package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping —
  * the lakehouse OPTIMIZE ZORDER capability on plain parquet: rows
  * that are close in EVERY clustered column land in the same file, so
  * parquet min/max row-group stats prune scans filtered on ANY of the
  * columns (a single-column sort only skips well on that column; its
  * files span the full range of every other column).
  *
  * Built deterministic end to end, unlike the sampling-based z-order
  * in most engines:
  *
  *  1. each column maps to rank space through its own EXACT quantile
  *     cuts ([[Percentiles]] — distributed, oracle-replayable),
  *     rounded to 6 decimals so any engine computes identical bucket
  *     ids: `bucket = #cuts <= value`, a `2^bits`-way equi-depth
  *     histogram that is skew-immune by construction (quantiles, not
  *     value ranges);
  *  2. bucket bits interleave into the z-value (column i contributes
  *     bit j at position `j * k + i` — plain integer arithmetic,
  *     replayable in SQL);
  *  3. the file assignment is the EXACT quantile bucket of the
  *     z-value itself, so files are equal-sized by construction and
  *     the row→file mapping is a pure function of the data — no
  *     RangePartitioner sampling, no RNG, re-runs produce the same
  *     layout ([[graft.sources.Sink]] philosophy).
  *
  * Null/NaN values take bucket 0 / the top bucket respectively (Spark
  * and DuckDB both order NaN above every double) — poison rows
  * cluster at the curve ends instead of failing the write.
  */
object ZOrder {

  /** Exact-quantile rank bucket of `v`: the number of cuts <= v,
    * in [0, 2^bits). `cutsArr` is the rounded cuts array column.
    */
  private def bucketOf(v: Column, cutsArr: Column): Column =
    size(filter(cutsArr, c => c <= v))

  /** Bit-interleave k bucket columns (each in [0, 2^bits)) into the
    * z-value: bit j of column i lands at position j*k + i.
    */
  private def interleave(buckets: Seq[Column], bits: Int): Column =
    (0 until bits).flatMap { j =>
      buckets.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftright(b, j).bitwiseAND(lit(1)), j * buckets.size + i)
      }
    }.reduce(_.bitwiseOR(_)).cast("int")

  /** `df` plus `outCol` = the z-value of `zCols` (each column rank-
    * bucketed through its exact quantile cuts at `bits` bits, then
    * bit-interleaved). Returns the cleanup handle releasing the
    * internal percentile caches.
    */
  def withZValue(
      df: DataFrame,
      zCols: Seq[String],
      bits: Int = 6,
      outCol: String = "zvalue"
  ): (DataFrame, () => Unit) = {
    require(zCols.size >= 2, s"z-ordering needs >= 2 columns, got $zCols")
    require(bits >= 1 && bits * zCols.size <= 30,
      s"bits * columns must fit an int, got $bits x ${zCols.size}")
    val nCuts = (1 << bits) - 1
    val ps = (1 to nCuts).map(_.toDouble / (1 << bits))
    val cleanups = scala.collection.mutable.ListBuffer.empty[() => Unit]
    // ONE cuts pipeline for every clustered column (r20 opt — was one
    // full percentile pass + one broadcast join per column), joined
    // back in a single broadcast
    val (cuts, cleanup) = Percentiles.cutsMultiWithCleanup(
      df, zCols.zipWithIndex.map { case (c, i) => (s"__zc${i}__", col(c).cast("double")) },
      Nil, ps)
    cleanups += cleanup
    // 6-decimal rounding makes the bucket boundaries engine-portable
    // (the kmeans/PageRank recipe); layout quality is unaffected
    val withCuts = df.crossJoin(broadcast(
      cuts.select(zCols.indices.map(i =>
        transform(col(s"__zc${i}__"), x => round(x, 6)).as(s"__zc${i}__")): _*)))
    val buckets = zCols.zipWithIndex.map { case (c, i) =>
      bucketOf(col(c).cast("double"), col(s"__zc${i}__"))
    }
    val out = withCuts
      .withColumn(outCol, interleave(buckets, bits))
      .drop(zCols.indices.map(i => s"__zc${i}__"): _*)
    (out, () => cleanups.foreach(f => f()))
  }

  /** `df` plus `zvalue` and `zbucket` (the exact-quantile file bucket
    * of the z-value, in [0, nBuckets)) — the full deterministic
    * row→file assignment, exposed for inspection/oracles; the write
    * path is [[graft.sources.Sink.writeZOrdered]].
    */
  def withZBucket(
      df: DataFrame,
      zCols: Seq[String],
      bits: Int = 6,
      nBuckets: Int = 64
  ): (DataFrame, () => Unit) = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val (withZ, cleanZ) = withZValue(df, zCols, bits)
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    // the zvalue frame is a 1:1 projection of `df` (plus broadcast cut
    // joins whose multiplied size ESTIMATE reads as huge), so its cuts
    // route by the BASE frame's size (r20 opt — the small-input case
    // paid the full distributed rank cascade for the file buckets)
    val (cuts, cleanCuts) =
      Percentiles.cutsWithCleanup(withZ, col("zvalue").cast("double"), Nil, ps, "__zfc__",
        routeDistributed = Some(Percentiles.distributedPath(df)))
    val out = withZ
      .crossJoin(broadcast(cuts.select(transform(col("__zfc__"), x => round(x, 6)).as("__zfc__"))))
      .withColumn("zbucket", bucketOf(col("zvalue").cast("double"), col("__zfc__")))
      .drop("__zfc__")
    (out, () => { cleanZ(); cleanCuts() })
  }
}
