package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.internal._

/** Distributed exact percentiles (NumPy/pandas linear interpolation —
  * the reference's quantile semantics, pd_utils/port.py:263-268 /
  * transform.py:221-232).
  *
  * Spark's builtin exact `percentile` aggregate buffers the whole
  * value multiset of each group as a boxed `OpenHashMap[AnyRef, Long]`
  * inside ONE aggregation buffer — measured 12-18 s and multi-GB GC
  * churn on a 6M-row column at sf1, and a guaranteed OOM cliff once a
  * single group's distinct values outgrow one task's heap. This
  * operator computes the same cut values (bit-identical: the
  * interpolation expression mirrors the builtin's scalar arithmetic
  * term for term) as a distributed plan instead:
  *
  *  1. count per (byvars, value) — one map-side-combined hash-agg
  *     shuffle; everything after runs on DISTINCT values only;
  *  2. range-repartition the counts on (byvars, value) so each
  *     partition holds a contiguous slice of each group's value
  *     order; per-partition cumulative counts are a partitioned
  *     window (parallel, spillable);
  *  3. per-(partition, group) subtotals — a tiny
  *     (numPartitions x |groups|)-row frame — prefix-sum into
  *     partition offsets and broadcast back: every distinct value now
  *     knows the exact global rank range [start, end) it covers, and
  *     the group's non-null total N, with no single-task funnel over
  *     data-sized input (the packSequences/shuffleRank recipe,
  *     [[graft.pipeline.Sampling]]);
  *  4. the rows covering floor/ceil of each target position
  *     p*(N-1) — at most 2|ps| per group — are filtered out and
  *     one tiny agg interpolates the cuts.
  *
  * Partition boundaries chosen by repartitionByRange's sampling do
  * not affect the result — ranks are exact under ANY contiguous
  * split — so the output is deterministic even though the sampling
  * is not.
  *
  * NULL and NaN values are excluded from ranks (callers pre-clean
  * infinities per their own contract). A group with zero clean values
  * produces no output row with `byvars` (join back as left -> null
  * cuts, like the builtin's null), and a single all-null row without
  * `byvars` (global aggregates always emit one row).
  */
object Percentiles {

  /** One row per byvars combo: byvars ++ [cutsCol: array<double>]
    * with `cutsCol(i)` = the ps(i) exact percentile of `value`.
    * With empty `byvars`, exactly one row (join back via
    * `crossJoin(broadcast(...))`).
    */
  def cuts(
      df: DataFrame,
      value: Column,
      byvars: Seq[String],
      ps: Seq[Double],
      cutsCol: String = "__cuts__"
  ): DataFrame = cutsWithCleanup(df, value, byvars, ps, cutsCol)._1

  /** [[cuts]] plus a cleanup thunk for the internal ranked-counts
    * persist: the counts/range-shuffle stage feeds BOTH the offsets
    * broadcast and the rank refine, and without the (lazy) persist
    * the whole scan + count-aggregation pipeline computes once per
    * side (measured 3 source scans at sf1). The cleanup follows the
    * minhashCandidatesWithCleanup convention (Dedup.scala): call it
    * after the consuming action.
    */
  def cutsWithCleanup(
      df: DataFrame,
      value: Column,
      byvars: Seq[String],
      ps: Seq[Double],
      cutsCol: String = "__cuts__"
  ): (DataFrame, () => Unit) = {
    require(ps.nonEmpty, "ps must be non-empty")
    require(ps.forall(p => p >= 0 && p <= 1), s"percentiles must be in [0,1], got $ps")
    val keys = byvars.map(col)
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt

    val vals = df
      .select((keys :+ value.cast("double").as("__v__")): _*)
      .where(col("__v__").isNotNull && !isnan(col("__v__")))

    // Size-adaptive: below the threshold the builtin aggregate's
    // whole-multiset buffer is harmless and its single pass beats the
    // multi-stage distributed plan's fixed overhead (~1 s of extra
    // stages); above it the buffer is the 12-18 s / OOM problem this
    // operator exists to remove. Both paths produce BIT-IDENTICAL
    // cuts (PercentilesSpec), so the switch can never change results
    // — it is purely a physical-plan choice, like AQE picking a join
    // strategy. Catalyst's sizeInBytes estimate is available at
    // composition time (no job). Tunable / forceable via conf for
    // tests and unusual deployments.
    val threshold = spark.conf
      .get("graft.percentiles.distributedThresholdBytes", (16L << 20).toString).toLong
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < threshold) {
      val agg = percentile(col("__v__"), lit(ps.toArray)).as(cutsCol)
      val out =
        (if (byvars.isEmpty) vals.agg(agg) else vals.groupBy(keys: _*).agg(agg))
          // the cuts frame is 1 row per group but referenced from
          // several plan sites (winsorize's bottom pass embeds the top
          // pass; the clamp joins read it again) — the lazy persist
          // makes the aggregation compute once per action, not once
          // per reference
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      return (out, () => { out.unpersist(); () })
    }
    val cnt = vals.groupBy((keys :+ col("__v__")): _*).agg(count(lit(1)).as("__c__"))
    val parts = cnt
      .repartitionByRange(nParts, (keys :+ col("__v__")).map(_.asc): _*)
      .withColumn("__pid__", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // (numPartitions x |groups|)-row offsets frame. The windows below
    // run over THIS tiny frame only (contract: one row per partition
    // per group); with empty byvars they are unpartitioned by
    // construction — a known, guarded global-window site (PlanSpec
    // census).
    val wOff = Window
      .partitionBy(keys: _*)
      .orderBy(col("__pid__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(keys: _*)
    val offs = parts
      .groupBy((col("__pid__") +: keys): _*)
      .agg(sum(col("__c__")).as("__pc__"))
      .withColumn("__off__", sum(col("__pc__")).over(wOff) - col("__pc__"))
      .withColumn("__n__", sum(col("__pc__")).over(wTot))
      .select((col("__pid__") +: keys) :+ col("__off__") :+ col("__n__"): _*)

    val wIn = Window
      .partitionBy((col("__pid__") +: keys): _*)
      .orderBy(col("__v__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = parts
      .withColumn("__cum__", sum(col("__c__")).over(wIn))
      .join(broadcast(offs), "__pid__" +: byvars)
      // this value occupies global ranks [__start__, __end__)
      .withColumn("__end__", col("__off__") + col("__cum__"))
      .withColumn("__start__", col("__end__") - col("__c__"))

    // builtin Percentile parity: position = p * (N - 1), computed and
    // interpolated with the same arithmetic shape so results are
    // IEEE-identical (PercentilesSpec pins bitwise equality).
    def pos(i: Int): Column = lit(ps(i)) * (col("__n__") - lit(1L)).cast("double")
    def covers(rank: Column): Column = col("__start__") <= rank && rank < col("__end__")

    val needed = ps.indices
      .flatMap(i => Seq(covers(floor(pos(i))), covers(ceil(pos(i)))))
      .reduce(_ || _)
    val aggExprs = ps.indices.flatMap { i =>
      Seq(
        max(when(covers(floor(pos(i))), col("__v__"))).as(s"__lo${i}__"),
        max(when(covers(ceil(pos(i))), col("__v__"))).as(s"__hi${i}__"))
    } :+ max(col("__n__")).as("__nn__")
    val cands = ranked.where(needed)
    val agged =
      if (byvars.isEmpty) cands.agg(aggExprs.head, aggExprs.tail: _*)
      else cands.groupBy(keys: _*).agg(aggExprs.head, aggExprs.tail: _*)

    val cutExprs = ps.indices.map { i =>
      val p = lit(ps(i)) * (col("__nn__") - lit(1L)).cast("double")
      val lo = floor(p).cast("double")
      val hi = ceil(p).cast("double")
      when(col(s"__lo${i}__").isNull, lit(null).cast("double"))
        .when(lo === hi, col(s"__lo${i}__"))
        // builtin parity: equal boundary keys skip interpolation (the
        // ulp-lossy (1-f)*v + f*v round-trip must NOT happen)
        .when(col(s"__lo${i}__") === col(s"__hi${i}__"), col(s"__lo${i}__"))
        .otherwise((hi - p) * col(s"__lo${i}__") + (p - lo) * col(s"__hi${i}__"))
    }
    // the cuts frame is tiny (one row per group) but may be read from
    // several plan sites — cache it so the rank pipeline runs once
    // per action
    val out = agged.select((keys :+ array(cutExprs: _*).as(cutsCol)): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (out, () => { out.unpersist(); parts.unpersist(); () })
  }

  /** [[cuts]] for a single percentile, unwrapped to a scalar column
    * `outCol` (the winsorize bound shape).
    */
  def cut(
      df: DataFrame,
      value: Column,
      byvars: Seq[String],
      p: Double,
      outCol: String
  ): DataFrame = cutWithCleanup(df, value, byvars, p, outCol)._1

  /** [[cut]] with the [[cutsWithCleanup]] release handle. */
  def cutWithCleanup(
      df: DataFrame,
      value: Column,
      byvars: Seq[String],
      p: Double,
      outCol: String
  ): (DataFrame, () => Unit) = {
    val (c, cleanup) = cutsWithCleanup(df, value, byvars, Seq(p), "__cuts1__")
    (c.select((byvars.map(col) :+ element_at(col("__cuts1__"), 1).as(outCol)): _*),
      cleanup)
  }

  /** Several scalar bounds over the SAME frame in as few jobs as the
    * physical path allows: on the builtin (small-input) path every
    * requested (outCol, value, p) is one expression of a SINGLE
    * aggregation pass — N bounds cost one scan, not N (the winsorize
    * shape: one pass per tail); on the distributed path each bound
    * runs its own rank pipeline (they aggregate different value
    * domains, so there is nothing to share). Returns one tiny frame
    * carrying byvars plus every outCol, and the combined release
    * handle. Bit-identical to N separate [[cutWithCleanup]] calls.
    */
  def boundsMulti(
      df: DataFrame,
      bounds: Seq[(String, Column, Double)],
      byvars: Seq[String]
  ): (DataFrame, () => Unit) = {
    require(bounds.nonEmpty, "bounds must be non-empty")
    val keys = byvars.map(col)
    val spark = df.sparkSession
    val threshold = spark.conf
      .get("graft.percentiles.distributedThresholdBytes", (16L << 20).toString).toLong
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < threshold) {
      // one pass: clean per-column inside the aggregate (percentile
      // ignores nulls; NaN pre-nulled to match the distributed path)
      val aggs = bounds.map { case (out, v, p) =>
        val clean = when(isnan(v.cast("double")), lit(null)).otherwise(v.cast("double"))
        percentile(clean, lit(p)).as(out)
      }
      val out =
        (if (byvars.isEmpty) df.agg(aggs.head, aggs.tail: _*)
         else df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (out, () => { out.unpersist(); () })
    } else {
      val pieces = bounds.map { case (out, v, p) => cutWithCleanup(df, v, byvars, p, out) }
      val joined = pieces.map(_._1).reduce { (a, b) =>
        if (byvars.isEmpty) a.crossJoin(b)
        else a.join(b, byvars, "full")
      }
      (joined, () => pieces.foreach(_._2()))
    }
  }
}
