package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-memory sketches for corpus-scale statistics. Unlike HLL
  * (whose register layout differs per engine, so results can't be
  * oracle-compared), the KMV (k-minimum-values) estimator is a pure
  * ORDER — the k smallest md5 hashes of the distinct values — making
  * it deterministic, mergeable, and bit-for-bit reproducible in any
  * engine with md5: the graft recipe for fitted/approximate results.
  */
object Sketch {

  /** 16^15 — the denominator normalizing a 15-hex-char prefix to
    * [0, 1). 15 chars = 60 bits, exact in both Long and double-free
    * integer arithmetic on every engine.
    */
  private val HexDenom = 1152921504606846976.0

  /** Per-group approximate distinct count of `valueCol` by KMV:
    * hash every distinct value to md5, keep each group's k smallest
    * hashes, and estimate
    *
    *   distinct ~= (k - 1) / frac(kth smallest hash)
    *
    * where frac maps the first 15 hex chars to [0, 1). Groups with
    * FEWER than k distinct values report the exact count (the sketch
    * holds every hash). Standard error ~ 1/sqrt(k-2).
    *
    * Scale shape: one (group, hash)-keyed distinct (map-side
    * combined), one per-group window rank that WindowGroupLimit
    * prunes to k rows per group map-side, one tiny per-group agg —
    * the full value set never concentrates anywhere, and the state
    * per group is k 32-char strings regardless of corpus size.
    * Estimates round to `decimals` so the single double division is
    * hash-comparable across engines.
    */
  def kmvDistinctByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int,
      decimals: Int = 4
  ): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val gcols = groupCols.map(col)
    val hashes = df
      .select(gcols :+ md5(col(valueCol).cast("string")).as("__h__"): _*)
      .distinct()
    val w = Window.partitionBy(gcols: _*).orderBy(col("__h__").asc)
    hashes
      .withColumn("__r__", row_number().over(w))
      .where(col("__r__") <= k)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("__n__"), max(col("__h__")).as("__kth__"))
      .select(gcols ++ Seq(
        when(col("__n__") < k, col("__n__").cast("double"))
          .otherwise(round(lit(k - 1) /
            (conv(substring(col("__kth__"), 1, 15), 16, 10).cast("long") / lit(HexDenom)),
            decimals))
          .as("distinct_est")): _*)
  }

  /** Whole-frame [[kmvDistinctByGroup]]: one row, `distinct_est`. */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int, decimals: Int = 4): DataFrame =
    kmvDistinctByGroup(df.withColumn("__g__", lit(1)), Seq("__g__"), valueCol, k, decimals)
      .drop("__g__")
}
