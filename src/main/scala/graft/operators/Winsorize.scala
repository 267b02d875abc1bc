package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.internal._

/** Winsorization: clamp values to per-group exact-percentile bounds.
  *
  * Reference: pd_utils/transform.py:167-232. pandas `quantile` uses
  * linear interpolation — Spark's exact `percentile` matches
  * (approx_percentile would NOT; SURVEY §7.4.1). NaN/NULL values are
  * left untouched (pandas comparisons with NaN are False) and are
  * excluded from the percentile computation (pandas quantile skips
  * NaN).
  *
  * Implemented as a whole-partition window percentile + clamp: one
  * shuffle on byvars, no join back.
  */
object Winsorize {

  /** @param pct    (bottom, top-complement) — scalar p means clamp at
    *               [p, 1-p]; a pair (b, t) means [b, 1-t] like the
    *               reference's tuple form (pd_utils/transform.py:195-201).
    * @param subset columns to winsorize; empty = all numeric columns
    *               not in byvars.
    */
  def winsorize(
      df: DataFrame,
      pct: (Double, Double),
      subset: Seq[String] = Nil,
      byvars: Seq[String] = Nil,
      bot: Boolean = true,
      top: Boolean = true
  ): DataFrame = {
    require(bot || top, "must winsorize at least one tail")
    val botPct = pct._1
    val topPct = 1 - pct._2
    val cols =
      if (subset.nonEmpty) subset
      else
        df.schema.fields
          .filter(f => f.dataType.isInstanceOf[NumericType] && !byvars.contains(f.name))
          .map(_.name)
          .toSeq
    def clamp(d: DataFrame, c: String, lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column): DataFrame = {
      val x = col(c).cast("double")
      val clampTop = if (top) when(x > hi, hi).otherwise(x) else x
      val clampBoth = if (bot) when(clampTop < lo, lo).otherwise(clampTop) else clampTop
      d.withColumn(c, when(x.isNull || isnan(x), x).otherwise(clampBoth))
    }
    if (byvars.nonEmpty) {
      val w = Window.partitionBy(toCols(byvars): _*)
      cols.foldLeft(df) { (d, c) =>
        val x = col(c).cast("double")
        val cleanX = when(isnan(x), lit(null)).otherwise(x)
        clamp(d, c, percentile(cleanX, lit(botPct)).over(w), percentile(cleanX, lit(topPct)).over(w))
      }
    } else {
      // No byvars: an empty-partition Window would funnel the whole
      // dataset through ONE task. Instead: one scalar aggregation for
      // every column's two percentiles, broadcast-cross-joined back —
      // stays a two-stage distributed plan at any scale.
      val aggs = cols.flatMap { c =>
        val x = col(c).cast("double")
        val cleanX = when(isnan(x), lit(null)).otherwise(x)
        Seq(
          percentile(cleanX, lit(botPct)).as(s"__lo_$c"),
          percentile(cleanX, lit(topPct)).as(s"__hi_$c")
        )
      }
      val bounds = df.agg(aggs.head, aggs.tail: _*)
      val joined = df.crossJoin(broadcast(bounds))
      val clamped = cols.foldLeft(joined)((d, c) => clamp(d, c, col(s"__lo_$c"), col(s"__hi_$c")))
      clamped.drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
    }
  }

  def winsorize(
      df: DataFrame,
      pct: Double,
      subset: Seq[String],
      byvars: Seq[String]
  ): DataFrame = winsorize(df, (pct, pct), subset, byvars)
}
