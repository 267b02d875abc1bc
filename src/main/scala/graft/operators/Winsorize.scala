package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.internal._

/** Winsorization: clamp values to per-group exact-percentile bounds.
  *
  * Reference: pd_utils/transform.py:167-232. pandas `quantile` uses
  * linear interpolation — Spark's exact `percentile` matches
  * (approx_percentile would NOT; SURVEY §7.4.1). NaN/NULL values are
  * left untouched and excluded from the percentile computation.
  *
  * Ordering subtlety the goldens pin (test_winsor_40_subset_byvars,
  * expected 1.0216): `_winsorize` clamps the TOP first by MUTATING the
  * column, then computes the bottom quantile on the already-clamped
  * values (pd_utils/transform.py:221-232). So with both tails active,
  * the bottom percentile here is taken over `least(x, hi)`, not the
  * raw column — a second window/aggregation pass that depends on the
  * first. Same partitioning both passes -> still a single shuffle.
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

    def cleanOf(c: String): Column = {
      val x = col(c).cast("double")
      when(isnan(x), lit(null)).otherwise(x)
    }
    def topClamped(c: String): Column = {
      val x = cleanOf(c)
      if (top) least(x, col(s"__hi_$c")) else x
    }
    def applyClamp(d: DataFrame, c: String): DataFrame = {
      val x = col(c).cast("double")
      val clampTop = if (top) when(x > col(s"__hi_$c"), col(s"__hi_$c")).otherwise(x) else x
      val clampBoth = if (bot) when(clampTop < col(s"__lo_$c"), col(s"__lo_$c")).otherwise(clampTop) else clampTop
      d.withColumn(c, when(x.isNull || isnan(x), x).otherwise(clampBoth))
    }
    val tmpCols = cols.flatMap(c => Seq(s"__hi_$c", s"__lo_$c")).toSeq

    val withBounds = if (byvars.nonEmpty) {
      val w = Window.partitionBy(toCols(byvars): _*)
      val withHi =
        if (top) cols.foldLeft(df)((d, c) => d.withColumn(s"__hi_$c", percentile(cleanOf(c), lit(topPct)).over(w)))
        else df
      if (bot) cols.foldLeft(withHi)((d, c) => d.withColumn(s"__lo_$c", percentile(topClamped(c), lit(botPct)).over(w)))
      else withHi
    } else {
      // No byvars: an empty-partition Window would funnel the whole
      // dataset through ONE task. Scalar aggregations broadcast-cross-
      // joined back keep the plan distributed at any scale (two
      // passes because the bottom quantile depends on the top clamp).
      val withHi = if (top) {
        val aggs = cols.map(c => percentile(cleanOf(c), lit(topPct)).as(s"__hi_$c"))
        df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))
      } else df
      if (bot) {
        val aggs = cols.map(c => percentile(topClamped(c), lit(botPct)).as(s"__lo_$c"))
        withHi.crossJoin(broadcast(withHi.agg(aggs.head, aggs.tail: _*)))
      } else withHi
    }
    val clamped = cols.foldLeft(withBounds)(applyClamp)
    clamped.drop(tmpCols.filter(clamped.columns.contains): _*)
  }

  def winsorize(
      df: DataFrame,
      pct: Double,
      subset: Seq[String],
      byvars: Seq[String]
  ): DataFrame = winsorize(df, (pct, pct), subset, byvars)
}
