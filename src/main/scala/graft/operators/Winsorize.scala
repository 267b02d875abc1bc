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
    val w =
      if (byvars.nonEmpty) Window.partitionBy(toCols(byvars): _*)
      else Window.partitionBy()
    cols.foldLeft(df) { (d, c) =>
      val x = col(c).cast("double")
      val cleanX = when(isnan(x), lit(null)).otherwise(x)
      val hi = percentile(cleanX, lit(topPct)).over(w)
      val lo = percentile(cleanX, lit(botPct)).over(w)
      val clampTop = if (top) when(x > hi, hi).otherwise(x) else x
      val clampBoth = if (bot) when(clampTop < lo, lo).otherwise(clampTop) else clampTop
      d.withColumn(c, when(x.isNull || isnan(x), x).otherwise(clampBoth))
    }
  }

  def winsorize(
      df: DataFrame,
      pct: Double,
      subset: Seq[String],
      byvars: Seq[String]
  ): DataFrame = winsorize(df, (pct, pct), subset, byvars)
}
