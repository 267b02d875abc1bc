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
  ): DataFrame = winsorizeWithCleanup(df, pct, subset, byvars, bot, top)._1

  /** [[winsorize]] plus the release handle for the per-column
    * exact-percentile persists ([[Percentiles.cutWithCleanup]]) —
    * call after the consuming action.
    */
  def winsorizeWithCleanup(
      df: DataFrame,
      pct: (Double, Double),
      subset: Seq[String] = Nil,
      byvars: Seq[String] = Nil,
      bot: Boolean = true,
      top: Boolean = true
  ): (DataFrame, () => Unit) = {
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

    // Bounds come from the distributed exact-percentile plan
    // (operators/Percentiles — bit-equal to the builtin aggregate
    // without its whole-multiset aggregation buffer), one tiny cuts
    // frame per column per active tail, broadcast back. Per-group
    // joins are NULL-SAFE so rows with null byvars clamp within the
    // null group, exactly like the former percentile-over-window
    // form. Two passes because the bottom quantile depends on the
    // top clamp.
    // One bounds pass per active tail ([[Percentiles.boundsMulti]]:
    // all columns share a single aggregation job on the small-input
    // path), one broadcast join per tail. Two passes by reference
    // semantics — the bottom quantile is computed on top-clamped
    // values. Per-group joins are NULL-SAFE so rows with null byvars
    // clamp within the null group, like the original
    // percentile-over-window form.
    val cleanups = scala.collection.mutable.ListBuffer.empty[() => Unit]
    def attach(d: DataFrame, prefix: String, pct: Double,
               valueOf: String => Column): DataFrame = {
      val (bounds, cleanup) = Percentiles.boundsMulti(
        d, cols.map(c => (s"$prefix$c", valueOf(c), pct)), byvars)
      cleanups += cleanup
      val b = broadcast(bounds)
      if (byvars.isEmpty) d.crossJoin(b)
      else byvars.foldLeft(
        d.join(b, byvars.map(k => d(k) <=> b(k)).reduce(_ && _), "left"))(
        (j, k) => j.drop(b(k)))
    }
    val withHi =
      if (top) attach(df, "__hi_", topPct, cleanOf)
      else df
    val withBounds =
      if (bot) attach(withHi, "__lo_", botPct, topClamped)
      else withHi
    val clamped = cols.foldLeft(withBounds)(applyClamp)
    (clamped.drop(tmpCols.filter(clamped.columns.contains): _*),
      () => cleanups.foreach(f => f()))
  }

  def winsorize(
      df: DataFrame,
      pct: Double,
      subset: Seq[String],
      byvars: Seq[String]
  ): DataFrame = winsorize(df, (pct, pct), subset, byvars)
}
