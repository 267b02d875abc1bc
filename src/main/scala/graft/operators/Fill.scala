package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.internal._

/** Missing-data fill operators.
  *
  * Reference: pd_utils/filldata.py. All per-group loops become window
  * aggregates; the reference's `-999.999` all-NaN sentinel round-trip
  * (pd_utils/filldata.py:113-115,148-153) is unnecessary — an all-null
  * group simply stays null.
  */
object Fill {

  /** Fill numeric nulls with a per-group aggregate (default mean) and
    * string nulls with first/last non-null (pd_utils/filldata.py:31-62).
    * "first"/"last" need a deterministic order → `orderCols`.
    */
  def fillnaByGroups(
      df: DataFrame,
      byvars: Seq[String],
      orderCols: Seq[String],
      excludeCols: Seq[String] = Nil,
      strVars: String = "first",
      numVars: String = "mean"
  ): DataFrame = {
    val wAll = Window
      .partitionBy(toCols(byvars): _*)
      .orderBy(toCols(orderCols): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // any GroupOps.namedAggs name works as the numeric fill, matching
    // the reference's arbitrary pandas agg string
    // (pd_utils/filldata.py:129-136): mean/median/min/max/sum/...
    def fillExpr(c: String, how: String): Column =
      GroupOps.namedAggs
        .getOrElse(how, throw new IllegalArgumentException(s"unsupported fill '$how'"))
        .apply(col(c))
        .over(wAll)
    val fillCols = df.columns.toSeq
      .filterNot(byvars.contains)
      .filterNot(excludeCols.contains)
    fillCols.foldLeft(df) { (d, c) =>
      val how = df.schema(c).dataType match {
        case _: NumericType => numVars
        case _              => strVars
      }
      // cast the fill back to the column's dtype so untouched columns
      // don't silently widen (pandas integer columns can never hold
      // NaN, so the reference's mean-fill only ever sees floats there)
      d.withColumn(c, coalesce(col(c), fillExpr(c, how).cast(df.schema(c).dataType)))
    }
  }

  /** fillnaByGroups then keep the first row per group
    * (pd_utils/filldata.py:10-28). */
  def fillnaByGroupsAndKeepOnePerGroup(
      df: DataFrame,
      byvars: Seq[String],
      orderCols: Seq[String],
      excludeCols: Seq[String] = Nil,
      strVars: String = "first",
      numVars: String = "mean"
  ): DataFrame = {
    val filled = fillnaByGroups(df, byvars, orderCols, excludeCols, strVars, numVars)
    val w = Window.partitionBy(toCols(byvars): _*).orderBy(toCols(orderCols): _*)
    filled
      .withColumn("__rn__", row_number().over(w))
      .where(col("__rn__") === 1)
      .drop("__rn__")
  }

  /** Forward-fill `cols` within `partCols` ordered by `orderCols`,
    * optionally only up to `limit` rows past the last non-null
    * (pandas fillna(method='ffill', limit=...) parity,
    * pd_utils/filldata.py:96-99). The limit guard compares each row's
    * position against that of the last non-null — two window
    * expressions, no UDAF.
    */
  def ffill(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[String],
      cols: Seq[String],
      limit: Option[Int] = None
  ): DataFrame = fillDirectional(df, partCols, orderCols, cols, limit, forward = true)

  /** Backward-fill analogue of [[ffill]]. */
  def bfill(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[String],
      cols: Seq[String],
      limit: Option[Int] = None
  ): DataFrame = fillDirectional(df, partCols, orderCols, cols, limit, forward = false)

  private def fillDirectional(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[String],
      cols: Seq[String],
      limit: Option[Int],
      forward: Boolean
  ): DataFrame = {
    val order = if (forward) toCols(orderCols) else orderCols.map(c => col(c).desc)
    val w = Window
      .partitionBy(toCols(partCols): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRow = Window.partitionBy(toCols(partCols): _*).orderBy(order: _*)
    cols.foldLeft(df) { (d, c) =>
      val filled = last(col(c), ignoreNulls = true).over(w)
      limit match {
        case None => d.withColumn(c, coalesce(col(c), filled))
        case Some(n) =>
          val rn = row_number().over(wRow)
          val lastNonNullRn =
            last(when(col(c).isNotNull, rn), ignoreNulls = true).over(w)
          d.withColumn(
            c,
            coalesce(col(c), when(rn - lastNonNullRn <= n, filled))
          )
      }
    }
  }

  /** Adds rows so that each group has every non-group id, then
    * ffill/bfill per group (pd_utils/filldata.py:65-101). The scaffold
    * is the cross product of the per-column distinct values
    * (each column's uniques independently, as in the reference) —
    * distinct frames are tiny relative to the data and broadcast.
    */
  def addMissingGroupRows(
      df: DataFrame,
      groupIdCols: Seq[String],
      nonGroupIdCols: Seq[String],
      fillMethod: Option[String] = Some("ffill"),
      fillLimit: Option[Int] = None
  ): DataFrame = {
    val fillIdCols = groupIdCols ++ nonGroupIdCols
    val scaffold = fillIdCols
      .map(c => df.select(c).distinct())
      .reduce((a, b) => a.crossJoin(b))
    val merged = scaffold.join(df, fillIdCols, "left")
    val valueCols = df.columns.toSeq.filterNot(fillIdCols.contains)
    fillMethod match {
      case Some("ffill") => ffill(merged, groupIdCols, nonGroupIdCols, valueCols, fillLimit)
      case Some("bfill") => bfill(merged, groupIdCols, nonGroupIdCols, valueCols, fillLimit)
      case None          => merged
      case Some(other)   => throw new IllegalArgumentException(s"unsupported fill method '$other'")
    }
  }

  /** Expands df to the full cross product of distinct byvar values,
    * left-joins the data, optionally filling nulls in `fillvars` with
    * `fillValue` (pd_utils/filldata.py:163-207).
    */
  def fillExcludedRows(
      df: DataFrame,
      byvars: Seq[String],
      fillvars: Seq[String] = Nil,
      fillValue: Option[Any] = None
  ): DataFrame = {
    val scaffold = byvars
      .map(c => df.select(c).na.drop().distinct())
      .reduce((a, b) => a.crossJoin(b))
    val merged = scaffold.join(df, byvars, "left")
    fillValue match {
      case Some(v: Double) => merged.na.fill(v, fillvars)
      case Some(v: Long)   => merged.na.fill(v, fillvars)
      case Some(v: Int)    => merged.na.fill(v.toLong, fillvars)
      case Some(v: String) => merged.na.fill(v, fillvars)
      case None            => merged
      case Some(other) => throw new IllegalArgumentException(s"unsupported fill value $other")
    }
  }

  /** Drops rows where all non-id columns are null
    * (pd_utils/filldata.py:104-106). */
  def dropMissingGroupRows(df: DataFrame, fillIdCols: Seq[String]): DataFrame = {
    val valueCols = df.columns.toSeq.filterNot(fillIdCols.contains)
    df.na.drop("all", valueCols)
  }
}
