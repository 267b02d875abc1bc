package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Dates
import graft.internal._

/** Reshaping operators: pivot, row-explosion over time shifts, and
  * month→day expansion.
  *
  * Reference: pd_utils/transform.py:11-107 (long_to_wide),
  * pd_utils/datetime_utils.py:56-209 (expand_time, expand_months).
  * The reference duplicates whole frames (`df.append([df]*n)`) — here
  * row explosion is `explode(array/sequence)` so nothing is
  * materialized on the driver and the operator scales linearly.
  */
object Reshape {

  /** Pivot long → wide (pd_utils/transform.py:11-107).
    *
    * One output row per distinct (groupvars ++ carried columns); new
    * columns `<value><colindexValue>` per distinct colindex value.
    * Multiple colindex columns are concatenated with `_` (reference
    * behavior). When `colindex` is empty, the within-group row count
    * is used (needs `orderCols` — Spark frames are unordered).
    * `agg` resolves duplicate cells (the reference keeps the first in
    * row order and warns; default `first`).
    */
  def longToWide(
      df: DataFrame,
      groupvars: Seq[String],
      values: Seq[String],
      colindex: Seq[String] = Nil,
      orderCols: Seq[String] = Nil,
      agg: Column => Column = c => first(c, ignoreNulls = true)
  ): DataFrame = {
    val base = df.dropDuplicates()
    val (withIdx, idxCol) = colindex match {
      case Nil =>
        require(orderCols.nonEmpty, "colindex empty: orderCols required for the cumcount colindex")
        val w = Window.partitionBy(toCols(groupvars): _*).orderBy(toCols(orderCols): _*)
        (base.withColumn("__colindex__", row_number().over(w) - 1), "__colindex__")
      case single :: Nil => (base, single)
      case many =>
        (base.withColumn("__colindex__", concat_ws("_", many.map(c => col(c).cast("string")): _*)), "__colindex__")
    }
    val carried = df.columns.toSeq
      .filterNot(groupvars.contains)
      .filterNot(values.contains)
      .filterNot(colindex.contains)
      .filterNot(_ == idxCol)
    val grouped = withIdx.groupBy((groupvars ++ carried).map(col): _*)
    val aggExprs = values.map(v => agg(col(v)).as(v))
    val pivoted = grouped
      .pivot(col(idxCol).cast("string"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    // Spark names pivot columns "<idx>" (single value) or "<idx>_<v>"
    // (multi value); the reference names them "<value><idx>".
    val renames: Seq[(String, String)] =
      if (values.size == 1)
        pivoted.columns.toSeq
          .filterNot((groupvars ++ carried).contains)
          .map(c => c -> s"${values.head}$c")
      else
        pivoted.columns.toSeq
          .filterNot((groupvars ++ carried).contains)
          .map { c =>
            val i = c.lastIndexOf('_')
            val (idx, v) = (c.substring(0, i), c.substring(i + 1))
            c -> s"$v$idx"
          }
    renames.foldLeft(pivoted) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  /** Duplicates each row once per shift in `time`, adding `shiftvar`
    * and `newdate` = date advanced by that many periods
    * (pd_utils/datetime_utils.py:56-174). freq: "m" months, "a" years,
    * "d" calendar days, "td" trading days (reference: CustomBusinessDay).
    *
    * Implemented with explode(array(...)) — no frame duplication.
    * Trading-day shifts map the date to its trading-day ordinal via a
    * broadcast calendar join and index back.
    */
  def expandTime(
      df: DataFrame,
      time: Seq[Int],
      datevar: String = "Date",
      freq: String = "m",
      newdate: String = "Shift Date",
      shiftvar: String = "Shift"
  ): DataFrame = {
    val exploded = df.withColumn(shiftvar, explode(array(time.map(lit): _*)))
    freq match {
      case "m" => exploded.withColumn(newdate, add_months(col(datevar), col(shiftvar)).cast("timestamp"))
      case "a" => exploded.withColumn(newdate, add_months(col(datevar), col(shiftvar) * 12).cast("timestamp"))
      case "d" => exploded.withColumn(newdate, date_add(col(datevar), col(shiftvar)).cast("timestamp"))
      case "td" =>
        val spark = df.sparkSession
        import spark.implicits._
        // dedup-compute-expand (the reference's own optimization,
        // pd_utils/merge.py:157-191): map the DISTINCT dates to
        // trading-day ordinals via a broadcast calendar, shift the
        // ordinal, map back — then broadcast-join onto the data.
        val Seq(lo, hi) = df
          .agg(min(col(datevar)).cast("date").cast("string"), max(col(datevar)).cast("date").cast("string"))
          .head()
          .toSeq
          .map(_.toString)
        val span = time.map(v => math.abs(v.toLong)).max
        val days = Dates.tradingDays(
          java.time.LocalDate.parse(lo).minusDays(span * 3 + 10),
          java.time.LocalDate.parse(hi).plusDays(span * 3 + 10)
        )
        val cal = days.zipWithIndex
          .map { case (d, i) => (java.sql.Date.valueOf(d), i) }
          .toDF("__td__", "__ord__")
        // ordinal of the latest trading day <= each distinct date
        val ordMap = df
          .select(col(datevar).cast("date").as("__d__"))
          .distinct()
          .join(broadcast(cal), col("__td__") <= col("__d__"))
          .groupBy(col("__d__"))
          .agg(max(col("__ord__")).as("__ord0__"))
        val shiftMap = ordMap
          .crossJoin(broadcast(Seq.tabulate(time.size)(i => time(i)).toDF("__shift__")))
          .withColumn("__target__", col("__ord0__") + col("__shift__"))
          .join(broadcast(cal), col("__ord__") === col("__target__"), "left")
          .select(col("__d__"), col("__shift__"), col("__td__").as("__newdate__"))
        exploded
          .join(
            broadcast(shiftMap),
            col(datevar).cast("date") === col("__d__") && col(shiftvar) === col("__shift__"),
            "left"
          )
          .withColumn(newdate, col("__newdate__").cast("timestamp"))
          .drop("__d__", "__shift__", "__newdate__")
      case other => throw new IllegalArgumentException(s"unsupported freq '$other'")
    }
  }

  /** Explodes each monthly row to one row per trading (or calendar)
    * day in that month as `newdatevar`
    * (pd_utils/datetime_utils.py:177-209). Pure
    * explode(sequence(month start, month end)) + trading-day filter —
    * no calendar join needed.
    */
  def expandMonths(
      df: DataFrame,
      datevar: String = "Date",
      newdatevar: String = "Daily Date",
      tradeDays: Boolean = true
  ): DataFrame = {
    val day = explode(
      sequence(
        trunc(col(datevar), "MM"),
        last_day(col(datevar)),
        expr("interval 1 day")
      )
    )
    val exploded = df.withColumn(newdatevar, day)
    val filtered =
      if (tradeDays) exploded.where(Dates.isTradingDay(col(newdatevar)))
      else exploded
    filtered.withColumn(newdatevar, col(newdatevar).cast("timestamp"))
  }
}
