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
      agg: Column => Column = c => first(c, ignoreNulls = true),
      colindexOnly: Boolean = false
  ): DataFrame = {
    require(!(colindexOnly && values.size > 1),
      "set colindexOnly to false when passing more than one value (pd_utils/transform.py:63-65)")
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
    // pivot per GROUP, then join the wide row back onto each original
    // row's carried columns — the reference merges the wide frame onto
    // the other columns so every original row carries the group's full
    // wide vector (tests/test_pandas.py:362-380, expect_df_no_colindex)
    val grouped = withIdx.groupBy(toCols(groupvars): _*)
    val aggExprs = values.map(v => agg(col(v)).as(v))
    // Pivot-value inference (`pivot(col)` with no values) collects the
    // distinct pivot values by re-executing the pivot input — which
    // CHAINS the dropDuplicates shuffle above, so the whole dedup ran
    // twice per pivot. The distinct colindex values of the RAW frame
    // are identical (dedup removes duplicate ROWS, never index
    // values), and over `df` Catalyst prunes the scan to the colindex
    // columns with a map-side-combined distinct — so collect them
    // there, sorted like Spark's own inference (ascending, nulls
    // first), and pass them explicitly. The cumcount (empty colindex)
    // case depends on post-dedup group sizes and keeps inference.
    val explicitVals: Option[Seq[Any]] = (colindex match {
      case Nil => None
      case single :: Nil => Some(df.select(col(single).cast("string").as("__pv__")))
      case many => Some(df.select(
        concat_ws("_", many.map(c => col(c).cast("string")): _*).as("__pv__")))
    }).map { src =>
      val vals = src.distinct().orderBy(col("__pv__")).collect().map(_.get(0)).toSeq
      require(vals.length <= 10000,
        s"pivot would create ${vals.length} columns (limit 10000) — aggregate first")
      vals
    }
    val wide = (explicitVals match {
      case Some(vals) => grouped.pivot(col(idxCol).cast("string"), vals)
      case None       => grouped.pivot(col(idxCol).cast("string"))
    }).agg(aggExprs.head, aggExprs.tail: _*)
    val pivoted =
      if (carried.isEmpty) wide
      else base.select((groupvars ++ carried).map(col): _*).dropDuplicates().join(wide, groupvars)
    // Spark names pivot columns "<idx>" (single value) or "<idx>_<v>"
    // (multi value); the reference names them "<value><idx>". For the
    // multi-value case, match the KNOWN value-name suffix rather than
    // splitting at the last underscore (which corrupts value names
    // that themselves contain '_', e.g. "ret_1").
    val renames: Seq[(String, String)] =
      if (colindexOnly)
        Nil // bare colindex values as column names (pd_utils/transform.py:92)
      else if (values.size == 1)
        pivoted.columns.toSeq
          .filterNot((groupvars ++ carried).contains)
          .map(c => c -> s"${values.head}$c")
      else {
        // longest value-name first: with values like ("ret", "vol_ret")
        // the column "1_vol_ret" suffix-matches BOTH, and picking the
        // shorter would misname it "ret1_vol" (ADVICE r3)
        val byLen = values.sortBy(-_.length)
        pivoted.columns.toSeq
          .filterNot((groupvars ++ carried).contains)
          .map { c =>
            byLen.find(v => c.endsWith(s"_$v")) match {
              case Some(v) => c -> s"$v${c.dropRight(v.length + 1)}"
              case None    => c -> c
            }
          }
      }
    renames.foldLeft(pivoted) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  /** Duplicates each row once per shift in `time`, adding `shiftvar`
    * and `newdate` = date advanced by that many periods
    * (pd_utils/datetime_utils.py:56-174). freq: "m" months, "a" years,
    * "d"/"td" trading days (the reference's 'd' defaults to its US
    * trading-day CustomBusinessDay calendar), "cd" plain calendar
    * days (extension).
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
      shiftvar: String = "Shift",
      intermediatePeriods: Boolean = false
  ): DataFrame = {
    // intermediate_periods=True densifies to every period between
    // min(time) and max(time) (pd_utils/datetime_utils.py:82-83)
    val periods = if (intermediatePeriods) time.min to time.max else time
    val exploded = df.withColumn(shiftvar, explode(array(periods.map(p => lit(p)): _*)))
    freq match {
      case "m" => exploded.withColumn(newdate, add_months(col(datevar), col(shiftvar)).cast("timestamp"))
      case "a" => exploded.withColumn(newdate, add_months(col(datevar), col(shiftvar) * 12).cast("timestamp"))
      case "cd" => exploded.withColumn(newdate, date_add(col(datevar), col(shiftvar)).cast("timestamp"))
      case "d" | "td" =>
        val spark = df.sparkSession
        import spark.implicits._
        // Static calendar (no data scan at composition time — the old
        // version ran an eager min/max job to bound the calendar; a
        // fixed 1960-2040 span is ~20k trading days, trivially
        // broadcast). EVERY calendar day maps to the ordinal of the
        // latest trading day <= it, so the date→ordinal lookup is an
        // equi join, not a range join.
        val allDays = Dates.calendarWithOrdinals(
          java.time.LocalDate.of(1960, 1, 1),
          java.time.LocalDate.of(2040, 12, 31)
        )
        val dayToOrd = allDays
          .map { case (d, ord, _) => (java.sql.Date.valueOf(d), ord) }
          .toDF("__day__", "__ord0__")
        val ordToTd = allDays
          .collect { case (d, ord, true) => (ord, java.sql.Date.valueOf(d)) }
          .toDF("__ord__", "__td__")
        exploded
          .join(broadcast(dayToOrd), col(datevar).cast("date") === col("__day__"), "left")
          .withColumn("__target__", col("__ord0__") + col(shiftvar))
          .join(broadcast(ordToTd), col("__ord__") === col("__target__"), "left")
          .withColumn(newdate, col("__td__").cast("timestamp"))
          .drop("__day__", "__ord0__", "__target__", "__ord__", "__td__")
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
