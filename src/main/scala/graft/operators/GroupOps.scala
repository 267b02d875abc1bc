package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.internal._

/** Group-aggregate-and-merge-back operators.
  *
  * Reference semantics: pd_utils/merge.py:14-154 (groupby_merge,
  * groupby_index), pd_utils/transform.py:110-164 (averages),
  * pd_utils/transform.py:260-292 (var_change_by_groups).
  *
  * Spark-first design: the reference materializes a grouped aggregate
  * and hash-joins it back onto the input (pd_utils/merge.py:102-105).
  * We instead express the whole operator as a window aggregate — one
  * shuffle on the group keys, no join, and Catalyst can prune/push
  * around it. All order-dependent variants take explicit sort columns
  * because Spark DataFrames are unordered (SURVEY §1.1).
  */
object GroupOps {

  /** Named aggregate whitelist mirroring the pandas groupby methods the
    * reference dispatches by string (pd_utils/merge.py:97-101).
    * `std`/`var` are sample (ddof=1) like pandas; `median` is the exact
    * 50th percentile with linear interpolation.
    */
  val namedAggs: Map[String, Column => Column] = Map(
    "min" -> (c => min(c)),
    "max" -> (c => max(c)),
    "sum" -> (c => sum(c)),
    "count" -> (c => count(c).cast("long")),
    "mean" -> (c => avg(c)),
    "avg" -> (c => avg(c)),
    "std" -> (c => stddev_samp(c)),
    "var" -> (c => var_samp(c)),
    "median" -> (c => percentile(c, lit(0.5))),
    "first" -> (c => first(c, ignoreNulls = true)),
    "last" -> (c => last(c, ignoreNulls = true)),
    "prod" -> (c => product(c))
  )

  /** Group by `byvars`, apply the named aggregation to each column of
    * `subset`, and attach results to every original row as
    * `<col>_<funcStr>` (pd_utils/merge.py:14-110).
    *
    * Pandas-parity null handling (SURVEY §1.4): rows with a missing
    * group key get a NULL aggregate (pandas drops NaN keys from
    * groupby); in `transform`-style usage, call [[groupbyTransform]]
    * which keeps null keys as their own group.
    */
  def groupbyMerge(
      df: DataFrame,
      byvars: Seq[String],
      funcStr: String,
      subset: Seq[String] = Nil,
      replace: Boolean = false
  ): DataFrame = {
    val cols =
      if (subset.nonEmpty) subset
      else df.columns.toSeq.filterNot(byvars.contains)
    val fn = namedAggs.getOrElse(
      funcStr,
      throw new IllegalArgumentException(s"unsupported agg '$funcStr'")
    )
    val w = Window.partitionBy(toCols(byvars): _*)
    val nullKey = anyMissing(df, byvars)
    val out = cols.foldLeft(df) { (d, c) =>
      d.withColumn(
        s"${c}_$funcStr",
        when(nullKey, lit(null)).otherwise(fn(col(c)).over(w))
      )
    }
    if (replace) replaceWithSuffixed(out, cols, funcStr) else out
  }

  /** `groupby_merge(..., 'transform', f)` equivalent: apply a window
    * aggregate within groups, INCLUDING null-keyed groups (the
    * reference sentinel-fills NaN keys so they form a real group,
    * pd_utils/merge.py:57-59), while rows with a missing value in any
    * subset column are excluded from the computation and receive NULL
    * (pd_utils/merge.py:61-68).
    *
    * `f` receives (value column, window) and must return the windowed
    * expression, e.g. `(c, w) => sum(c).over(w)`.
    */
  def groupbyTransform(
      df: DataFrame,
      byvars: Seq[String],
      subset: Seq[String],
      f: (Column, org.apache.spark.sql.expressions.WindowSpec) => Column,
      suffix: String = "transform",
      replace: Boolean = false
  ): DataFrame = {
    val w = Window.partitionBy(toCols(byvars): _*)
    val excluded = subset.map(c => isMissing(df, c)).reduce(_ || _)
    val out = subset.foldLeft(df) { (d, c) =>
      val masked = when(excluded, lit(null)).otherwise(col(c))
      d.withColumn(
        s"${c}_$suffix",
        when(excluded, lit(null)).otherwise(f(masked, w))
      )
    }
    if (replace) replaceWithSuffixed(out, subset, suffix) else out
  }

  private def replaceWithSuffixed(
      df: DataFrame,
      cols: Seq[String],
      suffix: String
  ): DataFrame = {
    val dropped = df.drop(cols: _*)
    cols.foldLeft(dropped)((d, c) =>
      d.withColumnRenamed(s"${c}_$suffix", c)
    )
  }

  /** 0-based row counter per group after an explicit in-group sort,
    * as `group_index` (pd_utils/merge.py:122-154). The reference
    * counts rows in physical order after a global sort; Spark has no
    * physical order, so `sortvars` defines the in-group order.
    */
  def groupbyIndex(
      df: DataFrame,
      byvars: Seq[String],
      sortvars: Seq[String] = Nil,
      ascending: Boolean = true
  ): DataFrame = {
    val order = (if (sortvars.nonEmpty) sortvars else byvars)
      .map(c => if (ascending) col(c).asc else col(c).desc)
    val w = Window.partitionBy(toCols(byvars): _*).orderBy(order: _*)
    df.withColumn("group_index", row_number().over(w) - 1)
  }

  /** Equal- and value-weighted per-group means
    * (pd_utils/transform.py:110-164).
    *
    * Output columns: each avgvar keeps its own name (EW mean); with
    * `wtvar`, adds `<var>_wavg` = sum(x*w)/sum(w over ALL group rows)
    * — matching the reference's transform('sum') denominator which
    * includes rows where x is null (pd_utils/transform.py:150-152).
    * With `count=Some(c)`, adds `<c>_count` (non-null count, and its
    * `_wavg` — the reference includes the count column in the wavg
    * loop, so we do too).
    *
    * Rows with missing byvars are dropped (pandas groupby).
    * True aggregation (one row per group): map-side partial agg, one
    * shuffle — scales to arbitrary group counts.
    */
  def averages(
      df: DataFrame,
      avgvars: Seq[String],
      byvars: Seq[String],
      wtvar: Option[String] = None,
      count: Option[String] = None
  ): DataFrame = {
    val base = dropMissingKeys(df, byvars)
    val countCol = count.map(c => s"${c}_count")
    val grpCount = count.map(c => org.apache.spark.sql.functions.count(col(c)).cast("double"))
    // The reference attaches the group count per ROW so it can ride
    // the same averaging as any avgvar — which costs a full windowed
    // shuffle+sort before the aggregation. But the attached column is
    // CONSTANT within its group, so both its averages collapse to
    // group-level aggregates: EW(avg of a constant) = the count;
    // WAVG = count·sum(w)/sum(w) = the count whenever sum(w) is
    // usable. One hash aggregation total, no window pass.
    val ew = avgvars.map(v => avg(col(v)).as(v)) ++
      countCol.zip(grpCount).map { case (n, c) => c.as(n) }
    // NB denominator: reference computes w/sum(w) with sum over all
    // group rows (null x included), numerator skips null x.
    val wavgFixed = wtvar match {
      case Some(wt) =>
        avgvars.map(v => (sum(col(v) * col(wt)) / sum(col(wt))).as(s"${v}_wavg")) ++
          countCol.zip(grpCount).map { case (n, c) =>
            // degenerate weights mimic the row-level division: all-null
            // weights -> null; an exactly-zero weight total -> NaN
            // (0/0; the row-level form gave NaN or ±Inf depending on
            // summation noise — the exact form is deterministic)
            val sw = sum(col(wt))
            when(sw.isNull, lit(null).cast("double"))
              .when(sw === 0.0, lit(Double.NaN))
              .otherwise(c)
              .as(s"${n}_wavg")
          }
      case None => Nil
    }
    base.groupBy(toCols(byvars): _*).agg((ew ++ wavgFixed).head, (ew ++ wavgFixed).tail: _*)
  }

  /** Per-group lagged difference `<v>_change = v - lag(v, numlags)`
    * over an explicit order (pd_utils/transform.py:260-292). The
    * reference lags in pre-existing row order on a deduplicated
    * (var+byvars+datevar) slice and joins back; with an explicit
    * order column the window lag is exactly equivalent and avoids the
    * join. Rows with missing byvars get NULL change.
    */
  def varChangeByGroups(
      df: DataFrame,
      vars: Seq[String],
      byvars: Seq[String],
      datevar: String,
      numlags: Int = 1,
      tiebreakCols: Seq[String] = Nil
  ): DataFrame = {
    // tiebreakCols make the in-group order total when datevar alone
    // has duplicates — without them lag() is nondeterministic (the
    // reference instead inherits the caller's physical row order,
    // which Spark does not have; SURVEY §1.1)
    val w = Window
      .partitionBy(toCols(byvars): _*)
      .orderBy((datevar +: tiebreakCols).map(col): _*)
    val nullKey = anyMissing(df, byvars)
    vars.foldLeft(df) { (d, v) =>
      d.withColumn(
        s"${v}_change",
        when(nullKey, lit(null))
          .otherwise(col(v) - lag(col(v), numlags).over(w))
      )
    }
  }

  /** Batch sessionization: number each key's events into sessions
    * separated by more than `gapSeconds` of inactivity (the batch
    * twin of `StreamOps.sessionize`). Adds a 1-based `session`
    * column. Two window functions (gap detection via lag, session
    * numbering via running sum) over the SAME window spec — one
    * shuffle + one sort on the keys, no extra exchange.
    *
    * Tied timestamps are order-ambiguous but session-stable: the
    * in-tie gap is zero, so every ordering assigns tied rows the
    * same session number.
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapSeconds: Long
  ): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(toCols(keys): _*).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val boundary = when(
      lag(col(tsCol), 1).over(w).isNull ||
        us - unix_micros(lag(col(tsCol), 1).over(w)) > gapSeconds * 1000000L,
      lit(1L)).otherwise(lit(0L))
    df.withColumn("session",
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
