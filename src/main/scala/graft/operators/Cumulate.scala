package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.internal._

/** Per-group cumulative products within positional windows.
  *
  * Reference: pd_utils/cum.py:19-312 (cumulate, create_windows,
  * window_mapping). The reference splits each group into NumPy arrays
  * and runs np.cumprod in a multiprocessing pool; here the whole
  * operator is a single window aggregate — Spark's exact `product`
  * aggregate over rowsBetween(unboundedPreceding, currentRow) — so
  * parallelism comes from hash partitioning on (byvars, windowId) and
  * no per-group materialization ever happens.
  */
object Cumulate {

  /** Positional window boundaries, ported from create_windows
    * (pd_utils/cum.py:285-303). Returns for method 'between' the
    * inclusive upper positional index of each window: window 0 = {0},
    * window k = (b_{k-1}, b_k], and one leftover window for all
    * remaining rows. `time` must be sorted (the reference sorts it,
    * pd_utils/cum.py:98-101).
    */
  def betweenBoundaries(time: Seq[Int]): Seq[Int] = {
    val shifted = time.map(_ - time.head) // first period becomes 0
    shifted.filter(_ != 0)
  }

  /** Window-id column from a 0-based positional index within the
    * group, for method 'between': when-chain over the boundaries
    * (first window = {0}); rows past the last boundary land in the
    * leftover window (pd_utils/cum.py:296-302).
    */
  def windowIdBetween(pos0: Column, time: Seq[Int]): Column = {
    val bounds = betweenBoundaries(time)
    val base = when(pos0 <= 0, lit(0))
    val chained = bounds.zipWithIndex.foldLeft(base) {
      case (acc, (b, i)) => acc.when(pos0 <= b, lit(i + 1))
    }
    chained.otherwise(lit(bounds.length + 1))
  }

  /** Pure-Scala port of window_mapping for unit tests: maps group size
    * n to the per-row window ids (pd_utils/cum.py:306-312).
    */
  def windowMapping(time: Seq[Int], n: Int, method: String = "between"): Seq[Int] = {
    method match {
      case "first" => (0 until n).map(i => if (i == 0) 0 else 1)
      case "between" =>
        val bounds = betweenBoundaries(time)
        (0 until n).map { i =>
          if (i == 0) 0
          else {
            val k = bounds.indexWhere(i <= _)
            if (k >= 0) k + 1 else bounds.length + 1
          }
        }
    }
  }

  /** Cumulates `cumvars` over time within groups as `cum_<col>`
    * (pd_utils/cum.py:19-257).
    *
    * @param method   "first" (cumprod from the group's first row; the
    *                 first row is its own window 0, reference
    *                 pd_utils/cum.py:199-201 assigns window 0 to rows
    *                 at the minimum periodvar) or "between" (cumprod
    *                 restarting at each requested boundary in `time`,
    *                 windows assigned positionally).
    * @param grossify add 1 before cumulating and subtract after.
    */
  def cumulate(
      df: DataFrame,
      cumvars: Seq[String],
      method: String,
      periodvar: String,
      byvars: Seq[String],
      time: Seq[Int] = Nil,
      grossify: Boolean = false,
      replace: Boolean = false
  ): DataFrame = {
    require(method == "first" || method == "between", s"method '$method' not supported (reference raises for 'zero' too)")
    val sortedTime = time.sorted
    val grossified = if (grossify) {
      cumvars.foldLeft(df)((d, c) => d.withColumn(c, col(c) + 1))
    } else df

    val wOrder = Window.partitionBy(toCols(byvars): _*).orderBy(col(periodvar))
    val withWid = method match {
      case "first" =>
        // reference: 0 where periodvar == the GLOBAL frame minimum,
        // else 1 (pd_utils/cum.py:200-201 filters on
        // df[periodvar] == min(df[periodvar]) — whole frame, not per
        // group). Kept lazy: scalar agg broadcast-cross-joined into
        // the plan, no driver action at composition time.
        val gmin = grossified.agg(min(col(periodvar)).as("__gmin__"))
        grossified
          .crossJoin(broadcast(gmin))
          .withColumn(
            "__window__",
            when(col(periodvar) === col("__gmin__"), lit(0)).otherwise(lit(1))
          )
          .drop("__gmin__")
      case "between" =>
        grossified.withColumn(
          "__window__",
          windowIdBetween(row_number().over(wOrder) - 1, sortedTime)
        )
    }

    val wCum = Window
      .partitionBy((toCols(byvars) :+ col("__window__")): _*)
      .orderBy(col(periodvar))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumd = cumvars.foldLeft(withWid) { (d, c) =>
      d.withColumn(s"cum_$c", product(col(c)).over(wCum))
    }

    val degross = if (grossify) {
      cumvars.foldLeft(cumd) { (d, c) =>
        d.withColumn(c, col(c) - 1).withColumn(s"cum_$c", col(s"cum_$c") - 1)
      }
    } else cumd

    val out = degross.drop("__window__")
    if (replace) {
      cumvars.foldLeft(out)((d, c) => d.drop(c).withColumnRenamed(s"cum_$c", c))
    } else out
  }
}
