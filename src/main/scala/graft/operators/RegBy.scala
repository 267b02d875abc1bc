package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import breeze.linalg.{DenseMatrix, DenseVector, pinv}

/** Per-group OLS: one output row per group with `coef_<x>` columns.
  *
  * Reference: pd_utils/regby.py:14-230. The reference splits to NumPy
  * arrays and runs statsmodels OLS per group (optionally in a process
  * pool). Here BOTH paths are codegen'd moment aggregations — no
  * per-group materialization anywhere, so any group size or skew
  * survives:
  *
  *  - coefficients: the X'X / X'y moment sums are plain codegen'd
  *    `sum(x_i * x_j)` aggregates — partial aggregation map-side, ONE
  *    shuffle moving O(k^2) doubles per group, then a tiny per-group
  *    pseudo-inverse solve on the aggregated row.
  *  - `stderr=true` (HC1): the robust meat matrix Σ e²·x·x' depends
  *    on beta, so it is a SECOND moment aggregation over the rows
  *    with the per-group betas joined back — still O(k^2) state per
  *    group and fully codegen'd, never a per-group observation
  *    buffer. (The reference concatenates group keys into a single
  *    string without a separator, pd_utils/regby.py:186-189, which
  *    silently merges e.g. ("AB","C") with ("A","BC") — grouping by
  *    the real columns here fixes that quirk rather than porting it.)
  *
  * Both use a Breeze pseudo-inverse — statsmodels' `OLS.fit` is also
  * pinv-based, keeping degenerate (rank-deficient / perfect-fit)
  * groups numerically comparable (SURVEY §7.4.7). Groups with fewer
  * than len(xvars)+1(+1 if cons) observations yield all-null
  * coefficients (pd_utils/regby.py:150-172); rows with any missing
  * y/x/group value are dropped first (pd_utils/regby.py:64-75).
  */
object RegBy {

  /** @param stderr include HC1 robust standard errors as `stderr_<x>`. */
  def regBy(
      df: DataFrame,
      yvar: String,
      xvars: Seq[String],
      groupvars: Seq[String],
      cons: Boolean = true,
      stderr: Boolean = false,
      merge: Boolean = false
  ): DataFrame = {
    val dim = xvars.size + (if (cons) 1 else 0)
    val rhsNames = (if (cons) Seq("const") else Nil) ++ xvars.map(x => s"coef_$x")

    val keep = df
      .select((groupvars ++ (yvar +: xvars)).map(c => col(c)): _*)
      .na.drop(groupvars ++ (yvar +: xvars))

    val withBeta = momentsWithBeta(keep, yvar, xvars, groupvars, cons)

    val out =
      if (!stderr) {
        withBeta.select(
          groupvars.map(col) ++
            rhsNames.zipWithIndex.map { case (nm, i) => element_at(col("__beta__"), i + 1).as(nm) }: _*
        )
      } else {
        val upperPairs = for { i <- 0 until dim; j <- i until dim } yield (i, j)
        // second pass: join betas back on the REAL group columns and
        // aggregate the HC1 meat Σ e²·x·x' as codegen'd sums. Null
        // beta (underdetermined group) nulls the residual, so the
        // meat sums and the stderrs come out null for that group.
        val regs = regCols(xvars, cons)
        val y = col(yvar).cast("double")
        val pred = (0 until dim)
          .map(i => element_at(col("__beta__"), i + 1) * regs(i))
          .reduce(_ + _)
        val e2 = (y - pred) * (y - pred)
        val meatAggs = upperPairs.map { case (i, j) =>
          sum(e2 * regs(i) * regs(j)).as(s"__meat_${i}_${j}__")
        }
        val meat = keep
          .join(withBeta.select((groupvars.map(col) :+ col("__beta__")): _*), groupvars)
          .groupBy(groupvars.map(col): _*)
          .agg(meatAggs.head, meatAggs.tail: _*)

        val d = dim
        // meat entries are all-null exactly when the group's beta is
        // null (underdetermined) — boxed Doubles so the null survives
        // deserialization
        val seUdf = udf { (n: Long, xtxFlat: Seq[Double], meatFlat: Seq[java.lang.Double]) =>
          if (meatFlat == null || meatFlat.exists(_ == null)) null.asInstanceOf[Seq[Double]]
          else {
            val xtxInv = pinv(unflatten(xtxFlat, d))
            val cov = xtxInv * unflatten(meatFlat.map(_.doubleValue()), d) * xtxInv * (n.toDouble / (n - d))
            (0 until d).map(j => math.sqrt(cov(j, j)))
          }
        }
        val xtxArr = array(upperPairs.map { case (i, j) => col(s"__xtx_${i}_${j}__") }: _*)
        val meatArr = array(upperPairs.map { case (i, j) => col(s"__meat_${i}_${j}__") }: _*)
        withBeta
          .join(meat, groupvars.toSeq, "left")
          .withColumn("__se__", seUdf(col("__n__"), xtxArr, meatArr))
          .select(
            groupvars.map(col) ++
              rhsNames.zipWithIndex.map { case (nm, i) => element_at(col("__beta__"), i + 1).as(nm) } ++
              rhsNames.zipWithIndex.map { case (nm, i) =>
                element_at(col("__se__"), i + 1).as(s"stderr_${nm.stripPrefix("coef_")}")
              }: _*
          )
      }
    if (merge) df.join(out, groupvars, "left") else out
  }

  /** Regressor column expressions: [1.0 if cons] ++ xvars as double. */
  private def regCols(xvars: Seq[String], cons: Boolean): Seq[Column] =
    (if (cons) Seq(lit(1.0)) else Nil) ++ xvars.map(c => col(c).cast("double"))

  /** Codegen'd X'X / X'y moment aggregation + per-group k x k solve.
    * Output: groupvars ++ __n__ ++ __xtx_i_j__ (upper triangle) ++
    * __beta__ (null when the group is underdetermined).
    */
  private def momentsWithBeta(
      keep: DataFrame,
      yvar: String,
      xvars: Seq[String],
      groupvars: Seq[String],
      cons: Boolean
  ): DataFrame = {
    val minObs = xvars.size + 1 + (if (cons) 1 else 0)
    val dim = xvars.size + (if (cons) 1 else 0)
    val regs = regCols(xvars, cons)
    val y = col(yvar).cast("double")

    val upperPairs = for { i <- 0 until dim; j <- i until dim } yield (i, j)
    val aggs: Seq[Column] =
      count(lit(1)).cast("long").as("__n__") +:
        (upperPairs.map { case (i, j) => sum(regs(i) * regs(j)).as(s"__xtx_${i}_${j}__") } ++
          (0 until dim).map(i => sum(regs(i) * y).as(s"__xty_${i}__")))
    val moments = keep.groupBy(groupvars.map(col): _*).agg(aggs.head, aggs.tail: _*)

    val d = dim
    val mObs = minObs
    val solve = udf { (n: Long, xtxFlat: Seq[Double], xty: Seq[Double]) =>
      if (n < mObs) null.asInstanceOf[Seq[Double]]
      else (pinv(unflatten(xtxFlat, d)) * DenseVector(xty.toArray)).toArray.toSeq
    }

    val xtxArr = array(upperPairs.map { case (i, j) => col(s"__xtx_${i}_${j}__") }: _*)
    val xtyArr = array((0 until dim).map(i => col(s"__xty_${i}__")): _*)
    moments.withColumn("__beta__", solve(col("__n__"), xtxArr, xtyArr))
  }

  /** Upper-triangle flat vector -> symmetric dense matrix. */
  private def unflatten(flat: Seq[Double], d: Int): DenseMatrix[Double] = {
    val m = DenseMatrix.zeros[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        m(i, j) = flat(idx)
        m(j, i) = flat(idx)
        j += 1
        idx += 1
      }
      i += 1
    }
    m
  }
}
