package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import breeze.linalg.{DenseMatrix, DenseVector, pinv}

import graft.internal._

/** Per-group OLS: one output row per group with `coef_<x>` columns.
  *
  * Reference: pd_utils/regby.py:14-230. The reference splits to NumPy
  * arrays and runs statsmodels OLS per group (optionally in a process
  * pool); here each group is reduced inside `groupByKey.mapGroups`
  * with a Breeze pseudo-inverse solve — statsmodels' `OLS.fit` also
  * uses a pinv-based solver, which keeps degenerate (rank-deficient /
  * perfect-fit) groups numerically comparable (SURVEY §7.4.7).
  *
  * Groups with fewer than k(+1) observations yield all-null
  * coefficients (pd_utils/regby.py:150-172); rows with any missing
  * y/x/group value are dropped first (pd_utils/regby.py:64-75).
  *
  * Scale: state per group is the raw observation list — fine for
  * typical panel-group sizes. For huge groups, a moment-matrix
  * (X'X, X'y) TypedImperativeAggregate is the planned v2; mapGroups
  * keeps statsmodels parity for now.
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
    val spark = df.sparkSession
    val k = xvars.size + (if (cons) 1 else 0)
    val minObs = xvars.size + 1 + (if (cons) 1 else 0)

    val keep = df
      .select((groupvars ++ (yvar +: xvars)).map(col): _*)
      .na.drop(groupvars ++ (yvar +: xvars))

    val keyType = StructType(groupvars.map(g => df.schema(g)))
    val rhsNames =
      (if (cons) Seq("const") else Nil) ++ xvars.map(x => s"coef_$x")
    val outNames =
      groupvars ++ rhsNames ++ (if (stderr) rhsNames.map(n => s"stderr_${n.stripPrefix("coef_")}") else Nil)
    val outSchema = StructType(
      groupvars.map(g => df.schema(g)) ++
        rhsNames.map(n => StructField(n, DoubleType)) ++
        (if (stderr) rhsNames.map(n => StructField(s"stderr_${n.stripPrefix("coef_")}", DoubleType)) else Nil)
    )

    val nx = xvars.size
    val gCount = groupvars.size
    val consFlag = cons
    val seFlag = stderr

    val rdd = keep.rdd
      .map { row =>
        val key = Row.fromSeq((0 until gCount).map(row.get))
        val y = toDouble(row.get(gCount))
        val xs = Array.tabulate(nx)(i => toDouble(row.get(gCount + 1 + i)))
        (key, (y, xs))
      }
      .groupByKey()
      .map { case (key, obs) =>
        val arr = obs.toArray
        val n = arr.length
        if (n < minObs) {
          Row.fromSeq(key.toSeq ++ Seq.fill(outSchema.size - gCount)(null))
        } else {
          val dim = nx + (if (consFlag) 1 else 0)
          val X = DenseMatrix.zeros[Double](n, dim)
          val yv = DenseVector.zeros[Double](n)
          var i = 0
          while (i < n) {
            val (y, xs) = arr(i)
            yv(i) = y
            var j = 0
            if (consFlag) X(i, 0) = 1.0
            while (j < nx) { X(i, j + (if (consFlag) 1 else 0)) = xs(j); j += 1 }
            i += 1
          }
          val xtx = X.t * X
          val xtxInv = pinv(xtx)
          val beta = xtxInv * (X.t * yv)
          val coefs = beta.toArray.toSeq
          val ses: Seq[Any] = if (seFlag) {
            val resid = yv - X * beta
            // HC1: (X'X)^-1 X' diag(e^2) X (X'X)^-1 * n/(n-k)
            val e2 = resid.map(e => e * e)
            val xw = DenseMatrix.tabulate(n, dim)((i, j) => X(i, j) * e2(i))
            val meat = X.t * xw
            val cov = xtxInv * meat * xtxInv * (n.toDouble / (n - dim))
            (0 until dim).map(j => math.sqrt(cov(j, j)): Any)
          } else Nil
          Row.fromSeq(key.toSeq ++ coefs ++ ses)
        }
      }

    val result = spark.createDataFrame(rdd, outSchema)
    if (merge) df.join(result, groupvars, "left") else result
  }

  private def toDouble(a: Any): Double = a match {
    case d: Double => d
    case f: Float  => f.toDouble
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case s: Short  => s.toDouble
    case b: Byte   => b.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case other     => throw new IllegalArgumentException(s"non-numeric value $other")
  }
}
