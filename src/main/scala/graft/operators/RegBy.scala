package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import breeze.linalg.{DenseMatrix, DenseVector, pinv}

/** Per-group OLS: one output row per group with `coef_<x>` columns.
  *
  * Reference: pd_utils/regby.py:14-230. The reference splits to NumPy
  * arrays and runs statsmodels OLS per group (optionally in a process
  * pool); here each group streams through `groupByKey.mapGroups`
  * accumulating the X'X / X'y moment matrices in O(k^2) state — no
  * per-group materialization, so a skewed group cannot OOM an
  * executor (the round-2 RDD `groupByKey` anti-pattern is gone). The
  * tiny k×k solve uses a Breeze pseudo-inverse — statsmodels'
  * `OLS.fit` is also pinv-based, keeping degenerate (rank-deficient /
  * perfect-fit) groups numerically comparable (SURVEY §7.4.7).
  *
  * Groups with fewer than len(xvars)+1(+1 if cons) observations yield
  * all-null coefficients (pd_utils/regby.py:150-172); rows with any
  * missing y/x/group value are dropped first (pd_utils/regby.py:64-75).
  *
  * HC1 robust stderr needs the residuals' meat matrix Σ e²·x·x',
  * which depends on β — a second streaming pass is impossible inside
  * one mapGroups, so with `stderr=true` observations are buffered
  * per group (documented trade-off; coefficients-only streams).
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
    val minObs = xvars.size + 1 + (if (cons) 1 else 0)

    val keep = df
      .select((groupvars ++ (yvar +: xvars)).map(c => col(c)): _*)
      .na.drop(groupvars ++ (yvar +: xvars))

    val rhsNames =
      (if (cons) Seq("const") else Nil) ++ xvars.map(x => s"coef_$x")
    val outSchema = StructType(
      groupvars.map(g => df.schema(g)) ++
        rhsNames.map(n => StructField(n, DoubleType)) ++
        (if (stderr) rhsNames.map(n => StructField(s"stderr_${n.stripPrefix("coef_")}", DoubleType)) else Nil)
    )

    val nx = xvars.size
    val gCount = groupvars.size
    val consFlag = cons
    val seFlag = stderr
    val dim = nx + (if (cons) 1 else 0)
    val nOut = outSchema.size

    // multi-col group keys concatenate to a string key, like the
    // reference's __key_regby__ (pd_utils/regby.py:186-189); the
    // original key values ride along in each row and are re-emitted.
    val grouped = keep.groupByKey { row =>
      (0 until gCount).map(i => String.valueOf(row.get(i))).mkString("\u0001")
    }(Encoders.STRING)

    val result = grouped.mapGroups { (_, it) =>
      var n = 0
      val xtx = Array.ofDim[Double](dim, dim)
      val xty = new Array[Double](dim)
      val xrow = new Array[Double](dim)
      var keyVals: Seq[Any] = null
      val buf = if (seFlag) scala.collection.mutable.ArrayBuffer.empty[(Double, Array[Double])] else null
      while (it.hasNext) {
        val row = it.next()
        if (keyVals == null) keyVals = (0 until gCount).map(row.get)
        val y = toDouble(row.get(gCount))
        if (consFlag) xrow(0) = 1.0
        var j = 0
        while (j < nx) { xrow(j + (if (consFlag) 1 else 0)) = toDouble(row.get(gCount + 1 + j)); j += 1 }
        var a = 0
        while (a < dim) {
          var b = 0
          while (b < dim) { xtx(a)(b) += xrow(a) * xrow(b); b += 1 }
          xty(a) += xrow(a) * y
          a += 1
        }
        if (seFlag) buf += ((y, xrow.clone()))
        n += 1
      }
      if (n < minObs) {
        Row.fromSeq(keyVals ++ Seq.fill(nOut - gCount)(null))
      } else {
        val xtxM = DenseMatrix.tabulate(dim, dim)((a, b) => xtx(a)(b))
        val xtxInv = pinv(xtxM)
        val beta = xtxInv * DenseVector(xty)
        val coefs = beta.toArray.toSeq
        val ses: Seq[Any] = if (seFlag) {
          // HC1: (X'X)^-1 (Σ e² x x') (X'X)^-1 · n/(n-k)
          val meat = DenseMatrix.zeros[Double](dim, dim)
          buf.foreach { case (y, xs) =>
            var p = 0.0
            var a = 0
            while (a < dim) { p += xs(a) * beta(a); a += 1 }
            val e2 = (y - p) * (y - p)
            a = 0
            while (a < dim) {
              var b = 0
              while (b < dim) { meat(a, b) += e2 * xs(a) * xs(b); b += 1 }
              a += 1
            }
          }
          val cov = xtxInv * meat * xtxInv * (n.toDouble / (n - dim))
          (0 until dim).map(j => math.sqrt(cov(j, j)): Any)
        } else Nil
        Row.fromSeq(keyVals ++ coefs ++ ses)
      }
    }(Encoders.row(outSchema))

    val out = result.toDF()
    if (merge) df.join(out, groupvars, "left") else out
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
