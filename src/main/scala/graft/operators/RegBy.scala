package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import breeze.linalg.{DenseMatrix, DenseVector, pinv}

/** Per-group OLS: one output row per group with `coef_<x>` columns.
  *
  * Reference: pd_utils/regby.py:14-230. The reference splits to NumPy
  * arrays and runs statsmodels OLS per group (optionally in a process
  * pool). Two Spark-first execution paths:
  *
  *  - coefficients-only (the common case): the X'X / X'y moment sums
  *    are plain codegen'd `sum(x_i * x_j)` aggregates — partial
  *    aggregation map-side, ONE shuffle moving O(k^2) doubles per
  *    group, then a tiny per-group pseudo-inverse solve on the
  *    aggregated row. No per-row object serialization, no per-group
  *    materialization; survives any group size or skew.
  *  - `stderr=true`: HC1 needs the residual meat matrix, which
  *    depends on beta — handled in `groupByKey.mapGroups`, streaming
  *    the moments and buffering observations only for the robust-SE
  *    pass (documented trade-off).
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
    val out =
      if (stderr) regByMapGroups(df, yvar, xvars, groupvars, cons)
      else regByMoments(df, yvar, xvars, groupvars, cons)
    if (merge) df.join(out, groupvars, "left") else out
  }

  /** Codegen'd moment aggregation + per-group k x k solve. */
  private def regByMoments(
      df: DataFrame,
      yvar: String,
      xvars: Seq[String],
      groupvars: Seq[String],
      cons: Boolean
  ): DataFrame = {
    val minObs = xvars.size + 1 + (if (cons) 1 else 0)
    val dim = xvars.size + (if (cons) 1 else 0)
    val rhsNames = (if (cons) Seq("const") else Nil) ++ xvars.map(x => s"coef_$x")

    val keep = df
      .select((groupvars ++ (yvar +: xvars)).map(c => col(c)): _*)
      .na.drop(groupvars ++ (yvar +: xvars))

    val regs: Seq[Column] =
      (if (cons) Seq(lit(1.0)) else Nil) ++ xvars.map(c => col(c).cast("double"))
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
      else {
        val xtx = DenseMatrix.zeros[Double](d, d)
        var idx = 0
        var i = 0
        while (i < d) {
          var j = i
          while (j < d) {
            xtx(i, j) = xtxFlat(idx)
            xtx(j, i) = xtxFlat(idx)
            j += 1
            idx += 1
          }
          i += 1
        }
        (pinv(xtx) * DenseVector(xty.toArray)).toArray.toSeq
      }
    }

    val xtxArr = array(upperPairs.map { case (i, j) => col(s"__xtx_${i}_${j}__") }: _*)
    val xtyArr = array((0 until dim).map(i => col(s"__xty_${i}__")): _*)
    val withBeta = moments.withColumn("__beta__", solve(col("__n__"), xtxArr, xtyArr))
    withBeta.select(
      groupvars.map(col) ++
        rhsNames.zipWithIndex.map { case (nm, i) => element_at(col("__beta__"), i + 1).as(nm) }: _*
    )
  }

  /** Streaming mapGroups path (needed for HC1 robust stderr). */
  private def regByMapGroups(
      df: DataFrame,
      yvar: String,
      xvars: Seq[String],
      groupvars: Seq[String],
      cons: Boolean
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
        rhsNames.map(n => StructField(s"stderr_${n.stripPrefix("coef_")}", DoubleType))
    )

    val nx = xvars.size
    val gCount = groupvars.size
    val consFlag = cons
    val dim = nx + (if (cons) 1 else 0)
    val nOut = outSchema.size

    // multi-col group keys concatenate to a string key, like the
    // reference's __key_regby__ (pd_utils/regby.py:186-189); the
    // original key values ride along in each row and are re-emitted.
    val grouped = keep.groupByKey { row =>
      (0 until gCount).map(i => String.valueOf(row.get(i))).mkString("")
    }(Encoders.STRING)

    val result = grouped.mapGroups { (_, it) =>
      var n = 0
      val xtx = Array.ofDim[Double](dim, dim)
      val xty = new Array[Double](dim)
      val xrow = new Array[Double](dim)
      var keyVals: Seq[Any] = null
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Array[Double])]
      while (it.hasNext) {
        val row = it.next()
        if (keyVals == null) keyVals = (0 until gCount).map(row.get)
        val yv = toDouble(row.get(gCount))
        if (consFlag) xrow(0) = 1.0
        var j = 0
        while (j < nx) { xrow(j + (if (consFlag) 1 else 0)) = toDouble(row.get(gCount + 1 + j)); j += 1 }
        var a = 0
        while (a < dim) {
          var b = 0
          while (b < dim) { xtx(a)(b) += xrow(a) * xrow(b); b += 1 }
          xty(a) += xrow(a) * yv
          a += 1
        }
        buf += ((yv, xrow.clone()))
        n += 1
      }
      if (n < minObs) {
        Row.fromSeq(keyVals ++ Seq.fill(nOut - gCount)(null))
      } else {
        val xtxM = DenseMatrix.tabulate(dim, dim)((a, b) => xtx(a)(b))
        val xtxInv = pinv(xtxM)
        val beta = xtxInv * DenseVector(xty)
        val coefs = beta.toArray.toSeq
        // HC1: (X'X)^-1 (Σ e² x x') (X'X)^-1 · n/(n-k)
        val meat = DenseMatrix.zeros[Double](dim, dim)
        buf.foreach { case (yv, xs) =>
          var p = 0.0
          var a = 0
          while (a < dim) { p += xs(a) * beta(a); a += 1 }
          val e2 = (yv - p) * (yv - p)
          a = 0
          while (a < dim) {
            var b = 0
            while (b < dim) { meat(a, b) += e2 * xs(a) * xs(b); b += 1 }
            a += 1
          }
        }
        val cov = xtxInv * meat * xtxInv * (n.toDouble / (n - dim))
        val ses = (0 until dim).map(j => math.sqrt(cov(j, j)): Any)
        Row.fromSeq(keyVals ++ coefs ++ ses)
      }
    }(Encoders.row(outSchema))

    result.toDF()
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
