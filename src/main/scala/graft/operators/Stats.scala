package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** Correlation matrix operators (pd_utils/corr.py:7-27).
  *
  * `corrPairs` is the engine-side tidy form (one row per column pair,
  * single aggregation pass — k*(k+1)/2 `corr` aggregates, one
  * reduce); `formattedCorrDf` reproduces the reference's
  * lower-triangular 2-decimal string presentation on the collected
  * k×k matrix (driver-side, k is small).
  */
object Stats {

  /** Pearson correlation as covar/(sd*sd) with a zero-variance guard:
    * Spark 4's ANSI mode makes the builtin `corr` THROW
    * DIVIDE_BY_ZERO on a constant column, where pandas (and DuckDB)
    * return NaN/NULL. The guard keeps the division conditional.
    */
  private def safeCorr(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val cov = covar_samp(a, b)
    val sa = stddev_samp(a)
    val sb = stddev_samp(b)
    when(sa.isNull || sb.isNull || sa === 0 || sb === 0, lit(null))
      .otherwise(cov / (sa * sb))
  }

  /** Tidy pairwise Pearson correlations including the diagonal.
    *
    * Fully lazy: one aggregation pass (k*(k+1)/2 corr aggregates,
    * map-side partial) followed by an in-plan stack-unpivot to
    * (col1, col2, corr) rows — no driver action at composition time,
    * so it composes into larger pipelines like any other operator.
    */
  def corrPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices
      j <- cols.indices
      if j >= i
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) => safeCorr(col(a), col(b)).as(s"${a}__${b}") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // explode the single aggregated row into one (col1, col2, corr)
    // row per pair — corr stays NULL for degenerate inputs
    wide.select(
      explode(
        array(pairs.map { case (a, b) =>
          struct(lit(a).as("col1"), lit(b).as("col2"), col(s"${a}__${b}").as("corr"))
        }: _*)
      ).as("p")
    ).select(col("p.col1"), col("p.col2"), col("p.corr"))
  }

  /** Lower-triangular formatted correlation matrix as strings
    * (reference presentation: 2 decimals, upper triangle blanked).
    */
  def formattedCorrDf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val tidy = corrPairs(df, cols)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val rows = cols.zipWithIndex.map { case (rc, i) =>
      val vals = cols.zipWithIndex.map { case (cc, j) =>
        if (j > i) ""
        else tidy.getOrElse((cc, rc), tidy((rc, cc))).map(v => f"$v%.2f").getOrElse("")
      }
      Row.fromSeq(rc +: vals)
    }
    val schema = StructType(
      StructField("column", StringType) +: cols.map(c => StructField(c, StringType))
    )
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
