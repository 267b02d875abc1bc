package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-location tool for repeated big
  * joins and aggregations on the same key at 100 TB.
  *
  * A fact table written with `bucketBy(n, key)` is pre-partitioned on
  * disk: every subsequent equi-join or groupBy on that key between
  * tables with the SAME bucket count reads co-located buckets and
  * plans NO Exchange on either side (pinned in BucketingSpec). For a
  * table joined daily against others on the same key, this converts
  * a per-query shuffle of the full table into a one-time write cost.
  *
  * `sortBy` additionally pre-sorts within buckets, letting sort-merge
  * joins skip the per-task sort.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally bucket-sorted) table.
    * Parquet under the session warehouse; `numBuckets` must match
    * across tables that should co-locate.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
