package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet sink — the output half of a 100 TB pipeline.
  * (Reference analog: the parquet side-cache in
  * `pd_utils/optimize/load/__init__.py` is its only writer; a
  * distributed pipeline additionally needs partition layout, file
  * sizing, and idempotent re-runs, which this provides.)
  *
  * Layout rules that survive scale:
  *   - `partitionCols` must be LOW-cardinality (a date, a language, a
  *     source shard) — every distinct value is a filesystem directory
  *     and a catalog entry; partition pruning then turns reads of
  *     `WHERE lang = 'en'` into a directory walk, never a scan.
  *   - `maxRecordsPerFile` caps file size so a hot partition value
  *     still rolls into scan-parallel files instead of one
  *     multi-gigabyte object.
  *   - `filesPerPartition > 1` spreads a hot partition's WRITE across
  *     that many tasks via a content-hash salt — deterministic, no
  *     RNG — so one skewed key cannot serialize the write stage.
  *
  * Idempotency: writes run in dynamic partition-overwrite mode — a
  * re-run (full or of a partition subset) atomically replaces exactly
  * the partitions present in the input and leaves every other
  * partition untouched. Same input + same session config → same
  * directory set, same per-directory file count, same row content
  * per file (task assignment is content-hashed and in-file order is
  * `sortCols`-stabilized), so re-runs are safe to point downstream
  * consumers at.
  *
  * Bucketed (catalog) output for shuffle-free same-key joins lives in
  * [[Bucketing]]; this sink is the path-based side.
  */
object Sink {

  /** Write `df` under `path` partitioned by `partitionCols`.
    *
    * @param sortCols          in-file row order (also what a
    *                          min/max-pruning reader benefits from);
    *                          empty = leave task order
    * @param maxRecordsPerFile roll a task's output file after this
    *                          many rows (0 = single file per task)
    * @param filesPerPartition max write tasks per partition value
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      filesPerPartition: Int = 1
  ): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(filesPerPartition >= 1, s"filesPerPartition must be >= 1, got $filesPerPartition")
    val dataCols = df.columns.filterNot(partitionCols.contains).toSeq
    require(dataCols.nonEmpty, "df must carry at least one non-partition column")
    // one write task per partition value (hash-colocated), or, with a
    // salt, up to filesPerPartition tasks per value; the salt is a
    // content hash so the row→file assignment is deterministic. The
    // task count is pinned explicitly — an AQE-coalesced repartition
    // would fold salted buckets back into one task and make the
    // layout a function of runtime statistics instead of the input
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val placed =
      if (filesPerPartition == 1) df.repartition(n, partitionCols.map(col): _*)
      else df
        .withColumn("__file__", pmod(xxhash64(dataCols.map(col): _*), lit(filesPerPartition)))
        .repartition(n, (partitionCols :+ "__file__").map(col): _*)
        .drop("__file__")
    val ordered =
      if (sortCols.nonEmpty) placed.sortWithinPartitions(sortCols.map(col): _*) else placed
    val w = ordered.write
      .mode(SaveMode.Overwrite)
      // replace only the partitions present in df; everything else on
      // disk survives — per-write override, session config untouched
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
    val capped =
      if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile) else w
    capped.parquet(path)
  }

  /** The written dataset back as a DataFrame (partition columns are
    * reconstructed from the directory layout; partition-value filters
    * on them prune to a directory walk).
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
