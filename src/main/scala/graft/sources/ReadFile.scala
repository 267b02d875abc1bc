package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extension-dispatch loader + cache-aware ingestion.
  *
  * Reference: pd_utils/optimize/load/__init__.py:6-22 (read_file — csv
  * only) and pd_utils/load.py:7-42 (load_sas with an mtime-checked CSV
  * side-cache). SAS itself needs an external connector; the public
  * surface here is the dispatch + the mtime-checked Parquet cache,
  * which is the part that transfers: any slow source gets a columnar
  * cache next to it that is reused while fresher than the source.
  */
object ReadFile {

  def readFile(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet")) spark.read.parquet(path)
    else if (lower.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else if (lower.endsWith(".json")) spark.read.json(path)
    else if (lower.endsWith(".orc")) spark.read.orc(path)
    else throw new IllegalArgumentException(s"unsupported extension: $path")
  }

  /** Reads `path` through a Parquet cache at `cachePath`: reuses the
    * cache while its mtime is newer than the source (the reference's
    * CSV-cache contract, pd_utils/load.py:12-33), else re-ingests and
    * rewrites it.
    */
  def readCached(spark: SparkSession, path: String, cachePath: String): DataFrame = {
    val src = Paths.get(path)
    val cache = Paths.get(cachePath)
    val cacheFresh = Files.exists(cache) && {
      val cm = Files.getLastModifiedTime(cache).toMillis
      val sm = Files.getLastModifiedTime(src).toMillis
      cm >= sm
    }
    if (cacheFresh) spark.read.parquet(cachePath)
    else {
      val df = readFile(spark, path)
      df.write.mode("overwrite").parquet(cachePath)
      spark.read.parquet(cachePath)
    }
  }
}
