package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{IvfIndex, Similarity}

/** Persisted IVF index vs the in-memory operator: same math, but the
  * serving scan must read ONLY the probed cell partitions.
  */
class IvfIndexSpec extends SparkSuite {

  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  private def tempPath(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ivf-$name").toString + "/idx"

  private def resultSet(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("stored search is identical to the in-memory ivfTopK") {
    val path = tempPath("parity")
    IvfIndex.build(emb, "vec_id", "emb", path, nlist = 16)
    val q = emb.where(col("vec_id") % 50 === 0)
    val stored = IvfIndex.searchTopK(spark, path, q, "vec_id", "emb", k = 5, nprobe = 4)
    val mem = Similarity.ivfTopK(emb, q, "vec_id", "emb", k = 5, nlist = 16, nprobe = 4)
    assert(resultSet(stored) == resultSet(mem))
  }

  test("the serving scan partition-prunes to the probed cells") {
    val path = tempPath("prune")
    IvfIndex.build(emb, "vec_id", "emb", path, nlist = 16)
    // a single query with nprobe=2 probes exactly 2 of 16 cells
    val q = emb.orderBy("vec_id").limit(1)
    val out = IvfIndex.searchTopK(spark, path, q, "vec_id", "emb", k = 3, nprobe = 2)
    out.queryExecution.toRdd.count()
    // descend through AQE wrappers — executedPlan.collect stops at
    // the adaptive boundary
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(out.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("graft-ivf-prune")))
    assert(scans.nonEmpty, "no file scan over the index found")
    val cellScan = scans.find(_.metadata.get("PartitionFilters").exists(_.contains("cent_id")))
    assert(cellScan.isDefined,
      s"index scan carries no cent_id PartitionFilters: ${scans.map(_.metadata.get("PartitionFilters"))}")
    assert(cellScan.get.selectedPartitions.partitionCount == 2,
      s"expected 2 probed cell partitions, scanned ${cellScan.get.selectedPartitions.partitionCount}")
  }

  test("appendBatch upserts under frozen centroids; re-append is idempotent") {
    val path = tempPath("append")
    val a = emb.where(col("vec_id") % 2 === 0)
    val b = emb.where(col("vec_id") % 2 =!= 0)
    IvfIndex.build(a, "vec_id", "emb", path, nlist = 8)
    IvfIndex.appendBatch(spark, path, b, "vec_id", "emb")
    val ids = spark.read.parquet(path).select("vec_id")
      .collect().map(_.getLong(0)).sorted
    val all = emb.where(Similarity.dot(col("emb"), col("emb")) > 0)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(all), "every (non-zero) id exactly once after append")
    val before = spark.read.parquet(path).collect().map(_.toString).sorted
    IvfIndex.appendBatch(spark, path, b, "vec_id", "emb")
    val after = spark.read.parquet(path).collect().map(_.toString).sorted
    assert(before.sameElements(after), "re-appending the same batch must rewrite in place")
    // appended vectors actually serve: a query must see odd-id neighbors
    val q = emb.where(col("vec_id") % 50 === 0).limit(5)
    val res = IvfIndex.searchTopK(spark, path, q, "vec_id", "emb", k = 5, nprobe = 8)
    assert(res.where(col("neighbor_id") % 2 =!= 0).count() > 0)
  }
}
