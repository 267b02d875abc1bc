package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.Sink

/** The partitioned sink: the properties a 100 TB pipeline's output
  * layout lives or dies by — lossless round-trip, deterministic
  * layout across re-runs, file-size control, and partition-scoped
  * overwrite for idempotent incremental runs.
  */
class SinkSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def tmp(): Path = Files.createTempDirectory("graft-sink-spec")

  /** (partition dir → parquet file count), recursively. */
  private def layout(root: Path): Map[String, Int] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
      .groupBy(p => root.relativize(p.getParent).toString)
      .view.mapValues(_.size).toMap

  test("round-trip is lossless: every row and column survives the write/read cycle") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val out = tmp()
    Sink.writePartitioned(d, out.toString, Seq("lang"), sortCols = Seq("doc_id"))
    val back = Sink.readPartitioned(spark, out.toString)
      .select(d.columns.map(col).toSeq: _*)
    assert(back.exceptAll(d).isEmpty && d.exceptAll(back).isEmpty,
      "re-read dataset differs from the source")
  }

  test("re-running the same write reproduces the same layout and content (idempotency)") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val out = tmp()
    def run(): Unit = Sink.writePartitioned(
      d, out.toString, Seq("lang"), sortCols = Seq("doc_id"),
      maxRecordsPerFile = 50L, filesPerPartition = 2)
    run()
    val l1 = layout(out)
    val c1 = Sink.readPartitioned(spark, out.toString).count()
    run()
    assert(layout(out) == l1, "re-run changed the partition-dir/file-count layout")
    assert(Sink.readPartitioned(spark, out.toString).count() == c1,
      "re-run changed the row count")
  }

  test("maxRecordsPerFile rolls a hot partition into multiple scan-parallel files") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val out = tmp()
    Sink.writePartitioned(d, out.toString, Seq("lang"),
      sortCols = Seq("doc_id"), maxRecordsPerFile = 50L)
    val counts = Sink.readPartitioned(spark, out.toString)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val files = layout(out)
    counts.foreach { case (lang, n) =>
      val got = files(s"lang=$lang")
      val want = math.ceil(n / 50.0).toInt
      assert(got >= want, s"lang=$lang holds $n rows but only $got files (cap 50)")
    }
  }

  test("filesPerPartition salts a hot partition's write across tasks, deterministically") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val out = tmp()
    Sink.writePartitioned(d, out.toString, Seq("lang"),
      sortCols = Seq("doc_id"), filesPerPartition = 2)
    // the salt may collide both hash buckets into one task, but the
    // biggest partition (en, ~193 rows) splits in practice
    assert(layout(out).values.max >= 2, s"no partition split across tasks: ${layout(out)}")
    // and the salt is content-derived: a second write lands identically
    val l1 = layout(out)
    Sink.writePartitioned(d, out.toString, Seq("lang"),
      sortCols = Seq("doc_id"), filesPerPartition = 2)
    assert(layout(out) == l1, "content-hash salting is not deterministic across runs")
  }

  test("dynamic overwrite replaces only the partitions present in the input") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val out = tmp()
    Sink.writePartitioned(d, out.toString, Seq("lang"), sortCols = Seq("doc_id"))
    val before = Sink.readPartitioned(spark, out.toString).count()
    // re-run ONLY the 'en' slice, with doctored content
    val enOnly = d.where(col("lang") === "en").withColumn("n_chars", lit(-1L))
    Sink.writePartitioned(enOnly, out.toString, Seq("lang"), sortCols = Seq("doc_id"))
    val back = Sink.readPartitioned(spark, out.toString)
    assert(back.count() == before, "partition-scoped rewrite changed total row count")
    assert(back.where(col("lang") === "en").agg(max("n_chars")).head.getLong(0) == -1L,
      "the rewritten partition does not carry the new content")
    assert(back.where(col("lang") =!= "en").agg(min("n_chars")).head.getLong(0) >= 0L,
      "an untouched partition was clobbered by the partial re-run")
  }

  test("compaction rewrites only overfull partitions down to the target, content intact") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val out = tmp()
    // fragment: salt each lang partition across 4 files
    Sink.writePartitioned(d, out.toString, Seq("lang"),
      sortCols = Seq("doc_id"), filesPerPartition = 4)
    val before = layout(out)
    assert(before.values.exists(_ > 1), "fixture must start fragmented")
    val content = Sink.readPartitioned(spark, out.toString)
      .select(d.columns.map(col).toSeq: _*)
    val beforeHash = content.orderBy(col("doc_id")).collect().map(_.toString).mkString("\n")

    val compacted = Sink.compactPartitions(
      spark, out.toString, Seq("lang"), sortCols = Seq("doc_id"), targetFiles = 1)
    assert(compacted.nonEmpty, "fragmented partitions must be reported as compacted")
    val after = layout(out)
    assert(after.values.forall(_ <= 1), s"file counts above target after compaction: $after")
    val afterHash = Sink.readPartitioned(spark, out.toString)
      .select(d.columns.map(col).toSeq: _*)
      .orderBy(col("doc_id")).collect().map(_.toString).mkString("\n")
    assert(afterHash == beforeHash, "compaction must not change dataset content")
    // already-compact layout: second pass is a no-op
    assert(Sink.compactPartitions(spark, out.toString, Seq("lang"),
      sortCols = Seq("doc_id"), targetFiles = 1).isEmpty,
      "compaction of a compact layout must be a no-op")
    // no staging residue
    assert(layout(out).keySet.forall(k => !k.contains(".compact-")),
      "staging directory must be cleaned up")
  }

  test("compaction leaves partitions at-or-under the target byte-for-byte untouched") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val out = tmp()
    Sink.writePartitioned(d, out.toString, Seq("lang"), sortCols = Seq("doc_id"))
    // fragment ONE partition by re-writing just its rows salted
    val hot = d.where(col("lang") === "en")
    Sink.writePartitioned(hot, out.toString, Seq("lang"),
      sortCols = Seq("doc_id"), filesPerPartition = 4)
    import java.nio.file.Files
    val untouched = Files.walk(out).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && !p.toString.contains("lang=en"))
      .map(p => p.toString -> Files.getLastModifiedTime(p))
      .toMap
    val compacted = Sink.compactPartitions(
      spark, out.toString, Seq("lang"), sortCols = Seq("doc_id"), targetFiles = 1)
    assert(compacted == Seq("lang=en"), s"only the fragmented partition may be rewritten: $compacted")
    untouched.foreach { case (p, mtime) =>
      assert(Files.getLastModifiedTime(java.nio.file.Paths.get(p)) == mtime,
        s"compaction touched a compact partition's file: $p")
    }
  }

  test("partition-value filters prune the re-read to the matching directories") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val out = tmp()
    Sink.writePartitioned(d, out.toString, Seq("lang"), sortCols = Seq("doc_id"))
    val plan = Sink.readPartitioned(spark, out.toString)
      .where(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("lang"),
      s"lang filter not applied as a partition filter:\n$plan")
    // partition pruning happens at the file index: the scan's data
    // filters must NOT contain the partition predicate
    assert(!plan.contains("PushedFilters: [IsNotNull(lang)"),
      s"partition predicate degraded to a data filter:\n$plan")
  }
}
