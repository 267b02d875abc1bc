package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps
import graft.streaming.StreamOps.SessionEvent

/** Structured Streaming extensions: the same operators run on batch
  * frames (deterministic) and on a MemoryStream (exercising the
  * streaming planner, watermarks, and state handling).
  */
class StreamingSpec extends SparkSuite {

  test("windowedAverages tumbling event-time windows (batch parity)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, ts("2024-01-01"), 10.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 20.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), 30.0)
    ).toDF("user_id", "ts", "value")
    val out = StreamOps.windowedAverages(df, "ts", Seq("user_id"), "value", "5 minutes")
    val got = out.orderBy("window_start")
      .select("value_avg", "n_events").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got == Seq((15.0, 2L), (30.0, 1L)))
  }

  test("windowedAverages runs as a real stream with a watermark") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val out = StreamOps.windowedAverages(df, "ts", Seq("user_id"), "value", "5 minutes")
    val q = out.writeStream.format("memory").queryName("wavg_test")
      .outputMode("update").start()
    try {
      input.addData((1L, ts("2024-01-01"), 10.0), (1L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 30.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT value_avg, n_events FROM wavg_test").collect()
      assert(rows.map(r => (r.getDouble(0), r.getLong(1))).toSet == Set((20.0, 2L)))
    } finally q.stop()
  }

  test("batch text operators (PII redaction, quality, token count) compose into streams") {
    // the pipeline operators are pure column expressions, so the SAME
    // code runs over readStream — this pins that no operator silently
    // requires a batch-only feature (e.g. a window without watermark)
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val out = df.select(
      col("doc_id"),
      graft.pipeline.TextAnalysis.piiRedact(col("text")).as("red"),
      graft.pipeline.TextAnalysis.tokenCount(col("text")).as("n_tok"))
    val q = out.writeStream.format("memory").queryName("pii_stream").outputMode("append").start()
    try {
      input.addData((1L, "mail a@b.io now"), (2L, "clean text"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, red, n_tok FROM pii_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(rows == Set((1L, "mail <EMAIL> now", 3), (2L, "clean text", 2)))
    } finally q.stop()
  }

  test("sessionize splits on inactivity gaps (batch parity)") {
    val s = spark; import s.implicits._
    val events = Seq(
      SessionEvent(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      SessionEvent(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 2.0),
      SessionEvent(1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 3.0), // > 1 min gap
      SessionEvent(2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 4.0)
    ).toDS()
    val out = StreamOps.sessionize(events, gapMillis = 60000).collect()
    val byKey = out.groupBy(_.key)
    assert(byKey(1L).length == 2)
    val first = byKey(1L).minBy(_.start.getTime)
    assert(first.nEvents == 2 && first.totalValue == 3.0)
    assert(byKey(2L).head.nEvents == 1)
  }

  test("streamingDedup keeps one row per normalized digest") {
    val s = spark; import s.implicits._
    val df = Seq(
      (ts("2024-01-01"), "The quick brown fox"),
      (ts("2024-01-01"), "the  quick BROWN fox!"), // same normalized digest
      (ts("2024-01-01"), "something else")
    ).toDF("ts", "text")
    val out = StreamOps.streamingDedup(df, "ts", "text")
    assert(out.count() == 2)
  }

  test("filterAgainstBlocklist drops blocklisted keys from a live stream (left_anti, stateless)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // blocklist as the batch pipeline would emit it: contaminated ids
    val block = Seq((2L, "why"), (4L, "why")).toDF("doc_id", "reason")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = StreamOps.filterAgainstBlocklist(stream, block, Seq("doc_id"))
      .writeStream.format("memory").queryName("blocklist_test").outputMode("append").start()
    try {
      input.addData((1L, "keep"), (2L, "drop"), (3L, "keep"), (4L, "drop"))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM blocklist_test").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L))
    } finally q.stop()
  }

  test("lshCandidatePairs batch mode emits exactly the batch pipeline's candidate set") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "The  quick Brown fox jumps over the lazy dog!"),
      (4L, "completely different content about spark engines and shuffles")
    ).toDF("doc_id", "text")
    val streamed = StreamOps.lshCandidatePairs(docs, "doc_id", "text")
      .collect().map(p => (p.id_a, p.id_b)).toSet
    val batch = graft.pipeline.Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    SparkEntry.runPendingCleanups()
  }

  test("lshCandidatePairs pairs a late duplicate against state from an earlier micro-batch") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    // stateTTLMillis = 0: a processing-time timeout keeps triggering
    // clock-check batches forever, which processAllAvailable never
    // drains — TTL off for the test, state still persists across
    // micro-batches
    val q = StreamOps.lshCandidatePairs(stream, "doc_id", "text", stateTTLMillis = 0L)
      .writeStream.format("memory").queryName("lsh_stream").outputMode("append").start()
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog"),
        (4L, "completely different content about spark engines and shuffles"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM lsh_stream").count() == 0) // nothing similar yet
      // the duplicate arrives a micro-batch later -> pairs against state
      input.addData((2L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT id_a, id_b FROM lsh_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)))
    } finally q.stop()
  }

  test("lshCandidatePairs saturates (not drops) an over-cap bucket") {
    val s = spark; import s.implicits._
    val many = (1L to 5L).map(i => (i, "identical text repeated for the bucket cap test"))
      .toDF("doc_id", "text")
    // cap 2: ids 1 and 2 enter each bucket and pair; 3..5 are ignored
    val pairs = StreamOps.lshCandidatePairs(many, "doc_id", "text", maxBucketIds = 2)
      .collect().map(p => (p.id_a, p.id_b)).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("enrichWithDimension broadcast-joins a stream against a static table") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Double)]
    val stream = input.toDF().toDF("user_id", "value")
    val q = StreamOps.enrichWithDimension(stream, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_test").outputMode("append").start()
    try {
      input.addData((1L, 10.0), (3L, 30.0)) // 3 has no dim row -> null tier
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, tier FROM enrich_test").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows == Map(1L -> Some("gold"), 3L -> None))
    } finally q.stop()
  }
}
