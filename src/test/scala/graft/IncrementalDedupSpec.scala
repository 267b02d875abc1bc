package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, IncrementalDedup}

/** Incremental dedup vs the persisted fingerprint store: the
  * decomposition contracts that make batch processing equal one-shot
  * processing (the q_dedup_incremental oracle pins full parity; these
  * pin the production `newPairsOnly` mode and store maintenance).
  */
class IncrementalDedupSpec extends SparkSuite {

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def pairsSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("id_a", "id_b", "n_band_matches").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private lazy val oneShot: Set[(Long, Long, Long)] = {
    val (out, cleanup) = Dedup.minhashCandidatesWithCleanup(docs, "doc_id", "text")
    val s = pairsSet(out); cleanup(); s
  }

  private def tempStore(name: String): String = {
    val path = java.nio.file.Files.createTempDirectory(s"graft-incr-$name").toString
    path
  }

  test("full mode reproduces the one-shot candidates through the store round-trip") {
    val store = tempStore("full")
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 =!= 0)
    IncrementalDedup.writeBatchFingerprints(a, "doc_id", "text", store, "a")
    val (out, cleanup) = IncrementalDedup.candidatesWithStoreCleanup(
      IncrementalDedup.readStore(spark, store, "doc_id"), b, "doc_id", "text",
      newPairsOnly = false)
    val got = pairsSet(out); cleanup()
    assert(got == oneShot, s"store+batch != one-shot: ${(got diff oneShot).take(3)} extra, ${(oneShot diff got).take(3)} missing")
  }

  test("newPairsOnly = one-shot minus the store-internal pairs, exactly") {
    val store = tempStore("newonly")
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 =!= 0)
    IncrementalDedup.writeBatchFingerprints(a, "doc_id", "text", store, "a")
    val (out, cleanup) = IncrementalDedup.candidatesWithStoreCleanup(
      IncrementalDedup.readStore(spark, store, "doc_id"), b, "doc_id", "text",
      newPairsOnly = true)
    val got = pairsSet(out); cleanup()
    // A-internal pairs (both ids even) were batch A's output; every
    // pair touching batch B must appear, with identical band counts
    val expected = oneShot.filterNot { case (ia, ib, _) => ia % 2 == 0 && ib % 2 == 0 }
    assert(got == expected,
      s"newPairsOnly drift: ${(got diff expected).take(3)} extra, ${(expected diff got).take(3)} missing")
    assert(expected.nonEmpty, "corpus must actually produce cross/new pairs for this pin to bite")
  }

  test("store >> batch: no forced broadcast of the surviving keys; pairs unchanged") {
    val store = tempStore("bigstore")
    // store side: 9/10 of the corpus; batch: the remaining tenth
    val a = docs.where(col("doc_id") % 10 =!= 0)
    val b = docs.where(col("doc_id") % 10 === 0)
    IncrementalDedup.writeBatchFingerprints(a, "doc_id", "text", store, "a")
    val expected = oneShot.filterNot { case (ia, ib, _) => ia % 10 != 0 && ib % 10 != 0 }
    // with the broadcast budget squeezed to nothing, the survivors
    // semi join must degrade to a SHUFFLED join — the old plan's
    // explicit broadcast() hint forced a driver-side collect of the
    // surviving store keys no matter how large the store grew
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val (out, cleanup) = IncrementalDedup.candidatesWithStoreCleanup(
        IncrementalDedup.readStore(spark, store, "doc_id"), b, "doc_id", "text",
        newPairsOnly = true)
      val got = pairsSet(out)
      val plan = out.queryExecution.executedPlan.toString
      cleanup()
      // the bloom WORDS broadcast stays (bounded at mBits/64 longs);
      // what must not broadcast is the surviving-key semi join
      val semiLines = plan.linesIterator.filter(_.contains("LeftSemi")).toSeq
      assert(semiLines.nonEmpty, s"no semi join found in:\n$plan")
      assert(semiLines.forall(l => !l.contains("Broadcast")),
        s"survivor pruning still forces a broadcast under a zero budget:\n${semiLines.mkString("\n")}")
      assert(got == expected,
        s"shuffled-semi pruning drift: ${(got diff expected).take(3)} extra, ${(expected diff got).take(3)} missing")
    } finally spark.conf.set(thresholdKey, saved)
  }

  test("three-batch chaining via processBatch converges to the same pair universe") {
    val store = tempStore("chain")
    val parts = (0 until 3).map(i => docs.where(col("doc_id") % 3 === i))
    var all = Set.empty[(Long, Long, Long)]
    parts.zipWithIndex.foreach { case (batch, i) =>
      val (out, cleanup) = IncrementalDedup.processBatch(
        spark, batch, "doc_id", "text", store, batchLabel = s"b$i")
      all ++= pairsSet(out); cleanup()
    }
    assert(all == oneShot,
      s"chained batches != one-shot: ${(all diff oneShot).take(3)} extra, ${(oneShot diff all).take(3)} missing")
  }

  test("re-writing a batch label is idempotent: store content unchanged") {
    val store = tempStore("idem")
    val a = docs.where(col("doc_id") % 2 === 0)
    IncrementalDedup.writeBatchFingerprints(a, "doc_id", "text", store, "a")
    val first = IncrementalDedup.readStore(spark, store, "doc_id")
      .collect().map(_.toString).sorted
    IncrementalDedup.writeBatchFingerprints(a, "doc_id", "text", store, "a")
    val second = IncrementalDedup.readStore(spark, store, "doc_id")
      .collect().map(_.toString).sorted
    assert(first.sameElements(second), "batch re-run must replace, not duplicate, its fingerprints")
  }

  test("incrementalDedupStream: micro-batches converge to the one-shot pair universe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val store = tempStore("stream")
    val pairsDir = tempStore("stream-pairs")
    val ckpt = tempStore("stream-ckpt")
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.incrementalDedupStream(
      input.toDF().toDF("doc_id", "text"), store, pairsDir, ckpt, "doc_id", "text")
    try {
      input.addData(rows.filter(_._1 % 2 == 0).toSeq: _*); q.processAllAvailable()
      input.addData(rows.filter(_._1 % 2 != 0).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val emitted = pairsSet(spark.read.parquet(pairsDir))
    assert(emitted == oneShot,
      s"streamed batches != one-shot: ${(emitted diff oneShot).take(3)} extra, ${(oneShot diff emitted).take(3)} missing")
    // the store now carries both micro-batches' fingerprint partitions
    val batches = spark.read.parquet(store).select("batch").distinct()
      .collect().map(_.getString(0)).sorted
    assert(batches.sameElements(Array("b000000", "b000001")), batches.mkString(","))
  }
}
