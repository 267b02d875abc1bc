package graft

import org.apache.spark.sql.functions._

import graft.syntax._

/** The fluent extension-method surface composes like the reference
  * reads: each call is still a lazy plan.
  */
class SyntaxSpec extends SparkSuite {

  test("fluent chain: winsorize -> portfolio -> averages via df.<op>") {
    val out = fixtureDf
      .winsorize((0.1, 0.1), Seq("RET"), Seq("PERMNO", "byvar"))
      .portfolio("RET", ngroups = 2, byvars = Seq("byvar"))
      .averages(Seq("RET"), Seq("byvar", "portfolio"))
    assert(out.count() == 4)
    assert(out.columns.toSet == Set("byvar", "portfolio", "RET"))
  }

  test("fluent groupbyMerge / varChange / groupbyIndex") {
    val out = fixtureDf
      .groupbyMerge(Seq("PERMNO", "byvar"), "max", Seq("RET"))
      .varChangeByGroups(Seq("RET"), Seq("PERMNO", "byvar"), "Date")
      .groupbyIndex(Seq("PERMNO", "byvar"), Seq("Date"))
    assert(out.columns.contains("RET_max"))
    assert(out.columns.contains("RET_change"))
    assert(out.columns.contains("group_index"))
    assert(out.count() == 12)
  }

  test("fluent pipeline chain: sample -> split -> pii counts -> dedup lines") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "alpha\nshared line"), (2L, "shared line\nbeta"), (3L, "gamma only")
    ).toDF("doc_id", "text")
    val out = docs
      .assignSplit(Seq("doc_id"), Seq("train" -> 0.5, "test" -> 0.5))
      .piiCounts("text")
      .dedupLines("doc_id", "text")
    assert(out.count() == 3)
    assert(out.columns.toSet == Set("doc_id", "text_dedup"))
    val eval = Seq((9L, "gamma only here today")).toDF("doc_id", "text")
    // 13-gram default finds no overlap on these short docs; 2-gram does
    assert(docs.decontaminate(eval, "doc_id", "text", n = 2).count() == 2)
  }

  test("fluent round-5 ops: mixture -> normalize -> c4 clean -> pack -> stats") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "w", "one good line with five words.\nsecond good line is here too.\nthird keeps the doc alive okay."),
      (2L, "x", "one good line with five words.\nsecond good line is here too.\nthird keeps the doc alive okay."),
      (3L, "w", "too short.\nnope")
    ).toDF("doc_id", "src", "text")
    val mixed = docs.mixtureSample("src", Map("x" -> 2.0), Seq("doc_id"), salt = "s")
    assert(mixed.where(col("src") === "x").count() == 2) // weight 2 -> two epochs
    assert(docs.nfcNormalize("text").columns.contains("text_nfc"))
    assert(docs.stripAccents("text").columns.contains("text_ascii"))
    val cleaned = docs.c4Clean("doc_id", "text")
    assert(cleaned.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val packed = docs.withColumn("n", length(col("text")).cast("long"))
      .packSequences("doc_id", "n", capacity = 64L)
    assert(packed.count() == 3 && packed.columns.contains("pack_id"))
    val stats = docs.corpusStats(Seq("src"), "text").collect()
    assert(stats.length == 2)
    val sem = Seq((1L, Array(1.0, 0.0)), (2L, Array(1.0, 0.0)), (3L, Array(0.0, 1.0)))
      .toDF("vec_id", "emb").semDedup("vec_id", "emb", threshold = 0.9, nlist = 1)
    assert(sem.select("vec_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val chunks = docs.chunkDocuments("doc_id", "text", chunkSize = 2, overlap = 1)
    assert(chunks.columns.toSeq == Seq("doc_id", "chunk_id", "chunk", "n_tokens"))
    assert(chunks.count() >= docs.count())
    val gq = docs.gopherQuality("doc_id", "text", minWords = 1)
    assert(gq.columns.contains("keep") && gq.count() == docs.count())
  }

  test("fluent round-10 ops: winnow -> range join -> partitioned write round-trip") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox naps under the warm sun")
    ).toDF("doc_id", "text")
    val fps = docs.winnowFingerprints("doc_id", "text")
    assert(fps.columns.toSeq == Seq("doc_id", "pos", "gram_hash") && fps.count() > 0)
    val pts = Seq((1L, 5L), (2L, 25L)).toDF("pid", "p")
    val ivs = Seq((10L, 0L, 10L)).toDF("iid", "s", "e")
    val joined = pts.pointInInterval(ivs, "p", "s", "e", Nil, 4L)
    assert(joined.select("pid").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val out = java.nio.file.Files.createTempDirectory("graft-syntax-sink")
    docs.withColumn("b", col("doc_id") % 2).writePartitioned(
      out.toString, Seq("b"), sortCols = Seq("doc_id"))
    assert(spark.read.parquet(out.toString).count() == 2)
  }

  test("composing operators triggers no Spark jobs (lazy plans)") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val composed = fixtureDf
      .winsorize((0.1, 0.1), Seq("RET"), Nil) // no-byvars path: scalar aggs stay lazy
      .portfolio("RET", ngroups = 2)          // whole-frame cutoffs stay lazy
      .longShortPortfolio("portfolio", Seq("byvar"), Seq("RET"))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "operator composition must not run Spark jobs")
    assert(composed.count() >= 0) // materializes fine when asked
  }
}
