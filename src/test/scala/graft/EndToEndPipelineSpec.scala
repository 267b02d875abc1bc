package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Contamination, Dedup, Sampling, TextAnalysis}

/** The whole training-data pipeline composed the way a user would
  * run it over a real corpus slice: clean -> line dedup -> exact
  * dedup -> near-dup removal -> decontaminate -> mixture -> split ->
  * pack. Pins that the operators actually compose (no column-name
  * clashes, no cache leaks, monotone row accounting) — the
  * end-to-end property no single-operator spec covers.
  */
class EndToEndPipelineSpec extends SparkSuite {

  test("full corpus pipeline composes: clean -> dedup -> decontaminate -> mixture -> split -> pack") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n0 = docs.count()

    // 1. C4-style cleaning over a derived lined corpus (the raw docs
    //    are single-line without terminal punctuation)
    val ws = col("__ws__")
    val lines = transform(sequence(lit(0), ceil(size(ws) / lit(5.0)).cast("int") - 1), i =>
      concat(array_join(slice(ws, i * 5 + 1, lit(5)), " "),
        when(i % 2 === 0, lit(".")).otherwise(lit(""))))
    val lined = docs
      .select(col("doc_id"), col("source"), Dedup.splitWords(col("text")).as("__ws__"))
      .select(col("doc_id"), col("source"), array_join(lines, "\n").as("text"))
    val cleaned = TextAnalysis.c4Clean(lined, "doc_id", "text", minWordsPerLine = 5, minKeptLines = 2)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("text_clean").as("text"))
    val n1 = cleaned.count()
    assert(n1 > 0 && n1 <= n0, s"cleaning must shrink or hold: $n0 -> $n1")

    // 2. corpus-wide line dedup, then exact-dup removal
    val lineDeduped = Dedup.dedupLines(cleaned, "doc_id", "text")
      .join(cleaned.select("doc_id", "source"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("text_dedup").as("text"))
      .where(length(col("text")) > 0)
    val exactDeduped = Dedup.dedupExact(lineDeduped, "doc_id", "text")
    val n2 = exactDeduped.count()
    assert(n2 > 0 && n2 <= n1)

    // 3. near-dup removal (LSH -> jaccard -> CC -> keep min id)
    val kept = Dedup.nearDupRepresentatives(exactDeduped, "doc_id", "text", jaccardThreshold = 0.5)
    val n3 = kept.count()
    assert(n3 > 0 && n3 <= n2)

    // 4. decontaminate against a held-out eval slice
    val eval = kept.where(col("doc_id") % 23 === 0)
    val train = kept.where(col("doc_id") % 23 =!= 0)
    val decon = Contamination.decontaminate(train, eval, "doc_id", "text", n = 3)
    val n4 = decon.count()
    assert(n4 <= train.count())

    // 5. mixture resample + split + pack
    val mixed = Sampling.mixtureSample(decon, "source",
      Map("src0" -> 2.0, "src1" -> 0.0), keyCols = Seq("doc_id"), salt = "e2e")
    assert(mixed.where(col("source") === "src1").count() == 0)
    val split = Sampling.assignSplit(mixed, Seq("doc_id", "copy"),
      Seq("train" -> 0.9, "validation" -> 0.1), salt = "e2e")
    assert(split.where(col("split") === "rest").count() == 0)
    val packed = Sampling.packSequences(
      split.where(col("split") === "train")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")).cast("long"))
        // mixture copies share doc_id; repartition-stable packing
        // needs a unique key, so key on (doc_id, copy)
        .withColumn("pack_key", concat_ws(":", col("doc_id"), col("copy"))),
      "pack_key", "n_tok", capacity = 2048L, salt = "e2e")
    val totalToks = packed.agg(sum("n_tok")).head().getLong(0)
    val maxPack = packed.agg(max("pack_id")).head().getLong(0)
    // chunked packing: pack count ~ ceil(total/capacity)
    assert(maxPack == (totalToks - 1) / 2048L,
      s"pack ids must cover exactly ceil($totalToks/2048) chunks, got max $maxPack")

    // 6. nothing stays cached once the per-query cleanups run
    SparkEntry.runPendingCleanups()
  }

  test("crawl ingest chain composes: WARC -> records -> HTML -> text -> URL dedup") {
    val s = spark; import s.implicits._
    import graft.pipeline.{UrlOps, WebIngest}
    import graft.testing.WebFixture
    // WARC files whose response bodies are the HTML fixtures — the
    // chain a real crawl ingest runs, stitched from this round's
    // operators (html bytes in place of the byte-filler bodies)
    val files = (0L until 40L).map { i =>
      val html = WebFixture.htmlPayload(i).getBytes("UTF-8")
      val uri = graft.testing.UrlFixture.messyUrl(i)
      val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\nContent-Length: ${html.length}\r\n\r\n").getBytes("US-ASCII") ++
        html ++ "\r\n\r\n".getBytes("US-ASCII")
      (i, rec)
    }.toDF("file_id", "payload")
    // 1. split records; every file contributes its one response
    val records = WebIngest.warcRecords(files, "file_id", "payload")
    assert(records.count() == 40)
    assert(records.where(col("warc_type") === "response").count() == 40)
    // 2. body bytes -> HTML -> visible text (slice by the record's
    //    range, the same pattern the digest column uses)
    val splitUdf = udf((b: Array[Byte]) => WebIngest.warcSplit(b).map(r =>
      new String(b, r.body_offset.toInt, r.content_length.toInt, "UTF-8")))
    val bodies = files.select(col("file_id"), explode(splitUdf(col("payload"))).as("html"))
    val texts = WebIngest.withHtmlText(bodies, "html").select(col("file_id"), col("text"))
    val t0 = texts.where(col("text").contains("Paragraph 0")).count()
    assert(t0 == 40, s"every page yields its first paragraph, got $t0")
    assert(texts.where(col("text").contains("<") || col("text").contains("var x")).count() == 0)
    // 3. URL dedup on the records' target URIs: ids 0..39 share
    //    canonical classes with period 100 -> all distinct here, but
    //    the canonicalizer still normalizes every messy variant
    val withUri = records.select(col("file_id"), col("target_uri"))
    val deduped = UrlOps.dedupByUrl(withUri, "target_uri", "file_id")
    assert(deduped.count() == 40)
    assert(deduped.where(col("url_canon").startsWith("http://host")).count() == 40)
  }
}
