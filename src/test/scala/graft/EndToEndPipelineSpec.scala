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
}
