package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that
  * share long word n-grams with an evaluation/benchmark corpus — the
  * standard leakage control for LLM training sets (GPT-3 appendix C /
  * PaLM-style 13-gram overlap).
  *
  * Scale shape: both sides tokenize+shingle ONCE (the same staged
  * word-array path as [[Dedup]]), shingles are md5-digested so the
  * join shuffles 32-byte keys instead of raw n-gram text, and the
  * eval side is aggregated to DISTINCT digests before the join — an
  * eval suite is tiny next to a 100 TB corpus, so Spark's AQE turns
  * that side into a broadcast and the corpus never shuffles at all.
  * No all-pairs stage; cost is one scan of each side.
  */
object Contamination {

  /** (idCol, `__dg__`) shingle-digest frame for one side. Pairs are
    * already distinct: [[Dedup.shingleFrame]] array_distincts the
    * shingles within each document, so no extra shuffle is needed.
    */
  private def digests(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Dedup.shingleFrame(df, idCol, textCol, n)
      .select(col("__id__").as(idCol), explode(col("__sg__")).as("__shingle__"))
      .select(col(idCol), md5(col("__shingle__")).as("__dg__"))

  /** Corpus documents sharing at least `minOverlap` distinct
    * `n`-gram shingles with `evalSet`: (idCol, n_overlap), overlap
    * counted over distinct shingles.
    */
  def contaminatedIds(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      minOverlap: Int = 1
  ): DataFrame = {
    val evalDigests = digests(evalSet, idCol, textCol, n)
      .select(col("__dg__")).distinct()
    digests(corpus, idCol, textCol, n)
      .join(evalDigests, Seq("__dg__"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }

  /** The decontaminated corpus: all rows of `corpus` minus the
    * contaminated ids (one left_anti — no extra shuffle beyond the
    * overlap join itself).
    */
  def decontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      minOverlap: Int = 1
  ): DataFrame =
    corpus.join(
      contaminatedIds(corpus, evalSet, idCol, textCol, n, minOverlap).select(idCol),
      Seq(idCol), "left_anti")
}
