package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that
  * share long word n-grams with an evaluation/benchmark corpus — the
  * standard leakage control for LLM training sets (GPT-3 appendix C /
  * PaLM-style 13-gram overlap).
  *
  * Scale shape: both sides tokenize+shingle ONCE (the same staged
  * word-array path as [[Dedup]]), shingles are xxhash64-digested so
  * the join shuffles 8-byte longs instead of raw n-gram text, and the
  * eval side is aggregated to DISTINCT digests before the join — an
  * eval suite is tiny next to a 100 TB corpus, so Spark's AQE turns
  * that side into a broadcast and the corpus never shuffles at all.
  * No all-pairs stage; cost is one scan of each side.
  */
object Contamination {

  /** (idCol, `__dg__`) shingle-digest frame for one side. Pairs are
    * already distinct: [[Dedup.shingleFrame]] array_distincts the
    * shingles within each document, so no extra shuffle is needed.
    *
    * The digest is xxhash64 — an 8-byte long join key instead of a
    * 32-char md5 string, so the corpus-side shuffle moves 4x less key
    * data and hashing is a few ns per shingle. A collision only
    * matters when a corpus shingle collides with one of the eval
    * side's distinct shingles: with an eval suite of ~1e6 distinct
    * grams and a 1e12-gram corpus, expected cross-collisions are
    * ~1e18/2^64 = 0.05 — a spurious +1 on one doc's n_overlap, well
    * inside the tolerance of a leakage filter.
    */
  private def digests(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Dedup.shingleFrame(df, idCol, textCol, n)
      .select(col("__id__").as(idCol), explode(col("__sg__")).as("__shingle__"))
      .select(col(idCol), xxhash64(col("__shingle__")).as("__dg__"))

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

  /** Character-window digests: slide a `window`-char window with
    * `stride` over the whitespace-normalized lowercase text (plus
    * one tail window flush with the end so suffixes are never
    * missed; texts shorter than the window contribute themselves).
    * Returns distinct (idCol, `__dg__`) pairs.
    */
  private def charDigests(
      df: DataFrame, idCol: String, textCol: String, window: Int, stride: Int): DataFrame = {
    val staged = df.select(col(idCol),
      trim(regexp_replace(lower(col(textCol)), "\\s+", " ")).as("__t__"))
    val t = col("__t__")
    val len = length(t)
    val nWin = (floor((len - window).cast("double") / stride) + 1).cast("int")
    val wins = when(len.isNull || len === 0, array().cast("array<string>"))
      .when(len <= window, array(t))
      .otherwise(array_union(
        transform(sequence(lit(0), nWin - 1), i => t.substr(i * stride + 1, lit(window))),
        array(t.substr(len - window + 1, lit(window)))))
    staged
      .select(col(idCol), explode(array_distinct(wins)).as("__win__"))
      .select(col(idCol), xxhash64(col("__win__")).as("__dg__"))
  }

  /** Exact-substring decontamination: corpus documents sharing at
    * least `minOverlap` distinct `window`-char windows with the eval
    * set — the character-level leakage family (robust to
    * tokenization and punctuation drift, complements the word-n-gram
    * [[contaminatedIds]]).
    *
    * The corpus slides at `stride`; the EVAL side enumerates every
    * offset (stride 1) — eval suites are tiny next to the corpus, and
    * one-sided exhaustion is what makes strided windows sound: some
    * corpus grid window falls fully inside any shared span of at
    * least `window + stride - 1` chars, and the eval side is
    * guaranteed to hold that exact substring. Strided windows on
    * BOTH sides would only match when the two occurrences align
    * mod stride. Same scale shape as [[contaminatedIds]]: windows
    * digest to 8-byte longs, the eval side reduces to DISTINCT
    * digests and broadcasts, the corpus never shuffles.
    */
  def charWindowContaminatedIds(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 50,
      stride: Int = 10,
      minOverlap: Int = 1
  ): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val evalDigests = charDigests(evalSet, idCol, textCol, window, stride = 1)
      .select(col("__dg__")).distinct()
    charDigests(corpus, idCol, textCol, window, stride)
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
