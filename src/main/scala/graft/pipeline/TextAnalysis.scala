package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, n-gram language ID, and document
  * fingerprinting. All are pure Catalyst column expressions
  * (codegen'd, no UDFs) so they pipeline inside a single stage over
  * the scan — the shape that survives a 100 TB corpus.
  */
object TextAnalysis {

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** A BPE-ish subword proxy: number of matches of a letter-run /
    * digit-run / single-symbol regex. Useful as a fast token estimate
    * when no tokenizer is available.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality-scoring feature columns:
    * chars, tokens, mean token length, punctuation ratio, digit
    * ratio, uppercase ratio, stopword ratio (English function words).
    */
  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with", "as", "at", "by", "it", "that", "this")

  def qualityFeatures(df: DataFrame, textCol: String, prefix: String = "q_"): DataFrame = {
    val t = col(textCol)
    val chars = length(t)
    val toks = tokenCount(t)
    val punct = length(t) - length(regexp_replace(t, "[\\.,;:!\\?'\"\\(\\)]", ""))
    val digits = length(t) - length(regexp_replace(t, "[0-9]", ""))
    val uppers = length(t) - length(regexp_replace(t, "[A-Z]", ""))
    val stopHits = defaultStopwords
      .map(w => (length(t) - length(regexp_replace(t, s"(?i)\\b$w\\b", ""))) / lit(w.length))
      .reduce(_ + _)
    df.withColumn(s"${prefix}chars", chars)
      .withColumn(s"${prefix}tokens", toks)
      .withColumn(s"${prefix}mean_tok_len", when(toks > 0, (chars - (toks - 1)).cast("double") / toks).otherwise(lit(0.0)))
      .withColumn(s"${prefix}punct_ratio", when(chars > 0, punct.cast("double") / chars).otherwise(lit(0.0)))
      .withColumn(s"${prefix}digit_ratio", when(chars > 0, digits.cast("double") / chars).otherwise(lit(0.0)))
      .withColumn(s"${prefix}upper_ratio", when(chars > 0, uppers.cast("double") / chars).otherwise(lit(0.0)))
      .withColumn(s"${prefix}stop_ratio", when(toks > 0, stopHits.cast("double") / toks).otherwise(lit(0.0)))
  }

  /** Language-ID marker words per language. Deliberately tiny and
    * deterministic: the score for a language is the number of
    * occurrences of its markers (space-padded substring matches);
    * argmax wins, ties broken by the fixed language order.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "es" -> Seq(" el ", " la ", " los ", " es "),
    "de" -> Seq(" der ", " die ", " und ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " est "),
    "zh" -> Seq("的", "是", "了", "在")
  )

  /** Count non-overlapping occurrences of a literal in `t` via the
    * replace-length trick (portable to any SQL engine).
    */
  def countOccurrences(t: Column, literal: String): Column =
    (length(t) - length(regexp_replace(t, java.util.regex.Pattern.quote(literal), ""))) / lit(literal.length)

  /** Heuristic language-ID over the marker table; text is padded with
    * spaces so edge words match.
    *
    * Argmax is `array_position(scores, array_max(scores))` — first
    * index achieving the max, i.e. first-wins tie-break in table
    * order. The previous `when`-chain fold re-inlined every earlier
    * score expression into each later branch; the generated code
    * blew past janino's 64KB method limit and every task paid a
    * failed-compile penalty before interpreted fallback. Here each
    * score expression appears exactly once inside the array.
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scoreArr = array(langMarkers.map { case (_, ws) =>
      ws.map(w => countOccurrences(padded, w)).reduce(_ + _)
    }: _*)
    val langArr = array(langMarkers.map { case (l, _) => lit(l) }: _*)
    element_at(langArr, array_position(scoreArr, array_max(scoreArr)).cast("int"))
  }

  /** Normalized-text digest fingerprint: lowercase, strip
    * non-alphanumerics to single spaces, trim, md5. Identical texts
    * modulo casing/punctuation/whitespace collide — the standard
    * cheap exact-dup key.
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(trim(regexp_replace(lower(text), "[^a-z0-9\\p{L}]+", " ")), "\\s+", " "))

  /** Polynomial rolling hash of the normalized text (Rabin-Karp
    * style, base 31, modulo the prime 1e9+7) via an aggregate over
    * the character codes. The modulus keeps every intermediate below
    * 2^35 — wraparound 64-bit arithmetic would THROW under Spark 4's
    * ANSI overflow checking, and mod-prime is reproducible in any
    * engine with exact integer math (DuckDB oracle included).
    */
  val rollingHashMod = 1000000007L

  def rollingHash(text: Column): Column = {
    val norm = regexp_replace(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), "\\s+", " ")
    aggregate(
      transform(split(norm, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => (acc * lit(31L) + c) % lit(rollingHashMod)
    )
  }
}
