package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE hashed-n-gram feature space shared by every operator that
  * featurizes text into buckets — [[Sampling.dsirLogWeights]] and
  * [[TextAnalysis.scoreLinearModel]] today. A single definition keeps
  * the cross-operator promise ("the classifier scores the same
  * features DSIR weights") true by construction, and both DuckDB
  * oracle mirrors mirror THIS: grams = unigrams ++ bigrams of the
  * empty-token-filtered [[Dedup.splitWords]] tokenization; bucket =
  * uint32 of the first 8 md5 hex chars mod `buckets`
  * (`('0x' || substring(md5(g),1,8))::BIGINT % n` in DuckDB).
  */
private[pipeline] object Features {

  /** `(__id__, __gs__)`: the gram array per row, staged from ONE
    * materialized word array (an inline split would re-run the regex
    * once per consumer).
    */
  def withGrams(df: DataFrame, idCol: String, textCol: String): DataFrame = df
    .select(col(idCol).as("__id__"),
      array_remove(Dedup.splitWords(col(textCol)), "").as("__ws__"))
    .select(col("__id__"),
      concat(col("__ws__"), Dedup.shinglesFromWordsNative(col("__ws__"), 2)).as("__gs__"))

  /** Engine-portable gram -> bucket hash. */
  def bucketOf(g: Column, buckets: Int): Column =
    (conv(substring(md5(g), 1, 8), 16, 10).cast("long") % buckets).cast("int")
}
