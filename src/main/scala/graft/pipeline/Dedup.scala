package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Design notes for 100 TB:
  *  - exact dedup is a hash-groupBy on a digest (never on raw text —
  *    the shuffle moves 32-byte keys, not documents);
  *  - MinHash candidates come from banded LSH: the only shuffle is on
  *    (band index, band signature), and pair generation happens
  *    within buckets — no all-pairs stage anywhere;
  *  - signatures/shingles are computed with codegen'd expressions
  *    (split/transform/aggregate), not UDFs.
  */
object Dedup {

  /** Exact dedup: keep the row with the minimum `idCol` per distinct
    * normalized text digest. Returns the winning (id, digest) pairs
    * plus group size — join back to the corpus to materialize the
    * deduplicated set.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprintMd5(col(textCol)).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup materialized: one surviving row per digest. */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Word n-gram shingles of the lowercased text as an array column. */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")
    val count = greatest(size(words) - (n - 1), lit(0))
    transform(
      sequence(lit(0), count - 1),
      i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k + 1)): _*)
    )
  }

  /** MinHash signature of a shingle array: for each of `numHashes`
    * seeds, the lexicographic minimum of md5(shingle || '#' || seed).
    * A string-min over md5 is a valid min-wise hash family and is
    * bit-reproducible across engines (used by the DuckDB oracle too).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingles, s => md5(concat(s, lit(s"#$seed")))))
    }: _*)

  /** Candidate near-duplicate pairs via banded LSH over MinHash
    * signatures. `numHashes` must be divisible by `bands`; docs
    * agreeing on all rows of any band become a candidate pair.
    * Output: (id_a, id_b, n_band_matches) with id_a < id_b.
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val sig = df
      .select(col(idCol).as("__id__"), minhashSignature(wordShingles(col(textCol), shingleWords), numHashes).as("__sig__"))
      .where(size(col("__sig__")) > 0 && col("__sig__").getItem(0).isNotNull)
    val banded = sig.select(
      col("__id__"),
      posexplode(
        array((0 until bands).map { b =>
          concat_ws("|", (0 until rowsPerBand).map(r => col("__sig__").getItem(b * rowsPerBand + r)): _*)
        }: _*)
      ).as(Seq("__band__", "__bandsig__"))
    )
    val a = banded.select(col("__band__"), col("__bandsig__"), col("__id__").as("id_a"))
    val b = banded.select(col("__band__"), col("__bandsig__"), col("__id__").as("id_b"))
    a.join(b, Seq("__band__", "__bandsig__"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_band_matches"))
  }

  /** SimHash over word features: for each of `bits` bit positions,
    * the sign of the sum over words of (+1 if bit set in md5(word)
    * else -1). Uses the high bit of each hex nibble of the digest —
    * 32 usable bits, portable to any engine with md5.
    * Returns a bit-string column like "01101...".
    */
  def simhashBits(text: Column, bits: Int = 16): Column = {
    require(bits <= 32, "hex-nibble simhash supports at most 32 bits")
    val words = split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")
    val bitCols = (0 until bits).map { i =>
      val vote = aggregate(
        words,
        lit(0),
        (acc, w) =>
          acc + when(substring(md5(w), i + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)
      )
      when(vote >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bitCols: _*)
  }

  /** Jaccard similarity of word n-gram sets between the two text
    * columns of a pre-paired frame (use [[minhashCandidates]] to
    * generate pairs at scale — never all-pairs).
    */
  def ngramJaccard(pairs: DataFrame, textA: Column, textB: Column, n: Int = 3): Column = {
    val sa = array_distinct(wordShingles(textA, n))
    val sb = array_distinct(wordShingles(textB, n))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Embedding-cosine near-duplicate pairs within blocking keys.
    * `blockCols` bounds the quadratic stage (e.g. an LSH bucket or a
    * coarse cluster id); cosine is computed with codegen'd
    * zip_with/aggregate — no UDF.
    */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCols: Seq[String],
      threshold: Double
  ): DataFrame = {
    val a = df.select((blockCols.map(col) :+ col(idCol).as("id_a")) :+ col(vecCol).as("__va__"): _*)
    val b = df.select((blockCols.map(col) :+ col(idCol).as("id_b")) :+ col(vecCol).as("__vb__"): _*)
    val cos = Similarity.cosine(col("__va__"), col("__vb__"))
    a.join(b, blockCols)
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", cos)
      .where(col("cosine") >= threshold)
      .select((blockCols.map(col) :+ col("id_a")) :+ col("id_b") :+ col("cosine"): _*)
  }
}
