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

  /** Whitespace-normalized lowercase word array. */
  def splitWords(text: Column): Column =
    split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")

  /** n-gram shingles from a MATERIALIZED word-array column (pass an
    * attribute, not an inline split — the words expression appears
    * once per gram position per element here and would be recomputed
    * each time). Fewer than `n` words yields an empty array (guard
    * needed: `sequence(0, -1)` is a DESCENDING sequence in Spark SQL,
    * which would index words at 0 and crash under ANSI).
    */
  def shinglesFromWords(words: Column, n: Int): Column = {
    val count = size(words) - (n - 1)
    when(
      count > 0,
      transform(
        sequence(lit(0), count - 1),
        i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k + 1)): _*)
      )
    ).otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles of the lowercased text as an array column.
    * Convenience form for single-use expressions; hot paths should
    * stage [[splitWords]] into a column first.
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromWords(splitWords(text), n)

  /** Same output as [[shinglesFromWords]] as a native codegen'd
    * Catalyst expression ([[graft.plans.ShinglesExpr]]) — what the
    * dedup hot paths use (r14): no encoder round-trip, and the
    * tokenize → shingle → minhash chain fuses into one
    * whole-stage-codegen method. The expression form remains the
    * spec the DuckDB oracle mirrors; PipelineSpec pins all three
    * forms identical.
    */
  def shinglesFromWordsNative(words: Column, n: Int): Column =
    graft.internal.exprColumn(graft.plans.ShinglesExpr(graft.internal.columnExpr(words), n))

  /** Same output as [[shinglesFromWords]] as a JVM-native UDF. Spark
    * evaluates lambda higher-order functions (transform/aggregate)
    * interpreted — never codegen — at ~4-5us per element; this loop
    * is ~20x faster (measured 13.7s -> 0.7s over 260k shingles).
    * Superseded on hot paths by [[shinglesFromWordsNative]]; kept as
    * the cross-checked middle form.
    */
  def shinglesFromWordsUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (words: Seq[String]) =>
      if (words == null) null // mirror the expression form: null words -> null
      else if (words.length < n) Seq.empty[String]
      else {
        val out = new Array[String](words.length - n + 1)
        var i = 0
        while (i < out.length) {
          val sb = new java.lang.StringBuilder(words(i))
          var k = 1
          while (k < n) { sb.append(' ').append(words(i + k)); k += 1 }
          out(i) = sb.toString
          i += 1
        }
        out.toSeq
      }
    }

  /** MinHash signature of a shingle array. Lane `k` takes the
    * lexicographic minimum over shingles of an 8-hex-char slice of an
    * md5 digest: chars `[8*(k%4), 8*(k%4)+8)` of `md5(s || "#"*(k/4))`
    * — i.e. each digest feeds FOUR 32-bit lanes, so `numHashes` lanes
    * cost `ceil(numHashes/4)` digests per shingle instead of
    * `numHashes` (4x less hashing on the hot path). Disjoint
    * fixed-width slices of a cryptographic digest are independent
    * uniform hashes, and a string-min over fixed-width hex equals the
    * numeric min over the underlying 32-bit values — valid min-wise
    * lanes, bit-reproducible across engines (the DuckDB oracle mirrors
    * the same substring-of-md5 expression).
    *
    * Implemented as ONE fold over the shingles that updates all
    * lanes per element — the obvious `numHashes x
    * array_min(transform(...))` form duplicates the shingle
    * expression per lane once Catalyst collapses projections, and the
    * generated code then blows past janino's method limit (every task
    * pays a failed-compile penalty; measured ~20x slower). "g" sorts
    * above every hex slice, so it is the fold's +infinity.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    aggregate(
      shingles,
      array(Seq.fill(numHashes)(lit("g")): _*),
      (acc, s) =>
        array((0 until numHashes).map { k =>
          val dig = md5(concat(s, lit("#" * (k / 4))))
          least(element_at(acc, k + 1), substring(dig, (k % 4) * 8 + 1, 8))
        }: _*)
    )

  private val hexChars = "0123456789abcdef".toCharArray

  /** Same signature as [[minhashSignature]] (bit-identical: 8-hex-char
    * slices of `md5(s || "#"*(k/4))`, lexicographic min per lane) as a
    * JVM-native UDF. Spark never code-generates lambda higher-order
    * functions, so the expression form pays ~5us of interpreted
    * overhead per lane-element; this tight loop is ~10x faster and is
    * what [[minhashCandidates]] uses on the hot path. Kept alongside
    * the expression form, which remains the spec for the DuckDB
    * oracle.
    */
  def minhashSignatureUdf(numHashes: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (shingles: Seq[String]) =>
      if (shingles == null) null
      else {
      val nDigests = (numHashes + 3) / 4
      val md = java.security.MessageDigest.getInstance("MD5")
      val mins = Array.fill(numHashes)("g")
      var i = 0
      while (i < shingles.length) {
        val sBytes = shingles(i).getBytes("UTF-8")
        var d = 0
        while (d < nDigests) {
          md.reset()
          md.update(sBytes)
          var j = 0
          while (j < d) { md.update('#'.toByte); j += 1 }
          val dig = md.digest()
          var lane = d * 4
          val laneEnd = math.min(lane + 4, numHashes)
          while (lane < laneEnd) {
            // hex chars [8*(lane%4), +8) = digest bytes [4*(lane%4), +4)
            val b0 = (lane % 4) * 4
            val sb = new java.lang.StringBuilder(8)
            var b = b0
            while (b < b0 + 4) {
              sb.append(hexChars((dig(b) >> 4) & 0xf))
              sb.append(hexChars(dig(b) & 0xf))
              b += 1
            }
            val hex = sb.toString
            if (hex.compareTo(mins(lane)) < 0) mins(lane) = hex
            lane += 1
          }
          d += 1
        }
        i += 1
      }
      mins.toSeq
      }
    }

  /** [[minhashSignatureUdf]]'s semantics as a NATIVE Catalyst
    * expression ([[graft.plans.MinhashSignatureExpr]]): same
    * bit-identical signature, but it runs inside whole-stage codegen
    * on Tungsten `UTF8String`s directly — no encoder round-trip to
    * `Seq[String]`, no codegen-span break at a ScalaUDF node. This is
    * what the hot path uses; the UDF and the expression form remain
    * as the measured mirror and the oracle spec (all three pinned
    * equal in PipelineSpec).
    */
  def minhashSignatureNative(shingles: Column, numHashes: Int): Column =
    graft.internal.exprColumn(
      graft.plans.MinhashSignatureExpr(graft.internal.columnExpr(shingles), numHashes))

  /** [[simhashUdf]]'s semantics as a NATIVE Catalyst expression —
    * same rationale as [[minhashSignatureNative]].
    */
  def simhashNative(words: Column, bits: Int): Column =
    graft.internal.exprColumn(
      graft.plans.SimhashBitsExpr(graft.internal.columnExpr(words), bits))

  /** Banded LSH signatures (the band strings of
    * [[minhashCandidates]]) in ONE native evaluation — for plans that
    * cannot stage the signature behind a persist barrier (streaming),
    * where a banding expression over a signature column would be
    * projection-collapsed into per-lane signature re-evaluations.
    */
  def minhashBandsNative(shingles: Column, numHashes: Int, bands: Int): Column =
    graft.internal.exprColumn(
      graft.plans.MinhashBandsExpr(graft.internal.columnExpr(shingles), numHashes, bands))

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
      bands: Int = 4,
      maxBucketSize: Int = 1000
  ): DataFrame =
  {
    val (out, release) =
      minhashCandidatesWithCleanup(df, idCol, textCol, shingleWords, numHashes, bands, maxBucketSize)
    graft.Cleanup.defer(release)
    out
  }

  /** [[minhashCandidates]] plus a cleanup thunk that unpersists the
    * internal banded-signature cache (the persist is load-bearing —
    * see the comment inside — but the handle would otherwise live
    * until context shutdown; long pipelines should call the thunk
    * once the result has been consumed / materialized downstream).
    */
  def minhashCandidatesWithCleanup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      maxBucketSize: Int = 1000
  ): (DataFrame, () => Unit) =
    minhashCandidatesFromShingles(shingleFrame(df, idCol, textCol, shingleWords), numHashes, bands, maxBucketSize)

  /** (`__id__`, `__sg__`) distinct-shingle frame — the shared first
    * stage of the MinHash/Jaccard pipelines. Words -> shingles are
    * staged as separate projections so each is evaluated once per row;
    * inlining the shingle expression into all `numHashes` min-lanes
    * would re-run the regex split per lane per element (measured ~20x
    * slower). `array_distinct` is safe for MinHash (a min over a
    * multiset equals the min over its distinct set) and is what exact
    * Jaccard needs anyway, so both consumers share this frame.
    */
  private[pipeline] def shingleFrame(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int
  ): DataFrame = df
    .select(col(idCol).as("__id__"), splitWords(col(textCol)).as("__words__"))
    .select(col("__id__"), array_distinct(shinglesFromWordsNative(col("__words__"), shingleWords)).as("__sg__"))
    .where(size(col("__sg__")) > 0)

  /** [[minhashCandidatesWithCleanup]] starting from a pre-staged
    * [[shingleFrame]] — lets callers that also need the shingles
    * (exact-Jaccard verify) tokenize each document exactly once.
    */
  /** The exploded (\_\_id\_\_, \_\_band\_\_, \_\_bandsig\_\_) banded-MinHash
    * frame — the unit [[minhashCandidatesFromShingles]] self-joins
    * and an incremental pipeline persists as its fingerprint store
    * ([[IncrementalDedup]]). Unpersisted; callers own caching.
    */
  private[pipeline] def bandedFromShingles(
      shingles: DataFrame,
      numHashes: Int,
      bands: Int,
      withCount: Boolean = false
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    // withCount threads the distinct-shingle count (one int per banded
    // row) so a thresholded consumer can length-ratio-filter INSIDE the
    // bucket self-join — before the pair groupBy — with no extra join
    val keepIn = if (withCount) Seq(col("__id__"), size(col("__sg__")).as("__n__")) else Seq(col("__id__"))
    val keepOut = if (withCount) Seq(col("__id__"), col("__n__")) else Seq(col("__id__"))
    shingles
      .select(keepIn :+ minhashSignatureNative(col("__sg__"), numHashes).as("__sig__"): _*)
      .select(
        keepOut :+
        posexplode(
          array((0 until bands).map { b =>
            concat_ws("|", (0 until rowsPerBand).map(r => col("__sig__").getItem(b * rowsPerBand + r)): _*)
          }: _*)
        ).as(Seq("__band__", "__bandsig__")): _*)
  }

  /** [[bandedFromShingles]] from raw documents, with output columns
    * renamed for external persistence: (idCol, band, bandsig).
    */
  def bandedFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4
  ): DataFrame =
    bandedFromShingles(shingleFrame(df, idCol, textCol, shingleWords), numHashes, bands)
      .select(col("__id__").as(idCol), col("__band__").as("band"), col("__bandsig__").as("bandsig"))

  private[pipeline] def minhashCandidatesFromShingles(
      shingles: DataFrame,
      numHashes: Int,
      bands: Int,
      maxBucketSize: Int,
      minJaccard: Double = 0.0
  ): (DataFrame, () => Unit) = {
    val prefilter = minJaccard > 0.0
    // persist the tiny (id, band, bandsig) frame: it feeds BOTH sides
    // of the self-join plus the bucket-size window, and Catalyst's
    // project-collapsing would otherwise re-inline (and re-execute)
    // the full signature expression into every consumer — measured
    // ~25x slower without the barrier. Size is ~bands rows per doc of
    // short strings, negligible next to the corpus at any scale.
    val banded = bandedFromShingles(shingles, numHashes, bands, withCount = prefilter)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Hot-bucket cap: one boilerplate-heavy band signature would make
    // the within-bucket self-join quadratic. Buckets larger than
    // `maxBucketSize` are dropped (standard LSH practice — such docs
    // still pair up in their other, more selective bands). Same
    // partitioning key as the join, so the count adds no extra shuffle.
    val wBucket = Window.partitionBy(col("__band__"), col("__bandsig__"))
    val capped = banded
      .withColumn("__bsize__", count(lit(1)).over(wBucket))
      .where(col("__bsize__") <= maxBucketSize)
      .drop("__bsize__")
    val extraA = if (prefilter) Seq(col("__n__").as("__na__")) else Nil
    val extraB = if (prefilter) Seq(col("__n__").as("__nb__")) else Nil
    val a = capped.select(Seq(col("__band__"), col("__bandsig__"), col("__id__").as("id_a")) ++ extraA: _*)
    val b = capped.select(Seq(col("__band__"), col("__bandsig__"), col("__id__").as("id_b")) ++ extraB: _*)
    // when thresholded, the length-ratio bound (see
    // [[lengthRatioPrefilter]]) drops ratio-impossible pairs HERE —
    // inside the bucket join, before their band-match rows ever reach
    // the pair groupBy shuffle; the filter is per-pair deterministic,
    // so a dropped pair loses ALL its band rows and simply never
    // becomes a candidate
    val ratioOk =
      if (prefilter)
        least(col("__na__"), col("__nb__")).cast("double") >=
          lit(minJaccard) * greatest(col("__na__"), col("__nb__")).cast("double") - lit(1e-9)
      else lit(true)
    val result = a.join(b, Seq("__band__", "__bandsig__"))
      .where(col("id_a") < col("id_b") && ratioOk)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_band_matches"))
    (result, () => { banded.unpersist(); () })
  }

  /** CROSS-corpus banded-MinHash candidate pairs: documents of `dfA`
    * near-matching documents of `dfB` — the FUZZY face of
    * decontamination ([[Contamination]] catches exact n-gram overlap;
    * an eval item paraphrased or lightly edited into the training set
    * only shows up here). Output is (id_a ∈ A, id_b ∈ B,
    * n_band_matches); compose the exact-Jaccard verify tail on top
    * exactly like the self-join path when a score is needed.
    *
    * Scale shape matches [[minhashCandidatesWithCleanup]]: the only
    * shuffle keys on (band, bandsig); a (band, bandsig) bucket is
    * dropped WHOLE when its COMBINED A+B membership exceeds
    * `maxBucketSize` (the same whole-drop rule as the self-join cap,
    * so engine and oracle agree by construction at any scale); the
    * bipartite pair join happens within surviving buckets only — no
    * A×B stage anywhere. Call the thunk after the consuming action.
    */
  def crossCorpusCandidatesWithCleanup(
      dfA: DataFrame,
      dfB: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      maxBucketSize: Int = 1000
  ): (DataFrame, () => Unit) =
    crossCorpusCandidatesFromShingles(
      shingleFrame(dfA, idCol, textCol, shingleWords),
      shingleFrame(dfB, idCol, textCol, shingleWords),
      numHashes, bands, maxBucketSize)

  /** [[crossCorpusCandidatesWithCleanup]] from pre-staged
    * [[shingleFrame]]s — lets the verify composition tokenize each
    * side exactly once.
    */
  private[pipeline] def crossCorpusCandidatesFromShingles(
      shA: DataFrame,
      shB: DataFrame,
      numHashes: Int,
      bands: Int,
      maxBucketSize: Int
  ): (DataFrame, () => Unit) = {
    val banded = bandedFromShingles(shA, numHashes, bands)
      .withColumn("__side__", lit(0))
      .unionByName(bandedFromShingles(shB, numHashes, bands)
        .withColumn("__side__", lit(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wBucket = Window.partitionBy(col("__band__"), col("__bandsig__"))
    val capped = banded
      .withColumn("__bsize__", count(lit(1)).over(wBucket))
      .where(col("__bsize__") <= maxBucketSize)
      .drop("__bsize__")
    val a = capped.where(col("__side__") === 0)
      .select(col("__band__"), col("__bandsig__"), col("__id__").as("id_a"))
    val b = capped.where(col("__side__") === 1)
      .select(col("__band__"), col("__bandsig__"), col("__id__").as("id_b"))
    val out = a.join(b, Seq("__band__", "__bandsig__"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_band_matches"))
    (out, () => { banded.unpersist(); () })
  }

  /** [[crossCorpusCandidatesWithCleanup]] with the exact word-shingle
    * Jaccard verify AND the keep/drop decision attached — the
    * end-to-end fuzzy-decontamination operator: an eval/train
    * candidate pair is verified with the same exact-Jaccard tail as
    * the self-join near-dup family, and `dropped` marks training
    * documents whose similarity to an eval item reaches
    * `dropThreshold` (the contaminated set a pipeline subtracts
    * before training). Every candidate pair is returned with its
    * exact `jac` so the decision is auditable; each document is
    * shingled exactly once per side, and the verify joins see only
    * bucket-join candidates — no A×B stage anywhere.
    */
  def crossCorpusVerifiedWithCleanup(
      dfA: DataFrame,
      dfB: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      maxBucketSize: Int = 1000,
      dropThreshold: Double = 0.5
  ): (DataFrame, () => Unit) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shA = shingleFrame(dfA, idCol, textCol, shingleWords).persist(lvl)
    val shB = shingleFrame(dfB, idCol, textCol, shingleWords).persist(lvl)
    val (cand, cleanCand) =
      crossCorpusCandidatesFromShingles(shA, shB, numHashes, bands, maxBucketSize)
    val out = cand
      .join(shA.select(col("__id__").as("id_a"), col("__sg__").as("__sga__")), Seq("id_a"))
      .join(shB.select(col("__id__").as("id_b"), col("__sg__").as("__sgb__")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_band_matches"),
        jaccardOfShingleArrays(col("__sga__"), col("__sgb__")).as("jac"))
      .withColumn("dropped", col("jac") >= dropThreshold)
    (out, () => { cleanCand(); shA.unpersist(); shB.unpersist(); () })
  }

  /** [[crossCorpusCandidatesWithCleanup]] without the cleanup handle
    * (persist-cache release parked in [[graft.Cleanup]]).
    */
  def crossCorpusCandidates(
      dfA: DataFrame,
      dfB: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      maxBucketSize: Int = 1000
  ): DataFrame =
  {
    val (out, release) = crossCorpusCandidatesWithCleanup(
      dfA, dfB, idCol, textCol, shingleWords, numHashes, bands, maxBucketSize)
    graft.Cleanup.defer(release)
    out
  }

  /** Near-dup candidate pairs from winnowed fingerprints (Schleimer
    * et al. 2003): documents sharing >= `minShared` selected gram
    * hashes, with the shared count. Winnowing's containment
    * guarantee makes this EXACT for long overlaps — any shared
    * normalized run of `w + k - 1` chars WILL share a fingerprint —
    * where MinHash bands only hit with probability; the flip side is
    * sensitivity to k (short grams pair everything that shares a
    * phrase, so near-dup work wants k ~ 20+).
    *
    * Scale shape mirrors [[minhashCandidatesWithCleanup]]: hashes
    * held by more than `maxHashDocs` documents are dropped whole
    * (boilerplate grams — real overlaps still pair through their
    * other fingerprints), the CAPPED frame is then persisted so it
    * feeds both self-join sides from one computation, and the cap
    * window shares the join's partitioning key so it adds no extra
    * shuffle. Call the thunk after the consuming action.
    */
  def winnowCandidatesWithCleanup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 20,
      w: Int = 16,
      minShared: Long = 2L,
      maxHashDocs: Int = 100
  ): (DataFrame, () => Unit) = {
    val fps = TextAnalysis.winnowFingerprintRows(df, idCol, textCol, k, w)
      .select(col(idCol).as("__id__"), col("gram_hash"))
      .distinct()
    val wHash = Window.partitionBy(col("gram_hash"))
    // persist AFTER the cap: the window then computes once, and the
    // cached frame's gram_hash partitioning feeds BOTH join sides
    // co-located — the self-join plans no exchange of its own
    val capped = fps
      .withColumn("__hsize__", count(lit(1)).over(wHash))
      .where(col("__hsize__") <= maxHashDocs)
      .drop("__hsize__")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = capped.select(col("gram_hash"), col("__id__").as("id_a"))
    val b = capped.select(col("gram_hash"), col("__id__").as("id_b"))
    val pairs = a.join(b, Seq("gram_hash"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    (pairs, () => { capped.unpersist(); () })
  }

  /** [[winnowCandidatesWithCleanup]] with the exact n-gram Jaccard
    * verify attached (the [[jaccardCandidatesWithCleanup]] pattern):
    * candidates come from shared winnowed fingerprints — no
    * all-pairs stage — and the word-shingle Jaccard is computed only
    * for the candidate pairs, each document shingled once. The two
    * candidate generators compose with the SAME verify tail, so a
    * pipeline can run either (or both) and filter on `jac` with
    * identical semantics.
    */
  def winnowVerifiedWithCleanup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 20,
      w: Int = 16,
      minShared: Long = 2L,
      maxHashDocs: Int = 100,
      shingleWords: Int = 3
  ): (DataFrame, () => Unit) = {
    val (cand, cleanCand) =
      winnowCandidatesWithCleanup(df, idCol, textCol, k, w, minShared, maxHashDocs)
    val sh = shingleFrame(df, idCol, textCol, shingleWords)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // LEFT joins: winnow candidacy is char-gram based (k chars), so a
    // doc with >= w+k-1 normalized chars but < shingleWords words can
    // be a candidate yet have NO word shingles — shingleFrame drops
    // it. An inner join would silently drop such pairs; the verify
    // contract is that every candidate pair gets a jac (0.0 when a
    // side has no shingles), matching the SQL oracle.
    val emptySg = array().cast("array<string>")
    val out = cand
      .join(sh.select(col("__id__").as("id_a"), col("__sg__").as("__sga__")), Seq("id_a"), "left")
      .join(sh.select(col("__id__").as("id_b"), col("__sg__").as("__sgb__")), Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"), col("n_shared"),
        jaccardOfShingleArrays(coalesce(col("__sga__"), emptySg), coalesce(col("__sgb__"), emptySg)).as("jac"))
    (out, () => { cleanCand(); sh.unpersist(); () })
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
    simhashFromMd5s(transform(words, w => md5(w)), bits)
  }

  /** SimHash bits from a MATERIALIZED array of per-word md5 digests
    * (stage `transform(words, md5)` into a column first on hot paths:
    * the digest array is referenced once per bit position, so an
    * inline expression would hash every word `bits` times).
    */
  def simhashFromMd5s(md5s: Column, bits: Int = 16): Column = {
    require(bits <= 32, "hex-nibble simhash supports at most 32 bits")
    val bitCols = (0 until bits).map { i =>
      val vote = aggregate(
        md5s,
        lit(0),
        (acc, h) =>
          acc + when(substring(h, i + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)
      )
      when(vote >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bitCols: _*)
  }

  /** Hamming distance between two equal-length bit-string columns as
    * a fixed-width codegen'd sum — one `substring` comparison per bit,
    * no UDF, no loop state. `bits` is small (<= 32) by construction.
    */
  def hammingDistance(a: Column, b: Column, bits: Int): Column =
    (0 until bits)
      .map(i => when(substring(a, i + 1, 1) =!= substring(b, i + 1, 1), 1).otherwise(0))
      .reduce(_ + _)

  /** Candidate near-duplicate pairs via banded SimHash: documents
    * agreeing EXACTLY on any of `bands` contiguous bit-slices of
    * their [[simhashBits]] signature become candidates, then the
    * exact Hamming distance is computed on candidates only and pairs
    * above `maxHamming` are dropped. By pigeonhole, any pair with
    * hamming < `bands` is guaranteed to collide in at least one band,
    * so recall is exact for `maxHamming <= bands - 1` and heuristic
    * above that. The shuffle carries (id, band, slice) — never text —
    * and the quadratic stage only sees same-slice buckets, the same
    * scale shape as [[minhashCandidates]].
    *
    * Output: (id_a, id_b, n_band_matches, hamming) with id_a < id_b.
    */
  def simhashCandidatesWithCleanup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 32,
      bands: Int = 4,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000
  ): (DataFrame, () => Unit) = {
    require(bits % bands == 0, "bits must be divisible by bands")
    val slice = bits / bands
    require(slice >= 8, "band slices narrower than 8 bits collide half the corpus into one bucket")
    // one-pass native UDF for the signature (see simhashUdf), and
    // persist: the signature feeds the band explode AND both sides of
    // the bucket join, and Catalyst's projection collapse would
    // otherwise re-execute the full simhash per consumer
    val sim = df
      .select(
        col(idCol).as("__id__"),
        split(trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " ")), " ").as("__aw__"))
      .select(col("__id__"), simhashNative(col("__aw__"), bits).as("__sh__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sim.select(
      col("__id__"),
      col("__sh__"),
      posexplode(array((0 until bands).map(b => substring(col("__sh__"), b * slice + 1, slice)): _*))
        .as(Seq("__band__", "__bandsig__"))
    )
    // hot-bucket cap, same rationale and shape as minhashCandidates:
    // a boilerplate-heavy band slice would make the bucket self-join
    // quadratic; the count shares the join's partitioning key
    val wBucket = Window.partitionBy(col("__band__"), col("__bandsig__"))
    val capped = banded
      .withColumn("__bsize__", count(lit(1)).over(wBucket))
      .where(col("__bsize__") <= maxBucketSize)
      .drop("__bsize__")
    val a = capped.select(col("__band__"), col("__bandsig__"), col("__id__").as("id_a"), col("__sh__").as("__sha__"))
    val b = capped.select(col("__band__"), col("__bandsig__"), col("__id__").as("id_b"), col("__sh__").as("__shb__"))
    val out = a.join(b, Seq("__band__", "__bandsig__"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      // signatures are identical across a pair's band matches; first()
      // carries them so the `bits`-term hamming expression below runs
      // once per DISTINCT pair, not once per raw band-match row
      .agg(
        count(lit(1)).as("n_band_matches"),
        first(col("__sha__")).as("__sha__"),
        first(col("__shb__")).as("__shb__"))
      .withColumn("hamming", hammingDistance(col("__sha__"), col("__shb__"), bits))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("n_band_matches"), col("hamming"))
    (out, () => { sim.unpersist(); () })
  }

  /** [[simhashCandidatesWithCleanup]] without the cleanup handle. */
  def simhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 32,
      bands: Int = 4,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000
  ): DataFrame =
  {
    val (out, release) =
      simhashCandidatesWithCleanup(df, idCol, textCol, bits, bands, maxHamming, maxBucketSize)
    graft.Cleanup.defer(release)
    out
  }

  /** Same bit-string as `simhashFromMd5s(transform(words, md5), bits)`
    * as a JVM-native UDF over the word array: one md5 per word, all
    * `bits` votes updated in a single pass. The expression form runs
    * `bits` interpreted aggregate-lambdas over the digest array
    * (Spark never codegens lambda higher-order functions) — measured
    * ~2.6s vs ~0.2s for 5000 docs x 32 bits. Bit k reads the high bit
    * of hex nibble k (byte k/2, bit 7 for even k / bit 3 for odd k),
    * exactly the `substring(hex, k+1, 1) IN ('8'..'f')` test of
    * [[simhashFromMd5s]], which remains the oracle-mirrored spec.
    */
  def simhashUdf(bits: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(bits <= 32, "hex-nibble simhash supports at most 32 bits")
    udf { (words: Seq[String]) =>
      if (words == null) null
      else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](bits)
      var i = 0
      while (i < words.length) {
        md.reset()
        val dig = md.digest(words(i).getBytes("UTF-8"))
        var b = 0
        while (b < bits) {
          val by = dig(b >> 1)
          val hi = if ((b & 1) == 0) (by >> 7) & 1 else (by >> 3) & 1
          votes(b) += (if (hi == 1) 1 else -1)
          b += 1
        }
        i += 1
      }
      val sb = new java.lang.StringBuilder(bits)
      var b = 0
      while (b < bits) { sb.append(if (votes(b) >= 0) '1' else '0'); b += 1 }
      sb.toString
      }
    }
  }

  /** Jaccard similarity of two MATERIALIZED distinct-shingle array
    * columns (see [[shinglesFromWords]] for staging rationale).
    */
  def jaccardOfShingleArrays(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
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

  /** Connected components over an undirected edge list: every node
    * ends with the minimum node id reachable from it as `cluster`.
    *
    * Each round combines min-label propagation (one hop over the
    * edges) with pointer jumping (`label := label(label)`), so the
    * effective reach DOUBLES per round and convergence is
    * O(log diameter) — a 100 TB chain-shaped component of length L
    * converges in ~log2(L) rounds, not L (a pure propagation loop is
    * diameter-bound and would blow any fixed `maxIter`). Per-round
    * work is two equi-joins + one min-aggregation, all plain shuffles
    * on node ids. Labels are `localCheckpoint`ed every round (without
    * lineage truncation the plan doubles per round), and the
    * superseded round's checkpoint blocks are RELEASED as soon as the
    * next round materializes — only the final labels' blocks outlive
    * the loop, via the cleanup handle.
    *
    * Output: (node, cluster) for every node appearing in `edges`,
    * plus a thunk releasing the final labels' checkpoint blocks (call
    * it once the result has been consumed / materialized downstream).
    */
  def connectedComponentsWithCleanup(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 30,
      localSolveMaxEdges: Long = 1L << 20,
      probeShipCapPairs: Long = 1L << 23
  ): (DataFrame, () => Unit) = {
    // Small-graph fast path: the edge set after LSH + Jaccard
    // filtering is proportional to the DUPLICATE count, not the
    // corpus, and usually fits the driver with room to spare. Below
    // the threshold (~16 MB of id pairs at the default), solve with
    // a local union-find instead of several driver-coordinated join
    // rounds; the distributed loop below remains the path for
    // genuinely large duplicate graphs.
    // Integral ids only — the local min-label must order identically
    // to Spark's `least`, which is only unambiguous for integers.
    val integralIds = {
      import org.apache.spark.sql.types._
      Seq(aCol, bCol).forall(c => edges.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    }
    // ONE probing job over the RAW edges decides the path AND (on the
    // small side) delivers the data (the old count()-then-collect()
    // pair was two jobs, and both ran behind the symmetrize+distinct
    // shuffle — union-find tolerates parallel, reversed, and self
    // edges, so the fast path needs neither the shuffle nor a second
    // job). Each partition ships its row count plus its id pairs
    // capped at a PER-PARTITION budget; a partition over budget ships
    // only the count. The per-partition budget is the global ship cap
    // (`probeShipCapPairs`, default 2^23 pairs = 128 MB of longs —
    // safely under spark.driver.maxResultSize's 1 GB default) divided
    // across partitions, so the TOTAL the probe can move is bounded
    // regardless of how a huge graph spreads: 200M edges over
    // hundreds of each-under-the-old-limit partitions previously
    // shipped them ALL and blew maxResultSize. If the summed count
    // fits `localSolveMaxEdges` AND every partition shipped in full,
    // the shipped pairs are the complete edge set; otherwise fall
    // through to the distributed loop (a qualifying-but-skewed graph
    // may fall through — correct, merely slower).
    val probeLimit = math.min(localSolveMaxEdges, Int.MaxValue - 2L).toInt
    val probed: Option[Array[Long]] =
      if (integralIds) {
        val rdd = edges.select(col(aCol).cast("long"), col(bCol).cast("long")).rdd
        val nParts = math.max(1, rdd.getNumPartitions)
        val perPartCap = math.min(
          probeLimit.toLong,
          math.max(1L, math.max(probeShipCapPairs, probeLimit.toLong) / nParts)
        ).toInt
        val perPart: Array[(Long, Array[Long])] = rdd
          .mapPartitions { it =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
            var n = 0L
            while (it.hasNext) {
              val r = it.next()
              n += 1
              if (n <= perPartCap) { buf += r.getLong(0); buf += r.getLong(1) }
            }
            Iterator.single((n, if (n <= perPartCap) buf.toArray else Array.emptyLongArray))
          }.collect()
        val total = perPart.iterator.map(_._1).sum
        val allShipped = perPart.forall { case (n, p) => p.length == 2 * n }
        if (total <= probeLimit && allShipped) Some(perPart.flatMap(_._2)) else None
      } else None
    probed match {
      case Some(flatPairs) =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x // path compression
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        var i = 0
        while (i < flatPairs.length) {
          val a = flatPairs(i); val b = flatPairs(i + 1); i += 2
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // min root wins -> component label = min id
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        val spark = edges.sparkSession
        import spark.implicits._
        val dt = edges.schema(aCol).dataType
        val labels = parent.keys.toSeq.map(n => (n, find(n))).toDF("node", "cluster")
          .select(col("node").cast(dt).as("node"), col("cluster").cast(dt).as("cluster"))
        return (labels, () => ())
      case None => () // big graph (or non-integral ids): distributed loop below
    }
    // symmetrize + dedup parallel edges once, and keep the frame hot:
    // it is re-joined every iteration
    val sym = edges
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed label = min(node, min neighbor): one aggregation (same
    // shuffle cost as the distinct node list) that is already the
    // fixed point for pair and star clusters — typically saves a
    // whole propagation round vs seeding with the node id itself
    var (labels, releaseLabels) = graft.internal.localCheckpointTracked(
      sym
        .groupBy(col("src").as("node"))
        .agg(min(col("dst")).as("__nmin__"))
        .select(col("node"), least(col("node"), col("__nmin__")).as("label")),
      eager = true)
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      // hop step: min label over graph neighbors
      val incoming = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("label")).as("__in__"))
      // jump step: the label of my label (labels are node ids within
      // the same component, so this is always component-internal)
      val labelOfLabel = labels.select(col("node").as("label"), col("label").as("__ll__"))
      val (updated, releaseUpdated) = graft.internal.localCheckpointTracked(
        labels
          .join(incoming, Seq("node"), "left")
          .join(labelOfLabel, Seq("label"), "left")
          .select(
            col("node"),
            least(
              col("label"),
              coalesce(col("__in__"), col("label")),
              coalesce(col("__ll__"), col("label"))).as("label"),
            (coalesce(col("__in__"), col("label")) < col("label") ||
              coalesce(col("__ll__"), col("label")) < col("label")).as("__chg__")
          ),
        eager = false) // lazy: the count below materializes it,
      // truncating lineage in the same job — one job per iteration
      changed = updated.where(col("__chg__")).count()
      releaseLabels() // round N's blocks are superseded by round N+1
      labels = updated.drop("__chg__")
      releaseLabels = releaseUpdated
      iter += 1
    }
    sym.unpersist()
    require(changed == 0, s"connectedComponents did not converge in $maxIter iterations")
    (labels.select(col("node"), col("label").as("cluster")), releaseLabels)
  }

  /** [[connectedComponentsWithCleanup]] without the cleanup handle:
    * the final labels' checkpoint blocks stay cached for as long as
    * the returned frame is in use (superseded per-round blocks are
    * still released inside the loop). Long-running sessions should
    * prefer the WithCleanup variant.
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 30,
      localSolveMaxEdges: Long = 1L << 20,
      probeShipCapPairs: Long = 1L << 23
  ): DataFrame =
  {
    val (out, release) =
      connectedComponentsWithCleanup(edges, aCol, bCol, maxIter, localSolveMaxEdges, probeShipCapPairs)
    graft.Cleanup.deferFragile(release) // releases checkpoint blocks
    out
  }

  /** Length-ratio prefilter for exact-Jaccard verify tails:
    * Jaccard(A,B) >= t implies |A ∩ B| >= t * |A ∪ B| with
    * |A ∩ B| <= min(|A|,|B|) and |A ∪ B| >= max(|A|,|B|), hence
    * min/max >= t on the DISTINCT-shingle counts. Joining the tiny
    * (id, count) frame and filtering BEFORE the shingle-array joins
    * means provably-below-threshold pairs never shuffle their arrays
    * through the second pair join (the dominant verify cost: each
    * surviving pair row carries a full shingle array between the two
    * id joins) and never pay `array_intersect`. The filter is a
    * necessary condition only — survivors still get the exact jac —
    * and the 1e-9 slack keeps the float-multiply bound conservative:
    * an extra survivor is caught by the exact filter downstream, while
    * a dropped pair is PROVABLY below t. No-op when `minJaccard <= 0`.
    */
  private[graft] def lengthRatioPrefilter(
      pairs: DataFrame,
      shingles: DataFrame,
      minJaccard: Double
  ): DataFrame =
    if (minJaccard <= 0.0) pairs
    else {
      val counts = shingles.select(col("__id__"), size(col("__sg__")).as("__n__"))
      pairs
        .join(counts.select(col("__id__").as("id_a"), col("__n__").as("__na__")), Seq("id_a"))
        .join(counts.select(col("__id__").as("id_b"), col("__n__").as("__nb__")), Seq("id_b"))
        .where(least(col("__na__"), col("__nb__")).cast("double")
          >= lit(minJaccard) * greatest(col("__na__"), col("__nb__")).cast("double") - lit(1e-9))
        .drop("__na__", "__nb__")
    }

  /** Banded-LSH candidate pairs with exact n-gram Jaccard attached:
    * (id_a, id_b, n_band_matches, jac). The scale-true near-dup
    * verify composition — the quadratic stage only ever sees LSH
    * candidates, and each document is tokenized/shingled exactly once
    * (the shingle frame is persisted because it feeds both sides of
    * the pair join). The cleanup thunk releases both internal caches.
    *
    * `minJaccard > 0` turns on the [[lengthRatioPrefilter]] and makes
    * the output EXACTLY the candidate pairs with `jac >= minJaccard`
    * (the exact filter is applied after the verify, so the prefilter
    * is invisible in the result). The default 0.0 keeps the original
    * all-candidates contract.
    */
  def jaccardCandidatesWithCleanup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      maxBucketSize: Int = 1000,
      minJaccard: Double = 0.0
  ): (DataFrame, () => Unit) = {
    // ONE tokenize+shingle pass feeds both the MinHash signatures and
    // the exact-Jaccard verify joins (persisted: three consumers)
    val sh = shingleFrame(df, idCol, textCol, shingleWords)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the length-ratio bound is applied INSIDE the candidate bucket
    // join (minJaccard threaded down) — ratio-impossible pairs never
    // reach the pair groupBy, let alone the array joins below
    val (cands, cleanupCands) =
      minhashCandidatesFromShingles(sh, numHashes, bands, maxBucketSize, minJaccard)
    val verified = cands
      .join(sh.select(col("__id__").as("id_a"), col("__sg__").as("__sga__")), Seq("id_a"))
      .join(sh.select(col("__id__").as("id_b"), col("__sg__").as("__sgb__")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_band_matches"),
        jaccardOfShingleArrays(col("__sga__"), col("__sgb__")).as("jac"))
    val out = if (minJaccard > 0.0) verified.where(col("jac") >= minJaccard) else verified
    (out, () => { cleanupCands(); sh.unpersist(); () })
  }

  /** [[jaccardCandidatesWithCleanup]] without the cleanup handle. */
  def jaccardCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      maxBucketSize: Int = 1000
  ): DataFrame =
  {
    val (out, release) =
      jaccardCandidatesWithCleanup(df, idCol, textCol, shingleWords, numHashes, bands, maxBucketSize)
    graft.Cleanup.defer(release)
    out
  }

  /** End-to-end near-duplicate grouping: banded-LSH candidates,
    * exact Jaccard verification on the candidate pairs only, then
    * connected components over the verified edges. Every document
    * gets a `cluster` id = the minimum doc id in its near-dup group
    * (its own id if it has no near-duplicates). Keep one row per
    * cluster downstream to materialize the deduplicated corpus.
    */
  def nearDupGroups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      jaccardThreshold: Double,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      maxBucketSize: Int = 1000
  ): DataFrame =
  {
    val (out, release) =
      nearDupGroupsWithCleanup(df, idCol, textCol, jaccardThreshold, shingleWords, numHashes, bands, maxBucketSize)
    graft.Cleanup.deferFragile(release) // releases checkpoint blocks
    out
  }

  /** [[nearDupGroups]] plus a cleanup thunk releasing the connected-
    * components labels' checkpoint blocks (the LSH/shingle caches are
    * already released internally before return — the CC loop is eager,
    * so they are fully consumed by then). Call the thunk once the
    * cluster frame has been consumed / materialized downstream.
    */
  def nearDupGroupsWithCleanup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      jaccardThreshold: Double,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      maxBucketSize: Int = 1000
  ): (DataFrame, () => Unit) = {
    // minJaccard = the cluster threshold: the length-ratio prefilter
    // prunes provably-below-threshold candidate pairs BEFORE their
    // shingle arrays shuffle through the verify joins — the edge set
    // is identical (the bound is implied by `jac >= threshold`)
    val (verified, cleanup) =
      jaccardCandidatesWithCleanup(df, idCol, textCol, shingleWords, numHashes, bands, maxBucketSize,
        minJaccard = jaccardThreshold)
    // materialize the (tiny) verified edge list BEFORE handing it to
    // connectedComponents: CC's symmetrize step references the edges
    // twice (forward + swapped union), and an unmaterialized input
    // would run the whole LSH + Jaccard pipeline once per branch
    // inside that first job — measured ~2x the dominant phase
    val edges = verified
      .where(col("jac") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count()
    // connectedComponents is eager (its loop runs jobs), so the
    // internal caches have been fully consumed when it returns
    val (cc, releaseCc) = connectedComponentsWithCleanup(edges, "id_a", "id_b")
    edges.unpersist()
    cleanup()
    val out = df.select(col(idCol))
      .join(cc.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster"), col(idCol)).as("cluster"))
    (out, releaseCc)
  }

  /** Materialize the deduplicated corpus: one representative row per
    * near-dup cluster (all original columns plus `cluster`).
    *
    *  - `keepLongest = false` (default): representative = the
    *    minimum-id document. The cluster label IS that id, so this is
    *    a pure filter after the cluster join — no extra shuffle.
    *  - `keepLongest = true`: representative = the document with the
    *    longest `textCol` (ties to the smaller id) — one windowed
    *    rank partitioned by cluster.
    */
  def nearDupRepresentatives(
      df: DataFrame,
      idCol: String,
      textCol: String,
      jaccardThreshold: Double,
      keepLongest: Boolean = false,
      shingleWords: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    // callers that need both the cluster map AND the deduplicated
    // corpus should run nearDupGroupsWithCleanup once and feed its
    // output to nearDupRepresentativesFromClusters instead
    val clusters =
      nearDupGroups(df, idCol, textCol, jaccardThreshold, shingleWords, numHashes, bands, maxBucketSize)
    nearDupRepresentativesFromClusters(df, clusters, idCol, textCol, keepLongest)
  }

  /** Representative selection from a PRE-COMPUTED cluster frame (the
    * output shape of [[nearDupGroups]]: one (idCol, cluster) row per
    * document). Lets callers that need both the cluster map and the
    * deduplicated corpus run LSH + Jaccard + connected components
    * exactly once and derive both results — recomputing the whole
    * pipeline for each output doubles the dominant cost.
    */
  def nearDupRepresentativesFromClusters(
      df: DataFrame,
      clusters: DataFrame,
      idCol: String,
      textCol: String,
      keepLongest: Boolean = false
  ): DataFrame = {
    val joined = df.join(clusters, Seq(idCol))
    if (!keepLongest) joined.where(col(idCol) === col("cluster"))
    else {
      val w = Window.partitionBy(col("cluster")).orderBy(length(col(textCol)).desc, col(idCol).asc)
      joined
        .withColumn("__rn__", row_number().over(w))
        .where(col("__rn__") === 1)
        .drop("__rn__")
    }
  }

  /** Corpus-wide line deduplication (the CCNet/C4 paragraph-dedup
    * primitive): every non-blank line keeps only its FIRST occurrence
    * across the whole corpus — first = smallest (doc id, line index) —
    * and each document is rebuilt from its surviving lines in original
    * order (empty string if nothing survives). Boilerplate lines
    * (headers, cookie banners, nav text) disappear from every document
    * but the one that introduced them.
    *
    * Scale shape: one shuffle keyed on the line DIGEST (32-byte md5,
    * never line text) for the first-occurrence window, one shuffle on
    * doc id for the rebuild — both plain hash partitions; a
    * boilerplate line repeated a billion times lands on one key but
    * WindowGroupLimit keeps only rank 1 per partition map-side before
    * the reduce.
    */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      outCol: String = "text_dedup"
  ): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("__li__", "__line__")))
      .where(length(trim(col("__line__"))) > 0)
    val w = Window.partitionBy(md5(trim(col("__line__")))).orderBy(col(idCol).asc, col("__li__").asc)
    val kept = lines.withColumn("__rn__", row_number().over(w)).where(col("__rn__") === 1)
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__li__"), col("__line__")))).as("__ls__"))
      .select(col(idCol), concat_ws("\n", transform(col("__ls__"), x => x.getField("__line__"))).as(outCol))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(outCol), lit("")).as(outCol))
  }

  /** Embedding-cosine near-duplicate pairs within blocking keys.
    * `blockCols` bounds the quadratic stage (e.g. an LSH bucket or a
    * coarse cluster id); cosine is computed with codegen'd
    * zip_with/aggregate — no UDF.
    *
    * `maxBlockSize` is the hard bound the blocking key alone cannot
    * give: in a block larger than the cap, only the `maxBlockSize`
    * LOWEST-id rows participate in pairing (the [[semDedup]]
    * saturation rule — deterministic, and capped-out rows simply
    * emit no pairs), so no caller-chosen key can make the self-join
    * quadratic in the corpus. The rank filter shuffles on
    * `blockCols`, the key the pair join needs anyway, and Spark's
    * WindowGroupLimit caps each map partition's contribution at
    * `maxBlockSize` rows BEFORE the shuffle — a billion-row block
    * never funnels through one ranking task.
    *
    * The default cap (2^13 = 8192) budgets a saturated block at
    * C(8192, 2) ≈ 33.5M scored pairs — heavy but bounded work for
    * one shuffle partition; the old 100k default allowed ~5×10^9
    * pairs per block, a cap in name only. Raise it explicitly when a
    * genuinely larger per-block budget is intended.
    */
  val DefaultMaxBlockSize: Int = 1 << 13

  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCols: Seq[String],
      threshold: Double,
      maxBlockSize: Int = DefaultMaxBlockSize
  ): DataFrame = {
    // norms are per ROW, so compute them before the quadratic pair
    // stage — norm-inside-cosine would re-fold each vector once per
    // pair instead of once per row
    val withNorm = df.select(
      (blockCols.map(col) :+ col(idCol).as("__id__") :+ col(vecCol).as("__v__")
        :+ Similarity.norm(col(vecCol)).as("__n__")): _*)
      .withColumn("__blockrank__",
        row_number().over(
          Window.partitionBy(blockCols.map(col): _*).orderBy(col("__id__"))))
      .where(col("__blockrank__") <= maxBlockSize)
      .drop("__blockrank__")
    val a = withNorm.toDF((blockCols :+ "id_a" :+ "__va__" :+ "__na__"): _*)
    val b = withNorm.toDF((blockCols :+ "id_b" :+ "__vb__" :+ "__nb__"): _*)
    val cos = Similarity.dot(col("__va__"), col("__vb__")) / (col("__na__") * col("__nb__"))
    a.join(b, blockCols)
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", cos)
      .where(col("cosine") >= threshold)
      .select((blockCols.map(col) :+ col("id_a")) :+ col("id_b") :+ col("cosine"): _*)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication in embedding space. Rows are blocked into IVF
    * cells — nearest centroid from `centroids` when given (use a
    * fitted [[Similarity.kmeansCentroids]] frame), else the
    * `nlist`-sized md5-ordered draw of [[Similarity.ivfTopK]] — and
    * within a cell a row is a semantic duplicate if some lower-id
    * row's cosine similarity reaches `threshold` (min-id-survives,
    * this repo's deterministic stand-in for the paper's
    * keep-farthest-from-centroid tie-break). Returns the surviving
    * rows of `df` unchanged.
    *
    * Scale shape: the centroid set is tiny and broadcast; assignment
    * is one broadcast nested-loop plus a per-row top-1 window keyed
    * on the row id; the quadratic stage is confined to each cell
    * (~N/nlist rows — pick `nlist` so a cell's pairs fit a task, the
    * same contract as [[embeddingNearDups]]' blocking key); survivors
    * come back via one left_anti on the id. No all-pairs stage.
    *
    * `maxCellSize` bounds the quadratic stage: in a cell larger than
    * the cap, only the `maxCellSize` LOWEST-id rows participate in
    * duplicate detection (deterministic saturation — rows past the
    * cap all survive), so one hot cell can never make the
    * within-cell self-join quadratic in the corpus. Saturation, not
    * the LSH operators' drop-wholesale rule, because the over-cap
    * regime differs: an over-cap LSH bucket is a degenerate
    * signature, while EVERY cell goes over this cap when `nlist` is
    * undersized for the corpus — saturating still dedups each cell's
    * head instead of silently disabling the operator. Size `nlist`
    * ~ corpus/expected-cell (the SemDeDup paper uses k in the tens
    * of thousands at web scale) and prefer trained `centroids` over
    * the uniform draw: fitted cells are far better balanced.
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nlist: Int = 16,
      scoreDecimals: Int = 4,
      centroids: Option[DataFrame] = None,
      maxCellSize: Int = 100000
  ): DataFrame =
  {
    val (out, release) =
      semDedupWithCleanup(df, idCol, vecCol, threshold, nlist, scoreDecimals, centroids, maxCellSize)
    graft.Cleanup.defer(release)
    out
  }

  /** [[semDedup]] plus a cleanup thunk for the internal cell-
    * assignment cache: the assignment frame feeds BOTH sides of the
    * within-cell pair join, and without the persist barrier Catalyst
    * re-runs the broadcast centroid scoring and the top-1 window for
    * each side. The cache is (id, vector, norm, cent_id) — one row
    * per input row; release it once the result is materialized.
    */
  def semDedupWithCleanup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nlist: Int = 16,
      scoreDecimals: Int = 4,
      centroids: Option[DataFrame] = None,
      maxCellSize: Int = 100000
  ): (DataFrame, () => Unit) = {
    val cents = centroids.getOrElse(Similarity.ivfCentroids(df, idCol, vecCol, nlist))
    // hot-cell cap BEFORE the persist: the rank window shuffles on
    // cent_id, the very key the pair join below needs, so the capped
    // frame arrives at the join already co-partitioned
    val cells = Similarity.ivfAssign(df, cents, idCol, vecCol, "row", keep = 1, scoreDecimals)
      .withColumn("__cellrank__",
        row_number().over(Window.partitionBy(col("cent_id")).orderBy(col("row_id"))))
      .where(col("__cellrank__") <= maxCellSize)
      .drop("__cellrank__")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = cells.select(col("cent_id"), col("row_id").as("id_a"),
      col("__rowv__").as("__va__"), col("__rown__").as("__na__"))
    val b = cells.select(col("cent_id"), col("row_id").as("id_b"),
      col("__rowv__").as("__vb__"), col("__rown__").as("__nb__"))
    val dups = a.join(b, Seq("cent_id"))
      .where(col("id_a") < col("id_b"))
      .where(Similarity.dot(col("__va__"), col("__vb__")) / (col("__na__") * col("__nb__")) >= threshold)
      .select(col("id_b").as(idCol))
      .distinct()
    (df.join(dups, Seq(idCol), "left_anti"), () => { cells.unpersist(); () })
  }

  // ---- exact-substring self-dedup (Lee et al. 2021) ---------------

  /** Cross-document repeated-substring spans — the distributed form
    * of ExactSubstr dedup ("Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2021): every maximal region
    * whose `window`-char substrings occur MORE THAN ONCE in the
    * whole corpus (any doc, including the same one) is reported as
    * an excisable `(id, span_start, span_end)` character span,
    * 0-based, end exclusive.
    *
    * Where the paper builds a single-node suffix array, the
    * distributed equivalent is a grid of overlapping windows: at
    * `stride = 1` (the default) every offset is a window, so any
    * repeated substring of length >= `window` is caught exactly —
    * same guarantee, shuffle-shaped.
    *
    * ==Stride guarantee (the 100 TB knob)==
    * At `stride = s`, a repeated substring is DETECTED whenever (a)
    * its length is at least `window + s - 1` — within any `s`
    * consecutive offsets a grid start exists, so a full window fits
    * inside every occurrence — and (b) its occurrences' start
    * offsets are congruent mod `s`, so those in-repeat windows land
    * on the grid in BOTH copies (self-dedup slides the same grid
    * over both sides; contrast
    * [[Contamination.charWindowContaminatedIds]], whose eval side
    * enumerates every offset and therefore needs no congruence).
    * At `s = 1` both conditions are vacuous: every repeat >=
    * `window` is caught. Both bounds are pinned in PipelineSpec.
    * False positives never happen at any stride: candidates are
    * re-verified on the actual strings.
    *
    * Cost scales as 1/s: the grid is ~`window/s` x the corpus text
    * through one hash-shuffle. The 100 TB operating profile is
    * `window = 50, stride in [4, 8]` — detection of every
    * congruent repeat >= ~57 chars at 1/4-1/8 the stride-1 grid —
    * with `stride = 1` reserved for corpora that fit the budget or
    * for a second confirm pass over suspect documents.
    *
    * Scale shape: the corpus-wide duplicate test groups by an 8-byte
    * xxhash64 of each window (map-side combined — the wide window
    * STRINGS never shuffle); the surviving duplicate-hash set is
    * tiny and AQE broadcasts it back, so candidate filtering adds no
    * full-data shuffle; candidates (bounded by true duplication) are
    * then re-grouped by the actual string, so a hash collision can
    * never fabricate a span. Span assembly is one per-doc window
    * over candidate offsets (gaps-and-islands: a new span starts
    * where the next duplicated offset no longer overlaps
    * [o, o + window)). Docs shorter than `window` cannot carry a
    * qualifying span and are skipped at the scan.
    */
  def repeatedSubstringSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 50,
      stride: Int = 1
  ): DataFrame =
    spansFromWindows(df, windowGrid(df, idCol, textCol, window, stride), idCol, textCol, window)

  /** [[repeatedSubstringSpans]] with the window grid persisted for
    * the run: the grid feeds BOTH the duplicate-hash aggregate and
    * the candidate filter, and at stride 1 it is ~window x the
    * corpus text — recomputing it (and re-materializing every
    * window substring) doubles the dominant cost. Call the thunk
    * after the consuming action.
    */
  def repeatedSubstringSpansWithCleanup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 50,
      stride: Int = 1
  ): (DataFrame, () => Unit) = {
    val grid = windowGrid(df, idCol, textCol, window, stride)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (spansFromWindows(df, grid, idCol, textCol, window), () => { grid.unpersist(); () })
  }

  /** The hash grid: one `(id, offset, hash)` row per window, via the
    * codegen'd one-pass [[graft.plans.WindowHashesExpr]] kernel —
    * the `transform(sequence, substr(...))` form it replaces paid an
    * interpreted lambda AND a quadratic UTF8String scan (every
    * `substr(o+1, w)` call re-walks the codepoints from byte 0). No
    * window STRING exists anywhere in this frame: strings
    * materialize later, for candidates only.
    */
  private def windowGrid(
      df: DataFrame, idCol: String, textCol: String, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    df.where(col(textCol).isNotNull && length(col(textCol)) >= window)
      .select(col(idCol),
        posexplode(graft.internal.exprColumn(graft.plans.WindowHashesExpr(
          graft.internal.columnExpr(col(textCol)), window, stride))).as(Seq("__i__", "__h__")))
      .select(col(idCol), (col("__i__") * stride).as("__o__"), col("__h__"))
  }

  private def spansFromWindows(
      df: DataFrame, winRows: DataFrame, idCol: String, textCol: String, window: Int): DataFrame = {
    val dupHashes = winRows.groupBy(col("__h__"))
      .agg(count(lit(1)).as("__c__")).where(col("__c__") > 1).select(col("__h__"))
    val cand = winRows.join(dupHashes, Seq("__h__")).select(col(idCol), col("__o__"))
    // exact verify: materialize the candidate windows' STRINGS (and
    // only theirs) by fetching each candidate's text from the corpus
    // — a hash collision can never fabricate a span
    val withW = cand
      .join(df.select(col(idCol), col(textCol).as("__t__")), Seq(idCol))
      .select(col(idCol), col("__o__"), col("__t__").substr(col("__o__") + 1, lit(window)).as("__w__"))
    // one count-over-window on the string replaces an aggregate +
    // self-join: the join form planned the whole candidate branch
    // (grid scan + duplicate-hash aggregate) TWICE — once per
    // consumer. Counting inside the candidate set is exact: a string
    // duplicated anywhere in the corpus has equal hashes, so every
    // occurrence is already a candidate.
    val confirmed = withW
      .withColumn("__wc__", count(lit(1)).over(Window.partitionBy(col("__w__"))))
      .where(col("__wc__") > 1)
      .select(col(idCol), col("__o__"))
    val wnd = Window.partitionBy(col(idCol)).orderBy(col("__o__"))
    confirmed
      .withColumn("__brk__",
        when(col("__o__") - lag(col("__o__"), 1).over(wnd) <= window, 0).otherwise(1))
      .withColumn("__grp__", sum(col("__brk__")).over(
        wnd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__grp__"))
      .agg(min(col("__o__")).cast("long").as("span_start"),
        (max(col("__o__")) + window).cast("long").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  private val exciseUdf = udf((text: String, spans: Seq[org.apache.spark.sql.Row]) => {
    if (text == null) null
    else if (spans == null || spans.isEmpty) text
    else {
      // java.lang.StringBuilder: the (CharSequence, from, to) append
      // exists there — Scala's would auto-tuple the 3 args into one
      val sb = new java.lang.StringBuilder
      var pos = 0
      for (r <- spans) {
        val s = math.min(math.max(r.getLong(0).toInt, pos), text.length)
        val e = math.min(math.max(r.getLong(1).toInt, s), text.length)
        sb.append(text, pos, s)
        pos = e
      }
      sb.append(text, pos, text.length)
      sb.toString
    }
  })

  /** The corpus with every [[repeatedSubstringSpans]] region excised
    * from `textCol` (appended as `<textCol>_clean`): the Lee et al.
    * remove-the-duplicated-bytes policy. Spans are disjoint and
    * sorted by construction; excision is a scalar per-row splice (no
    * Catalyst builtin exists for multi-span string surgery — same
    * argument as the robots/href UDFs).
    */
  def stripRepeatedSubstrings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 50,
      stride: Int = 1
  ): DataFrame = {
    val spans = repeatedSubstringSpans(df, idCol, textCol, window, stride)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end")))).as("__spans__"))
    df.join(spans, Seq(idCol), "left")
      .withColumn(s"${textCol}_clean", exciseUdf(col(textCol), col("__spans__")))
      .drop("__spans__")
  }
}
