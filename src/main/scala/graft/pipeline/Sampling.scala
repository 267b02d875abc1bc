package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Both are pure functions of the row keys — no RNG state, so a
  * sample is reproducible across runs, engines, partitionings, and
  * retries (a failed task re-executes to the identical subset). At
  * 100 TB that determinism is what makes a sample auditable: the
  * exact corpus a model trained on can be reconstructed from the
  * key columns and the parameters alone.
  */
object Sampling {

  /** Lexicographic md5-hex threshold for a fraction in [0, 1]: md5
    * hashes are uniform over [0, 16^32), so keeping rows whose hex
    * digest sorts below `hex(fraction * 16^32)` keeps ~fraction of
    * them. 16 hex digits of precision (~1e-19 granularity), padded
    * to compare against full 32-digit digests.
    */
  def fractionThresholdHex(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    if (fraction >= 1) "g" // sorts above every hex digest
    else {
      val scaled = BigDecimal(fraction) * BigDecimal(BigInt(16).pow(16))
      val hex = scaled.toBigInt.toString(16)
      ("0" * (16 - hex.length)) + hex
    }
  }

  /** Deterministic Bernoulli sample: keep a row iff
    * `md5(keys ++ salt)` sorts below the fraction threshold. A pure
    * codegen'd filter — pushes all the way down to the scan, no
    * shuffle, no RNG. Different `salt`s draw independent samples
    * (e.g. train/validation splits: disjoint salts, or split one
    * hash range into bands).
    */
  def deterministicSample(
      df: DataFrame,
      keyCols: Seq[String],
      fraction: Double,
      salt: String = ""
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    df.where(keyDigest(keyCols, salt) < lit(fractionThresholdHex(fraction)))
  }

  /** md5 over the separator-joined, null-sentineled key columns plus
    * salt — the shared hash of [[deterministicSample]] and
    * [[assignSplit]], so bands drawn by one compose with samples
    * drawn by the other. The unit separator keeps ("AB","C") and
    * ("A","BC") apart; the explicit null sentinel is needed because
    * concat_ws silently SKIPS null elements, which would otherwise
    * collapse ("a", NULL) and (NULL, "a") into one key with
    * correlated decisions.
    */
  private def keyDigest(keyCols: Seq[String], salt: String): Column =
    md5(concat_ws("\u0001",
      (keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0000null"))) :+ lit(salt)): _*))

  /** Deterministic multi-way split (train/validation/test): adds a
    * `split` column assigning each row to the FIRST band whose
    * cumulative hash threshold exceeds `md5(keys ++ salt)`. Same
    * hash family as [[deterministicSample]], so splits are disjoint
    * by construction, reproducible across runs/engines/retries, and
    * a pure codegen filter (no shuffle, no RNG). Fractions must sum
    * to <= 1; rows above the last threshold get the `rest` label
    * (empty-string label drops them from every split).
    */
  def assignSplit(
      df: DataFrame,
      keyCols: Seq[String],
      fractions: Seq[(String, Double)],
      salt: String = "",
      rest: String = "rest"
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-12,
      "fractions must be non-empty and sum to <= 1")
    val digest = keyDigest(keyCols, salt)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val assign = fractions.zip(cum).foldRight(lit(rest): Column) {
      case (((name, _), cumFrac), tail) =>
        when(digest < lit(fractionThresholdHex(math.min(cumFrac, 1.0))), lit(name)).otherwise(tail)
    }
    df.withColumn("split", assign)
  }

  /** Deterministic domain-mixture resampling: emit each row
    * `weights(group)` times in expectation — the "data mixture"
    * primitive that up/down-weights sources (e.g. wiki 3.0x, web
    * 0.5x) for training. A weight's integer part duplicates the row
    * that many times (a `copy` index column distinguishes epochs);
    * the fractional part is a [[deterministicSample]] draw from the
    * same hash family, so mixtures compose with samples and splits.
    * Groups absent from `weights` get `defaultWeight`.
    *
    * Scale shape: a literal `when`-chain threshold per group plus one
    * `explode` of a tiny int sequence — no shuffle, no RNG, no join
    * against a weights table (mixtures have a handful of sources; a
    * thousand-entry chain is still a cheap codegen'd expression).
    * Down-weighting (all weights < 1) degenerates to a pure
    * scan-pushable filter with `copy` constantly 0.
    */
  def mixtureSample(
      df: DataFrame,
      groupCol: String,
      weights: Map[String, Double],
      keyCols: Seq[String],
      salt: String = "",
      defaultWeight: Double = 1.0
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0), "weights must be >= 0")
    val digest = keyDigest(keyCols, salt)
    def copiesFor(w: Double): Column = {
      val whole = math.floor(w).toLong
      lit(whole) + when(digest < lit(fractionThresholdHex(w - whole)), lit(1L)).otherwise(lit(0L))
    }
    // sorted for a deterministic chain order; the final otherwise
    // carries the default weight
    val copies = weights.toSeq.sortBy(_._1).foldRight(copiesFor(defaultWeight)) {
      case ((g, w), tail) => when(col(groupCol) === lit(g), copiesFor(w)).otherwise(tail)
    }
    // sequence(0, copies - 1) with copies = 0 would be the DESCENDING
    // sequence [0, -1] (the same trap shinglesFromWords guards), so
    // zero-copy rows take the empty array, which explode then drops.
    df.withColumn("copy",
      explode(when(copies > 0, sequence(lit(0L), copies - 1)).otherwise(array())))
  }

  /** Concat-and-chunk sequence packing: documents are concatenated in
    * a deterministic pseudo-random order (the [[deterministicSample]]
    * hash of the id, so packing is reproducible and key-shufflable by
    * salt) and the token stream is chunked every `capacity` tokens.
    * Returns (idCol, lengthCol, pack_id, pack_offset): the chunk the
    * document STARTS in and its token offset within that chunk — a
    * document whose length crosses a boundary continues into the
    * following pack(s), exactly like GPT-style pretraining packing.
    *
    * Scale shape — the naive formulation is a running total over one
    * global window, i.e. every row through a single task; this one is
    * the standard distributed prefix sum instead: rows hash into 256
    * DATA-DERIVED range buckets (first two hex chars of the order
    * digest, so bucketing is reproducible and partition-layout
    * independent), a windowed cumsum runs inside each bucket (one
    * shuffle, 1/256th of the data per task), per-bucket totals
    * (256 rows) prefix-sum on the driver side of a broadcast join,
    * and each row's global start is bucket offset + local cumsum.
    * Costs one full-data shuffle plus one tiny aggregation — no
    * single-partition stage anywhere.
    *
    * `idCol` must be unique per row (it is the total-order
    * tiebreak); rows replicated by [[mixtureSample]] should pack on
    * a composite key, e.g. `concat_ws(":", col(id), col("copy"))`.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      lengthCol: String,
      capacity: Long,
      salt: String = ""
  ): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val keyed = df.select(
      col(idCol), col(lengthCol),
      keyDigest(Seq(idCol), salt).as("__ok__"))
      .withColumn("__bkt__", substring(col("__ok__"), 1, 2))
    val w = Window.partitionBy(col("__bkt__"))
      .orderBy(col("__ok__").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("__cum__", sum(col(lengthCol)).over(w))
    // 256-row frame: total tokens per bucket -> exclusive prefix sum
    // over bucket order. Tiny, so the single-partition window and the
    // broadcast are both free.
    val wb = Window.orderBy(col("__bkt__").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = keyed.groupBy(col("__bkt__"))
      .agg(sum(col(lengthCol)).as("__btot__"))
      .withColumn("__boff__", sum(col("__btot__")).over(wb) - col("__btot__"))
      .select(col("__bkt__"), col("__boff__"))
    // `/` on longs is double division in Spark; dividing the exact
    // multiple (start - start % capacity) keeps the quotient integral
    // and hence exact in double up to 2^53 total tokens (9 petatokens).
    val start = col("__boff__") + col("__cum__") - col(lengthCol)
    local.join(broadcast(offsets), Seq("__bkt__"))
      .withColumn("__start__", start)
      .select(
        col(idCol), col(lengthCol),
        ((col("__start__") - col("__start__") % capacity) / capacity)
          .cast("long").as("pack_id"),
        (col("__start__") % capacity).as("pack_offset"))
  }

  /** Deterministic global shuffle rank — the reproducible corpus
    * permutation a training-data export needs (fixed read order
    * across runs/engines/retries; a different `salt` = a different
    * epoch's permutation): rank in [0, n) by the md5 order of
    * (keys, salt), the [[deterministicSample]]/[[assignSplit]] hash
    * family.
    *
    * Scale shape: NOT a global sort funnel — the [[packSequences]]
    * distributed prefix sum with unit lengths: 256 digest-prefix
    * buckets (hash-uniform by construction), a per-bucket window
    * rank, and a 256-row exclusive bucket-offset sum broadcast back.
    * The corpus never routes through one task; the plan is
    * bucket-partitioned end to end.
    */
  def shuffleRank(
      df: DataFrame,
      keyCols: Seq[String],
      salt: String = "",
      outCol: String = "shuffle_rank"
  ): DataFrame = {
    val keyed = df.withColumn("__ok__", keyDigest(keyCols, salt))
      .withColumn("__bkt__", substring(col("__ok__"), 1, 2))
    val w = Window.partitionBy(col("__bkt__"))
      .orderBy((col("__ok__").asc +: keyCols.map(col(_).asc)): _*)
    val local = keyed.withColumn("__r__", row_number().over(w))
    val wb = Window.orderBy(col("__bkt__").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = keyed.groupBy(col("__bkt__")).agg(count(lit(1)).as("__btot__"))
      .withColumn("__boff__", sum(col("__btot__")).over(wb) - col("__btot__"))
      .select(col("__bkt__"), col("__boff__"))
    local.join(broadcast(offsets), Seq("__bkt__"))
      .withColumn(outCol, (col("__boff__") + col("__r__") - 1).cast("long"))
      .drop("__ok__", "__bkt__", "__r__", "__boff__")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling",
    * arXiv:2302.03169): score raw-corpus documents by how target-like
    * their hashed n-gram distribution is. Features are the unigrams +
    * bigrams of the lowercased whitespace tokenization ([[Dedup
    * .splitWords]], empty tokens dropped), hashed into `buckets`
    * buckets — uint32 of the first 8 md5 hex chars mod `buckets`,
    * reproducible in any engine with md5, like the LSH plane matrix.
    * Bag-of-buckets models with add-one smoothing are fit on each
    * side, and a document's log importance weight is
    *
    *   logw(d) = sum over grams g of d of
    *             [ ln p_target(bucket(g)) - ln p_raw(bucket(g)) ]
    *
    * Keep the highest-logw documents (or feed `logw` through a
    * deterministic threshold) to resample the corpus toward the
    * target distribution. Documents with no grams (null/empty text)
    * score 0.
    *
    * Scale shape: the two bucket-count aggregations are map-side
    * combinable hash aggs whose shuffles carry at most `buckets` rows
    * per task; the bucket -> log-ratio table is `buckets` rows,
    * assembled against an in-plan spine (missing buckets count 0) and
    * BROADCAST into the scoring join; scoring then re-aggregates to
    * one row per document. No driver collect, no all-pairs stage; the
    * only non-expression step is the shared native shingle loop.
    */
  def dsirLogWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 256
  ): DataFrame =
  {
    val (out, release) = dsirLogWeightsWithCleanup(raw, target, idCol, textCol, buckets)
    graft.Cleanup.defer(release)
    out
  }

  /** [[dsirLogWeights]] plus a cleanup thunk for the internal
    * per-(doc, bucket) count cache. The raw corpus feeds BOTH the
    * bucket model and the scoring pass; without a persist barrier
    * each consumer would re-run the tokenize + shingle + md5 pass
    * over the whole corpus (the dominant cost — a self-referencing
    * plan is recomputed per subtree, ReuseExchange does not apply).
    * The cached frame is already aggregated to at most
    * min(`buckets`, distinct grams) rows per document — bounded,
    * unlike the raw gram stream. Release after the result is
    * materialized.
    */
  def dsirLogWeightsWithCleanup(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 256
  ): (DataFrame, () => Unit) = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // the shared hashed-n-gram feature space (one definition for DSIR
    // and the linear classifier — see Features)
    def withGrams(df: DataFrame): DataFrame = Features.withGrams(df, idCol, textCol)
    def bucketOf(g: Column): Column = Features.bucketOf(g, buckets)
    // ONE tokenize pass over the raw corpus: per-(doc, bucket) gram
    // counts, shared by the model aggregation and the scoring join
    val rawDocBuckets = withGrams(raw)
      .select(col("__id__"), explode(col("__gs__")).as("__g__"))
      .select(col("__id__"), bucketOf(col("__g__")).as("__b__"))
      .groupBy(col("__id__"), col("__b__"))
      .agg(count(lit(1)).as("__c__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted: consumed by its total AND the log-ratio assembly —
    // without the barrier the target tokenize + shingle pass ran twice
    // (r20 opt); the cached frame is at most `buckets` rows
    val tCnt = withGrams(target)
      .select(explode(col("__gs__")).as("__g__"))
      .select(bucketOf(col("__g__")).as("__b__"))
      .groupBy(col("__b__"))
      .agg(count(lit(1)).as("__c__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rCnt = rawDocBuckets.groupBy(col("__b__")).agg(sum(col("__c__")).as("__c__"))
    // totals as broadcast scalar aggs (the tfIdf corpus-size pattern)
    val tTot = broadcast(tCnt.agg(coalesce(sum(col("__c__")), lit(0L)).cast("double").as("__tt__")))
    val rTot = broadcast(rCnt.agg(coalesce(sum(col("__c__")), lit(0L)).cast("double").as("__rt__")))
    val spine = raw.sparkSession.range(buckets).select(col("id").cast("int").as("__b__"))
    val logRatio = broadcast(
      spine
        .join(tCnt.withColumnRenamed("__c__", "__ct__"), Seq("__b__"), "left")
        .join(rCnt.withColumnRenamed("__c__", "__cr__"), Seq("__b__"), "left")
        .crossJoin(tTot)
        .crossJoin(rTot)
        .select(col("__b__"),
          (log((coalesce(col("__ct__"), lit(0L)) + lit(1.0)) / (col("__tt__") + lit(buckets.toDouble))) -
            log((coalesce(col("__cr__"), lit(0L)) + lit(1.0)) / (col("__rt__") + lit(buckets.toDouble)))).as("__lr__")))
    // per-doc score = sum over buckets of count * logratio (grouping
    // the per-gram sum by bucket first — same value, and the scoring
    // join probes `buckets`-bounded rows per doc instead of every gram)
    val scores = rawDocBuckets
      .join(logRatio, Seq("__b__"))
      .groupBy(col("__id__"))
      .agg(sum(col("__c__") * col("__lr__")).as("logw"))
    val out = raw.select(col(idCol))
      .join(scores.withColumnRenamed("__id__", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("logw"), lit(0.0)).as("logw"))
    (out, () => { rawDocBuckets.unpersist(); tCnt.unpersist(); () })
  }

  /** Keep at most `n` rows per group, chosen deterministically by
    * `orderCols` (pass a hash column for an unbiased cap, or e.g. a
    * quality score to keep the best). The standard "cap documents
    * per domain" primitive: one shuffle on the group keys; Spark 4
    * rewrites the rank filter to WindowGroupLimit, so each partition
    * retains only n rows per group map-side — no full sort of the
    * group spills.
    */
  def capPerGroup(
      df: DataFrame,
      byvars: Seq[String],
      n: Int,
      orderCols: Seq[Column]
  ): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must define a deterministic preference order")
    val w = Window.partitionBy(byvars.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn__", row_number().over(w))
      .where(col("__rn__") <= n)
      .drop("__rn__")
  }
}
