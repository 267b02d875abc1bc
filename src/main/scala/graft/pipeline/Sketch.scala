package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-memory sketches for corpus-scale statistics. Unlike HLL
  * (whose register layout differs per engine, so results can't be
  * oracle-compared), the KMV (k-minimum-values) estimator is a pure
  * ORDER — the k smallest md5 hashes of the distinct values — making
  * it deterministic, mergeable, and bit-for-bit reproducible in any
  * engine with md5: the graft recipe for fitted/approximate results.
  */
object Sketch {

  /** 16^15 — the denominator normalizing a 15-hex-char prefix to
    * [0, 1). 15 chars = 60 bits, exact in both Long and double-free
    * integer arithmetic on every engine.
    */
  private val HexDenom = 1152921504606846976.0

  /** Per-group approximate distinct count of `valueCol` by KMV:
    * hash every distinct value to md5, keep each group's k smallest
    * hashes, and estimate
    *
    *   distinct ~= (k - 1) / frac(kth smallest hash)
    *
    * where frac maps the first 15 hex chars to [0, 1). Groups with
    * FEWER than k distinct values report the exact count (the sketch
    * holds every hash). Standard error ~ 1/sqrt(k-2). NULL values
    * are excluded from the count (a null hashes to a null md5, which
    * Spark's ASC window order would slot FIRST while DuckDB slots it
    * last — dropping it keeps the sketch engine-portable and matches
    * COUNT(DISTINCT)'s null stance).
    *
    * Scale shape: one (group, hash)-keyed distinct (map-side
    * combined), one per-group window rank that WindowGroupLimit
    * prunes to k rows per group map-side, one tiny per-group agg —
    * the full value set never concentrates anywhere, and the state
    * per group is k 32-char strings regardless of corpus size.
    * Estimates round to `decimals` so the single double division is
    * hash-comparable across engines.
    */
  def kmvDistinctByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int,
      decimals: Int = 4
  ): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val gcols = groupCols.map(col)
    val hashes = df
      .select(gcols :+ md5(col(valueCol).cast("string")).as("__h__"): _*)
      .where(col("__h__").isNotNull)
      .distinct()
    val w = Window.partitionBy(gcols: _*).orderBy(col("__h__").asc)
    hashes
      .withColumn("__r__", row_number().over(w))
      .where(col("__r__") <= k)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("__n__"), max(col("__h__")).as("__kth__"))
      .select(gcols ++ Seq(
        when(col("__n__") < k, col("__n__").cast("double"))
          .otherwise(round(lit(k - 1) /
            (conv(substring(col("__kth__"), 1, 15), 16, 10).cast("long") / lit(HexDenom)),
            decimals))
          .as("distinct_est")): _*)
  }

  /** Whole-frame [[kmvDistinctByGroup]]: one row, `distinct_est`. */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int, decimals: Int = 4): DataFrame =
    kmvDistinctByGroup(df.withColumn("__g__", lit(1)), Seq("__g__"), valueCol, k, decimals)
      .drop("__g__")

  /** KMV set algebra: union / intersection / Jaccard estimates for
    * every PAIR of `groupCol` slices, from the slices' mergeable KMV
    * states alone — the corpus is touched once (the per-slice
    * sketches), and everything after is sketch-sized (k rows per
    * slice) regardless of corpus size.
    *
    * Merging two KMV sketches = the k smallest hashes of their hash-
    * set union, which is itself the valid KMV sketch of the slice
    * union (the k smallest hashes of A union B are all necessarily
    * held in A's or B's own k smallest). Over that merged sketch:
    *
    *   union_est ~= (k - 1) / frac(kth)       (exact count when < k)
    *   jaccard   ~= |{h in merged-k : h in A and h in B}| / |merged-k|
    *   inter_est  = jaccard * union_est
    *
    * (Beyer et al., SIGMOD 2007 — KMV synopses for distinct-value
    * queries under multiset operations.) Deterministic and engine-
    * portable like [[kmvDistinctByGroup]], where theta/HLL sketches
    * are not: the oracle replays every estimate bit-for-bit.
    *
    * Scale shape: one corpus-wide distinct + WindowGroupLimit-pruned
    * rank builds the slice sketches (k rows per slice survive
    * map-side); the pair scaffold, membership union, merged rank and
    * final agg all run over O(pairs x k) rows — broadcast-sized
    * frames even at thousands of slices.
    *
    * Output: `(group_a, group_b, union_est, inter_est, jaccard)`,
    * one row per unordered pair with `group_a < group_b`.
    */
  /** Deterministic count-min sketch of `valueCol` frequencies:
    * `d` hash rows x `w` buckets, the bucket of value v in row r
    * being the first 8 hex chars of md5("r:v") mod w — engine-
    * portable bucketing, no RNG state, the same fitted-result rule
    * as every sketch here. The state is AT MOST d*w rows however
    * large the corpus (one map-side-combined hash aggregate builds
    * it), it merges bucket-wise by +, and lookups over-count only:
    * est(v) = min over rows of v's bucket count >= true count, with
    * err <= e/w * N at probability 1 - (1/e)^d (Cormode & Muthu,
    * 2005). Where [[kmvDistinctByGroup]] answers "how many
    * distinct", this answers "how often does THIS value occur"
    * without holding the distinct domain anywhere.
    */
  def countMinSketch(df: DataFrame, valueCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1 hash rows and w >= 2 buckets, got d=$d w=$w")
    val rows = explode(array((0 until d).map(r =>
      struct(lit(r).as("__r__"), cmsBucket(r, col(valueCol), w).as("__b__"))): _*))
    df.where(col(valueCol).isNotNull)
      .select(rows.as("__rb__"))
      .groupBy(col("__rb__.__r__").as("row_id"), col("__rb__.__b__").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  private def cmsBucket(r: Int, v: Column, w: Int): Column =
    conv(substring(md5(concat(lit(s"$r:"), v.cast("string"))), 1, 8), 16, 10)
      .cast("long") % w

  /** Point lookups against a [[countMinSketch]]: the estimate for
    * each (non-null, distinct) value of `candidates(valueCol)` is
    * the MIN over the d rows of its bucket's count; values whose
    * buckets were never touched read 0. The candidate frame drives
    * the cost — the sketch side is d*w rows and broadcasts.
    */
  def cmsLookup(
      sketch: DataFrame,
      candidates: DataFrame,
      valueCol: String,
      d: Int,
      w: Int
  ): DataFrame = {
    val cand = candidates.select(col(valueCol).cast("string").as(valueCol))
      .where(col(valueCol).isNotNull)
      .distinct()
    val probes = cand.select(col(valueCol), explode(array((0 until d).map(r =>
      struct(lit(r).as("row_id"), cmsBucket(r, col(valueCol), w).as("bucket"))): _*)).as("__p__"))
      .select(col(valueCol), col("__p__.row_id").as("row_id"), col("__p__.bucket").as("bucket"))
    probes
      .join(broadcast(sketch), Seq("row_id", "bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }

  /** Deterministic Bloom filter over `valueCol` (Bloom 1970 — the
    * crawl-frontier / seen-set primitive): value v sets the `hashes`
    * bit positions md5("j:v") mod `mBits`, packed 64 bits per word
    * into AT MOST mBits/64 `(word, bits)` rows by one bit_or hash
    * aggregate. Same engine-portable md5 bucketing as
    * [[countMinSketch]] — no RNG, so an external engine replays the
    * exact bit pattern. Merge filters of equal (mBits, hashes) by
    * unioning and re-OR-ing. NO FALSE NEGATIVES by construction;
    * false-positive rate ~ (1 - e^(-kn/m))^k.
    */
  def bloomBuild(df: DataFrame, valueCol: String, mBits: Int, hashes: Int): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(hashes >= 1, s"need at least one hash, got $hashes")
    df.where(col(valueCol).isNotNull)
      .select(explode(array((0 until hashes).map(j =>
        bloomPos(j, col(valueCol), mBits)): _*)).as("__p__"))
      .select((col("__p__") / 64).cast("long").as("word"),
        expr("shiftleft(1L, CAST(__p__ % 64 AS INT))").as("__m__"))
      .groupBy(col("word"))
      .agg(expr("bit_or(__m__)").as("bits"))
  }

  private def bloomPos(j: Int, v: Column, mBits: Int): Column =
    conv(substring(md5(concat(lit(s"$j:"), v.cast("string"))), 1, 8), 16, 10)
      .cast("long") % mBits

  /** Membership probes against a [[bloomBuild]] filter: `maybe_seen`
    * is true iff ALL `hashes` bit positions of the value are set.
    * Inserted values always read true; an unseen value reads true
    * only on a full k-fold collision. The probe frame drives the
    * cost — the filter side is <= mBits/64 rows and broadcasts.
    */
  def bloomProbe(
      bloom: DataFrame,
      probes: DataFrame,
      valueCol: String,
      mBits: Int,
      hashes: Int
  ): DataFrame = {
    val cand = probes.select(col(valueCol).cast("string").as(valueCol))
      .where(col(valueCol).isNotNull)
      .distinct()
    cand
      .select(col(valueCol), explode(array((0 until hashes).map(j =>
        bloomPos(j, col(valueCol), mBits)): _*)).as("__p__"))
      .select(col(valueCol), (col("__p__") / 64).cast("long").as("word"),
        expr("shiftleft(1L, CAST(__p__ % 64 AS INT))").as("__m__"))
      .join(broadcast(bloom), Seq("word"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("bits").bitwiseAND(col("__m__")) =!= 0L, lit(false)))
        .as("maybe_seen"))
  }

  def kmvOverlapByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int,
      decimals: Int = 4
  ): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val sk = df
      .select(col(groupCol).as("__g__"), md5(col(valueCol).cast("string")).as("__h__"))
      .where(col("__h__").isNotNull)
      .distinct()
      .withColumn("__r__", row_number().over(Window.partitionBy(col("__g__")).orderBy(col("__h__").asc)))
      .where(col("__r__") <= k)
      .select(col("__g__"), col("__h__"))
    val groups = sk.select(col("__g__")).distinct()
    val pairs = groups.select(col("__g__").as("group_a"))
      .join(groups.select(col("__g__").as("group_b")), col("group_a") < col("group_b"))
    // membership-tagged union of the two slice sketches, equi-joined
    // per side (never an OR-join: each side broadcasts cleanly)
    val ua = pairs.join(sk.withColumnRenamed("__g__", "group_a"), Seq("group_a"))
      .select(col("group_a"), col("group_b"), col("__h__"), lit(1).as("__ina__"), lit(0).as("__inb__"))
    val ub = pairs.join(sk.withColumnRenamed("__g__", "group_b"), Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("__h__"), lit(0).as("__ina__"), lit(1).as("__inb__"))
    val merged = ua.unionByName(ub)
      .groupBy(col("group_a"), col("group_b"), col("__h__"))
      .agg(max(col("__ina__")).as("__ina__"), max(col("__inb__")).as("__inb__"))
      .withColumn("__r__", row_number().over(
        Window.partitionBy(col("group_a"), col("group_b")).orderBy(col("__h__").asc)))
      .where(col("__r__") <= k)
    val agg = merged
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("__n__"), max(col("__h__")).as("__kth__"),
        sum(when(col("__ina__") === 1 && col("__inb__") === 1, 1).otherwise(0)).as("__both__"))
    val unionEst = when(col("__n__") < k, col("__n__").cast("double"))
      .otherwise(round(lit(k - 1) /
        (conv(substring(col("__kth__"), 1, 15), 16, 10).cast("long") / lit(HexDenom)),
        decimals))
    // inter = both * union / n, multiplied BEFORE dividing: when the
    // merged sketch is exhaustive (n < k) this cancels exactly
    // (5 * 15 / 15 = 5), where jaccard_rounded * union would smear
    // the exact answer (0.3333 * 15 = 4.9995)
    agg.select(col("group_a"), col("group_b"),
      unionEst.as("union_est"),
      round(col("__both__") * unionEst / col("__n__").cast("double"), decimals).as("inter_est"),
      round(col("__both__") / col("__n__").cast("double"), decimals).as("jaccard"))
  }
}
