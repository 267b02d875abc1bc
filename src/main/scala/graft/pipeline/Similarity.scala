package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (query set × corpus — fine when
  * the query side is small enough to broadcast). Scale path:
  * sign-random-projection LSH bucketing so the join only touches
  * matching buckets; recall is tuned with `planes` (bucket
  * granularity) and multi-probe is achieved by repeating with
  * different seeds and unioning.
  *
  * All vector math is codegen'd zip_with/aggregate over Array columns
  * — no UDF, no driver collect.
  */
object Similarity {

  /** Dot product of two numeric-array columns — the native Catalyst
    * expression ([[graft.plans.DotProductExpr]]): a codegen'd
    * primitive loop with the same left-to-right accumulation order as
    * [[dotExpr]], so results are bit-identical FOR `array<double>`
    * inputs, while skipping the interpreted per-element lambda cost
    * every vector operator was paying (Spark never codegens HOFs).
    * Other numeric arrays are cast to `array<double>` up front (a
    * no-op for double columns), so a float-array input multiplies in
    * exact double precision here where the HOF form multiplied in
    * float first — this path can differ from [[dotExpr]] in low-order
    * bits (every in-repo caller pre-casts to double, where the two
    * are bit-identical).
    */
  def dot(a: Column, b: Column): Column =
    graft.internal.exprColumn(graft.plans.DotProductExpr(
      graft.internal.columnExpr(a.cast("array<double>")),
      graft.internal.columnExpr(b.cast("array<double>"))))

  /** [[dot]] WITHOUT the `array<double>` pre-cast — for sides that
    * are already `array<double>` or int8 code arrays
    * (`array<tinyint>`). Byte sides dot in their stored 1-byte form
    * ([[graft.plans.DotProductExpr]] dispatches per element type;
    * exact — products ≤ 127², sums ≪ 2^53), which is the point: the
    * int8 ANN scoring joins and shuffles carry codes at 1 byte per
    * component instead of the 8 bytes an up-front cast would inflate
    * them to.
    */
  def dotRaw(a: Column, b: Column): Column =
    graft.internal.exprColumn(graft.plans.DotProductExpr(
      graft.internal.columnExpr(a), graft.internal.columnExpr(b)))

  /** Norm over an uncast (double or int8-code) array — see [[dotRaw]]. */
  def normRaw(a: Column): Column = sqrt(dotRaw(a, a))

  /** Drops rows whose vector has zero norm. Cosine is undefined for
    * the zero vector: Spark's double divide-by-zero yields null,
    * DuckDB's IEEE division yields NaN, and either can occupy top-k
    * slots when candidates are scarce — so every top-k entry point
    * excludes zero vectors from BOTH sides up front, and the oracle
    * SQL applies the same filter. (An all-zero embedding is a
    * degenerate/corrupt row in any real corpus; dropping it is the
    * defined contract, not a silent repair.)
    *
    * NaN-bearing vectors are excluded EXPLICITLY (r16): both Spark
    * and DuckDB order NaN GREATER than every number, so a bare
    * `dot > 0` keeps a NaN vector — and its NaN cosine would then
    * rank ABOVE every real neighbor in the (score desc) top-k window,
    * serving garbage first. Same degenerate-row contract as the zero
    * vector; the oracle SQL applies the same `NOT isnan` filter.
    */
  private[pipeline] def dropZeroVectors(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.where(dot(v, v) > 0.0d && !isnan(dot(v, v)))
  }

  /** The interpreted HOF form of [[dot]] — kept as the spec the
    * DuckDB oracle mirrors (`list_dot_product` / explicit fold),
    * pinned bit-identical to the native form in PipelineSpec.
    */
  def dotExpr(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each row of `queries`, the `k`
    * nearest corpus rows. Ranking uses (rounded score desc, id asc)
    * so results are stable across engines at float-epsilon level.
    *
    * Broadcast the query side (it is the small one by construction).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      scoreDecimals: Int = 4
  ): DataFrame = {
    // norms staged per row, not per (query, corpus) pair
    val q = broadcast(
      dropZeroVectors(queries, vecCol).select(col(idCol).as("query_id"), col(vecCol).as("__qv__"),
        norm(col(vecCol)).as("__qn__"))
    )
    val c = dropZeroVectors(corpus, vecCol).select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv__"),
      norm(col(vecCol)).as("__cn__"))
    val scored = q
      .crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        round(dot(col("__qv__"), col("__cv__")) / (col("__qn__") * col("__cn__")), scoreDecimals))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** Symmetric int8 scalar quantization of an embedding column — the
    * 4x storage cut that makes a 100 TB embedding corpus hold its
    * working set: per-vector scale `max(|x|)/127`, code
    * `round(x/scale)` in [-127, 127] (the max element rounds to
    * exactly +-127, so no clamp is needed). Deterministic —
    * half-away-from-zero rounding over exact double arithmetic, so
    * an external engine reproduces every code. All-zero vectors get
    * scale 0 and all-zero codes. Codes are kept as an integer array
    * column; `scale` rides alongside for dequantization
    * (`x ~ code * scale`).
    */
  def quantizeInt8(
      df: DataFrame,
      vecCol: String,
      codesCol: String = "codes",
      scaleCol: String = "scale"
  ): DataFrame = {
    // fused native kernel (r15): the former three-lambda expression
    // chain (abs transform -> array_max -> round transform) was the
    // dominant cost of every int8 build — HOFs never codegen. The
    // kernel replays the identical arithmetic (same IEEE scale
    // division, Spark's own BigDecimal HALF_UP rounding per code), so
    // the int8 oracles gate it unchanged.
    val q = graft.internal.exprColumn(graft.plans.Int8QuantizeExpr(
      graft.internal.columnExpr(col(vecCol).cast("array<double>"))))
    df.withColumn("__q8__", q)
      .withColumn(scaleCol, col("__q8__").getField("scale"))
      .withColumn(codesCol, col("__q8__").getField("codes"))
      .drop("__q8__")
  }

  /** [[bruteForceTopK]] over int8-quantized vectors: cosine on the
    * CODES (the per-vector scales cancel out of the ratio, so
    * scoring is integer dot products — exact in double up to 2^53 —
    * plus one division). Recall degrades only by the quantization
    * error; storage and shuffle shrink 4x. Same (rounded score desc,
    * id asc) determinism contract as the float path.
    */
  def int8TopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      scoreDecimals: Int = 4
  ): DataFrame = {
    // codes stay array<tinyint> through the join (r15): the corpus
    // side is the volume, and dotting bytes directly (exact — see
    // dotRaw) keeps it 1 byte per component instead of the 8 the
    // old array<double> cast shipped
    def codes(df: DataFrame, id: String, cv: String) =
      quantizeInt8(dropZeroVectors(df, vecCol).select(col(idCol).as(id), col(vecCol)), vecCol, cv, "__s__")
        .select(col(id), col(cv).cast("array<tinyint>").as(cv))
    val q = broadcast(
      codes(queries, "query_id", "__qv__").withColumn("__qn__", normRaw(col("__qv__"))))
    val c = codes(corpus, "neighbor_id", "__cv__").withColumn("__cn__", normRaw(col("__cv__")))
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        round(dotRaw(col("__qv__"), col("__cv__")) / (col("__qn__") * col("__cn__")), scoreDecimals))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane matrix: component (p, d)
    * = (uint32 of the first 8 hex chars of md5("seed#p#d") mod 2001
    * - 1000) / 1000, uniform in [-1, 1]. Computed ONCE in plain Scala
    * at plan-construction time and embedded as literal arrays — the
    * per-row work is a pure codegen'd zip_with fold with zero hashing
    * — and md5 makes the same matrix reproducible in any engine
    * (`('0x' || substring(md5(s), 1, 8))::BIGINT % 2001` in DuckDB),
    * so LSH results are oracle-checkable, unlike the earlier
    * xxhash64 formulation.
    */
  def planeMatrix(planes: Int, dims: Int, seed: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      md.reset()
      val dig = md.digest(s"$seed#$p#$d".getBytes("UTF-8"))
      val u = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) | ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      ((u % 2001L) - 1000L).toDouble / 1000.0
    }
  }

  /** Johnson-Lindenstrauss random projection: reduce `dims`-d
    * embeddings to `k` dims by projecting onto the md5-derived
    * [[planeMatrix]] rows, scaled by 1/√k (distance-preserving in
    * expectation — JL lemma; the standard pre-step that makes
    * brute-force/IVF over 768-d web embeddings affordable by
    * shrinking the vectors the quadratic stages carry). One JVM-UDF
    * pass per row computing all k components (the [[lshBucketUdf]]
    * rationale: lambda HOFs never code-generate), division (not
    * reciprocal multiply) so an external engine reproduces every
    * double: component p = <v, r_p> / √(k/3), sums left-to-right —
    * the planes are uniform[-1,1] (variance 1/3), so the unbiased
    * distance-preserving scale is √(k·σ²) = √(k/3), not the
    * unit-gaussian √k (RandomProjectionSpec pins the median
    * distortion at ~1).
    * Null vectors stay null; a length mismatch with `dims` throws
    * (silent truncation would corrupt distances).
    */
  def randomProjection(
      df: DataFrame,
      vecCol: String,
      outCol: String,
      dims: Int,
      k: Int,
      seed: Int = 7
  ): DataFrame = {
    val m = planeMatrix(k, dims, seed)
    val root = math.sqrt(k / 3.0)
    val proj = udf { (vec: Seq[Double]) =>
      if (vec == null) null
      else {
        require(vec.length == dims, s"expected $dims-d vector, got ${vec.length}")
        Array.tabulate(k) { p =>
          val plane = m(p)
          var s = 0.0
          var d = 0
          while (d < dims) { s += vec(d) * plane(d); d += 1 }
          s / root
        }
      }
    }
    df.withColumn(outCol, proj(col(vecCol)))
  }

  /** Sign-LSH bucket id: one bit per hyperplane = sign of <v, r_p>.
    * Returns a string of 0/1 of length `planes`. `dims` must match
    * the vector length (zip_with would null-pad a mismatch).
    */
  def lshBucket(vec: Column, planes: Int, dims: Int, seed: Int = 42): Column = {
    val m = planeMatrix(planes, dims, seed)
    val bits = (0 until planes).map { p =>
      val plane = array(m(p).map(lit): _*)
      val proj = aggregate(zip_with(vec, plane, (v, r) => v * r), lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Same bucket string as [[lshBucket]] (bit-identical: sign of
    * <v, r_p> over the md5-derived plane matrix) as a JVM-native UDF:
    * ONE pass over the vector computing all `planes` projections.
    * The expression form runs `planes` interpreted
    * `aggregate(zip_with(...))` lambda folds per row — Spark never
    * code-generates lambda higher-order functions, the same pathology
    * measured and fixed for MinHash ([[Dedup.minhashSignatureUdf]])
    * and SimHash ([[Dedup.simhashUdf]]) — so [[lshTopK]] uses this on
    * the hot path while the expression form remains the spec the
    * DuckDB oracle mirrors (pinned equal in PipelineSpec).
    */
  def lshBucketUdf(planes: Int, dims: Int, seed: Int = 42): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val m = planeMatrix(planes, dims, seed)
    udf { (vec: Seq[Double]) =>
      // null vector: the expression form's when(null >= 0, "1")
      // .otherwise("0") yields the all-zeros bucket — mirror it
      // instead of NPE-ing on vec.length
      if (vec == null) "0" * planes
      else {
      val n = math.min(dims, vec.length)
      val sb = new java.lang.StringBuilder(planes)
      var p = 0
      while (p < planes) {
        val row = m(p)
        var acc = 0.0
        var d = 0
        while (d < n) { acc += vec(d) * row(d); d += 1 }
        sb.append(if (acc >= 0) '1' else '0')
        p += 1
      }
      sb.toString
      }
    }
  }

  /** LSH-bucketed cosine top-k: queries join only their own bucket.
    * With `probes > 1`, unions results over several independent
    * hash seeds (multi-probe) before re-ranking globally per query.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dims: Int,
      planes: Int = 8,
      probes: Int = 2,
      scoreDecimals: Int = 4
  ): DataFrame = {
    val corpusNz = dropZeroVectors(corpus, vecCol)
    val queriesNz = dropZeroVectors(queries, vecCol)
    val per = (0 until probes).map { probe =>
      val seed = 42 + probe
      val bucketUdf = lshBucketUdf(planes, dims, seed)
      val c = corpusNz.select(
        col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv__"),
        norm(col(vecCol)).as("__cn__"),
        bucketUdf(col(vecCol)).as("__bucket__")
      )
      val q = queriesNz.select(
        col(idCol).as("query_id"),
        col(vecCol).as("__qv__"),
        norm(col(vecCol)).as("__qn__"),
        bucketUdf(col(vecCol)).as("__bucket__")
      )
      q.join(c, Seq("__bucket__"))
        .where(col("query_id") =!= col("neighbor_id"))
        .select(
          col("query_id"),
          col("neighbor_id"),
          round(dot(col("__qv__"), col("__cv__")) / (col("__qn__") * col("__cn__")), scoreDecimals).as("score")
        )
    }
    val all = per.reduce(_ unionByName _).dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    all
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF (inverted-file) cosine top-k — the coarse-quantizer scale
    * path: corpus rows are assigned to their nearest of `nlist`
    * centroids, and each query scores only the rows in its `nprobe`
    * nearest centroid cells, so the scored fraction is ~nprobe/nlist
    * of the corpus instead of all of it.
    *
    * Centroids are the `nlist` corpus vectors whose md5(id) sorts
    * lowest — a deterministic uniform draw with no RNG state and no
    * k-means iterations, reproducible in any engine (so the whole
    * operator is oracle-checkable, like the md5-plane sign-LSH).
    * The centroid set is broadcast; assignment is a broadcast
    * cross-join + per-row rank, one shuffle each side. Ties rank by
    * (rounded similarity desc, centroid id) so assignment is exact
    * across engines.
    *
    * RECALL vs COST: with the random draw, cells carry no semantic
    * coherence, so recall@k tracks the probed FRACTION nprobe/nlist
    * (measured ~2× the fraction on the synthetic embeddings) — a
    * large derived nlist at fixed nprobe trades recall for speed.
    * The 100 TB recipe that keeps BOTH is a TRAINED quantizer: pass
    * `centroids = Some(kmeansCentroids(...))` (fit offline, possibly
    * on a [[Sampling.deterministicSample]]) and coherent cells
    * retain recall at probed fractions where the random draw decays
    * (PipelineSpec pins fitted ≥ random at a 6% fraction). With
    * `centroids` given, `nlist` is ignored.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      scoreDecimals: Int = 4,
      centroids: Option[DataFrame] = None
  ): DataFrame = {
    val corpusNz = dropZeroVectors(corpus, vecCol)
    val queriesNz = dropZeroVectors(queries, vecCol)
    val cents = centroids.map(broadcast)
      .getOrElse(ivfCentroids(corpusNz, idCol, vecCol, resolveNlist(nlist, corpusNz)))
    // corpus routing is TWO-LEVEL (build-side cost ~2·n·√nlist dots,
    // one exchange); query probing stays flat — queries are few and
    // flat nprobe ranking probes the truly nearest cells
    val corpusCells = ivfAssignTwoLevel(corpusNz, cents, idCol, vecCol, "neighbor", scoreDecimals)
    val queryCells = ivfAssign(queriesNz, cents, idCol, vecCol, "query", keep = nprobe, scoreDecimals)
    // a corpus row lives in exactly ONE cell and a query probes
    // DISTINCT cells, so each (query, neighbor) pair appears at most
    // once — no dedup stage needed before the global re-rank
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    queryCells
      .join(corpusCells, Seq("cent_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        round(dot(col("__queryv__"), col("__neighborv__")) / (col("__queryn__") * col("__neighborn__")), scoreDecimals))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** [[ivfTopK]] serving from int8 CODES — the standard compressed
    * ANN shape at 100 TB: cell routing stays float (the centroid set
    * is broadcast and tiny), but the per-cell scoring joins carry
    * 4x-smaller quantized vectors, which is where the volume lives.
    * Scores are quantized cosine (scales cancel, integer-exact
    * sums); ranking keeps the (rounded score desc, id asc) contract.
    */
  def ivfInt8TopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      scoreDecimals: Int = 4
  ): DataFrame = {
    val corpusNz = dropZeroVectors(corpus, vecCol)
    val queriesNz = dropZeroVectors(queries, vecCol)
    val cents = ivfCentroids(corpusNz, idCol, vecCol, resolveNlist(nlist, corpusNz))
    // tinyint end-to-end (r15): the cell join ships corpus codes at
    // 1 byte per component — that join is where the volume lives
    def codesOf(df: DataFrame, id: String, cv: String) =
      quantizeInt8(df.select(col(idCol).as(id), col(vecCol)), vecCol, cv, "__s__")
        .select(col(id), col(cv).cast("array<tinyint>").as(cv))
    val corpusCells = ivfAssignTwoLevel(corpusNz, cents, idCol, vecCol, "neighbor", scoreDecimals)
      .select("cent_id", "neighbor_id")
      .join(codesOf(corpusNz, "neighbor_id", "__nq__"), Seq("neighbor_id"))
      .withColumn("__nn__", normRaw(col("__nq__")))
    val queryCells = ivfAssign(queriesNz, cents, idCol, vecCol, "query", keep = nprobe, scoreDecimals)
      .select("cent_id", "query_id")
      .join(broadcast(codesOf(queriesNz, "query_id", "__qq__")), Seq("query_id"))
      .withColumn("__qn__", normRaw(col("__qq__")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    queryCells
      .join(corpusCells, Seq("cent_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        round(dotRaw(col("__qq__"), col("__nq__")) / (col("__qn__") * col("__nn__")), scoreDecimals))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** Sentinel `nlist` value meaning "derive from the corpus size":
    * [[autoNlist]] of the nonzero-vector count. A FIXED nlist makes
    * probed-cell size grow linearly with the corpus (cell ~ n/nlist,
    * and a probe scans whole cells), so serving cost at 100 TB is
    * corpus-linear no matter how selective nprobe is; the standard
    * sizing is nlist ∝ √n, which balances the broadcast assignment
    * stage (n·nlist) against the probe stage (n_q·nprobe·n/nlist) and
    * keeps BOTH sub-linear per row.
    */
  val AutoNlist: Int = 0

  /** The derived cell count for a corpus of `n` nonzero vectors:
    * `max(16, ⌈√n⌉)` — √n cells of ~√n vectors each; the floor keeps
    * tiny corpora from degenerating to a single cell. Pure integer →
    * IEEE-double math, so any engine derives the same value for the
    * oracle replay.
    */
  def autoNlist(n: Long): Int = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)

  private[pipeline] def resolveNlist(nlist: Int, corpusNz: DataFrame): Int =
    if (nlist == AutoNlist) autoNlist(corpusNz.count()) else nlist

  /** The `nlist` deterministic IVF centroids of [[ivfTopK]]: the
    * corpus vectors whose md5(id) sorts lowest, broadcast as
    * (cent_id, __cv__, __cn__). Shared with [[Dedup.semDedup]] so
    * both operators block by the same cells.
    */
  private[graft] def ivfCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int
  ): DataFrame = broadcast(
    corpus
      .select(col(idCol).as("cent_id"), col(vecCol).as("__cv__"), norm(col(vecCol)).as("__cn__"),
        md5(col(idCol).cast("string")).as("__h__"))
      .orderBy(col("__h__"), col("cent_id"))
      .limit(nlist)
      .drop("__h__")
  )

  /** Lloyd k-means over an embedding column — the TRAINED upgrade of
    * the [[ivfTopK]] coarse quantizer (whose centroids are a uniform
    * draw, not fitted). Every step is deterministic and
    * engine-portable, so the whole trained model is oracle-checkable:
    *
    *  - init = the [[ivfCentroids]] md5-order draw (no RNG state);
    *  - assignment = nearest centroid by (cosine rounded to
    *    `scoreDecimals` desc, centroid id asc) — [[ivfAssign]];
    *  - update = per-dimension mean rounded to `centroidDecimals`
    *    (the ONE cross-engine-inexact step is the distributed sum
    *    inside the mean; rounding absorbs its ulp-level order
    *    sensitivity), dimensions reassembled in order via a struct
    *    array_sort, norms re-derived from the rounded components so
    *    downstream cosines are bit-identical given identical means.
    *
    * Scale shape per iteration: one broadcast of the k-row centroid
    * frame, one per-row top-1 window keyed on the row id, one
    * (cent, dim)-keyed hash agg whose shuffle carries k x dims rows
    * after map-side combine — no all-pairs stage, no driver collect.
    * A centroid that attracts no rows drops out (standard Lloyd).
    * Each iteration extends the lazy plan, so every
    * [[CompactEveryIters]] rounds the k-row centroid frame is
    * materialized and re-embedded as a literal relation — plan depth
    * (and analyzer cost) stays bounded no matter how large `iters`
    * is, instead of blowing up the analyzer on a caller's iters=50.
    * Train offline and persist the result for reuse regardless.
    *
    * Returns the fitted (cent_id, __cv__, __cn__) broadcast frame —
    * feed it to [[kmeansAssign]] for cluster labels.
    */
  def kmeansCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      scoreDecimals: Int = 4,
      centroidDecimals: Int = 6
  ): DataFrame = {
    var cents = ivfCentroids(df, idCol, vecCol, k)
    for (i <- 1 to iters) {
      val assigned = ivfAssign(df, cents, idCol, vecCol, "row", keep = 1, scoreDecimals)
      cents = broadcast(
        assigned
          .select(col("cent_id"), posexplode(col("__rowv__")).as(Seq("__dim__", "__v__")))
          .groupBy(col("cent_id"), col("__dim__"))
          .agg(round(avg(col("__v__")), centroidDecimals).as("__m__"))
          .groupBy(col("cent_id"))
          .agg(array_sort(collect_list(struct(col("__dim__"), col("__m__")))).as("__dm__"))
          .select(col("cent_id"), transform(col("__dm__"), x => x.getField("__m__")).as("__cv__"))
          .withColumn("__cn__", norm(col("__cv__"))))
      if (i % CompactEveryIters == 0 && i < iters) cents = compactCentroids(cents)
    }
    cents
  }

  /** Plan-depth relief interval for [[kmeansCentroids]] — every this
    * many Lloyd rounds the centroid plan is collapsed to a literal.
    */
  private val CompactEveryIters = 4

  /** Materialize the (k-row by contract) centroid frame and re-embed
    * it as a literal local relation. The collect is bounded by k — a
    * frame the driver already holds in full whenever it is broadcast
    * — and the rebuilt plan is depth-1, so training cost stays linear
    * in `iters` instead of the analyzer re-walking every prior round.
    * Values round-trip exactly (double/array-of-double), keeping the
    * training trajectory bit-identical to the unrolled plan.
    */
  private def compactCentroids(cents: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    broadcast(cents.sparkSession.createDataFrame(cents.collect().toList.asJava, cents.schema))
  }

  /** Cluster labels under a fitted [[kmeansCentroids]] model:
    * (idCol, cent_id), assignment by the same deterministic
    * (rounded cosine desc, cent_id asc) rule training used.
    */
  def kmeansAssign(
      df: DataFrame,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      scoreDecimals: Int = 4
  ): DataFrame =
    ivfAssign(df, cents, idCol, vecCol, "row", keep = 1, scoreDecimals)
      .select(col("row_id").as(idCol), col("cent_id"))

  // ---- product quantization (IVF-PQ: the compressed-domain path) --

  /** Product-quantization codebooks: the vector splits into `m`
    * contiguous subspaces of `dims / m` components, and each subspace
    * trains its own `ksub`-codeword quantizer with the SAME
    * deterministic Lloyd machinery as [[kmeansCentroids]] (md5-order
    * init, rounded-cosine rank-1 assignment, rounded means) — so the
    * whole fitted model is reproducible in any engine, like every
    * other fitted model here. Returns a broadcastable
    * `(sub_id, cent_id, __cbv__, __cbn__, __cbn2__)` frame of
    * `m * ksub` rows (`__cbn2__` = the codeword's squared norm,
    * summed once per codeword so reconstruction norms don't
    * re-derive it per row).
    *
    * At 100 TB: train on a deterministic sample
    * ([[Sampling.deterministicSample]]) — the codebook is a
    * statistic, not a per-row artifact — then encode the full corpus
    * with the broadcast result.
    */
  def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      m: Int,
      ksub: Int,
      iters: Int,
      scoreDecimals: Int = 4,
      centroidDecimals: Int = 6,
      l2: Boolean = false
  ): DataFrame = {
    require(dims % m == 0, s"dims=$dims must split evenly into m=$m subspaces")
    val sub = dims / m
    // all m subspaces train JOINTLY over one exploded (row, sub_id,
    // subvector) frame: assignment and means are independent per
    // subspace, so the trajectory is bit-identical to m separate
    // Lloyd runs — but every iteration is ONE corpus scan instead of
    // m (the scan count must not grow with m at 100 TB)
    val subsArr = array((0 until m).map(s =>
      slice(col(vecCol).cast("array<double>"), s * sub + 1, sub)): _*)
    val ex = corpus.select(col(idCol), posexplode(subsArr).as(Seq("sub_id", "__sv__")))
    // the init draw: the md5-lowest ksub ids (the ivfCentroids rule —
    // the same ids seed every subspace, as slicing doesn't change
    // ids). In residual (l2) mode the draw EXCLUDES zero vectors:
    // the coarse quantizer uses the SAME md5 order, so whenever
    // ksub <= nlist the unfiltered draw would pick exactly the coarse
    // centroids' own rows — whose residuals are all EXACTLY ZERO by
    // construction — and Lloyd would start from ksub copies of the
    // zero codeword and collapse to one. The oracle applies the same
    // nonzero filter to its init CTE.
    val initSrc = if (l2) dropZeroVectors(corpus, vecCol) else corpus
    // ONE narrow collect of the ksub init rows (r20 opt, guide §2.4):
    // the former form broadcast the draw ids and re-scanned the WHOLE
    // exploded corpus through a join just to slice out ksub rows — an
    // extra corpus pass (plus its broadcast job) at the head of every
    // PQ fit. The subspace slices and norms are computed driver-side
    // with the exact SQL arithmetic (slice copies doubles; norm is the
    // same left-to-right self-dot + sqrt the kernel uses), so the init
    // codebook is bit-identical. Null/irregular vectors keep the join
    // form — the proven path for shapes the fast one can't take.
    val initRows = initSrc
      .select(col(idCol).as("cent_id"), col(vecCol).cast("array<double>").as("__v__"),
        md5(col(idCol).cast("string")).as("__h__"))
      .orderBy(col("__h__"), col("cent_id"))
      .limit(ksub)
      .select(col("cent_id"), col("__v__"))
      .collect()
    val cleanInit = initRows.forall { r =>
      !r.isNullAt(0) && !r.isNullAt(1) && {
        val v = r.getSeq[Any](1); v.length == dims && v.forall(_ != null)
      }
    }
    var cents =
      if (cleanInit) {
        import org.apache.spark.sql.types._
        import scala.jdk.CollectionConverters._
        val idType = initSrc.schema(initSrc.schema.fieldIndex(idCol)).dataType
        val initSchema = StructType(Seq(
          StructField("sub_id", IntegerType, nullable = false),
          StructField("cent_id", idType),
          StructField("__cbv__", ArrayType(DoubleType)),
          StructField("__cbn__", DoubleType)))
        val rows = initRows.toSeq.flatMap { r =>
          val v = r.getSeq[Double](1)
          (0 until m).map { s0 =>
            val sv = v.slice(s0 * sub, s0 * sub + sub)
            var acc = 0.0d
            var i = 0
            while (i < sv.length) { acc += sv(i) * sv(i); i += 1 }
            org.apache.spark.sql.Row(s0, r.get(0), sv, math.sqrt(acc))
          }
        }
        broadcast(corpus.sparkSession.createDataFrame(rows.asJava, initSchema))
      } else {
        val initIds = broadcast(initSrc
          .select(col(idCol).as("cent_id"), md5(col(idCol).cast("string")).as("__h__"))
          .orderBy(col("__h__"), col("cent_id"))
          .limit(ksub)
          .drop("__h__"))
        broadcast(ex
          .join(initIds, ex(idCol) === initIds("cent_id"))
          .select(col("sub_id"), col("cent_id"), col("__sv__").as("__cbv__"))
          .withColumn("__cbn__", norm(col("__cbv__"))))
      }
    for (i <- 1 to iters) {
      val assigned = pqRank1(ex, cents, idCol, scoreDecimals, l2)
      cents = broadcast(assigned
        .select(col("sub_id"), col("cent_id"), posexplode(col("__sv__")).as(Seq("__dim__", "__v__")))
        .groupBy(col("sub_id"), col("cent_id"), col("__dim__"))
        .agg(round(avg(col("__v__")), centroidDecimals).as("__m__"))
        .groupBy(col("sub_id"), col("cent_id"))
        .agg(array_sort(collect_list(struct(col("__dim__"), col("__m__")))).as("__dm__"))
        .select(col("sub_id"), col("cent_id"), transform(col("__dm__"), x => x.getField("__m__")).as("__cbv__"))
        .withColumn("__cbn__", norm(col("__cbv__"))))
      if (i % CompactEveryIters == 0 && i < iters) cents = compactCentroids(cents)
    }
    broadcast(cents.withColumn("__cbn2__", dot(col("__cbv__"), col("__cbv__"))))
  }

  /** One collected codeword of the PACKED rank-1 encode (r19 opt):
    * `(draw id, stored rank, codeword vector, norm, squared norm)` —
    * the per-subspace literal array the packed argmax scans per row.
    */
  private[pipeline] final case class PqCw(id: Long, ci: Int, v: Seq[Double], n: Double, n2: Double)

  /** Collect a stored-schema codebook frame's rows into per-subspace
    * [[PqCw]] arrays for the packed encode — `None` when the shape
    * can't take the packed path (non-integral draw ids, a legacy
    * sidecar lacking `__ci__`/`__cbn2__`, or a Long.MinValue id whose
    * negation would overflow the tiebreak), in which case callers keep
    * the shuffled explode/join/window pipeline. The collect is bounded
    * by m·ksub — the same frame [[pqSearch]] already broadcasts whole.
    */
  private[pipeline] def packCodebook(
      rows: Array[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType
  ): Option[Array[Array[PqCw]]] = {
    import org.apache.spark.sql.types._
    def idx(n: String): Option[Int] = if (schema.fieldNames.contains(n)) Some(schema.fieldIndex(n)) else None
    val out = for {
      subI <- idx("sub_id"); idI <- idx("cent_id"); ciI <- idx("__ci__")
      vI <- idx("__cbv__"); nI <- idx("__cbn__"); n2I <- idx("__cbn2__")
      integral = schema(idI).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      if integral && rows.nonEmpty && rows.forall(r => !r.isNullAt(idI) && !r.isNullAt(ciI))
      entries = rows.map { r =>
        val id = r.get(idI) match {
          case b: Byte => b.toLong; case s: Short => s.toLong
          case i: Int => i.toLong; case l: Long => l
        }
        (r.getInt(subI), PqCw(id, r.getInt(ciI), r.getSeq[Double](vI), r.getDouble(nI), r.getDouble(n2I)))
      }
      if !entries.exists(_._2.id == Long.MinValue)
      m = entries.map(_._1).max + 1
      grouped = entries.groupBy(_._1)
      if (0 until m).forall(grouped.contains)
    } yield (0 until m).map(s => grouped(s).map(_._2)).toArray
    out
  }

  /** The PACKED rank-1 encode helper (r19 opt): the winning codeword
    * of every subspace computed per ROW against the driver-collected
    * codebook — [[graft.plans.PqArgBestExpr]], a codegen'd primitive
    * loop — instead of explode × codebook-join × window over
    * n·m·ksub rows. ONE projection chain, zero exchanges; at corpus
    * scale the encode stops shuffling anything at all (guide §2.4).
    *
    * Bit-identical to the shuffled form by construction: the kernel
    * replays pqRank1's metric arithmetic term for term over the same
    * staged subvector norms and the same collected codeword doubles,
    * and applies the same (metric, draw-id) tiebreak with the window
    * defaults' NaN/null placement — see [[graft.plans.PqArgBestExpr]]'s
    * contract note.
    *
    * Usage: select [[stagedCols]] first (slices + norms hoisted so
    * each computes once per row), then [[idxCols]] (`__bi{s}__`, the
    * winner positions — ONE kernel eval per (row, subspace)), then
    * map positions to rank / squared norm / codeword via [[ci]] /
    * [[n2]] / [[v]] literal lookups.
    */
  private[pipeline] final class PackedCodebook(
      packed: Array[Array[PqCw]],
      scoreDecimals: Int,
      l2: Boolean
  ) {
    val m: Int = packed.length
    val sub: Int = packed.head.head.v.length
    private val ids = packed.map(_.map(_.id))
    private val vsA = packed.map(_.map(_.v.toArray))
    private val nsA = packed.map(_.map(_.n))

    /** Slices + their norms, hoisted so each computes once per row
      * (the norm re-derives the slice expression — twice per row, not
      * ksub times — because a projection cannot reference its own
      * output aliases).
      */
    def stagedCols(vec: Column): Seq[Column] = (0 until m).flatMap { s =>
      val svExpr = slice(vec.cast("array<double>"), s * sub + 1, sub)
      val aux =
        if (l2) dot(svExpr, svExpr).as(s"__sv2${s}__")
        else norm(svExpr).as(s"__svn${s}__")
      Seq(svExpr.as(s"__sv${s}__"), aux)
    }

    def idxCols: Seq[Column] = (0 until m).map { s =>
      val aux = if (l2) col(s"__sv2${s}__") else col(s"__svn${s}__")
      graft.internal.exprColumn(graft.plans.PqArgBestExpr(
        graft.internal.columnExpr(col(s"__sv${s}__")),
        graft.internal.columnExpr(aux),
        graft.internal.columnExpr(lit(s)),
        ids, vsA, nsA, scoreDecimals, l2)).as(s"__bi${s}__")
    }

    /** Winner rank (`__ci__`) of subspace `s` — a literal lookup. */
    def ci(s: Int): Column =
      element_at(typedLit(packed(s).map(_.ci).toSeq), col(s"__bi${s}__") + 1)

    /** Winner stored squared norm (`__cbn2__`) of subspace `s`. */
    def n2(s: Int): Column =
      element_at(typedLit(packed(s).map(_.n2).toSeq), col(s"__bi${s}__") + 1)

    /** Winner codeword vector (`__cbv__`) of subspace `s`. */
    def v(s: Int): Column =
      element_at(typedLit(packed(s).map(_.v).toSeq), col(s"__bi${s}__") + 1)
  }

  /** Rank-1 codeword assignment for one exploded (row, sub_id, __sv__)
    * frame — the step shared by PQ training and [[pqEncode]]. Two
    * metrics behind one deterministic contract:
    *
    *  - cosine (`l2 = false`, the raw-vector mode): (rounded cosine
    *    desc, cent_id asc) — byte-identical to the pre-r17 inline
    *    form;
    *  - squared L2 (`l2 = true`, the RESIDUAL mode): (rounded
    *    |sv − cbv|² asc, cent_id asc), expanded as
    *    `dot(sv,sv) − 2·dot(sv,cbv) + dot(cbv,cbv)` — three native
    *    codegen'd dots, no per-element lambda, and the exact IEEE
    *    expression an external engine replays term-for-term.
    *    Residuals NEED l2: a residual can be exactly zero (every
    *    coarse centroid's own row), and zero-vector cosine is 0/0 —
    *    null in Spark but NaN in DuckDB, ranked at OPPOSITE ends of a
    *    desc window. L2 has no division, so the degenerate class
    *    vanishes instead of needing a filter.
    */
  private def pqRank1(
      ex: DataFrame,
      cents: DataFrame,
      idCol: String,
      scoreDecimals: Int,
      l2: Boolean
  ): DataFrame = pqRank1Packed(ex, cents, scoreDecimals, l2).getOrElse {
    if (!l2) {
      val w = Window.partitionBy(col(idCol), col("sub_id"))
        .orderBy(col("__psim__").desc, col("cent_id").asc)
      ex
        .withColumn("__svn__", norm(col("__sv__")))
        .join(cents, Seq("sub_id"))
        .withColumn("__psim__",
          round(dot(col("__sv__"), col("__cbv__")) / (col("__svn__") * col("__cbn__")), scoreDecimals))
        .withColumn("__pr__", row_number().over(w))
        .where(col("__pr__") === 1)
    } else {
      val w = Window.partitionBy(col(idCol), col("sub_id"))
        .orderBy(col("__pd__").asc, col("cent_id").asc)
      ex
        .withColumn("__sv2__", dot(col("__sv__"), col("__sv__")))
        .join(cents.withColumn("__cbn2a__", dot(col("__cbv__"), col("__cbv__"))), Seq("sub_id"))
        .withColumn("__pd__",
          round(col("__sv2__") - lit(2.0) * dot(col("__sv__"), col("__cbv__")) + col("__cbn2a__"),
            scoreDecimals))
        .withColumn("__pr__", row_number().over(w))
        .where(col("__pr__") === 1)
        .drop("__sv2__", "__cbn2a__", "__pd__")
    }
  }

  /** The PACKED form of [[pqRank1]] (r19 opt): the per-(row, subspace)
    * winning codeword as an argmax over the COLLECTED codebook — one
    * projection over the exploded frame instead of a ksub-fold
    * codebook join plus a per-(row, sub) window sort. This is the step
    * every Lloyd training iteration and every [[pqEncode]] pays, so at
    * corpus scale it removes the largest shuffle+sort of each PQ fit.
    * `None` (→ shuffled fallback) for codebooks the packed path can't
    * take: non-integral draw ids or a Long.MinValue id.
    *
    * Bit-identical to the window form: same staged subvector norm /
    * squared norm, the same rounded metric expression (the l2 branch's
    * codeword squared norm is computed driver-side by the same
    * left-to-right accumulation as [[graft.plans.DotProductExpr]] —
    * IEEE double arithmetic is engine-independent), and the same
    * (metric, id) tiebreak with the same NaN/null placement (see
    * [[pqPackedWinners]]'s comparator note). The collect is bounded by
    * m·ksub — the frame every consumer already broadcasts whole; the
    * per-iteration collect also REPLACES the compactCentroids
    * plan-depth relief (each iteration now trains from a literal).
    */
  private def pqRank1Packed(
      ex: DataFrame,
      cents: DataFrame,
      scoreDecimals: Int,
      l2: Boolean
  ): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val schema = cents.schema
    val need = Seq("sub_id", "cent_id", "__cbv__", "__cbn__")
    if (!need.forall(schema.fieldNames.contains)) return None
    val idI = schema.fieldIndex("cent_id")
    val integral = schema(idI).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!integral) return None
    val rows = cents
      .select(col("sub_id"), col("cent_id").cast("long"),
        col("__cbv__").cast("array<double>"), col("__cbn__")).collect()
    if (rows.isEmpty || rows.exists(r => r.isNullAt(1) || r.getLong(1) == Long.MinValue)) return None
    val bySub = rows.groupBy(_.getInt(0))
    val m = bySub.keysIterator.max + 1
    if (!(0 until m).forall(bySub.contains)) return None
    // the l2 metric's codeword squared norm, by the same left-to-right
    // accumulation as DotProductExpr (the value the shuffled form
    // computes fresh per join row) — IEEE doubles, engine-independent
    def dotLR(a: Seq[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      s
    }
    val packed: Seq[Seq[PqCw]] = (0 until m).map { s =>
      bySub(s).toSeq.map { r =>
        val v = r.getSeq[Double](2)
        PqCw(r.getLong(1), -1, v, r.getDouble(3), dotLR(v))
      }
    }
    val ids = packed.map(_.map(_.id).toArray).toArray
    val vsA = packed.map(_.map(_.v.toArray).toArray).toArray
    val nsA = packed.map(_.map(_.n).toArray).toArray
    val allIds = typedLit(packed.map(_.map(_.id)))
    val staged =
      if (!l2) ex.withColumn("__svn__", norm(col("__sv__")))
      else ex.withColumn("__sv2__", dot(col("__sv__"), col("__sv__")))
    val aux = if (l2) col("__sv2__") else col("__svn__")
    val idx = graft.internal.exprColumn(graft.plans.PqArgBestExpr(
      graft.internal.columnExpr(col("__sv__")),
      graft.internal.columnExpr(aux),
      graft.internal.columnExpr(col("sub_id").cast("int")),
      ids, vsA, nsA, scoreDecimals, l2))
    val out = staged.withColumn("__bi__", idx)
      .withColumn("cent_id",
        element_at(element_at(allIds, col("sub_id") + 1), col("__bi__") + 1))
      .drop("__bi__", "__sv2__")
    Some(out)
  }

  /** PQ codes: one `(idCol, sub_id, code_id)` row per (vector,
    * subspace) — the nearest codeword by the deterministic (rounded
    * cosine desc, cent_id asc) rule shared with [[ivfAssign]]. This
    * IS the compressed corpus: `m` small ids per vector instead of
    * `dims` doubles (the 100 TB memory story), joined back by id.
    */
  def pqEncode(
      df: DataFrame,
      codebook: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      m: Int,
      scoreDecimals: Int = 4,
      l2: Boolean = false
  ): DataFrame = {
    val sub = dims / m
    val subsArr = array((0 until m).map(s =>
      slice(col(vecCol).cast("array<double>"), s * sub + 1, sub)): _*)
    val exploded = df
      .select(col(idCol), posexplode(subsArr).as(Seq("sub_id", "__sv__")))
    pqRank1(exploded, codebook, idCol, scoreDecimals, l2)
      .select(col(idCol), col("sub_id"), col("cent_id").as("code_id"))
  }

  /** IVF-PQ cosine top-k — the compressed-domain ANN scale path:
    * the [[ivfTopK]] coarse quantizer prunes each query to its
    * `nprobe` cells (~nprobe/nlist of the corpus), and the fine stage
    * scores candidates by ASYMMETRIC DISTANCE COMPUTATION over the PQ
    * codes instead of exact dot products: per query a lookup table of
    * `m * ksub` partial dot products (query subvector x codeword) is
    * computed ONCE, and each candidate pair then costs `m` table
    * lookups + adds — no vector math per pair, and candidates travel
    * as `m`-id code rows, not `dims`-double vectors. The approximate
    * score is `sum_s <q_s, cw(x, s)> / (|q| * |x_hat|)` with
    * `|x_hat|` the reconstruction norm from the codeword squared
    * norms.
    *
    * Everything downstream of the fitted codebooks is deterministic
    * and engine-portable (rounded scores, id tiebreaks), so the whole
    * operator is oracle-checkable like [[ivfTopK]].
    *
    * Scale shape: codebooks and the per-query LUT rows broadcast; the
    * candidate join shuffles (query_id, neighbor_id, m code rows)
    * only for pairs sharing a probed cell; one hash agg sums the `m`
    * partials per pair with map-side combine; the final top-k is a
    * per-query window over candidates. No stage touches corpus
    * vectors after encode.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dims: Int,
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 1,
      nlist: Int = 16,
      nprobe: Int = 4,
      scoreDecimals: Int = 4,
      residual: Boolean = false
  ): DataFrame = {
    // single-query form (the oracle replays fit + search as one
    // plan): no persistence, the model frames inline into the search
    val model = pqFit(corpus, idCol, vecCol, dims, m, ksub, iters, nlist, nprobe,
      scoreDecimals, persist = false, residual = residual)
    pqSearch(model, queries, idCol, vecCol, k)
  }

  /** A fitted IVF-PQ index: the coarse-quantizer centroids, the
    * trained codebooks, and the ENCODED corpus (codes, cell
    * assignments, reconstruction norms). Fitting is the expensive,
    * corpus-scanning part; everything a search needs afterwards is
    * here, so serving reuses one fit across arbitrarily many query
    * batches without retraining. `release()` drops the persisted
    * corpus-side frames when the index retires.
    */
  final case class PqModel private[pipeline] (
      centroids: DataFrame,
      codebooks: DataFrame,
      codes: DataFrame,
      cells: DataFrame,
      norms: DataFrame,
      dims: Int,
      m: Int,
      ksub: Int,
      nprobe: Int,
      scoreDecimals: Int,
      residual: Boolean,
      private val releaseThunk: () => Unit) {
    def release(): Unit = releaseThunk()
  }

  /** Fit the IVF-PQ index of [[pqTopK]] once: coarse centroids,
    * jointly-trained codebooks, and the three corpus-side frames a
    * search consumes (codes, cells, reconstruction norms). With
    * `persist` (the serving default) those frames materialize to
    * MEMORY_AND_DISK so each query batch reads the encoded corpus
    * from cache instead of re-running encode; `persist = false`
    * keeps the model fully lazy for single-shot plans (and for the
    * oracle, which must replay the whole fit).
    *
    * At 100 TB: fit on the full corpus (encode is one scan; training
    * can subsample via [[Sampling.deterministicSample]] upstream),
    * then serve every downstream query batch from the ~`m` bytes/row
    * compressed frames — the raw vectors are never touched again.
    *
    * `residual = true` (r17) is canonical IVFADC: the fine quantizer
    * trains on and encodes `x − c_cell(x)` — the residual after the
    * coarse quantizer — instead of the raw vector. Residuals
    * concentrate near the origin (the coarse quantizer has already
    * absorbed the between-cell variance), so the SAME m×ksub byte
    * budget spends its codewords on a much tighter distribution and
    * reconstructs materially closer vectors ⇒ higher recall at equal
    * probed fraction (measured on the repo's own fixtures — see
    * [[pqRecallReport]]). Differences from the raw mode, all replayed
    * by the oracle:
    *  - codeword assignment is SQUARED L2, not cosine (residuals are
    *    offsets, not directions — and the coarse centroid's own row
    *    has an exactly-zero residual, which cosine cannot rank
    *    portably: see [[pqRank1]]);
    *  - the reconstruction is `x̂ = c_cell + r̂`, so the stored norm
    *    is |x̂| and the ADC numerator gains a per-(query, cell)
    *    `dot(q, c_cell)` term — nprobe scalars per query, never
    *    per-candidate work;
    *  - the codes are RELATIVE TO the coarse quantizer: retraining
    *    cells invalidates them (the persisted-index consequence is
    *    documented at [[IvfIndex.buildPq]]).
    */
  def pqFit(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 1,
      nlist: Int = 16,
      nprobe: Int = 4,
      scoreDecimals: Int = 4,
      persist: Boolean = true,
      residual: Boolean = false
  ): PqModel = {
    import org.apache.spark.storage.StorageLevel
    val corpusNz = dropZeroVectors(corpus, vecCol)
    // the model frames (nlist + m*ksub rows) persist too in serving
    // mode: the LUT of EVERY search joins the codebook frame, whose
    // lineage is the whole iterative Lloyd training — uncached, each
    // query batch would silently retrain
    var cents = ivfCentroids(corpusNz, idCol, vecCol, resolveNlist(nlist, corpusNz))
    if (residual) return pqFitResidual(corpusNz, cents, idCol, vecCol, dims, m, ksub,
      iters, nprobe, scoreDecimals, persist)
    var cb = pqCodebooks(corpusNz, idCol, vecCol, dims, m, ksub, iters, scoreDecimals)
    if (persist) {
      cents = cents.persist(StorageLevel.MEMORY_AND_DISK)
      cb = cb.persist(StorageLevel.MEMORY_AND_DISK)
      // serving mode fails fast if Lloyd dropped a codeword (r17,
      // ADVICE r16): pqSearch addresses a flat m x ksub LUT, so a
      // subspace with fewer codewords would silently mis-score every
      // candidate; the count doubles as the cache warm-up. (The lazy
      // persist=false form stays uncounted by contract — it exists
      // for single-shot plans the oracle replays relationally, where
      // a dropped codeword shows up as a gated mismatch instead.)
      val counts = cb.groupBy(col("sub_id")).agg(count(lit(1)).as("n")).collect()
      require(counts.length == m && counts.forall(_.getLong(1) == ksub.toLong),
        s"pqFit: Lloyd training left unequal codeword counts per subspace " +
          s"(expected $m x $ksub, got ${counts.map(r => s"sub ${r.getInt(0)}: ${r.getLong(1)}").sorted.mkString(", ")}) " +
          "- flat ADC addressing requires exactly ksub codewords per subspace; lower ksub, " +
          "reduce iters, or train on more rows")
    }
    var codes = pqEncode(corpusNz, cb, idCol, vecCol, dims, m, scoreDecimals)
      .withColumnRenamed(idCol, "neighbor_id")
    var cells = ivfAssignTwoLevel(corpusNz, cents, idCol, vecCol, "neighbor", scoreDecimals)
      .select(col("neighbor_id"), col("cent_id"))
    if (persist) {
      codes = codes.persist(StorageLevel.MEMORY_AND_DISK)
      cells = cells.persist(StorageLevel.MEMORY_AND_DISK)
    }
    // built AFTER codes persists so the norm scan reads the cache
    var xnorm = codes
      .join(cb.select(col("sub_id"), col("cent_id").as("code_id"), col("__cbn2__")),
        Seq("sub_id", "code_id"))
      .groupBy(col("neighbor_id"))
      .agg(sqrt(sum(col("__cbn2__"))).as("__xn__"))
    if (persist) xnorm = xnorm.persist(StorageLevel.MEMORY_AND_DISK)
    val persisted = if (persist) Seq(cents, cb, codes, cells, xnorm) else Nil
    PqModel(cents, cb, codes, cells, xnorm, dims, m, ksub, nprobe, scoreDecimals,
      residual = false, () => persisted.foreach(_.unpersist()))
  }

  /** The residual-mode fit behind [[pqFit]] (`residual = true`) —
    * see the mode's contract there. Stage shape mirrors the raw fit:
    * ONE extra broadcast join derives the residual frame from the
    * cell assignment (which the raw fit computes anyway), training /
    * encode run over it with the L2 rank rule, and the
    * reconstruction norms add a per-row `zip_with` with the cell
    * centroid — no new shuffle, no per-pair work.
    */
  private def pqFitResidual(
      corpusNz: DataFrame,
      cents0: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      m: Int,
      ksub: Int,
      iters: Int,
      nprobe: Int,
      scoreDecimals: Int,
      persist: Boolean
  ): PqModel = {
    import org.apache.spark.storage.StorageLevel
    var cents = cents0
    // the cell assignment feeds the residuals AND the model's cells
    // frame — in serving mode persist it once instead of routing the
    // corpus twice
    var assigned = ivfAssignTwoLevel(corpusNz, cents, idCol, vecCol, "neighbor", scoreDecimals)
    if (persist) {
      cents = cents.persist(StorageLevel.MEMORY_AND_DISK)
      assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
    }
    val cells = assigned.select(col("neighbor_id"), col("cent_id"))
    // r = x − c_cell(x), componentwise — exact IEEE subtraction any
    // engine replays
    val resid = assigned
      .join(cents.select(col("cent_id"), col("__cv__")), Seq("cent_id"))
      .select(col("neighbor_id"), col("cent_id"),
        zip_with(col("__neighborv__"), col("__cv__"), (a, b) => a - b).as("__rv__"))
    var cb = pqCodebooks(resid.select(col("neighbor_id"), col("__rv__")),
      "neighbor_id", "__rv__", dims, m, ksub, iters, scoreDecimals, l2 = true)
    if (persist) {
      cb = cb.persist(StorageLevel.MEMORY_AND_DISK)
      val counts = cb.groupBy(col("sub_id")).agg(count(lit(1)).as("n")).collect()
      require(counts.length == m && counts.forall(_.getLong(1) == ksub.toLong),
        s"pqFit(residual): Lloyd training left unequal codeword counts per subspace " +
          s"(expected $m x $ksub, got ${counts.map(r => s"sub ${r.getInt(0)}: ${r.getLong(1)}").sorted.mkString(", ")}) " +
          "- flat ADC addressing requires exactly ksub codewords per subspace; lower ksub, " +
          "reduce iters, or train on more rows")
    }
    var codes = pqEncode(resid, cb, "neighbor_id", "__rv__", dims, m, scoreDecimals, l2 = true)
    var cellsP = cells
    if (persist) {
      codes = codes.persist(StorageLevel.MEMORY_AND_DISK)
      cellsP = cellsP.persist(StorageLevel.MEMORY_AND_DISK)
    }
    // |x̂| with x̂ = c_cell + r̂: reconstruct r̂ from the codes (the
    // codeword arrays concatenate in subspace order), add the cell
    // centroid, take the norm — the full-reconstruction norm the ADC
    // denominator needs in residual mode
    var xnorm = codes
      .join(cb.select(col("sub_id"), col("cent_id").as("code_id"), col("__cbv__")),
        Seq("sub_id", "code_id"))
      .groupBy(col("neighbor_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub_id"), col("__cbv__")))),
        x => x("__cbv__"))).as("__rh__"))
      .join(cellsP, Seq("neighbor_id"))
      .join(cents.select(col("cent_id"), col("__cv__")), Seq("cent_id"))
      .select(col("neighbor_id"),
        norm(zip_with(col("__cv__"), col("__rh__"), (a, b) => a + b)).as("__xn__"))
    if (persist) xnorm = xnorm.persist(StorageLevel.MEMORY_AND_DISK)
    val persisted = if (persist) Seq(cents, assigned, cb, codes, cellsP, xnorm) else Nil
    PqModel(cents, cb, codes, cellsP, xnorm, dims, m, ksub, nprobe, scoreDecimals,
      residual = true, () => persisted.foreach(_.unpersist()))
  }

  /** Search a fitted [[PqModel]]: coarse-prune each query to its
    * `nprobe` cells, score candidates by asymmetric distance
    * computation over the PQ codes (per-query LUT of m x ksub
    * partial dot products, broadcast), keep the top `k`. Touches
    * only the model's compressed frames — never a corpus vector —
    * so serving cost is per-query-batch, not per-corpus.
    *
    * Zero/NaN-norm queries are dropped like every other top-k entry
    * point (r17, ADVICE r16): cosine is undefined for them, and
    * Spark's null score vs DuckDB's NaN would rank OPPOSITE ends of
    * the desc window — the oracle's query CTE already derives from
    * the nonzero-filtered corpus, so the engine filter is what keeps
    * the two sides aligned when a degenerate query appears.
    */
  def pqSearch(
      model: PqModel,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val sub = model.dims / model.m
    val queriesNz = dropZeroVectors(queries, vecCol)
    val qAssigned = ivfAssign(queriesNz, model.centroids, idCol, vecCol, "query",
      keep = model.nprobe, model.scoreDecimals)
    // residual mode: the ADC numerator decomposes dot(q, x̂) =
    // dot(q, c_cell) + dot(q, r̂); the first term depends only on the
    // (query, probed cell) pair — nprobe scalars per query, derived
    // here against the broadcast centroid frame, never per candidate
    val queryCells =
      if (!model.residual) qAssigned.select(col("query_id"), col("cent_id"))
      else qAssigned
        .join(broadcast(model.centroids.select(col("cent_id"), col("__cv__"))), Seq("cent_id"))
        .select(col("query_id"), col("cent_id"),
          dot(col("__queryv__"), col("__cv__")).as("__qcd__"))
    val subsArr = array((0 until model.m).map(s =>
      slice(col(vecCol).cast("array<double>"), s * sub + 1, sub)): _*)
    val lut = queriesNz
      .select(col(idCol).as("query_id"),
        norm(col(vecCol).cast("array<double>")).as("__qn__"),
        posexplode(subsArr).as(Seq("sub_id", "__qsv__")))
      .join(model.codebooks, Seq("sub_id"))
      .select(col("query_id"), col("__qn__"), col("sub_id"),
        col("cent_id").as("code_id"), dot(col("__qsv__"), col("__cbv__")).as("__part__"))
    // ADC tables packed into ARRAYS so the scoring stage is one
    // codegen'd fold per candidate pair. The exploded alternative
    // (pairs x m sub-rows through a LUT join + re-aggregation) moves
    // m x |pairs| rows through two extra exchanges — measured 7x
    // slower at 60k vectors. Arrays sort by (sub, code) so index
    // s*ksub + code-rank addresses the flat LUT.
    val lutArr = lut
      .groupBy(col("query_id"))
      .agg(first(col("__qn__")).as("__qn__"),
        transform(
          array_sort(collect_list(struct(col("sub_id"), col("code_id"), col("__part__")))),
          x => x("__part__")).as("__lutf__"))
    // code ids are draw ids, not 0..ksub-1 — the flat index is the
    // code's RANK within its sub's (sub_id, code_id) order, matching
    // the lut array's sort
    val wCi = Window.partitionBy(col("sub_id")).orderBy(col("code_id"))
    val codeIdx = model.codebooks
      .select(col("sub_id"), col("cent_id").as("code_id"))
      .withColumn("__ci__", row_number().over(wCi) - 1)
    val codesArr = model.codes
      .join(broadcast(codeIdx), Seq("sub_id", "code_id"))
      .groupBy(col("neighbor_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub_id"), col("__ci__")))),
        x => x("__ci__")).as("__codes__"))
      .join(model.norms, Seq("neighbor_id"))
    val pairCols =
      if (model.residual) Seq(col("query_id"), col("neighbor_id"), col("__qcd__"))
      else Seq(col("query_id"), col("neighbor_id"))
    val pairs = queryCells
      .join(model.cells, Seq("cent_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(pairCols: _*)
    val adc = aggregate(
      sequence(lit(0), lit(model.m - 1)), lit(0.0),
      (acc, s) => acc + element_at(col("__lutf__"),
        (s * model.ksub + element_at(col("__codes__"), s + 1) + 1).cast("int")))
    val num = if (model.residual) col("__qcd__") + adc else adc
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    pairs
      .join(codesArr, Seq("neighbor_id"))
      .join(broadcast(lutArr), Seq("query_id"))
      .withColumn("score", round(num / (col("__qn__") * col("__xn__")), model.scoreDecimals))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** Measured recall@k of IVF serving vs brute force, one row per
    * (nlist, nprobe) configuration — the data-driven sizing surface
    * for `nprobe` at scale. The two-level routed assignment is a
    * BLOCKING structure (the chosen cell may differ from the flat
    * argmax near group boundaries) and random-draw cells carry no
    * semantic coherence, so the only trustworthy recall number is a
    * MEASURED one on the operator's own corpus: run this on a
    * deterministic sample ([[Sampling.deterministicSample]]) with
    * candidate configs, read the (recall, probed_fraction) frontier,
    * and size `nprobe` from data instead of folklore.
    *
    * Output: `(nlist, nprobe, resolved_nlist, probed_fraction,
    * recall_at_k)` — `recall_at_k` is the micro-averaged fraction of
    * brute-force top-k pairs the IVF route reproduces (1.0 at
    * `nprobe >= resolved_nlist` by construction: probing every cell
    * IS brute force under the same tie rules); `probed_fraction` is
    * the cost side (`nprobe / resolved_nlist` of the corpus scanned
    * per query). The ground truth is computed ONCE and persisted;
    * each config then costs one ivfTopK + one semi-join count. The
    * per-config loop is driver-side by design — `configs` is a
    * handful of candidate settings, never data-sized.
    */
  def recallReport(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      configs: Seq[(Int, Int)],
      scoreDecimals: Int = 4
  ): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = corpus.sparkSession
    import spark.implicits._
    val truth = bruteForceTopK(corpus, queries, idCol, vecCol, k, scoreDecimals)
      .select(col("query_id"), col("neighbor_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val total = truth.count()
      val nzCount = dropZeroVectors(corpus, vecCol).count()
      // the per-config serves are INDEPENDENT given the persisted
      // truth — run them concurrently so one config's Catalyst
      // planning overlaps another's execution and short jobs back-fill
      // the tail (r20 opt, guide §2.6); `futs.map(_.get())` keeps the
      // declared configs order, and each value is a pure function of
      // its config, so the report is unchanged
      val rows = concurrently(configs) { case (nlist, nprobe) =>
        // clamped to the nonzero corpus count (r17, ADVICE r16):
        // ivfCentroids' limit(nlist) yields fewer cells when the
        // corpus is smaller than nlist, so the unclamped value would
        // overstate cost (probed_fraction) and delay the declared
        // "1.0 at nprobe >= resolved_nlist" point
        val resolved = math.min(
          (if (nlist == AutoNlist) autoNlist(nzCount) else nlist).toLong, nzCount).toInt
        val served = ivfTopK(corpus, queries, idCol, vecCol, k, nlist, nprobe, scoreDecimals)
          .select(col("query_id"), col("neighbor_id"))
        val hits = truth.join(served, Seq("query_id", "neighbor_id"), "left_semi").count()
        (nlist, nprobe, resolved,
          math.min(1.0, nprobe.toDouble / resolved),
          if (total == 0L) 0.0 else hits.toDouble / total)
      }
      rows.toDF("nlist", "nprobe", "resolved_nlist", "probed_fraction", "recall_at_k")
    } finally { truth.unpersist(); () }
  }

  /** Map `items` through `f` on a small thread pool and return the
    * results in input order — the guide §2.6 overlap-independent-jobs
    * pattern for the per-config recall serves (each config is its own
    * chain of Spark actions; serialized, every chain's planning gap
    * idles the cluster). Exceptions propagate (first failure rethrown
    * after all tasks settle).
    */
  private[pipeline] def concurrently[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.sizeIs <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(items.size, 4))
      try {
        val futs = items.map(a => pool.submit(new java.util.concurrent.Callable[B] {
          override def call(): B = f(a)
        }))
        futs.map(fu =>
          try fu.get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause })
      } finally { pool.shutdownNow(); () }
    }

  /** [[recallReport]] for a FITTED quantizer: sweep `nprobes` under
    * one trained centroid frame (a [[kmeansCentroids]] fit — or any
    * (cent_id, __cv__, __cn__) frame) instead of the md5 draw. This
    * is the report that justifies the training cost: compare its
    * frontier against [[recallReport]] at the same probed fractions
    * and keep the quantizer only where fitted recall clears random
    * (PipelineSpec pins fitted ≥ random at a 6% fraction on loose
    * clusters — the regime training exists for). Output matches
    * [[recallReport]] with `nlist` reported as the frame's cell
    * count.
    */
  def recallReportFitted(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobes: Seq[Int],
      centroids: DataFrame,
      scoreDecimals: Int = 4
  ): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = corpus.sparkSession
    import spark.implicits._
    // the driver budget fires BEFORE the collect materializes the
    // frame (r17, VERDICT r16 #4): one narrow (count, dim) aggregate
    // — executor-side, never driver-held — decides whether the
    // frame fits, so an oversized fitted quantizer fails with the
    // sizing knobs named instead of OOM-ing the driver mid-collect
    val stat = centroids.agg(count(lit(1)), max(size(col("__cv__")))).head()
    val nlist = stat.getLong(0).toInt
    val dim = if (nlist == 0) 0 else stat.getInt(1)
    require(nlist.toLong * dim <= MaxCentroidComponents,
      s"recallReportFitted: centroid frame is $nlist cells x $dim dims = " +
        s"${nlist.toLong * dim} components, over the ${MaxCentroidComponents}-component " +
        "driver budget (Similarity.MaxCentroidComponents) - the frame is collected AND " +
        "broadcast whole; train fewer cells (cap nlist below sqrt(n)), reduce the embedding " +
        "dim (randomProjection), or raise the budget on a bigger driver")
    // the frame is contractually broadcast-sized; materialize once so
    // a possibly-iterative training lineage doesn't replay per config
    val cents = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(centroids.collect(): _*), centroids.schema))
    val truth = bruteForceTopK(corpus, queries, idCol, vecCol, k, scoreDecimals)
      .select(col("query_id"), col("neighbor_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val total = truth.count()
      // independent per-nprobe serves overlapped, results in declared
      // order (r20 opt, guide §2.6 — see [[concurrently]])
      val rows = concurrently(nprobes) { nprobe =>
        val served = ivfTopK(corpus, queries, idCol, vecCol, k,
          nlist, nprobe, scoreDecimals, centroids = Some(cents))
          .select(col("query_id"), col("neighbor_id"))
        val hits = truth.join(served, Seq("query_id", "neighbor_id"), "left_semi").count()
        (nlist, nprobe, nlist,
          math.min(1.0, nprobe.toDouble / nlist),
          if (total == 0L) 0.0 else hits.toDouble / total)
      }
      rows.toDF("nlist", "nprobe", "resolved_nlist", "probed_fraction", "recall_at_k")
    } finally { truth.unpersist(); () }
  }

  /** Routing thresholds for [[ivfAssignTwoLevel]]: the flat
    * [[ivfAssign]] route is taken only when the centroid set has
    * fewer than [[TwoLevelMinNlist]] rows AND the vector side has
    * fewer than [[TwoLevelMinRows]] rows. Two distinct costs are
    * being balanced:
    *
    *  - the two-level route pays FIXED overhead (two extra
    *    aggregation stages, a membership broadcast, the eager
    *    materialization) that dominates at small inputs — measured
    *    at sf0.1 (n = 2k, nlist = 45) it cost ~2× the flat route;
    *  - the flat route ships n·nlist SCORED ROWS (vector payload
    *    included) through its rank exchange, while the two-level
    *    form map-side-combines to n grouped rows — at sf10 with a
    *    FIXED nlist = 16 quantizer the flat window moves 3.2M
    *    vector rows and measured ~10 s slower than the two-level
    *    route on the same query (q_ann_ivf_fitted), even though
    *    nlist is tiny.
    *
    * So: small nlist alone does not justify flat — only small
    * nlist × small n does. The bounds cap the flat candidate stream
    * at 64 × 100k rows; auto-sized callers ([[autoNlist]]) cross
    * the nlist bound at n ≈ 4k and never come near the corner.
    *
    * The route is part of the RESULT contract (the two routes may
    * pick different cells for a vector near a group boundary), so
    * the oracle SQL branches on the same two counts —
    * [[graft.OracleSql]] INTERPOLATES these constants into its route
    * guard (r16), so the two sides cannot drift if the thresholds
    * move.
    */
  private[graft] val TwoLevelMinNlist = 64

  /** See [[TwoLevelMinNlist]] — the vector-side row bound of the
    * flat route.
    */
  private[graft] val TwoLevelMinRows = 100000L

  /** Driver-memory budget for the centroid collect in
    * [[ivfAssignTwoLevel]], in vector COMPONENTS (nlist × dim
    * doubles). The centroid frame is contractually broadcast-sized —
    * every caller ships it whole to every executor — but it is the one
    * driver-held term that grows with corpus size under [[autoNlist]]
    * (nlist = √n): at n = 10¹⁰ and dim = 4k that is ~4×10⁸ doubles,
    * ~3 GB, and the collect would OOM the driver mid-job with a
    * generic heap error. The default budget (2²⁶ components = 512 MB
    * of doubles) fails such an index with a clear, actionable message
    * instead; callers with bigger drivers can raise it. (Spark's own
    * `spark.driver.maxResultSize` also bounds the collect, but its
    * error names neither the operator nor the sizing knobs.)
    */
  // @volatile (r17): tests and multi-threaded drivers (the managed
  // stream's maintenance daemon collects centroids off the trigger
  // thread) may set and read this from different threads
  @volatile private[graft] var MaxCentroidComponents: Long = 1L << 26

  /** Nearest-centroid cell assignment — the IVF routing used by every
    * build/append path. Two routes behind one contract-stable switch:
    *
    *  - FLAT ([[ivfAssign]](keep = 1)) when the centroid set has
    *    fewer than [[TwoLevelMinNlist]] rows, or when the centroid id
    *    type is not integral (strings etc. — the two-level tiebreak
    *    needs numeric negation; the flat window orders any type);
    *  - TWO-LEVEL otherwise, cutting the assignment asymptote from
    *    n·nlist to ~2·n·√nlist dot products: the ⌈√nlist⌉
    *    SUPER-centroids (the same md5-order draw rule as
    *    [[ivfCentroids]], taken FROM the centroid set) partition the
    *    centroids into coarse groups; each vector ranks the
    *    super-centroids first and then only the winner group's
    *    members. Both ranks keep the engine-portable (cosine rounded
    *    to `scoreDecimals` desc, id asc) rule, so the full route —
    *    super draw, membership, both ranks — replays exactly in the
    *    oracle.
    *
    * The centroid frame is contractually tiny (it is broadcast whole
    * by every caller), so it is collected ONCE into a literal local
    * relation: the route decision, the id-contract guard, and every
    * downstream reference reuse the same driver-held rows — a
    * potentially expensive centroid lineage (the md5-order corpus
    * limit, or a fitted k-means training) is never evaluated twice,
    * and the flat branch runs no extra job at all.
    *
    * Two-level specifics, by design:
    *  - the chosen cell may differ from the flat argmax when the
    *    globally nearest centroid sits outside the winner group (IVF
    *    cells are a blocking structure, not a semantic claim; the
    *    gated recall pins hold — see PipelineSpec);
    *  - vectors rank only LIVE super-cells (those that won at least
    *    one member in the membership rank), so every vector lands in
    *    a non-empty group even under rounded-cosine ties;
    *  - rank-1 is an ORDERED-STRUCT MAX AGGREGATION, not a window:
    *    map-side combine collapses each partition's candidate rows
    *    before the exchange, so the shuffle carries n rows (the
    *    grouped vectors) instead of the window form's n·nlist scored
    *    rows — and the level-2 agg reuses level-1's partitioning, so
    *    the whole route is ONE exchange. The (sim desc, id asc) rule
    *    becomes max over struct(sim, -id): the negation flips the
    *    tiebreak without touching the similarity component (no -0.0
    *    artifacts), which is exactly why the guard below requires
    *    integral NON-NEGATIVE centroid ids on this route — a negative
    *    id would invert the documented asc tiebreak silently.
    */
  private[graft] def ivfAssignTwoLevel(
      df: DataFrame,
      cents0: DataFrame,
      idCol: String,
      vecCol: String,
      pfx: String,
      scoreDecimals: Int,
      carryCols: Seq[String] = Nil,
      knownRows: Option[Long] = None
  ): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    import scala.jdk.CollectionConverters._
    val spark = cents0.sparkSession
    val rows = cents0.collect()
    // the driver-memory contract on this collect (VERDICT r15 #7):
    // nlist × dim must fit the documented budget — fail with the
    // sizing knobs named, not a generic heap error three stages later
    if (rows.nonEmpty) {
      val dim = rows.head.getSeq[Double](cents0.schema.fieldIndex("__cv__")).length
      require(rows.length.toLong * dim <= MaxCentroidComponents,
        s"ivfAssignTwoLevel: centroid frame is ${rows.length} cells x $dim dims = " +
          s"${rows.length.toLong * dim} components, over the ${MaxCentroidComponents}-component " +
          "driver budget (Similarity.MaxCentroidComponents) - the frame is collected AND " +
          "broadcast whole; train fewer cells (cap nlist below sqrt(n)), reduce the embedding " +
          "dim (randomProjection), or raise the budget on a bigger driver")
    }
    val cents = broadcast(spark.createDataFrame(rows.toList.asJava, cents0.schema))
    val idIdx = cents0.schema.fieldIndex("cent_id")
    val integralId = cents0.schema(idIdx).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    // the vector-side count runs ONLY when the centroid set is small
    // enough for flat to be in play — auto-sized paths with nlist
    // < 64 imply n ≲ 4k, so the count is trivial there; a fixed
    // small-nlist quantizer over a big corpus pays one narrow scan
    // and is repaid many times over by the routing it buys. Callers
    // that already counted the frame (the AutoNlist builds) pass
    // `knownRows` so the scan never runs twice (r20 opt).
    def smallCorpus: Boolean = knownRows.getOrElse(df.count()) < TwoLevelMinRows
    if (!integralId || (rows.length < TwoLevelMinNlist && smallCorpus)) {
      if (!integralId && rows.length >= TwoLevelMinNlist)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"ivfAssignTwoLevel: centroid id type ${cents0.schema(idIdx).dataType} is not integral; " +
            "routing FLAT (n·nlist) — use integral non-negative ids for the two-level (n·√nlist) route")
      ivfAssign(df, cents, idCol, vecCol, pfx, keep = 1, scoreDecimals, carryCols)
    } else {
      require(!rows.exists(r => r.isNullAt(idIdx) || java.lang.Long.parseLong(r.get(idIdx).toString) < 0L),
        "ivfAssignTwoLevel: centroid ids must be non-negative — the two-level tiebreak " +
          "negates the id for its (sim desc, id asc) rule; a negative id would invert it silently")
      // super draw: the same md5-order rule as ivfCentroids, applied
      // driver-side to the already-collected centroid rows (pure
      // SELECTION — no arithmetic to diverge from the oracle replay,
      // which re-derives it with SQL md5 + the same ASCII-hex order)
      val nsup = math.ceil(math.sqrt(rows.length.toDouble)).toInt
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(s: String): String = {
        md.reset()
        md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      }
      val supRows = rows
        .sortBy(r => (hex(r.get(idIdx).toString), java.lang.Long.parseLong(r.get(idIdx).toString)))
        .take(nsup)
      val sups0 = broadcast(spark.createDataFrame(supRows.toList.asJava, cents0.schema))
        .select(col("cent_id").as("__sup__"), col("__cv__").as("__sv__"), col("__cn__").as("__sn__"))
      // centroid -> super membership: tiny (nlist x nsup) broadcast
      // cross join, same rank rule
      val msim = round(dot(col("__cv__"), col("__sv__")) / (col("__cn__") * col("__sn__")), scoreDecimals)
      val mem = cents.crossJoin(sups0)
        .withColumn("__mk__", struct(msim.as("s"), (col("__sup__") * lit(-1)).as("i")))
        .groupBy(col("cent_id"), col("__cv__"), col("__cn__"))
        .agg(max(col("__mk__")).as("__mkw__"))
        .withColumn("__sup__", col("__mkw__").getField("i") * lit(-1))
        .drop("__mkw__")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.Cleanup.defer(() => { mem.unpersist(); () })
      // the membership frame is tiny (one row per centroid) and below
      // it feeds only driver-side collection — materialize via the
      // collect itself (the former mem.count() warm-up job is gone,
      // r19 opt)
      // live super-cells (those that won >= 1 member), vectors
      // included — every centroid appears exactly once as a mem
      // cent_id, so the super's own row supplies its vector
      val live =
        mem.select(col("cent_id").as("__sup__"), col("__cv__").as("__sv__"), col("__cn__").as("__sn__"))
          .join(mem.select(col("__sup__")).distinct(), Seq("__sup__"))
      // PACKED two-level routing (r19 opt, guide §2.4): the former
      // crossJoin + max(struct) aggregations shuffled the corpus
      // TWICE (hash-agg exchanges keyed on the row, vectors riding
      // along). Both levels are per-row argmaxes over frames the
      // driver already holds whole, so route in ONE projection with
      // zero exchanges: level 1 picks the nearest live super
      // ([[graft.plans.PqArgBestExpr]] — the same rounded cosine and
      // the same (sim desc, id asc) tiebreak with the aggregation
      // form's NaN/null placement), and level 2's `subId` child is
      // the level-1 winner index, selecting that super's member-cell
      // array. Values bit-identical: same metric expressions over
      // the same collected doubles, same comparator semantics (see
      // PqArgBestExpr's contract note).
      val liveRows = live.select(col("__sup__"),
        col("__sv__").cast("array<double>"), col("__sn__")).collect()
      val memRows = mem.select(col("cent_id").cast("long"),
        col("__cv__").cast("array<double>"), col("__cn__"),
        col("__sup__").cast("long")).collect()
      val supIds = liveRows.map(r => java.lang.Long.parseLong(r.get(0).toString))
      val supVs = liveRows.map(_.getSeq[Double](1).toArray)
      val supNs = liveRows.map(_.getDouble(2))
      val memBySup: Map[Long, Array[org.apache.spark.sql.Row]] = memRows.groupBy(_.getLong(3))
      val memIds = supIds.map(s => memBySup(s).map(_.getLong(0)))
      val memVs = supIds.map(s => memBySup(s).map(_.getSeq[Double](1).toArray))
      val memNs = supIds.map(s => memBySup(s).map(_.getDouble(2)))
      val base = df.select(Seq(col(idCol).as(s"${pfx}_id"), col(vecCol).as(s"__${pfx}v__"),
        norm(col(vecCol)).as(s"__${pfx}n__")) ++ carryCols.map(col): _*)
      val supIdx = graft.internal.exprColumn(graft.plans.PqArgBestExpr(
        graft.internal.columnExpr(col(s"__${pfx}v__").cast("array<double>")),
        graft.internal.columnExpr(col(s"__${pfx}n__")),
        graft.internal.columnExpr(lit(0)),
        Array(supIds), Array(supVs), Array(supNs), scoreDecimals, l2 = false))
      val centIdx = graft.internal.exprColumn(graft.plans.PqArgBestExpr(
        graft.internal.columnExpr(col(s"__${pfx}v__").cast("array<double>")),
        graft.internal.columnExpr(col(s"__${pfx}n__")),
        graft.internal.columnExpr(col("__si__")),
        memIds, memVs, memNs, scoreDecimals, l2 = false))
      base.withColumn("__si__", supIdx)
        // preserve the centroid frame's id type (the long literal
        // lookup would otherwise widen an int cent_id)
        .withColumn("cent_id",
          element_at(element_at(typedLit(memIds.map(_.toSeq).toSeq), col("__si__") + 1),
            centIdx + 1).cast(cents0.schema(idIdx).dataType))
        .drop("__si__")
    }
  }

  /** Nearest `keep` centroids per row (norms staged per row/centroid;
    * ties on rounded similarity rank by centroid id so assignment is
    * exact across engines): (pfx_id, __pfxv__, __pfxn__, cent_id).
    */
  private[graft] def ivfAssign(
      df: DataFrame,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      pfx: String,
      keep: Int,
      scoreDecimals: Int,
      carryCols: Seq[String] = Nil
  ): DataFrame = {
    // keep=1 PACKED route (r19 opt): rank-1 nearest-centroid is the
    // same per-row argbest the PQ encode runs — one projection over
    // the collected centroid frame ([[graft.plans.PqArgBestExpr]],
    // same rounded cosine, same (sim desc, id asc) tiebreak with the
    // window defaults' NaN/null placement), replacing the
    // crossJoin × per-row window sort that shuffled the corpus with
    // its vectors. Non-integral / overflow-risk ids keep the window.
    if (keep == 1) {
      import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
      val sch = cents.schema
      val ok = Seq("cent_id", "__cv__", "__cn__").forall(sch.fieldNames.contains) &&
        (sch(sch.fieldIndex("cent_id")).dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        })
      if (ok) {
        val rows = cents.select(col("cent_id").cast("long"),
          col("__cv__").cast("array<double>"), col("__cn__")).collect()
        if (rows.nonEmpty && !rows.exists(r => r.isNullAt(0) || r.getLong(0) == Long.MinValue)) {
          val ids = rows.map(_.getLong(0))
          val vs = rows.map(_.getSeq[Double](1).toArray)
          val ns = rows.map(_.getDouble(2))
          val base = df.select(Seq(col(idCol).as(s"${pfx}_id"),
            col(vecCol).as(s"__${pfx}v__"),
            norm(col(vecCol)).as(s"__${pfx}n__")) ++ carryCols.map(col): _*)
          val idx = graft.internal.exprColumn(graft.plans.PqArgBestExpr(
            graft.internal.columnExpr(col(s"__${pfx}v__").cast("array<double>")),
            graft.internal.columnExpr(col(s"__${pfx}n__")),
            graft.internal.columnExpr(lit(0)),
            Array(ids), Array(vs), Array(ns), scoreDecimals, l2 = false))
          // preserve the centroid frame's id type (the long literal
          // lookup would otherwise widen an int cent_id)
          return base.withColumn("cent_id",
            element_at(typedLit(ids.toSeq), idx + 1)
              .cast(sch(sch.fieldIndex("cent_id")).dataType))
        }
      }
    }
    ivfAssignRanked(df, cents, idCol, vecCol, pfx, keep, scoreDecimals, carryCols)
      .drop("__cr__")
  }

  /** The window form of [[ivfAssign]] KEEPING the per-row rank column
    * `__cr__` (1-based nearest-centroid order). A caller that serves
    * several probe widths from one routing pass filters
    * `__cr__ <= width` instead of re-ranking — row_number's prefix
    * property makes the filtered frame identical to a fresh
    * keep = width assignment (r20 opt: the adaptive serve routed its
    * queries twice, once for the estimate and once widened).
    */
  private[graft] def ivfAssignRanked(
      df: DataFrame,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      pfx: String,
      keep: Int,
      scoreDecimals: Int,
      carryCols: Seq[String] = Nil
  ): DataFrame = {
    val scored = df
      .select(Seq(col(idCol).as(s"${pfx}_id"), col(vecCol).as(s"__${pfx}v__"),
        norm(col(vecCol)).as(s"__${pfx}n__")) ++ carryCols.map(col): _*)
      .crossJoin(cents)
      .withColumn("__csim__",
        round(dot(col(s"__${pfx}v__"), col("__cv__")) / (col(s"__${pfx}n__") * col("__cn__")), scoreDecimals))
    val w = Window.partitionBy(col(s"${pfx}_id")).orderBy(col("__csim__").desc, col("cent_id").asc)
    scored
      .withColumn("__cr__", row_number().over(w))
      .where(col("__cr__") <= keep)
      .drop("__cv__", "__cn__", "__csim__")
  }
}
