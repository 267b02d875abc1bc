package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED IVF index: the serving face of [[Similarity.ivfTopK]].
  *
  * [[Similarity.ivfTopK]] recomputes cell assignment for the whole
  * corpus on every call — right for one-shot analytics, wrong for a
  * 100 TB embedding corpus queried repeatedly. This index writes the
  * corpus ONCE, partitioned on disk by centroid cell
  * (`cent_id=<id>/` directories via
  * [[graft.sources.Sink.writePartitioned]]), with the frozen
  * centroid table alongside under `_centroids/` (the underscore
  * prefix hides it from the cell reader's file discovery). Serving
  * then routes queries to their `nprobe` cells and reads ONLY those
  * partitions — the probed cell ids become parquet PartitionFilters,
  * so the scan lists nprobe/nlist of the directories and touches
  * none of the rest, no matter how large the corpus
  * (IvfIndexSpec pins the pruned scan in the physical plan).
  *
  * The cell lookup is a driver-side `collect()` of the DISTINCT
  * probed cell ids — bounded by `nlist` (tens to thousands), the
  * same cardinality any partition-pruning predicate carries; never
  * data-sized.
  *
  * Incremental maintenance: [[appendBatch]] assigns a new batch
  * under the FROZEN centroids (standard IVF practice — cells drift
  * only when the quantizer is retrained, which is a [[build]]) and
  * key-upserts it into the cell layout
  * ([[graft.sources.Sink.upsertPartitioned]]): re-ingested ids
  * replace their old row even if they move cells is NOT needed —
  * frozen centroids pin an id to one cell, so the upsert rewrites
  * in place.
  *
  * Search results are bit-identical to [[Similarity.ivfTopK]] with
  * the same parameters (vectors and norms round-trip parquet doubles
  * exactly; the scoring expression is the same), so the stored path
  * shares q_ann_ivf's oracle.
  */
object IvfIndex {

  private val CentroidsDir = "_centroids"

  /** Build (or rebuild) the index at `path`: pick the deterministic
    * [[Similarity.ivfCentroids]] draw, assign every corpus row to
    * its nearest cell, write cells as partitioned parquet and the
    * centroid table under `_centroids/`. Zero vectors are excluded
    * (cosine undefined), like every Similarity path.
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nlist: Int = 16,
      scoreDecimals: Int = 4
  ): Unit = {
    val nz = Similarity.dropZeroVectors(corpus, vecCol)
    val cents = Similarity.ivfCentroids(nz, idCol, vecCol, nlist)
    val assigned = Similarity
      .ivfAssign(nz, cents, idCol, vecCol, "row", keep = 1, scoreDecimals)
      .select(col("cent_id"), col("row_id").as(idCol),
        col("__rowv__").as(vecCol), col("__rown__").as("__vn__"))
    graft.sources.Sink.writePartitioned(
      assigned, path, partitionCols = Seq("cent_id"), sortCols = Seq(idCol))
    cents.write.mode("overwrite").parquet(s"$path/$CentroidsDir")
  }

  /** Upsert a new batch of vectors into an existing index under its
    * frozen centroids: only the touched cells' partitions rewrite.
    */
  def appendBatch(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      scoreDecimals: Int = 4
  ): Unit = {
    val cents = broadcast(spark.read.parquet(s"$path/$CentroidsDir"))
    val nz = Similarity.dropZeroVectors(batch, vecCol)
    val assigned = Similarity
      .ivfAssign(nz, cents, idCol, vecCol, "row", keep = 1, scoreDecimals)
      .select(col("cent_id"), col("row_id").as(idCol),
        col("__rowv__").as(vecCol), col("__rown__").as("__vn__"))
    graft.sources.Sink.upsertPartitioned(
      spark, path, assigned, keyCols = Seq(idCol),
      partitionCols = Seq("cent_id"), sortCols = Seq(idCol))
    ()
  }

  /** Cosine top-k against the stored index: route queries to their
    * `nprobe` nearest cells, scan ONLY those cell partitions, score,
    * rank (rounded score desc, id asc). Bit-identical to
    * [[Similarity.ivfTopK]] at equal (nlist, nprobe, scoreDecimals).
    */
  def searchTopK(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 4,
      scoreDecimals: Int = 4
  ): DataFrame = {
    val cents = broadcast(spark.read.parquet(s"$path/$CentroidsDir"))
    val qNz = Similarity.dropZeroVectors(queries, vecCol)
    val qCells = Similarity
      .ivfAssign(qNz, cents, idCol, vecCol, "query", keep = nprobe, scoreDecimals)
    // the partition-pruning predicate: distinct probed cells, <= nlist
    // values by construction
    val probed = qCells.select(col("cent_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val cells = spark.read.parquet(path)
      .where(col("cent_id").isin(probed: _*))
      .select(col("cent_id").cast("long").as("cent_id"),
        col(idCol).as("neighbor_id"), col(vecCol).as("__nv__"), col("__vn__"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    qCells
      .join(cells, Seq("cent_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        round(Similarity.dot(col("__queryv__"), col("__nv__")) /
          (col("__queryn__") * col("__vn__")), scoreDecimals))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }
}
