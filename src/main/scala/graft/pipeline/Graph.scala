package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analysis over an edge list — the web-graph quality
  * signals (PageRank-family centrality) crawl pipelines score pages
  * with, fed by [[UrlOps.outlinks]] edges.
  */
object Graph {

  /** PageRank by power iteration, every step deterministic and
    * engine-portable (the kmeans recipe): ranks round to `decimals`
    * each round, so the DuckDB oracle replays the exact trajectory
    * with unrolled CTEs. The update is the standard
    * dangling-mass-redistributing form:
    *
    *   p'(v) = round((1-d)/N + d * (sum over edges u->v of
    *           p(u)/outdeg(u)  +  dangling/N), decimals)
    *
    * with `dangling` the summed rank of zero-outdegree nodes.
    *
    * Scale shape per iteration: edge contributions shuffle once keyed
    * on dst with map-side combine (edges carry ids only, never
    * payloads); N and the dangling mass are broadcast scalar aggs;
    * the node frame (id, outdeg) is computed once and persisted. No
    * driver collect; iteration count is the caller's convergence
    * budget (fixed-iteration PageRank is the standard corpus-scoring
    * form — convergence-tested loops belong offline).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85,
      decimals: Int = 6
  ): DataFrame =
  {
    val (out, release) = pageRankWithCleanup(edges, srcCol, dstCol, iters, damping, decimals)
    graft.Cleanup.deferFragile(release) // releases checkpoint blocks
    out
  }

  /** [[pageRank]] plus the cleanup thunk releasing the persisted
    * edge + node frames (both are read every iteration; without the
    * persist each round would re-derive them from the source plan).
    */
  def pageRankWithCleanup(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85,
      decimals: Int = 6
  ): (DataFrame, () => Unit) = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges
      .select(col(srcCol).cast("string").as("src"), col(dstCol).cast("string").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val outdeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("__deg__"))
    val base = nodes
      .join(outdeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("__deg__"), lit(0L)).as("__deg__"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDf = broadcast(base.agg(count(lit(1)).cast("double").as("__n__")))
    // each round reads the previous ranks TWICE (dangling mass +
    // contributions), so every round must materialize — but only the
    // CURRENT round's blocks are live input. Eager localCheckpoint +
    // immediate release of round N-1 (the connectedComponents
    // pattern, Dedup.scala) keeps at most two rounds cached at any
    // instant instead of O(iters) frames held to the cleanup thunk,
    // and truncates lineage so recompute can't go exponential.
    var (ranks, releaseRanks) = graft.internal.localCheckpointTracked(
      base.crossJoin(nDf)
        .select(col("node"), col("__deg__"), col("__n__"),
          round(lit(1.0) / col("__n__"), decimals).as("rank")),
      eager = true)
    for (_ <- 1 to iters) {
      val dangling = broadcast(ranks.where(col("__deg__") === 0)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm__")))
      val contribs = e
        // dangling rows can't join (no outgoing edges) — filtering
        // them first keeps the join input minimal and avoids even
        // producing the IEEE-infinite rank/0.0 rows
        .join(ranks.where(col("__deg__") > 0)
          .select(col("node").as("src"), (col("rank") / col("__deg__")).as("__c__")),
          Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__c__")).as("__in__"))
      val (updated, releaseUpdated) = graft.internal.localCheckpointTracked(
        base.crossJoin(nDf)
          .join(contribs, Seq("node"), "left")
          .crossJoin(dangling)
          .select(col("node"), col("__deg__"), col("__n__"),
            round((lit(1.0) - lit(damping)) / col("__n__") +
              lit(damping) * (coalesce(col("__in__"), lit(0.0)) + col("__dm__") / col("__n__")),
              decimals).as("rank")),
        eager = true)
      releaseRanks() // round N-1's blocks are superseded by round N
      ranks = updated
      releaseRanks = releaseUpdated
    }
    (ranks.select(col("node"), col("rank")),
      () => { e.unpersist(); base.unpersist(); releaseRanks() })
  }

  /** Collapse a URL-level edge list to the HOST graph: both endpoints
    * map through [[UrlOps.urlHost]], intra-host edges (the vast
    * majority of a real crawl's links — nav bars, pagination) drop,
    * and parallel edges dedup to one `(host_src, host_dst)` pair.
    * Feeding the result to [[pageRank]] gives domain-level centrality
    * — the crawl-prioritization view (which DOMAINS matter) rather
    * than the page view.
    *
    * Scale shape: the host map is per-row codegen'd expressions that
    * pipeline with the scan; the only shuffle is the distinct on the
    * collapsed pairs, whose cardinality is |hosts|² -bounded and in
    * practice orders of magnitude below the URL edge count — the
    * whole point of aggregating before iterating.
    */
  def hostEdges(edges: DataFrame, srcUrlCol: String, dstUrlCol: String): DataFrame =
    edges
      .select(
        UrlOps.urlHost(col(srcUrlCol)).as("host_src"),
        UrlOps.urlHost(col(dstUrlCol)).as("host_dst"))
      .where(col("host_src") =!= "" && col("host_dst") =!= "" &&
        col("host_src") =!= col("host_dst"))
      .distinct()
}
