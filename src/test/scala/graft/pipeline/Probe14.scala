package graft.pipeline
import org.apache.spark.sql.{SparkSession, functions => F}

/** Diagnostic stage-timing probe for the near-dup pipeline (test
  * sourceset only — not part of the library). Usage:
  * `sbt "Test/runMain graft.pipeline.Probe14 <sfDir> <stage>"` with
  * stage in {shingle,cands,cands0,verified,verified0,all}.
  */
object Probe14 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
    val which = if (args.length > 1) args(1) else "all"
    which match {
      case "shingle" => time("shingleFrame") {
        val sgf = docs.select(F.col("doc_id").as("__id__"),
          F.array_distinct(Dedup.shinglesFromWordsUdf(3)(Dedup.splitWords(F.col("text")))).as("__sg__"))
          .where(F.size(F.col("__sg__")) > 0)
        println("  n_docs=" + sgf.count())
      }
      case "cands" => time("candidates_prefiltered") {
        val sgf = docs.select(F.col("doc_id").as("__id__"),
          F.array_distinct(Dedup.shinglesFromWordsUdf(3)(Dedup.splitWords(F.col("text")))).as("__sg__"))
          .where(F.size(F.col("__sg__")) > 0).persist()
        val (c, cl) = Dedup.minhashCandidatesFromShingles(sgf, 8, 4, 1000, minJaccard = 0.5)
        println("  n_cands=" + c.count()); cl()
      }
      case "cands0" => time("candidates_unfiltered") {
        val sgf = docs.select(F.col("doc_id").as("__id__"),
          F.array_distinct(Dedup.shinglesFromWordsUdf(3)(Dedup.splitWords(F.col("text")))).as("__sg__"))
          .where(F.size(F.col("__sg__")) > 0).persist()
        val (c, cl) = Dedup.minhashCandidatesFromShingles(sgf, 8, 4, 1000)
        println("  n_cands=" + c.count()); cl()
      }
      case "verified" => time("verified_full") {
        val (vv, cl) = Dedup.jaccardCandidatesWithCleanup(docs, "doc_id", "text", minJaccard = 0.5)
        println("  n_verified=" + vv.count()); cl()
      }
      case "verified0" => time("verified_nofilter") {
        val (vv, cl) = Dedup.jaccardCandidatesWithCleanup(docs, "doc_id", "text")
        println("  n_verified=" + vv.where(F.col("jac") >= 0.5).count()); cl()
      }
      case _ => time("groups_full") {
        val (g, cl) = Dedup.nearDupGroupsWithCleanup(docs, "doc_id", "text", 0.5)
        println("  n_groups=" + g.count()); cl()
      }
    }
    spark.stop()
  }
}
