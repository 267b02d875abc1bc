package graft.testing

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{IvfIndex, Similarity}

/** One-shot measurement harness for the r18 COVERAGE records:
  * builds payload-bearing float and PQ stores over a scale dir's
  * embeddings and prints the FILTERED-recall frontier — truth =
  * brute force over the filtered corpus, serving = the filtered
  * probed-cell search — next to the unfiltered frontier at the same
  * nprobe, plus the recall the selectivity-aware adaptive probe
  * recovers. This is the receipt for "an operator can SEE the
  * selectivity-induced recall drop and size nprobe for it".
  *
  * Usage: runMain graft.testing.R18Report <sfDir> <workDir>
  */
object R18Report {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R18Report <sfDir> <workDir>")
    val Array(sfDir, workDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"), col("label"))
    val n = e.count()
    val sel = e.where(col("label") === 3).count().toDouble / n
    println(f"[r18] corpus rows: $n  label=3 selectivity: $sel%.4f")
    val q = e.where(col("vec_id") % 50 === 0).select("vec_id", "emb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(workDir))
    val pred = col("label") === 3

    def frontier(name: String, path: String): Unit = {
      // truth = ORIGINAL float vectors (with payload), so compressed
      // stores measure true recall, not reconstruction-relative
      val nprobes = Seq(4, 16, 64)
      val unf = IvfIndex.recallReport(spark, path, q, "vec_id", "emb", k = 10, nprobes,
        truthCorpus = Some(e))
        .collect().map(r => r.getInt(1) -> (r.getDouble(3), r.getDouble(4))).toMap
      val fil = IvfIndex.recallReport(spark, path, q, "vec_id", "emb", k = 10, nprobes,
        truthCorpus = Some(e), filter = Some(pred))
        .collect().map(r => r.getInt(1) -> r.getDouble(4)).toMap
      nprobes.foreach { np =>
        println(f"[r18] $name%-10s nprobe=$np%4d probed=${unf(np)._1}%6.4f " +
          f"recall@10 unfiltered=${unf(np)._2}%6.4f filtered=${fil(np)}%6.4f")
      }
      // adaptive: base nprobe widened by measured selectivity — the
      // recall an operator gets WITHOUT hand-tuning per predicate
      val truth = Similarity.bruteForceTopK(e.where(pred), q, "vec_id", "emb", k = 10)
        .select("query_id", "neighbor_id").persist()
      val total = truth.count()
      Seq(4, 16).foreach { np =>
        val served = IvfIndex.searchTopKAdaptive(spark, path, q, "vec_id", "emb",
          k = 10, nprobe = np, filter = Some(pred)).select("query_id", "neighbor_id")
        val hits = truth.join(served, Seq("query_id", "neighbor_id"), "left_semi").count()
        println(f"[r18] $name%-10s ADAPTIVE base nprobe=$np%4d " +
          f"filtered recall@10=${if (total == 0) 0.0 else hits.toDouble / total}%6.4f")
      }
      truth.unpersist(); ()
    }

    val pf = s"$workDir/float"
    IvfIndex.build(e, "vec_id", "emb", pf, nlist = Similarity.AutoNlist,
      payloadCols = Seq("label"))
    frontier("float", pf)
    val ppq = s"$workDir/pq"
    IvfIndex.buildPq(e, "vec_id", "emb", ppq, dims = 64, m = 8, ksub = 256, iters = 1,
      nlist = Similarity.AutoNlist, payloadCols = Seq("label"))
    frontier("pq-m8k256", ppq)
    spark.stop()
  }
}
