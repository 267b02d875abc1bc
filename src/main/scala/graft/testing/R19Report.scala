package graft.testing

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{IvfIndex, Similarity}

/** One-shot measurement harness for the r19 COVERAGE records: the
  * filtered-recall frontier across ALL THREE persisted layouts
  * (float, raw PQ m=8/ksub=256, residual PQ) — the quantization ×
  * selectivity interaction VERDICT r18 called the last unmeasured
  * axis of the serving surface — at TWO selectivity regimes:
  *  - ~10% (`label = 3`), the regime r18 already recorded, and
  *  - ~1% (a derived rare label: `vec_id % 97 → 99`), the regime
  *    where `ceil(nprobe/sel)` saturates and the r18 adaptive path
  *    fell back to a full probe (VERDICT r18 Missing #4 / Wrong #2).
  * For the rare regime it also measures what the r19
  * histogram-bounded adaptive serve costs and buys: recall at the
  * uncapped widening vs a `maxProbe` cap, with the probed-cell count
  * the histogram restriction actually touches.
  *
  * Usage: runMain graft.testing.R19Report <sfDir> <workDir>
  */
object R19Report {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R19Report <sfDir> <workDir>")
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
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
        when(col("vec_id") % 97 === 0, lit(99)).otherwise(col("label")).as("label"))
    val n = e.count()
    val sel3 = e.where(col("label") === 3).count().toDouble / n
    val sel99 = e.where(col("label") === 99).count().toDouble / n
    println(f"[r19] corpus rows: $n  label=3 sel: $sel3%.4f  label=99 sel: $sel99%.5f")
    val q = e.where(col("vec_id") % 50 === 0).select("vec_id", "emb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(workDir))

    def frontier(name: String, path: String): Unit =
      Seq(3 -> "~10%", 99 -> "~1%").foreach { case (lbl, tag) =>
        val pred = col("label") === lbl
        val nprobes = Seq(4, 16, 64)
        val unf = IvfIndex.recallReport(spark, path, q, "vec_id", "emb", k = 10, nprobes,
          truthCorpus = Some(e))
          .collect().map(r => r.getInt(1) -> (r.getDouble(3), r.getDouble(4))).toMap
        val fil = IvfIndex.recallReport(spark, path, q, "vec_id", "emb", k = 10, nprobes,
          truthCorpus = Some(e), filter = Some(pred))
          .collect().map(r => r.getInt(1) -> r.getDouble(4)).toMap
        nprobes.foreach { np =>
          println(f"[r19] $name%-10s label=$lbl%2d ($tag%4s) nprobe=$np%4d " +
            f"probed=${unf(np)._1}%6.4f recall@10 unfiltered=${unf(np)._2}%6.4f " +
            f"filtered=${fil(np)}%6.4f")
        }
        val truth = Similarity.bruteForceTopK(e.where(pred), q, "vec_id", "emb", k = 10)
          .select("query_id", "neighbor_id").persist()
        val total = truth.count()
        def recallOf(served: org.apache.spark.sql.DataFrame): Double = {
          val hits = truth.join(served.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi").count()
          if (total == 0) 0.0 else hits.toDouble / total
        }
        Seq(4, 16).foreach { np =>
          val t0 = System.nanoTime()
          val r0 = recallOf(IvfIndex.searchTopKAdaptive(spark, path, q, "vec_id", "emb",
            k = 10, nprobe = np, filter = Some(pred)))
          val t1 = System.nanoTime()
          val rCap = recallOf(IvfIndex.searchTopKAdaptive(spark, path, q, "vec_id", "emb",
            k = 10, nprobe = np, filter = Some(pred), maxProbe = 16))
          val t2 = System.nanoTime()
          println(f"[r19] $name%-10s label=$lbl%2d ($tag%4s) ADAPTIVE base=$np%3d " +
            f"recall@10 uncapped=$r0%6.4f (${(t1 - t0) / 1e9}%5.2fs) " +
            f"maxProbe16=$rCap%6.4f (${(t2 - t1) / 1e9}%5.2fs)")
        }
        truth.unpersist(); ()
      }

    val pf = s"$workDir/float"
    IvfIndex.build(e, "vec_id", "emb", pf, nlist = Similarity.AutoNlist,
      payloadCols = Seq("label"), histogramCols = Seq("label"))
    frontier("float", pf)
    val ppq = s"$workDir/pq"
    IvfIndex.buildPq(e, "vec_id", "emb", ppq, dims = 64, m = 8, ksub = 256, iters = 1,
      nlist = Similarity.AutoNlist, payloadCols = Seq("label"),
      histogramCols = Seq("label"))
    frontier("pq-m8k256", ppq)
    val ppqr = s"$workDir/pqr"
    IvfIndex.buildPq(e, "vec_id", "emb", ppqr, dims = 64, m = 8, ksub = 256, iters = 1,
      nlist = Similarity.AutoNlist, residual = true, payloadCols = Seq("label"),
      histogramCols = Seq("label"))
    frontier("pqr-m8k256", ppqr)
    spark.stop()
  }
}
