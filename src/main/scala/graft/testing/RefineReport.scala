package graft.testing

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{IvfIndex, Similarity}

/** One-shot measurement harness for the r19 REFINE records: what the
  * IVFPQ+refine rung costs and buys on the compressed layouts, against
  * the ORIGINAL float corpus as truth.
  *
  * The r19 three-layout frontier showed compressed recall saturating
  * at the ADC quantization ceiling (pq m8/k256 unfiltered full-probe
  * recall ≈ 0.23 on this corpus): past a point, probing more cells
  * buys nothing because the 8-byte codes mis-ORDER the candidates.
  * The refine rung stores the int8 triple (d bytes/row) next to the
  * ranks and re-ranks the top `refine` ADC candidates by exact
  * integer dot — this report records recall@10 at fixed nprobe for
  * refine ∈ {0, 5k, 20k-ish}, the float-layout recall at the same
  * nprobe (the coverage ceiling refine can at best reach), serve
  * times, and the on-disk bytes/vector of each layout.
  *
  * Usage: runMain graft.testing.RefineReport <sfDir> <workDir>
  */
object RefineReport {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RefineReport <sfDir> <workDir>")
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
        col("label"))
    val n = e.count()
    val q = e.where(col("vec_id") % 50 === 0).select("vec_id", "emb")
    println(s"[refine] corpus rows: $n  queries: ${q.count()}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(workDir))

    def dirBytes(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else f.listFiles().map(c => dirBytes(c.getPath)).sum
    }
    // cell-layout bytes only (sidecars are metadata-sized)
    def cellBytes(p: String): Long =
      new java.io.File(p).listFiles().filter(_.getName.startsWith("cent_id="))
        .map(c => dirBytes(c.getPath)).sum

    val truth = Similarity.bruteForceTopK(e, q, "vec_id", "emb", k = 10)
      .select("query_id", "neighbor_id").persist()
    val total = truth.count()
    def recallOf(served: org.apache.spark.sql.DataFrame): Double = {
      val hits = truth.join(served.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      if (total == 0) 0.0 else hits.toDouble / total
    }

    // float baseline: the coverage ceiling at each nprobe
    val pf = s"$workDir/float"
    IvfIndex.build(e, "vec_id", "emb", pf, nlist = Similarity.AutoNlist)
    println(f"[refine] float      bytes/vector: ${cellBytes(pf).toDouble / n}%8.1f")
    val nprobes = Seq(4, 16, 64)
    val floatRec = nprobes.map { np =>
      np -> recallOf(IvfIndex.searchTopK(spark, pf, q, "vec_id", "emb", k = 10, nprobe = np))
    }.toMap
    nprobes.foreach(np => println(f"[refine] float      nprobe=$np%4d recall@10=${floatRec(np)}%6.4f"))

    def report(name: String, path: String): Unit = {
      println(f"[refine] $name%-10s bytes/vector: ${cellBytes(path).toDouble / n}%8.1f")
      for (np <- nprobes; rf <- Seq(0, 50, 200)) {
        val t0 = System.nanoTime()
        val r = recallOf(IvfIndex.searchTopK(spark, path, q, "vec_id", "emb", k = 10,
          nprobe = np, refine = rf))
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[refine] $name%-10s nprobe=$np%4d refine=$rf%4d " +
          f"recall@10=$r%6.4f ($dt%5.2fs) float-ceiling=${floatRec(np)}%6.4f")
      }
    }

    val ppq = s"$workDir/pqref"
    IvfIndex.buildPq(e, "vec_id", "emb", ppq, dims = 64, m = 8, ksub = 256, iters = 1,
      nlist = Similarity.AutoNlist, refineInt8 = true)
    report("pq+int8", ppq)
    val ppqr = s"$workDir/pqrref"
    IvfIndex.buildPq(e, "vec_id", "emb", ppqr, dims = 64, m = 8, ksub = 256, iters = 1,
      nlist = Similarity.AutoNlist, residual = true, refineInt8 = true)
    report("pqr+int8", ppqr)
    // the plain-PQ byte floor, for the size column of the record
    val ppq0 = s"$workDir/pq0"
    IvfIndex.buildPq(e, "vec_id", "emb", ppq0, dims = 64, m = 8, ksub = 256, iters = 1,
      nlist = Similarity.AutoNlist)
    println(f"[refine] pq-plain   bytes/vector: ${cellBytes(ppq0).toDouble / n}%8.1f")

    // the filtered production serve: adaptive widening + refine on the
    // compressed store (payload + histogram twin of the pq store)
    val eLab = e
    val pfl = s"$workDir/pqref-lab"
    IvfIndex.buildPq(eLab, "vec_id", "emb", pfl, dims = 64, m = 8, ksub = 256, iters = 1,
      nlist = Similarity.AutoNlist, payloadCols = Seq("label"),
      histogramCols = Seq("label"), refineInt8 = true)
    val pred = col("label") === 3
    val ftruth = Similarity.bruteForceTopK(e.where(pred), q, "vec_id", "emb", k = 10)
      .select("query_id", "neighbor_id").persist()
    val ftot = ftruth.count()
    def frecallOf(served: org.apache.spark.sql.DataFrame): Double = {
      val hits = ftruth.join(served.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      if (ftot == 0) 0.0 else hits.toDouble / ftot
    }
    Seq(0, 200).foreach { rf =>
      val t0 = System.nanoTime()
      val r = frecallOf(IvfIndex.searchTopKAdaptive(spark, pfl, q, "vec_id", "emb",
        k = 10, nprobe = 16, filter = Some(pred), refine = rf))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[refine] pq+lab     ADAPTIVE base=16 refine=$rf%4d " +
        f"filtered-recall@10=$r%6.4f ($dt%5.2fs)")
    }
    ftruth.unpersist()
    truth.unpersist()
    spark.stop()
  }
}
