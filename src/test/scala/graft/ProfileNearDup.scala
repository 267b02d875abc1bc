package graft.pipeline

import org.apache.spark.sql.{functions => F, SparkSession}


/** Scratch profiler for the near-dup pipeline phases (not a test). */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    time("warm count")(docs.count())
    (1 to 3).foreach { round =>
      val sh = Dedup.shingleFrame(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"r$round shingle frame")(sh.count())
      val sig = sh.select(F.col("__id__"), Dedup.minhashSignatureUdf(8)(F.col("__sg__")).as("__sig__"))
      time(s"r$round minhash sig")(sig.count())
      val (cands, cleanup) = Dedup.minhashCandidatesFromShingles(sh, 8, 4, 1000)
      val c = cands.persist()
      time(s"r$round candidates")(println(s"[prof]   n_cands = ${c.count()}"))
      val out = c
        .join(sh.select(F.col("__id__").as("id_a"), F.col("__sg__").as("__sga__")), Seq("id_a"))
        .join(sh.select(F.col("__id__").as("id_b"), F.col("__sg__").as("__sgb__")), Seq("id_b"))
        .select(F.col("id_a"), F.col("id_b"),
          Dedup.jaccardOfShingleArrays(F.col("__sga__"), F.col("__sgb__")).as("jac"))
      time(s"r$round jaccard verify")(out.where(F.col("jac") >= 0.5).count())
      cleanup(); c.unpersist(); sh.unpersist()
    }
    spark.stop()
  }
}
