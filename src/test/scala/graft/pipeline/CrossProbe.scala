package graft.pipeline
import org.apache.spark.sql.{SparkSession, functions => F}

/** Scratch probe: cross-corpus candidate counts per parameterization. */
object CrossProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(args(0) + "/documents.parquet")
    val evalD = d.where(F.col("doc_id") % 37 === 0)
    val train = d.where(F.col("doc_id") % 37 =!= 0)
    for ((sw, nh, bd) <- Seq((3,8,8))) {
      val (c, cl) = Dedup.crossCorpusCandidatesWithCleanup(evalD, train, "doc_id", "text", sw, nh, bd)
      val n = c.count()
      val (v, cl2) = Dedup.crossCorpusVerifiedWithCleanup(evalD, train, "doc_id", "text", sw, nh, bd)
      val nd = v.where(F.col("dropped")).count()
      cl(); cl2()
      println(s"PROBE sw=$sw nh=$nh bands=$bd candidates=$n dropped=$nd")
    }
    spark.stop()
  }
}
