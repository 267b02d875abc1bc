package graft.pipeline
import org.apache.spark.sql.{functions => F, SparkSession}
object ProfSim {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](l: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"[prof] $l%-22s ${(System.nanoTime()-t0)/1e9}%.2fs"); r }
    time("warm")(docs.count())
    (1 to 2).foreach { r =>
      val sim = docs.select(F.col("doc_id").as("__id__"),
          F.transform(F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")), " "), w => F.md5(w)).as("__md5s__"))
        .select(F.col("__id__"), Dedup.simhashFromMd5s(F.col("__md5s__"), 32).as("__sh__"))
        .persist()
      time(s"r$r signature")(sim.count())
      val (out, cleanup) = Dedup.simhashCandidatesWithCleanup(docs, "doc_id", "text", 32, 4, 3, 100)
      time(s"r$r full operator")(println("[prof]   pairs = " + out.count()))
      cleanup(); sim.unpersist()
    }
    spark.stop()
  }
}
