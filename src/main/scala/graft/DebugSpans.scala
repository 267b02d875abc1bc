package graft
import org.apache.spark.sql.functions._
object DebugSpans {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // stage 1: the grid alone
    val window = 40
    val grid = d.where(col("text").isNotNull && length(col("text")) >= window)
      .select(col("doc_id"), col("text").as("__t__"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), length(col("__t__")) - window, lit(1)),
        o => struct(o.as("__o__"), col("__t__").substr(o + 1, lit(window)).as("__w__")))).as("__ow__"))
      .select(col("doc_id"), col("__ow__.__o__").as("__o__"), col("__ow__.__w__").as("__w__"))
      .withColumn("__h__", xxhash64(col("__w__")))
    time("grid count")(grid.count())
    time("grid count again")(grid.count())
    val dupH = grid.groupBy("__h__").agg(count(lit(1)).as("__c__")).where(col("__c__") > 1).select("__h__")
    time("dupHashes")(dupH.count())
    val cand = grid.join(dupH, Seq("__h__"))
    time("cand")(cand.count())
    time("full spans")(graft.pipeline.Dedup.repeatedSubstringSpans(d, "doc_id", "text", window = 40).count())
    s.stop()
  }
}
