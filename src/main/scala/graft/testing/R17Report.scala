package graft.testing

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{IvfIndex, Similarity}

/** One-shot measurement harness for the r17 COVERAGE records: builds
  * the four persisted ANN layouts over a scale dir's embeddings,
  * prints their on-disk cell bytes, and prints the stored-index
  * recall frontiers (true-float truth) for the compressed layouts —
  * the raw-vs-residual comparison at equal probed fraction.
  *
  * Usage: runMain graft.testing.R17Report <sfDir> <workDir> [sizesOnly|m=M,ksub=K]
  */
object R17Report {
  private def dirBytes(path: String, includeSidecars: Boolean): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else if (f.isDirectory) {
        if (!includeSidecars && f.getName.startsWith("_")) 0L
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      } else 0L
    walk(new java.io.File(path))
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args.take(2)
    val sizesOnly = args.length > 2 && args(2) == "sizesOnly"
    // key=value pairs parsed individually (ADVICE r17 #5): "m=8" alone,
    // reordered keys, or a malformed token get a usage message instead
    // of an ArrayIndexOutOfBounds/NumberFormatException
    val (pqM, pqKsub) = args.drop(2).find(_.startsWith("m=")) match {
      case Some(s) =>
        val kv = s.split(",").flatMap { tok =>
          tok.split("=", 2) match {
            case Array(key, v) if v.nonEmpty && v.forall(_.isDigit) => Some(key -> v.toInt)
            case _ => None
          }
        }.toMap
        (kv.get("m"), kv.get("ksub")) match {
          case (Some(m), Some(k)) => (m, k)
          case _ => sys.error(s"malformed PQ shape argument '$s' - expected m=M,ksub=K (both integers)")
        }
      case None => (4, 8)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // `clustered` swaps in a 20k-row, 64-dim, 256-cluster corpus at
    // the same scale as sf1's embeddings: the synthetic embeddings
    // table is near-noise (measured within-label cosine 0.023), so it
    // cannot exhibit the regime residual PQ exists for — real
    // embedding corpora are CLUSTERED, and the coarse quantizer
    // absorbs the between-cluster variance the residuals then skip
    val e =
      if (args.contains("clustered"))
        spark.createDataset((0 until 20000).map { i =>
          val c = i % 256
          (i.toLong, Array.tabulate(64)(d => math.sin(c * 37 + d) + 0.45 * math.sin(i * 13 + d * 7)))
        }).toDF("vec_id", "emb")
      else spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val n = e.count()
    println(s"[r17] corpus rows: $n")
    val q = e.where(col("vec_id") % 50 === 0)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(workDir))
    def build(name: String)(f: String => Unit): String = {
      val p = s"$workDir/$name"
      val t0 = System.nanoTime()
      f(p)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[r17] $name%-10s cells ${dirBytes(p, includeSidecars = false) / 1e6}%8.1f MB  " +
        f"total ${dirBytes(p, includeSidecars = true) / 1e6}%8.1f MB  build $secs%7.1f s")
      p
    }
    val pf = build("float")(p => IvfIndex.build(e, "vec_id", "emb", p, nlist = Similarity.AutoNlist))
    val p8 = build("int8")(p => IvfIndex.build(e, "vec_id", "emb", p, nlist = Similarity.AutoNlist, int8 = true))
    println(s"[r17] pq settings: m=$pqM ksub=$pqKsub (${pqM * (32 - Integer.numberOfLeadingZeros(pqKsub - 1))} bits/vector)")
    val ppq = build("pq")(p => IvfIndex.buildPq(e, "vec_id", "emb", p, dims = 64,
      m = pqM, ksub = pqKsub, iters = 1, nlist = Similarity.AutoNlist))
    val ppqr = build("pq-resid")(p => IvfIndex.buildPq(e, "vec_id", "emb", p, dims = 64,
      m = pqM, ksub = pqKsub, iters = 1, nlist = Similarity.AutoNlist, residual = true))
    if (!sizesOnly) {
      def report(name: String, path: String, truth: Boolean): Unit = {
        val rep = IvfIndex.recallReport(spark, path, q, "vec_id", "emb", k = 10,
          nprobes = Seq(4, 16, 64, 100000),
          truthCorpus = if (truth) Some(e) else None)
        rep.collect().foreach { r =>
          println(f"[r17] frontier $name%-10s nprobe=${r.getInt(1)}%6d " +
            f"probed=${r.getDouble(3)}%6.4f recall@10=${r.getDouble(4)}%6.4f")
        }
      }
      report("float", pf, truth = false)
      report("int8", p8, truth = true)
      report("pq-raw", ppq, truth = true)
      report("pq-resid", ppqr, truth = true)
    }
    spark.stop()
  }
}
