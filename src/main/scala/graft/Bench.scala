package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ContextCleaner only releases broadcast blocks / shuffle state
      // after their driver-side references are GC'd; the default
      // periodic-GC interval (30min) is longer than this whole run,
      // so without this a broadcast-heavy query's blocks linger and
      // tax every LATER query's memory — measured ~9s of phantom cost
      // on q_simhash_candidates in-suite vs fresh-JVM
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    // One warm-up run of the first query absorbs JVM/codegen start-up
    // cost so per-query numbers reflect execution, not class loading.
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      finally SparkEntry.runPendingCleanups()
    }
    // optional args = query names to run (default: all)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a crashing query must NOT masquerade as a fast one: record -1
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => errors += s"$name: ${e.getClass.getSimpleName}"; false }
        // release operator-internal caches AFTER the action, inside the
        // timed window — cache hygiene is part of each query's cost
        finally SparkEntry.runPendingCleanups()
      val elapsed = (System.nanoTime() - t0) / 1e9
      // quiesce BETWEEN queries (outside the timed window): dropping
      // the previous query's broadcast/shuffle references through the
      // ContextCleaner needs a driver GC, and leaving it to chance
      // charges one query's cleanup to whichever query runs next —
      // per-query numbers should measure the query, not its
      // predecessor's garbage
      System.gc()
      name -> (if (ok) elapsed else -1.0)
    }
    SparkEntry.releaseShared()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val errStr = errors.map(e => "\"" + e.replace("\"", "'") + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_failed":${errors.size},"errors":$errStr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
