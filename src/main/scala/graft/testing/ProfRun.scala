package graft.testing

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler: runs named SparkEntry queries under the
  * Bench session config and prints one line per Spark JOB with its
  * duration and submitting call site, so per-query wall time decomposes
  * into fit / build / write / serve phases without touching operator
  * code. Usage: runMain graft.testing.ProfRun q_ann_ivf_store_pq [more...]
  */
object ProfRun {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_PROF_CONF="k=v;k=v" — extra session confs for
    // A/B-testing size-adaptive knobs (e.g. the percentile threshold)
    val extraConf = sys.env.getOrElse("SPARK_GRAFT_PROF_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = extraConf.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))((b, kv) => b.config(kv._1, kv._2))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val lastEnd = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the RESULT stage's name carries the action's call site
        // (e.g. "parquet at IvfIndex.scala:399") — the phase label
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site, e.stageIds.length))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, site, nStages) =>
          val now = System.nanoTime()
          val ms = (now - t0) / 1e6
          val gap = (t0 - lastEnd.getAndSet(now)) / 1e6
          lines.add(f"  job ${e.jobId}%4d ${ms}%8.1f ms (gap ${gap}%7.1f)  stages=$nStages%3d  $site")
        }
      }
    })
    // warm-up: absorb codegen/classloading like Bench does
    graft.SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
      finally graft.SparkEntry.runPendingCleanups()
    }
    args.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"no such query: $name")
        case Some(fn) =>
          lines.clear()
          lastEnd.set(System.nanoTime())
          val t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.toRdd.count()
          graft.SparkEntry.runPendingCleanups()
          val total = (System.nanoTime() - t0) / 1e9
          // give async job-end events a beat to drain
          Thread.sleep(300)
          println(f"== $name  total=${total}%.2f s ==")
          lines.forEach(l => println(l))
          graft.SparkEntry.releaseShared()
          System.gc()
      }
    }
    spark.stop()
  }
}
