package graft.testing

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` of declared queries to files — the
  * plan receipts for the optimization rounds (plans/r19/...).
  *
  * Usage: runMain graft.testing.PlanDump <outDir> <suffix> q_x [q_y...]
  * Writes <outDir>/<query>_<suffix>.txt. With
  * `graft.debug.dumpBuildPlans` set (see IvfIndex), the store builds
  * additionally dump their internal cell-row build plans to that dir.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("graft.debug.dumpBuildPlans", new java.io.File(outDir, suffix).getAbsolutePath)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"no such query: $name")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
          // run it so AQE-final shapes and build side effects happen
          df.queryExecution.toRdd.count()
          graft.SparkEntry.runPendingCleanups()
          println(s"dumped $name")
      }
    }
    graft.SparkEntry.releaseShared()
    spark.stop()
  }
}
