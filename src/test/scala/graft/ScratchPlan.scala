package graft

/** Dev aid: print a driver query's executed plan. Not a test. */
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.session
    val name = args.headOption.getOrElse("q_repeated_spans")
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.executedPlan.toString)
    SparkEntry.runPendingCleanups()
    spark.stop()
  }
}
