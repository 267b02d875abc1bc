package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed co-location: the one-time-write / many-shuffle-free-reads
  * trade that carries repeated same-key joins at 100 TB.
  */
class BucketingSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("same-bucket-count tables join with NO Exchange on either side") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_bucketed", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(o, "o_bucketed", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    // force a sort-merge join so the assertion is about bucketing, not
    // a broadcast hiding the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.table(spark, "li_bucketed")
        .join(Bucketing.table(spark, "o_bucketed"), "l_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      // and it is correct: every lineitem row finds its order
      assert(j.count() == li.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    val agg = Bucketing.table(spark, "li_bucketed")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed groupBy still shuffles:\n$plan")
    assert(agg.count() == spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey").distinct().count())
  }
}
