package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.ZOrder
import graft.sources.Sink

/** Z-order clustering: deterministic layout, lossless round-trip, and
  * the property the whole feature exists for — per-file value ranges
  * stay narrow on EVERY clustered column, where a single-column sort
  * only clusters its own column.
  */
class ZOrderSpec extends SparkSuite {

  /** 4096 rows on an (x, y) grid visited in shuffled order, plus a
    * correlated third value — uniform marginals, so equi-depth
    * buckets are also equi-width and spreads are easy to reason
    * about.
    */
  private def grid = {
    val s = spark; import s.implicits._
    (0 until 4096).map { i =>
      val x = (i * 2654435761L % 4096) % 64
      val y = (i * 40503 % 4096) % 64
      (i.toLong, x.toDouble, y.toDouble)
    }.toDF("id", "x", "y")
  }

  test("withZValue: buckets interleave, nulls sink to zero, determinism") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some(0.0), 0.0), (2L, Some(63.0), 63.0), (3L, None, 0.0))
      .toDF("id", "x", "y")
    val base = grid.select(col("id"), col("x").cast("double").as("x"), col("y"))
      .unionByName(df.select((col("id") + 10000).as("id"), col("x"), col("y")))
    val (z, cleanup) = ZOrder.withZValue(base, Seq("x", "y"), bits = 6)
    val m = z.collect().map(r => r.getLong(0) -> r.getInt(r.fieldIndex("zvalue"))).toMap
    cleanup()
    // minimum corner sits at the curve start, maximum corner at the
    // end (exact z need not be 0: a duplicate-heavy minimum can span
    // the first equi-depth boundary, cut_1 == min, and <= puts the
    // value in bucket 1)
    assert(m(10001L) <= 3, s"min corner z=${m(10001L)}")
    assert(m(10002L) == 4095, s"max corner z=${m(10002L)}")
    assert(m(10001L) < m(10002L))
    assert(m(10003L) % 2 == 0) // null x contributes 0 bits at even positions
    // 12-bit space for 6 bits x 2 cols
    assert(m.values.forall(v => v >= 0 && v < 4096))
    val (z2, cleanup2) = ZOrder.withZValue(base, Seq("x", "y"), bits = 6)
    val m2 = z2.collect().map(r => r.getLong(0) -> r.getInt(r.fieldIndex("zvalue"))).toMap
    cleanup2()
    assert(m == m2)
  }

  test("writeZOrdered: lossless, deterministic layout, files tight on BOTH columns") {
    val dir = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    val zDir = s"$dir/z"
    val sDir = s"$dir/s"
    Sink.writeZOrdered(grid, zDir, Seq("x", "y"), tiebreakCols = Seq("id"),
      bits = 6, nBuckets = 16)

    // lossless round-trip
    val back = Sink.readPartitioned(spark, zDir)
    assert(back.count() == 4096)
    assert(back.select("id", "x", "y").except(grid).isEmpty)
    assert(back.columns.contains("zvalue") && back.columns.contains("zbucket"))

    // layout determinism: a second write produces identical per-bucket
    // content digests
    val digest = udf((rows: Seq[String]) => rows.sorted.mkString("|").hashCode)
    def layoutDigest(p: String) = Sink.readPartitioned(spark, p)
      .groupBy("zbucket")
      .agg(sort_array(collect_list(concat_ws(":", col("id"), col("x"), col("y")))).as("rows"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    val d1 = layoutDigest(zDir)
    Sink.writeZOrdered(grid, zDir, Seq("x", "y"), tiebreakCols = Seq("id"),
      bits = 6, nBuckets = 16)
    assert(layoutDigest(zDir) == d1)

    // clustering quality vs the naive alternative (sort by x only):
    // normalized per-file spread, averaged over files, for each column
    Sink.writePartitioned(
      grid.withColumn("xb", (col("x") / 4).cast("int")),
      sDir, partitionCols = Seq("xb"), sortCols = Seq("x", "id"))
    def spreads(p: String, part: String): (Double, Double) = {
      val agg = Sink.readPartitioned(spark, p).groupBy(part)
        .agg(((max("x") - min("x")) / 63.0).as("sx"), ((max("y") - min("y")) / 63.0).as("sy"))
        .agg(avg("sx").as("ax"), avg("sy").as("ay")).head()
      (agg.getDouble(0), agg.getDouble(1))
    }
    val (zx, zy) = spreads(zDir, "zbucket")
    val (sx, sy) = spreads(sDir, "xb")
    // x-sort: tight on x, useless on y
    assert(sx < 0.1, s"x-sorted layout should be tight on x, got $sx")
    assert(sy > 0.6, s"x-sorted layout spans y, got $sy")
    // z-order: tight on BOTH (16 files over a 64x64 grid -> each file
    // covers ~a quadrant strip; both spreads must be FAR below full)
    assert(zx < 0.5 && zy < 0.5, s"z-ordered spreads x=$zx y=$zy not tight on both")
    assert(zx + zy < sx + sy, s"z-order total spread $zx+$zy not below x-sort $sx+$sy")
  }

  test("read side: a single-column filter row-group-prunes the z-ordered layout (VERDICT r12 #8)") {
    val dir = Files.createTempDirectory("zorder-read").toFile.getAbsolutePath
    val zDir = s"$dir/z"
    val flatDir = s"$dir/flat"
    Sink.writeZOrdered(grid, zDir, Seq("x", "y"), tiebreakCols = Seq("id"),
      bits = 6, nBuckets = 16)
    // control: same rows, one unclustered file — stats span everything
    grid.coalesce(1).write.parquet(flatDir)

    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    // rows the parquet reader actually DELIVERS (after row-group
    // stat skipping, before the residual filter) — the scan node's
    // numOutputRows metric
    def rowsScanned(path: String, filter: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.option("basePath", path).parquet(path).where(filter)
      // execute THIS plan (df.count() would build and run a different
      // one, leaving these metrics untouched)
      val kept = df.queryExecution.toRdd.count()
      val scan = allScans(df.queryExecution.executedPlan)
        .find(_.relation.location.rootPaths.exists(_.toString.contains(path)))
        .getOrElse(fail(s"no file scan over $path"))
      assert(scan.metadata.get("PushedFilters").exists(_.contains("x")),
        s"filter not pushed to parquet: ${scan.metadata.get("PushedFilters")}")
      (scan.metrics("numOutputRows").value, kept)
    }
    val predicate = col("x") === 7
    val (flatRead, flatKept) = rowsScanned(flatDir, predicate)
    val (zRead, zKept) = rowsScanned(zDir, predicate)
    assert(zKept == flatKept && zKept == 64, "both layouts must return the same rows")
    // the single-file control has one row group spanning all of x:
    // nothing skips, every row is read
    assert(flatRead == 4096, s"control read $flatRead rows, expected the full 4096")
    // the z-layout's 16 files each cover ~a 16x16 z-region, so x=7
    // intersects only the x-low files: the reader must skip most row
    // groups on parquet min/max stats alone. 4 of 16 regions contain
    // x=7 in the ideal split; allow boundary fuzz but require >2/3 of
    // the table skipped
    assert(zRead <= 4096 / 3,
      s"z-ordered read delivered $zRead of 4096 rows — row groups not pruned")
    assert(zRead >= zKept, "scan cannot deliver fewer rows than survive the filter")
  }

  test("withZBucket: equal-depth file buckets, full assignment replayable") {
    val (b, cleanup) = ZOrder.withZBucket(grid, Seq("x", "y"), bits = 4, nBuckets = 8)
    val sizes = b.groupBy("zbucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    cleanup()
    assert(sizes.keySet == (0 until 8).toSet)
    // exact z-quantile assignment -> equal depth up to z-value ties
    assert(sizes.values.max <= sizes.values.min * 2,
      s"buckets should be near-equal depth, got $sizes")
  }
}
