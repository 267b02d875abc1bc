package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second of the two join shapes
  * the reference's merge family implies but Spark lacks natively
  * (the first, as-of, lives in [[AsOf]]; reference analog for both:
  * the date-conditioned merges of `pd_utils/merge.py`).
  *
  * For a pure range predicate (`start <= point <= end`) Catalyst
  * plans BroadcastNestedLoopJoin — quadratic work and a broadcast of
  * a whole side, neither of which survives 100 TB. This operator
  * makes the join linear: the numeric axis is cut into
  * `bucketWidth`-sized cells, each interval EXPLODES into the cells
  * it covers, each point maps to its single cell, and the join
  * becomes an equi join on (equiKeys, cell) followed by the exact
  * range refine. Each matching pair meets in exactly one cell (the
  * point's), so no dedup pass is needed.
  *
  * `bucketWidth` trades explode fan-out against cell selectivity:
  * ~the median interval length is the usual sweet spot (fan-out ~2,
  * cells hold few intervals). Degenerate long intervals fan out as
  * `span/bucketWidth` rows — cap interval length upstream, or size
  * the bucket to the p99 span.
  *
  * Axis columns must be numeric (cast dates to day counts,
  * timestamps through `unix_micros`). Bounds are INCLUSIVE on both
  * ends. Null points/bounds match nothing (inner-join semantics).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      equiKeys: Seq[String] = Nil,
      bucketWidth: Long = 1L
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // floor over a double division: exact for |axis| < 2^52 (any
    // realistic day/micro count) and, unlike integral `div`,
    // floor-consistent for negative axis values
    def cell(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / bucketWidth).cast("long")
    val lb = points.withColumn("__cell__", cell(col(pointCol)))
    // inverted intervals (start > end) match nothing, but Spark's
    // sequence(hi, lo) is DESCENDING — an inverted/corrupt interval
    // would explode ~span/bucketWidth junk cells of wasted join work
    // before the refine filters them, so drop such rows up front
    val rb = intervals
      .where(col(startCol) <= col(endCol))
      .withColumn(
        "__cell__", explode(sequence(cell(col(startCol)), cell(col(endCol)))))
    lb.join(rb, equiKeys :+ "__cell__")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__cell__")
  }

  /** Interval-overlap join: pairs whose `[start, end]` ranges
    * intersect (inclusive ends — `aStart <= bEnd && bStart <= aEnd`).
    * Same cell explode on BOTH sides; an overlapping pair shares
    * every cell their intersection covers, so to avoid a dedup pass
    * the pair is claimed only in the LATER interval's start cell
    * (`cell == greatest(cellA_start, cellB_start)`, which any
    * overlapping pair shares exactly once). Left columns must not
    * collide with right columns — rename first.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      equiKeys: Seq[String] = Nil,
      bucketWidth: Long = 1L
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def cell(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / bucketWidth).cast("long")
    // inverted intervals overlap nothing; pre-filter to keep the
    // descending-sequence explode from fanning out junk cells
    val lb = left
      .where(col(leftStart) <= col(leftEnd))
      .withColumn(
        "__cell__", explode(sequence(cell(col(leftStart)), cell(col(leftEnd)))))
    val rb = right
      .where(col(rightStart) <= col(rightEnd))
      .withColumn(
        "__cell__", explode(sequence(cell(col(rightStart)), cell(col(rightEnd)))))
    lb.join(rb, equiKeys :+ "__cell__")
      .where(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .where(col("__cell__") === greatest(cell(col(leftStart)), cell(col(rightStart))))
      .drop("__cell__")
  }
}
