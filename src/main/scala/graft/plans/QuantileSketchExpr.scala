package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable relative-error quantile sketch state (DDSketch, Masson
  * et al., VLDB 2019, arXiv:1908.10693): per-sign log-γ bucket
  * counts plus a zero counter. Fully DETERMINISTIC — bucket counts
  * are exact, so two sketches over the same multiset are identical
  * regardless of row order or partitioning (unlike KLL's coin-flip
  * compaction or t-digest's order-dependent merging), which makes
  * the aggregate safe under Spark's nondeterministic partial
  * aggregation and trivially testable.
  */
final class DDSketchState(
    var zero: Long,
    val pos: mutable.HashMap[Int, Long],
    val neg: mutable.HashMap[Int, Long]) {
  def n: Long = zero + pos.valuesIterator.sum + neg.valuesIterator.sum
}

/** `approx_quantiles(value, ps, alpha)` as a native Catalyst
  * aggregate: returns an array of the requested quantiles, each
  * within RELATIVE error `alpha` of the exact element at rank
  * round(p * (n-1)) — the scale path where the exact distributed
  * percentile plan ([[graft.operators.Percentiles]]) is too heavy
  * (its shuffle carries every distinct value; this buffer carries at
  * most ~log(maxValue/minPositive)/log(γ) buckets per sign, a few
  * thousand for doubles at alpha=0.01, constant in the data).
  *
  * Map-side combine works exactly like sum: partial sketches are
  * bucket-count maps merged bucket-wise, so the shuffle carries one
  * small binary blob per group per partition. NULL and NaN inputs
  * are excluded like the builtin percentile; infinities saturate to
  * the extreme buckets. An all-excluded group evaluates to NULL
  * (builtin parity).
  */
case class DDSketchQuantiles(
    child: Expression,
    ps: Seq[Double],
    alpha: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DDSketchState]
  with UnaryLike[Expression] {

  // no ImplicitCastInputTypes (AbstractDataType is private[sql] in
  // Spark 4) — the Percentiles.approxQuantiles wrapper casts the
  // child to double explicitly

  require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
    s"quantiles must be in [0,1], got $ps")
  require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")

  private val gamma = (1 + alpha) / (1 - alpha)
  private val invLogGamma = 1.0 / math.log(gamma)
  // bucket estimate = 2γ^i/(γ+1), the midpoint minimizing relative error
  private val midCoeff = 2.0 / (gamma + 1)
  // |bucket index| cap: 2^30 comfortably covers the double range
  // (log_γ of 1e308 at alpha=0.001 is ~7e5) while keeping γ^i finite
  private val MaxBucket = 1 << 30

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_approx_quantiles"

  private def bucketOf(mag: Double): Int = {
    val b = math.ceil(math.log(mag) * invLogGamma)
    if (b > MaxBucket) MaxBucket else if (b < -MaxBucket) -MaxBucket else b.toInt
  }
  private def estimateOf(bucket: Int): Double = midCoeff * math.pow(gamma, bucket)

  override def createAggregationBuffer(): DDSketchState =
    new DDSketchState(0L, mutable.HashMap.empty, mutable.HashMap.empty)

  override def update(buffer: DDSketchState, input: InternalRow): DDSketchState = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (!x.isNaN) {
        if (x > 0) { val b = bucketOf(x); buffer.pos.update(b, buffer.pos.getOrElse(b, 0L) + 1) }
        else if (x < 0) { val b = bucketOf(-x); buffer.neg.update(b, buffer.neg.getOrElse(b, 0L) + 1) }
        else buffer.zero += 1
      }
    }
    buffer
  }

  override def merge(buffer: DDSketchState, other: DDSketchState): DDSketchState = {
    buffer.zero += other.zero
    other.pos.foreach { case (b, c) => buffer.pos.update(b, buffer.pos.getOrElse(b, 0L) + c) }
    other.neg.foreach { case (b, c) => buffer.neg.update(b, buffer.neg.getOrElse(b, 0L) + c) }
    buffer
  }

  override def eval(buffer: DDSketchState): Any = {
    val n = buffer.n
    if (n == 0) return null
    // ascending numeric order: negatives by DESCENDING magnitude
    // bucket, then zeros, then positives ascending
    val negs = buffer.neg.toArray.sortBy(-_._1)
    val poss = buffer.pos.toArray.sortBy(_._1)
    def valueAtRank(rank: Long): Double = {
      var cum = 0L
      var i = 0
      while (i < negs.length) {
        cum += negs(i)._2
        if (cum > rank) return -estimateOf(negs(i)._1)
        i += 1
      }
      cum += buffer.zero
      if (cum > rank) return 0.0
      i = 0
      while (i < poss.length) {
        cum += poss(i)._2
        if (cum > rank) return estimateOf(poss(i)._1)
        i += 1
      }
      if (poss.nonEmpty) estimateOf(poss(poss.length - 1)._1)
      else if (buffer.zero > 0) 0.0
      else -estimateOf(negs(negs.length - 1)._1)
    }
    new GenericArrayData(ps.map { p =>
      val rank = math.round(p * (n - 1)).max(0L).min(n - 1)
      valueAtRank(rank)
    }.toArray)
  }

  override def serialize(buffer: DDSketchState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.zero)
    out.writeInt(buffer.pos.size)
    buffer.pos.foreach { case (b, c) => out.writeInt(b); out.writeLong(c) }
    out.writeInt(buffer.neg.size)
    buffer.neg.foreach { case (b, c) => out.writeInt(b); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DDSketchState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val zero = in.readLong()
    val pos = mutable.HashMap.empty[Int, Long]
    var k = in.readInt()
    while (k > 0) { pos.update(in.readInt(), in.readLong()); k -= 1 }
    val neg = mutable.HashMap.empty[Int, Long]
    k = in.readInt()
    while (k > 0) { neg.update(in.readInt(), in.readLong()); k -= 1 }
    new DDSketchState(zero, pos, neg)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DDSketchQuantiles =
    copy(child = newChild)
}
