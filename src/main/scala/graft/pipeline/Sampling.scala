package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Both are pure functions of the row keys — no RNG state, so a
  * sample is reproducible across runs, engines, partitionings, and
  * retries (a failed task re-executes to the identical subset). At
  * 100 TB that determinism is what makes a sample auditable: the
  * exact corpus a model trained on can be reconstructed from the
  * key columns and the parameters alone.
  */
object Sampling {

  /** Lexicographic md5-hex threshold for a fraction in [0, 1]: md5
    * hashes are uniform over [0, 16^32), so keeping rows whose hex
    * digest sorts below `hex(fraction * 16^32)` keeps ~fraction of
    * them. 16 hex digits of precision (~1e-19 granularity), padded
    * to compare against full 32-digit digests.
    */
  def fractionThresholdHex(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    if (fraction >= 1) "g" // sorts above every hex digest
    else {
      val scaled = BigDecimal(fraction) * BigDecimal(BigInt(16).pow(16))
      val hex = scaled.toBigInt.toString(16)
      ("0" * (16 - hex.length)) + hex
    }
  }

  /** Deterministic Bernoulli sample: keep a row iff
    * `md5(keys ++ salt)` sorts below the fraction threshold. A pure
    * codegen'd filter — pushes all the way down to the scan, no
    * shuffle, no RNG. Different `salt`s draw independent samples
    * (e.g. train/validation splits: disjoint salts, or split one
    * hash range into bands).
    */
  def deterministicSample(
      df: DataFrame,
      keyCols: Seq[String],
      fraction: Double,
      salt: String = ""
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    df.where(keyDigest(keyCols, salt) < lit(fractionThresholdHex(fraction)))
  }

  /** md5 over the separator-joined, null-sentineled key columns plus
    * salt — the shared hash of [[deterministicSample]] and
    * [[assignSplit]], so bands drawn by one compose with samples
    * drawn by the other. The unit separator keeps ("AB","C") and
    * ("A","BC") apart; the explicit null sentinel is needed because
    * concat_ws silently SKIPS null elements, which would otherwise
    * collapse ("a", NULL) and (NULL, "a") into one key with
    * correlated decisions.
    */
  private def keyDigest(keyCols: Seq[String], salt: String): Column =
    md5(concat_ws("\u0001",
      (keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0000null"))) :+ lit(salt)): _*))

  /** Deterministic multi-way split (train/validation/test): adds a
    * `split` column assigning each row to the FIRST band whose
    * cumulative hash threshold exceeds `md5(keys ++ salt)`. Same
    * hash family as [[deterministicSample]], so splits are disjoint
    * by construction, reproducible across runs/engines/retries, and
    * a pure codegen filter (no shuffle, no RNG). Fractions must sum
    * to <= 1; rows above the last threshold get the `rest` label
    * (empty-string label drops them from every split).
    */
  def assignSplit(
      df: DataFrame,
      keyCols: Seq[String],
      fractions: Seq[(String, Double)],
      salt: String = "",
      rest: String = "rest"
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-12,
      "fractions must be non-empty and sum to <= 1")
    val digest = keyDigest(keyCols, salt)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val assign = fractions.zip(cum).foldRight(lit(rest): Column) {
      case (((name, _), cumFrac), tail) =>
        when(digest < lit(fractionThresholdHex(math.min(cumFrac, 1.0))), lit(name)).otherwise(tail)
    }
    df.withColumn("split", assign)
  }

  /** Keep at most `n` rows per group, chosen deterministically by
    * `orderCols` (pass a hash column for an unbiased cap, or e.g. a
    * quality score to keep the best). The standard "cap documents
    * per domain" primitive: one shuffle on the group keys; Spark 4
    * rewrites the rank filter to WindowGroupLimit, so each partition
    * retains only n rows per group map-side — no full sort of the
    * group spills.
    */
  def capPerGroup(
      df: DataFrame,
      byvars: Seq[String],
      n: Int,
      orderCols: Seq[Column]
  ): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must define a deterministic preference order")
    val w = Window.partitionBy(byvars.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn__", row_number().over(w))
      .where(col("__rn__") <= n)
      .drop("__rn__")
  }
}
