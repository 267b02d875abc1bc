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
    // unit separator between key parts: a separator-less concat would
    // hash ("AB","C") and ("A","BC") identically, correlating their
    // sampling decisions. NULL keys get an explicit sentinel BEFORE
    // concat_ws — concat_ws silently SKIPS null elements, so without
    // it ("a", NULL) and (NULL, "a") would collapse to the same key
    // and draw identical (correlated) sampling decisions.
    val digest = md5(concat_ws("\u0001",
      (keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0000null"))) :+ lit(salt)): _*))
    df.where(digest < lit(fractionThresholdHex(fraction)))
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
