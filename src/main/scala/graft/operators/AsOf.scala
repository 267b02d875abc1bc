package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.internal._

/** As-of (backward) join: for each left row, attach the right row(s)
  * with the same keys and the latest right date <= left date.
  *
  * Reference: left_merge_latest, pd_utils/merge.py:194-443 (three
  * backends — pandas many-to-many, low-memory loop, SQLite). All
  * collapse to one Spark plan: equi+range join, keep latest right date
  * per left row via a dense_rank window (dense_rank, not row_number,
  * so ties on the max right date all survive — the reference's
  * groupby-max + merge-back keeps ties, pd_utils/merge.py:271-277),
  * then left join back so unmatched left rows are preserved.
  *
  * Scale: the range predicate joins on the equi keys first (hash
  * shuffle or broadcast if `df2` is small); the many-to-many blowup
  * the reference's "low_memory" mode works around never materializes
  * beyond each join partition, and AQE can split skewed keys.
  */
object AsOf {

  /** @param on        equi-join keys (excluding the date).
    * @param maxOffset optional staleness bound: right date must be >=
    *                  left date - maxOffset (e.g.
    *                  `expr("INTERVAL 30 DAYS")` for timestamps, or
    *                  `lit(2)` for integer year columns).
    *
    * Scale caveat — `maxOffset = None` over deep right histories: the
    * range join matches EVERY right row at or before each left date
    * before the dense_rank keeps only the latest, so the intermediate
    * fans out as distinct (keys, left date) x right-history depth —
    * quadratic-ish when one key carries years of history against many
    * left dates (this is the same blowup the reference's "low_memory"
    * backend loops around, pd_utils/merge.py:300-356). At scale,
    * pass a `maxOffset` staleness bound (the typical query only wants
    * recent history anyway — the bound turns the fan-out into a
    * constant window) or pre-aggregate the right side to one row per
    * (keys, date) first; both keep the join linear in its inputs.
    *
    * Output: all columns of `df`, plus `df2`'s non-key columns; when
    * the two date columns share a name, the right one is suffixed
    * `_y` (pandas suffix convention the goldens pin).
    */
  def leftMergeLatest(
      df: DataFrame,
      df2: DataFrame,
      on: Seq[String],
      leftDatevar: String = "Date",
      rightDatevar: String = "Date",
      maxOffset: Option[Column] = None,
      broadcastRight: Boolean = false
  ): DataFrame = {
    val rightDateOut =
      if (leftDatevar == rightDatevar) s"${rightDatevar}_y" else rightDatevar
    val r0 = df2.withColumnRenamed(rightDatevar, rightDateOut)
    // prefix right non-key cols on collision with left (other than the
    // date, pandas would suffix _y as well)
    val collide = r0.columns.filter(c => !on.contains(c) && c != rightDateOut && df.columns.contains(c))
    val r = collide.foldLeft(r0)((d, c) => d.withColumnRenamed(c, s"${c}_y"))

    // Distinct left keys only — the reference joins df[on + [leftDate]]
    // (pd_utils/merge.py:254), so the many-to-many work is per distinct
    // (keys, leftDate), not per left row.
    val leftKeys = df.select((on :+ leftDatevar).map(col): _*).distinct()
    val rside = if (broadcastRight) broadcast(r) else r

    val rangeCond = maxOffset match {
      case Some(off) => col(rightDateOut) <= col(leftDatevar) && col(rightDateOut) >= col(leftDatevar) - off
      case None      => col(rightDateOut) <= col(leftDatevar)
    }
    val cand = leftKeys.join(rside, on, "inner").where(rangeCond)
    val w = Window
      .partitionBy((on :+ leftDatevar).map(col): _*)
      .orderBy(col(rightDateOut).desc)
    val latest = cand
      .withColumn("__rk__", dense_rank().over(w))
      .where(col("__rk__") === 1)
      .drop("__rk__")
    df.join(latest, on :+ leftDatevar, "left")
  }
}
