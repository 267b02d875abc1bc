package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.internal._

/** As-of (backward) join: for each left row, attach the right row(s)
  * with the same keys and the latest right date <= left date.
  *
  * Reference: left_merge_latest, pd_utils/merge.py:194-443 (three
  * backends — pandas many-to-many, low-memory loop, SQLite). All
  * collapse to one Spark plan: a DATE-ONLY equi+range join feeding a
  * max(right date) aggregate per (keys, left date), the payload then
  * equi-joined back on that winning date (equality, so ties on the
  * max right date all survive — the reference's groupby-max +
  * merge-back keeps ties, pd_utils/merge.py:271-277), then a left
  * join so unmatched left rows are preserved.
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
    * Deep-history guard: the range join is computed over the right
    * side's (keys, date) pairs ONLY — never its payload columns — and
    * immediately aggregated to max(right date) per (keys, left date)
    * before the payload joins back by date equality. The (left dates
    * x right-history depth) fan-out the reference's "low_memory"
    * backend loops around (pd_utils/merge.py:300-356) therefore
    * materializes as a two-column frame feeding a map-side-combined
    * max, not as wide rows; the payload join is equi-only and linear
    * in its inputs. A `maxOffset` staleness bound additionally
    * shrinks the narrow fan-out itself to a constant window per left
    * date — still worth passing when one key carries years of
    * history.
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
    // Narrow pass: right (keys, date) pairs only — the fan-out frame
    // is two-ish columns wide and collapses through a map-side-
    // combined max before any payload column is touched.
    val rDates = rside.select((on :+ rightDateOut).map(col): _*).distinct()
    val latestDate = leftKeys.join(rDates, on, "inner")
      .where(rangeCond)
      .groupBy((on :+ leftDatevar).map(col): _*)
      .agg(max(col(rightDateOut)).as(rightDateOut))
    // Payload pass: equi join back on the winning date; ties on the
    // max right date all survive (the reference's groupby-max +
    // merge-back tie rule) because the join is by date EQUALITY, not
    // a rank filter.
    val latest = latestDate.join(rside, on :+ rightDateOut, "inner")
    df.join(latest, on :+ leftDatevar, "left")
  }
}
