package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extensions (no reference surface — SURVEY
  * §2.13/§7.5 records streaming as an extension, not parity).
  * The operators mirror their batch counterparts so a pipeline can
  * move from backfill (batch over parquet) to live (readStream) by
  * swapping the source:
  *
  *  - [[windowedAverages]] = GroupOps.averages over event-time
  *    tumbling windows with a watermark (late data dropped after the
  *    allowed delay; state is bounded).
  *  - [[sessionize]] = inactivity-gap sessions via
  *    flatMapGroupsWithState — the custom-state escape hatch for
  *    semantics window functions can't express incrementally.
  *  - [[streamingDedup]] = exact dedup on a digest with a watermark
  *    bound on the dedup state (the streaming face of
  *    Dedup.dedupExact).
  *
  * All operators work identically on batch frames (Spark runs the
  * same plan), which is how the specs exercise them deterministically.
  */
object StreamOps {

  /** Per-key equal-weighted averages over event-time tumbling
    * windows. `delay` is the watermark: how late an event may arrive
    * and still be counted.
    */
  def windowedAverages(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      windowLength: String,
      delay: String = "10 minutes"
  ): DataFrame = {
    val withWm =
      if (df.isStreaming) df.withWatermark(tsCol, delay) else df
    withWm
      .groupBy((window(col(tsCol), windowLength) +: keyCols.map(col)): _*)
      .agg(avg(col(valueCol)).as(s"${valueCol}_avg"), count(lit(1)).as("n_events"))
      .select(
        (col("window.start").as("window_start") +: col("window.end").as("window_end")
          +: keyCols.map(col)) :+ col(s"${valueCol}_avg") :+ col("n_events"): _*
      )
  }

  case class SessionEvent(key: Long, ts: Timestamp, value: Double)
  case class Session(key: Long, start: Timestamp, end: Timestamp, nEvents: Int, totalValue: Double)
  private case class SessionState(start: Long, last: Long, n: Int, total: Double)

  /** Groups events into sessions separated by >= `gapMillis` of
    * inactivity. Emits one row per closed session; on a stream the
    * state times out via ProcessingTimeTimeout, in batch every
    * group's trailing session is flushed at group end.
    *
    * State per key is O(1) (start/last/count/sum) — the shape that
    * holds at any key cardinality.
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMillis: Long
  ): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    // capture outside the closure: the Dataset itself must not be
    // referenced on executors (its plan is driver-side state)
    val streaming = events.isStreaming
    events
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout()
      ) { (key: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
        for (e <- sorted) {
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last >= gapMillis =>
              closed += Session(key, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
              cur = Some(SessionState(t, t, 1, e.value))
            case Some(s) =>
              cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        if (state.hasTimedOut || !streaming) {
          // flush the trailing session (batch: group is complete)
          cur.foreach(s => closed += Session(key, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          state.remove()
        } else {
          cur.foreach(state.update)
          state.setTimeoutDuration(gapMillis)
        }
        closed.iterator
      }
  }

  /** Watermark-bounded exact dedup: keeps the first event per
    * normalized digest, remembering a digest only while it is within
    * the watermark delay of the stream's max event time.
    *
    * `dropDuplicatesWithinWatermark` is what actually purges state
    * here: a plain `dropDuplicates(digest)` whose key subset excludes
    * the event-time column NEVER evicts — the watermark only bounds
    * dedup state when event time is part of the keys — so state would
    * grow without bound in production (ADVICE r3). The trade-off is
    * the documented semantics: a duplicate arriving later than `delay`
    * after the first occurrence can be emitted again.
    */
  def streamingDedup(
      df: DataFrame,
      tsCol: String,
      textCol: String,
      delay: String = "1 hour"
  ): DataFrame = {
    val keyed = df.withColumn("__digest__",
      graft.pipeline.TextAnalysis.fingerprintMd5(col(textCol)))
    val out =
      if (df.isStreaming)
        keyed.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("__digest__")
      else keyed.dropDuplicates("__digest__")
    out.drop("__digest__")
  }

  /** Stream-static enrichment: left-join a (micro-batched) stream
    * against a static dimension table on `keys`, broadcasting the
    * dimension so every micro-batch is a map-side join — no shuffle
    * of the stream, no streaming state. The static side is re-read
    * per micro-batch by Spark's stream-static join machinery, so a
    * dimension refreshed in place (e.g. overwritten parquet) is
    * picked up without restarting the query.
    */
  def enrichWithDimension(
      stream: DataFrame,
      dimension: DataFrame,
      keys: Seq[String]
  ): DataFrame =
    stream.join(broadcast(dimension), keys, "left")

  /** Streaming ingest filtering against a static blocklist (the
    * stream-side form of [[graft.pipeline.Contamination]]: drop
    * arriving documents whose key appears in a decontamination /
    * dedup blocklist materialized by the batch pipeline). A
    * stream-static left_anti with the static side broadcast — each
    * micro-batch is a map-side probe, no stream shuffle, no state,
    * and an in-place-refreshed blocklist is picked up per batch.
    */
  def filterAgainstBlocklist(
      stream: DataFrame,
      blocklist: DataFrame,
      keys: Seq[String]
  ): DataFrame =
    stream.join(broadcast(blocklist.select(keys.map(col): _*).distinct()), keys, "left_anti")
}
