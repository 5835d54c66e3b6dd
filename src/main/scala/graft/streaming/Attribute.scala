package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming last-touch attribution — the stateful-stream twin of the
  * batch `q_attribution` carry window: per user, the most recent view's
  * campaign is keyed state that every later purchase reads, surviving
  * across micro-batches (a view in Monday's batch attributes a purchase
  * in Friday's). State is ONE (timestamp, campaign) pair per user —
  * O(users), not O(events) — and never expires by design: last-touch
  * has no horizon (a real deployment would add an attribution-window
  * timeout exactly like Sessionize's EventTimeTimeout).
  *
  * AttributionStreamSpec proves stream == batch on in-order input, and
  * that the carry crosses an activation boundary (view in file 1,
  * purchase in file 2, two AvailableNow runs over one checkpoint).
  * Parity limit (documented, spec-pinned): a purchase arriving in a
  * LATER micro-batch with event time older than the carried view is
  * emitted as -1, where batch may attribute it to an older view —
  * see stateFn.
  */
object Attribute {

  case class AttEvent(user_id: Long, ts_us: Long, event_id: Long,
                      event_type: String, k: Int)
  case class LastView(ts_us: Long, event_id: Long, k: Int)
  case class Attribution(user_id: Long, purchase_event_id: Long, campaign: Int)

  /** Fold a batch of one user's events (sorted by event time) into the
    * carried last-view state; emit one attribution per purchase. BOTH
    * sides of the carry are guarded by event-time order:
    *  - a late-arriving (out-of-order) view older than the carried state
    *    must not regress it, or stream and batch (which sorts globally)
    *    would diverge across batch boundaries;
    *  - symmetrically, a late-arriving PURCHASE with event time older
    *    than the carried view must not be attributed to that future
    *    view. The state holds only the single newest view, so the view
    *    that batch would attribute such a purchase to is gone — emit -1
    *    (unattributed). This is the documented stream/batch divergence
    *    of the O(1)-state variant: batch, sorting globally, may
    *    attribute a backfilled purchase to an older view. The
    *    [[stateFnHistory]] variant below recovers batch parity for that
    *    case with O(histSize) state. AttributionStreamSpec pins the
    *    parity cases, this divergence case, and the recovery. */
  private def stateFn(user: Long, events: Iterator[AttEvent],
                      state: GroupState[LastView]): Iterator[Attribution] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var last = state.getOption
    val out = Seq.newBuilder[Attribution]
    sorted.foreach { e =>
      if (e.event_type == "view") {
        if (last.forall(l =>
          Ordering[(Long, Long)].gt((e.ts_us, e.event_id), (l.ts_us, l.event_id))))
          last = Some(LastView(e.ts_us, e.event_id, e.k))
      } else {
        val k = last match {
          case Some(l) if Ordering[(Long, Long)]
            .lt((l.ts_us, l.event_id), (e.ts_us, e.event_id)) => l.k
          case _ => -1
        }
        out += Attribution(user, e.event_id, k)
      }
    }
    last.foreach(state.update)
    out.result().iterator
  }

  private def attributions(s: SparkSession, watchDir: String) = {
    import s.implicits._
    EventStream.readEvents(s, watchDir)
      .filter($"event_type".isin("view", "purchase"))
      .withColumn("k_raw",
        regexp_extract($"props", "\"k\": ([0-9]+)", 1).cast("int"))
      // a view with no parseable campaign must not touch the carry —
      // the batch twin's last(..., ignoreNulls) skips it; dropping it
      // here keeps the two paths identical (purchases pass regardless,
      // their own k is never read)
      .filter($"event_type" === "purchase" || $"k_raw".isNotNull)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
        $"event_type", coalesce($"k_raw", lit(-1)).as("k"))
      .as[AttEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(stateFn)
  }

  /** Bounded VIEW-HISTORY state — the richer-state upgrade that recovers
    * batch parity for late purchases: instead of one carried view, keep
    * the newest `histSize` views per user (newest-first), and attribute
    * each purchase to the newest view STRICTLY OLDER than it — exactly
    * the batch carry semantics, now answerable for backfilled purchases
    * as long as the view batch would attribute to is among the retained
    * `histSize` newest. State is O(histSize) per user, still
    * corpus-size-independent; emission remains append-only, so a late
    * VIEW improves only future attributions (an already-emitted -1 is
    * final — full retro-parity would need a watermark-delayed emission,
    * a latency trade this operator deliberately does not make). */
  case class ViewHistory(views: Seq[LastView])

  val DefaultViewHistory = 8

  private def stateFnHistory(histSize: Int)(
      user: Long, events: Iterator[AttEvent],
      state: GroupState[ViewHistory]): Iterator[Attribution] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var hist = state.getOption.map(_.views).getOrElse(Seq.empty)
    val out = Seq.newBuilder[Attribution]
    sorted.foreach { e =>
      if (e.event_type == "view") {
        hist = (LastView(e.ts_us, e.event_id, e.k) +: hist)
          .sortBy(v => (-v.ts_us, -v.event_id))
          .take(histSize)
      } else {
        val k = hist.find(v =>
          Ordering[(Long, Long)].lt((v.ts_us, v.event_id), (e.ts_us, e.event_id)))
          .map(_.k).getOrElse(-1)
        out += Attribution(user, e.event_id, k)
      }
    }
    state.update(ViewHistory(hist))
    out.result().iterator
  }

  /** Durable history-state attribution — [[runAttributionStreamDurable]]
    * with `stateFnHistory` replacing the single-view carry. */
  def runAttributionStreamHistory(s: SparkSession, watchDir: String,
                                  outDir: String, checkpointDir: String,
                                  histSize: Int = DefaultViewHistory): DataFrame = {
    import s.implicits._
    val q = EventStream.readEvents(s, watchDir)
      .filter($"event_type".isin("view", "purchase"))
      .withColumn("k_raw",
        regexp_extract($"props", "\"k\": ([0-9]+)", 1).cast("int"))
      .filter($"event_type" === "purchase" || $"k_raw".isNotNull)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
        $"event_type", coalesce($"k_raw", lit(-1)).as("k"))
      .as[AttEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(stateFnHistory(histSize) _)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }

  /** One-shot streaming attribution over a watched events directory
    * (memory sink — the parity harness). */
  def runAttributionStream(s: SparkSession, watchDir: String,
                           queryName: String): DataFrame = {
    val q = attributions(s, watchDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    q.awaitTermination()
    s.table(queryName)
  }

  /** Durable variant: parquet sink + checkpoint, so the per-user carry
    * state AND the processed-file log survive re-activation — the memory
    * sink cannot recover from a checkpoint. Returns all attributions
    * emitted so far. */
  def runAttributionStreamDurable(s: SparkSession, watchDir: String,
                                  outDir: String, checkpointDir: String): DataFrame = {
    val q = attributions(s, watchDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }
}
