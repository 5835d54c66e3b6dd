package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, Trigger, TTLConfig, ValueState}

/** Spark 4's `transformWithState` — the arbitrary-state API that
  * succeeds `flatMapGroupsWithState` (typed state handles, multiple
  * named state variables, timers, TTL). Exercised here as a
  * DRIVER-VISIBLE row so the new state machine is hash-compared against
  * a SQL oracle, not just spec'd: per-user RUNNING totals — each event
  * emits its user's cumulative event count and value cents as of that
  * event.
  *
  * Determinism contract: `handleInputRows` receives a micro-batch's
  * rows in ARRIVAL order, so the processor sorts each user's batch by
  * (event time, event_id) before folding — within one AvailableNow
  * batch over a static fixture that makes the running totals exactly
  * the event-time cumulative the oracle computes with a user-partitioned
  * window. Across multiple batches the state still carries exact
  * totals; only intra-user ordering BETWEEN batches follows arrival
  * time, as in any streaming system without a reorder buffer.
  *
  * Scale shape: state is ONE (count, cents) pair per user (TTL-able via
  * TTLConfig for bounded retention); each micro-batch shuffles once on
  * user_id — identical exchange to the batch window plan. */
object StateV2 {

  case class RunEvent(user_id: Long, event_id: Long, us: Long, cents: Long)
  case class RunTotals(n: Long, cents: Long)
  case class RunOut(user_id: Long, event_id: Long, us: Long,
      running_n: Long, running_cents: Long)

  /** Per-user running count + cents via a typed ValueState handle. */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, RunEvent, RunOut] {
    @transient private var state: ValueState[RunTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunTotals](
        "totals", Encoders.product[RunTotals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[RunEvent],
        timerValues: TimerValues): Iterator[RunOut] = {
      // event-time order within the batch (arrival order is file order)
      val sorted = rows.toSeq.sortBy(r => (r.us, r.event_id))
      var acc =
        if (state.exists()) state.get() else RunTotals(0L, 0L)
      val out = sorted.map { r =>
        acc = RunTotals(acc.n + 1, acc.cents + r.cents)
        RunOut(r.user_id, r.event_id, r.us, acc.n, acc.cents)
      }
      state.update(acc)
      out.iterator
    }
  }

  // ---------------------------------------------------- q_stream_running
  private def streamRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // transformWithState requires a state store with column families —
    // RocksDB (bundled with Spark 4), not the default HDFS-backed one.
    // Runtime conf, scoped to this session; every other streaming row
    // is provider-agnostic, so flipping it session-wide is safe.
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val events = EventStream.readEvents(s, dir + "/events.parquet")
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        round($"value" * 100).cast("long").as("cents"))
      .as[RunEvent]
    val q = events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName("q_stream_running_mem")
      .start()
    q.awaitTermination()
    s.table("q_stream_running_mem").orderBy($"event_id")
  }

  private val streamRunningSql =
    """SELECT user_id, event_id, epoch_us(ts) AS us,
      |  ROW_NUMBER() OVER w AS running_n,
      |  CAST(SUM(c) OVER w AS BIGINT) AS running_cents
      |FROM (SELECT user_id, event_id, ts,
      |        CAST(round(value * 100) AS BIGINT) AS c
      |      FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS UNBOUNDED PRECEDING)
      |ORDER BY event_id""".stripMargin

  val all: Seq[graft.NamedQuery] = Seq(
    graft.NamedQuery("q_stream_running", streamRunning,
      Some(streamRunningSql), bench = true))
}
