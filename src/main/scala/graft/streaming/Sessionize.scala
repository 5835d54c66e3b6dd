package graft.streaming

import graft.{NamedQuery, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Sessionization — gap-based session windows over the event stream, in
  * both execution models:
  *
  *  - BATCH: the classic gaps-and-islands plan (lag → new-session flag →
  *    running sum → per-session aggregate), fully relational, one shuffle
  *    on user_id reused by both windows and the final aggregation.
  *    Oracle-checked as `q_sessionize`.
  *  - STREAMING: custom keyed state via `flatMapGroupsWithState`
  *    (EventTimeTimeout): sessions close either when a later event
  *    arrives past the gap, or when the watermark passes last+gap.
  *    SessionizeSpec asserts stream == batch on identical input.
  *
  * Money-sum determinism: event values carry 2 decimal digits, so both
  * paths sum exact cents (the batch path via the decimal-routed dsum,
  * the state path via a Long cents accumulator) — results agree
  * bit-for-bit regardless of partitioning or arrival order.
  */
object Sessionize {

  val GapMinutes = 720 // 12h — matched to the test stream's event density
  private val GapUs = GapMinutes * 60L * 1000000L

  private val StartFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  // ------------------------------------------------------------------- batch
  /** Gaps-and-islands sessionization of (user_id, ts, value). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = GapMinutes): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
    val withId = flagged.withColumn("sid",
      sum(col("new_s")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withId.groupBy(col("user_id"), col("sid"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .select("user_id", "session_start", "n_events", "total_value")
  }

  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sessionizeBatch(Tables.events(s, dir))
      .orderBy($"user_id", $"session_start")
  }

  private val qSessionizeSql =
    s"""WITH o AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > ${GapUs}000
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM o)
       |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       |  COUNT(*) AS n_events, ${sqlDsum("value")} AS total_value
       |FROM s GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  // -------------------------------------------------------- q_stream_sessions
  /** DRIVER-VISIBLE native session windows: the same gap-based
    * sessionization through Spark's built-in `session_window`
    * aggregation, run as a REAL streaming query (watermark +
    * merging-session state + AvailableNow) and oracle-checked against
    * the gaps-and-islands SQL. One semantic note, pinned by the oracle:
    * `session_window` merges an event only while it lands STRICTLY
    * inside the previous event's [ts, ts+gap) extension, so an exact
    * gap-length distance starts a NEW session — the oracle's new-session
    * flag is therefore `>= gap`, where the flatMapGroupsWithState path
    * (q_sessionize, `> gap`) keeps the boundary event. Both are valid
    * contracts; each is documented where it holds.
    *
    * Scale shape: the aggregation shuffles once on user_id per
    * micro-batch — the same key the batch plan shuffles on. NOTE on
    * state: this driver-visible row runs in COMPLETE output mode so the
    * oracle sees every session including those still inside the final
    * watermark horizon — and in complete mode watermarking does NOT
    * evict aggregate state, so state here is all-sessions-sized. The
    * production-shape variant is append-mode output (watermark-closed
    * sessions only, state bounded to per-user OPEN windows) — that path
    * is `runSessionStream` below (flatMapGroupsWithState with
    * EventTimeTimeout), exercised in SessionizeSpec. It can't be the
    * driver-visible row because append would withhold the fixture's
    * final-hour sessions while the oracle compares the full set. */
  private def qStreamSessions(s: SparkSession, dir: String): DataFrame =
      StreamTune.sized(s, dir + "/events.parquet") {
    import s.implicits._
    val q = EventStream.readEvents(s, dir + "/events.parquet")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", s"$GapMinutes minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
      .select($"user_id",
        date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        $"n_events", $"total_value")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("complete")
      .format("memory")
      .queryName("q_stream_sessions_mem")
      .start()
    q.awaitTermination()
    s.table("q_stream_sessions_mem")
      .orderBy($"user_id", $"session_start")
  }

  private val qStreamSessionsSql =
    s"""WITH o AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) >= ${GapUs}000
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM o)
       |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       |  COUNT(*) AS n_events, ${sqlDsum("value")} AS total_value
       |FROM s GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    // q_sessionize is the BATCH formulation (window functions, no
    // streaming lifecycle) — deliberately streaming=false despite living
    // in the streaming package
    NamedQuery("q_sessionize", qSessionize, Some(qSessionizeSql), bench = true),
    NamedQuery("q_stream_sessions", qStreamSessions,
      Some(qStreamSessionsSql), bench = true, streaming = true))

  // --------------------------------------------------------------- streaming
  // `ts` (the watermarked TimestampType column) must survive into the
  // Dataset — event-time timeout requires it; ts_us is the exact micros.
  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                       value_cents: Long)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, cents: Long)
  case class Session(user_id: Long, session_start: String, n_events: Long,
                     total_value: Double)

  private def toSession(user: Long, o: OpenSession): Session =
    Session(user,
      StartFmt.format(java.time.Instant.EPOCH.plusNanos(o.startUs * 1000L)),
      o.n, o.cents / 100.0)

  /** Keyed state transition: fold this batch's (sorted) events into the
    * open session, emitting every session that a gap closes; on event-time
    * timeout (watermark passed last+gap) emit the open session. */
  private def stateFn(user: Long, events: Iterator[SessEvent],
                      state: GroupState[OpenSession]): Iterator[Session] = {
    if (events.isEmpty && state.hasTimedOut) {
      val out = state.getOption.map(toSession(user, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(_.ts_us)
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(o) if e.ts_us - o.lastUs <= GapUs =>
          open = Some(OpenSession(o.startUs, e.ts_us, o.n + 1, o.cents + e.value_cents))
        case Some(o) =>
          closed += toSession(user, o)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value_cents))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value_cents))
      }
    }
    open.foreach { o =>
      state.update(o)
      // close via watermark once no successor can extend the session
      state.setTimeoutTimestamp((o.lastUs + GapUs) / 1000L)
    }
    closed.result().iterator
  }

  /** Streaming sessionization over a watched events directory; processes
    * all available input (Trigger.AvailableNow) and emits sessions closed
    * by gaps or by the final watermark. With `checkpointDir` set, session
    * state and seen-file tracking survive across activations — a second
    * run emits only sessions from newly-arrived files. */
  def runSessionStream(s: SparkSession, watchDir: String, queryName: String,
                       checkpointDir: Option[String] = None): DataFrame =
      StreamTune.sized(s, watchDir) {
    import s.implicits._
    val events = EventStream.readEvents(s, watchDir)
      .withWatermark("ts", "0 seconds")
      .select($"user_id", $"ts", unix_micros($"ts").as("ts_us"),
        round($"value" * 100).cast("long").as("value_cents"))
      .as[SessEvent]
    val writer = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(stateFn)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
    val q = checkpointDir
      .fold(writer)(dir => writer.option("checkpointLocation", dir))
      .start()
    q.awaitTermination()
    s.table(queryName)
  }
}
