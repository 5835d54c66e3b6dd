package graft.streaming

import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming parity for the reference's stage-trigger model
  * (S8, SURVEY.md §2.1/§2.10): the reference chains batch stages by
  * dropping `*_step_completed.txt` marker files on S3
  * (`/root/reference/retrieval.py:156-160`, `cleaning.py:121-125`) and
  * re-running on a schedule. The Spark-native equivalent is a file-source
  * stream with `Trigger.AvailableNow`; pass `checkpointDir` to make
  * activations incremental — seen-file state then lives in the
  * checkpoint, so a re-activation processes only newly-arrived files.
  * Without it each run gets an ephemeral checkpoint and reprocesses the
  * whole directory (the batch-parity mode the specs compare against).
  * The same windowed aggregation plan serves batch and stream.
  *
  * The aggregation below is the SAME window spec as
  * `Relational.eventWindowAgg` (q_event_window_agg); StreamingSpec
  * asserts the two agree row-for-row at sf0.001.
  */
object EventStream {

  /** Schema of the raw events parquet — `ts` arrives as epoch-nanos LONG
    * (TIMESTAMP(NANOS) under `nanosAsLong`; streaming sources require an
    * explicit schema). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events parquet path (file or directory
    * glob), normalizing `ts` to a microsecond TimestampType exactly like
    * Tables.events. Streaming sources need an explicit schema, so the
    * actual on-disk `ts` type is PROBED with a batch read of the same
    * path (footer-only — no data scan): driver generations have shipped
    * epoch-nanos LONG and TIMESTAMP(MICROS) NTZ, and spec-staged dirs
    * carry long-nanos frames; branching on the probe keeps one streaming
    * contract across all of them (an unreadable/not-yet-created path
    * defaults to the current driver format, NTZ micros).
    * A single-FILE path streams via its parent directory + pathGlobFilter
    * (the streaming parquet source requires a directory basePath). The
    * file-vs-directory probe goes through the Hadoop FileSystem API, not
    * java.io.File, so an `hdfs://`/`s3a://` single-file path takes the
    * same parent-dir branch as a local one. */
  def readEvents(s: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val isFile =
      try p.getFileSystem(s.sparkContext.hadoopConfiguration)
        .getFileStatus(p).isFile
      catch { case _: java.io.IOException => false }
    val tsType: DataType =
      try s.read.parquet(path).schema("ts").dataType
      catch {
        case scala.util.control.NonFatal(e) =>
          // Surface the fallback as a setup diagnostic: a stream started
          // BEFORE its source dir exists binds NTZ-micros here, and if
          // long-nanos files arrive later they fail/misparse downstream
          // with no hint of the cause unless this probe says so.
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"readEvents ts-type probe failed for '$path' " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}); defaulting " +
              "to TIMESTAMP_NTZ micros — if this path later receives " +
              "epoch-nanos LONG files, restart the stream after the first " +
              "file lands so the probe can bind the real type")
          TimestampNTZType
      }
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val base = s.readStream.schema(schema).options(options)
    val src =
      if (isFile)
        base.option("pathGlobFilter", p.getName).parquet(p.getParent.toString)
      else base.parquet(path)
    tsType match {
      case LongType =>
        src.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        src.withColumn("ts", col("ts").cast(TimestampType))
      case _ => src
    }
  }

  /** 1-hour event-time windows per event_type with a 1-hour watermark —
    * identical spec to the batch q_event_window_agg, so results are
    * comparable bit-for-bit (same exact decimal-routed sum). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Process all currently-available input (Trigger.AvailableNow) into an
    * in-memory table and return it. `complete` mode so closed-and-open
    * windows are both emitted — the batch-parity contract. With
    * `checkpointDir` set, a later activation reads only files that
    * arrived since the previous one. */
  def runAvailableNow(s: SparkSession, path: String, queryName: String,
                      checkpointDir: Option[String] = None): DataFrame =
    StreamTune.sized(s, path) {
      val writer = windowedCounts(readEvents(s, path))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
      val q = checkpointDir
        .fold(writer)(dir => writer.option("checkpointLocation", dir))
        .start()
      q.awaitTermination()
      s.table(queryName)
    }

  /** Streaming exact dedup — the streaming counterpart of q_dedup_exact
    * for at-least-once upstream delivery. dropDuplicatesWithinWatermark
    * keeps dedup state only for ids newer than the watermark, so state
    * is bounded by (arrival skew window × id rate) instead of growing
    * with the whole stream — the only formulation that survives an
    * unbounded 100 TB ingest. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming ingest to a parquet sink — the incremental file-to-file
    * pipeline shape (at corpus scale, ingest IS a stream of arriving
    * files). The file sink's transaction log (_spark_metadata) plus the
    * source's seen-file checkpoint give exactly-once end to end: a
    * re-activation over the same input appends nothing, and readers see
    * only committed files. */
  def runParquetIngest(s: SparkSession, inPath: String, outPath: String,
                       checkpointDir: String,
                       transform: DataFrame => DataFrame = identity): Unit =
    StreamTune.sized(s, inPath) {
      val q = transform(readEvents(s, inPath))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .format("parquet")
        .option("path", outPath)
        .option("checkpointLocation", checkpointDir)
        .start()
      q.awaitTermination()
    }

  /** Stream-static enrichment join — the streaming counterpart of the
    * J2–J4 dim-enrich joins (cleaning.py:85-88): every micro-batch of
    * the event stream joins the static dimension frame, which is
    * re-planned (and so re-read) per batch — a dim update between
    * batches is picked up without restarting the query. The static side
    * broadcasts, so the unbounded stream side never shuffles and the
    * join holds NO state (unlike a stream-stream join with its
    * watermark-bounded buffers) — the only enrich shape that stays O(1)
    * state on an unbounded 100 TB ingest. */
  def enrichedEvents(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Stream-stream interval join — correlate two live event streams
    * (here: each user's 'click' with the 'view' that preceded it within
    * `windowMinutes`). Both sides carry watermarks and the join
    * condition bounds event-time distance, so each side's buffered
    * state is evicted once the other side's watermark passes the bound
    * — state stays O(rate × window), not O(history), the only
    * stream-stream formulation that survives an unbounded ingest. Inner
    * join, so matches emit as soon as both rows have arrived. */
  def intervalJoin(views: DataFrame, clicks: DataFrame,
                   windowMinutes: Int = 10): DataFrame = {
    val v = views.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    v.join(c,
      v("user_id") === c("user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(v("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Outer-join variant of [[intervalJoin]] (left_outer / full_outer):
    * same watermarks and interval condition, user_id COALESCEd across
    * sides so null-extended rows keep their key. Kept separate from the
    * inner helper so the inner plan is untouched. */
  def intervalJoinOuter(views: DataFrame, clicks: DataFrame,
                        joinType: String,
                        windowMinutes: Int = 10): DataFrame = {
    val v = views.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    v.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      .select(coalesce(col("user_id"), col("c_user_id")).as("user_id"),
        col("view_id"), col("click_id"), col("view_ts"), col("click_ts"))
  }

  /** One-shot AvailableNow run of the interval join over one input
    * directory split by event_type into the two stream sides. */
  def runIntervalJoinAvailableNow(s: SparkSession, path: String,
                                  viewType: String, clickType: String,
                                  queryName: String): DataFrame =
    StreamTune.sized(s, path) {
      val events = readEvents(s, path)
      val q = intervalJoin(
        events.filter(col("event_type") === viewType),
        events.filter(col("event_type") === clickType))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
      q.awaitTermination()
      s.table(queryName)
    }

  /** One-shot AvailableNow run of the stream-static enrich into a memory
    * sink (append mode — a stateless join emits rows as they arrive). */
  def runEnrichAvailableNow(s: SparkSession, path: String, dim: DataFrame,
                            queryName: String): DataFrame =
    StreamTune.sized(s, path) {
      val q = enrichedEvents(readEvents(s, path), dim)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
      q.awaitTermination()
      s.table(queryName)
    }

  /** One-shot AvailableNow run of the streaming dedup into a memory sink
    * (no checkpoint — the memory sink cannot recover from one; for
    * checkpointed multi-activation dedup, pass `dedupedEvents` as the
    * transform to runParquetIngest, which persists watermark and dedup
    * state so late arrivals drop across activations — StreamingSpec). */
  def runDedupAvailableNow(s: SparkSession, path: String,
                           queryName: String): DataFrame =
    StreamTune.sized(s, path) {
      val q = dedupedEvents(readEvents(s, path))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
      q.awaitTermination()
      s.table(queryName)
    }

  // ------------------------------------------------------- q_stream_replay
  /** DRIVER-VISIBLE streaming parity: the windowed aggregation runs as a
    * real Structured Streaming query (file source → watermark → windowed
    * agg → AvailableNow → memory sink) and the ORACLE computes the batch
    * answer in SQL — stream-equals-batch stops being a spec-only claim
    * and becomes a hash-compared CORRECTNESS row. Exercises the full
    * streaming stack: source schema pinning (nanos LONG), event-time
    * windows, watermarking, complete-mode emission, and replay
    * determinism (an AvailableNow replay of a static directory must be
    * byte-equal to batch on any partitioning).
    *
    * Scale shape: identical plan to q_event_window_agg — the stream
    * window() expands row-locally, one keyed shuffle per micro-batch,
    * state bounded by open windows × types under the watermark. */
  private def streamReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    runAvailableNow(s, dir + "/events.parquet", "q_stream_replay_mem")
      .orderBy($"window_start", $"event_type")
  }

  private val streamReplaySql =
    s"""SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------- q_stream_sliding
  /** DRIVER-VISIBLE SLIDING (overlapping) windowed aggregation — the one
    * window shape the tumbling replay can't show: a 1-hour window
    * sliding every 15 minutes, so every event contributes to EXACTLY
    * window÷slide = 4 overlapping windows and the engine maintains 4×
    * the open-window state of the tumbling plan (still bounded by the
    * watermark horizon, never by history). Complete mode, same
    * batch-parity contract as q_stream_replay; the oracle generates
    * each event's 4 grid-aligned window starts explicitly (UNNEST k ∈
    * 0..3 of time_bucket(15min, ts) − k·15min — membership is exact
    * because ts − start < 15 + 45 min for every k), so Spark's
    * window-assignment arithmetic is replayed, not assumed. */
  private def streamSliding(s: SparkSession, dir: String): DataFrame =
      StreamTune.sized(s, dir + "/events.parquet") {
    import s.implicits._
    val q = readEvents(s, dir + "/events.parquet")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .select(
        date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", $"total_value")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("complete")
      .format("memory")
      .queryName("q_stream_sliding_mem")
      .start()
    q.awaitTermination()
    s.table("q_stream_sliding_mem")
      .orderBy($"window_start", $"event_type")
  }

  private val streamSlidingSql =
    s"""WITH assigned AS (
       |  SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
       |      - k * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S')
       |      AS window_start,
       |    event_type, value
       |  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
       |SELECT window_start, event_type, COUNT(*) AS n,
       |  ${sqlDsum("value")} AS total_value
       |FROM assigned GROUP BY 1, 2
       |ORDER BY window_start, event_type""".stripMargin

  // ------------------------------------------------------- q_stream_ohlc
  /** STREAMING daily OHLC bars — the market-indicator family's bar
    * sub-plan (operators/Indicators.scala) run as a live stream: open
    * and close are `min_by`/`max_by` over the unique (tick micros,
    * event_id) key, which Spark maintains as ordinary streaming
    * aggregation state (one (open-key, open, close-key, close, hi, lo,
    * n, Σ) tuple per open window×instrument — bounded by the watermark
    * horizon, NEVER by tick history). The batch q_ohlc computes the
    * same bars via ROW_NUMBER order statistics and the shared DuckDB
    * oracle is that ROW_NUMBER spelling — three formulations of the
    * open/close order statistic agreeing per cell (streaming min_by
    * state, batch window ranks, DuckDB ranks) is the differential
    * point of this row. Complete mode, batch-parity contract as
    * q_stream_sliding. */
  /** The streaming OHLC aggregation over any events source frame —
    * shared by the correctness row below and StreamBench's steady-state
    * pipeline (where append mode + the watermark make day-window
    * eviction part of the measured per-batch cost). */
  def ohlcAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select($"ts", $"event_type", $"event_id",
        unix_micros($"ts").as("us"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(
        min_by($"cents", struct($"us", $"event_id")).as("open_cents"),
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        max_by($"cents", struct($"us", $"event_id")).as("close_cents"),
        count(lit(1)).as("n_ticks"),
        sum($"cents").as("notional_cents"))
      .select(date_format($"w.start", "yyyy-MM-dd").as("day"),
        $"event_type", $"open_cents", $"high_cents", $"low_cents",
        $"close_cents", $"n_ticks", $"notional_cents")
  }

  private def streamOhlc(s: SparkSession, dir: String): DataFrame =
      StreamTune.sized(s, dir + "/events.parquet") {
    import s.implicits._
    val q = ohlcAgg(readEvents(s, dir + "/events.parquet"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("complete")
      .format("memory")
      .queryName("q_stream_ohlc_mem")
      .start()
    q.awaitTermination()
    s.table("q_stream_ohlc_mem").orderBy($"event_type", $"day")
  }

  // -------------------------------------------------- q_stream_bars_nmin
  /** STREAMING 15-minute bars — the intraday resample (`q_bars_nmin`,
    * operators/Indicators.scala) as a live tumbling-window aggregation:
    * `window(ts, "15 minutes")` assigns the SAME epoch-aligned buckets
    * as the batch side's `us DIV BucketUs` (both align to the 1970
    * epoch in UTC), and open/close are the min_by/max_by streaming
    * state of the q_stream_ohlc machine. State is one tuple per open
    * window×instrument, bounded by the watermark horizon. The shared
    * oracle is the batch ROW_NUMBER spelling over the same grid (bars
    * only — gap-filling is the batch post-pass, downstream of the
    * streaming sink), so batch + streaming parity is a hash-compared
    * CORRECTNESS row, not a spec claim. */
  def barsNminAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select($"ts", $"event_type", $"event_id",
        unix_micros($"ts").as("us"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy(window($"ts", s"${graft.operators.Indicators.BarMinutes} minutes")
        .as("w"), $"event_type")
      .agg(
        min_by($"cents", struct($"us", $"event_id")).as("open_cents"),
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        max_by($"cents", struct($"us", $"event_id")).as("close_cents"),
        count(lit(1)).as("n_ticks"),
        sum($"cents").as("notional_cents"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm").as("bucket_start"),
        $"event_type", $"open_cents", $"high_cents", $"low_cents",
        $"close_cents", $"n_ticks", $"notional_cents")
  }

  private def streamBarsNmin(s: SparkSession, dir: String): DataFrame =
      StreamTune.sized(s, dir + "/events.parquet") {
    import s.implicits._
    val q = barsNminAgg(readEvents(s, dir + "/events.parquet"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("complete")
      .format("memory")
      .queryName("q_stream_bars_nmin_mem")
      .start()
    q.awaitTermination()
    s.table("q_stream_bars_nmin_mem").orderBy($"event_type", $"bucket_start")
  }

  /** Bars-only projection of the shared 15-minute-bar oracle CTE
    * (Indicators.barsNminSqlCte) — the streaming sibling emits the
    * sparse grid (no gap rows). */
  private val streamBarsNminSql =
    s"""${graft.operators.Indicators.barsNminSqlCte}
       |SELECT strftime(make_timestamp(bucket * ${graft.operators.Indicators.BucketUs}),
       |    '%Y-%m-%d %H:%M') AS bucket_start,
       |  event_type, open_cents, high_cents, low_cents, close_cents,
       |  n_ticks, notional_cents
       |FROM nbars ORDER BY event_type, bucket""".stripMargin

  // ------------------------------------- q_sql_face_stream_sliding
  /** SQL FACE of the sliding-window pipeline — the batch SQL-face
    * contract (SqlFace.scala) extended to STREAMING: the aggregation is
    * a pure `spark.sql(...)` spelling over a streaming temp view
    * (`window(ts, '1 hour', '15 minutes')` resolves in SQL and the
    * whole plan streams end-to-end into the same AvailableNow/complete
    * memory sink). The watermark rides in the VIEW's plan — OSS Spark
    * SQL has no watermark clause, and in complete mode it does not
    * evict, so binding it DataFrame-side changes nothing — while every
    * transform the face is about (window assignment, grouping, the
    * decimal-routed exact sum) is SQL text. Same oracle as
    * q_stream_sliding; Round8OpsSpec proves the two spellings equal
    * frame-for-frame. */
  private def streamSlidingSqlFace(s: SparkSession, dir: String): DataFrame =
      StreamTune.sized(s, dir + "/events.parquet") {
    import s.implicits._
    readEvents(s, dir + "/events.parquet")
      .withWatermark("ts", "1 hour")
      .createOrReplaceTempView("stream_events_face")
    val agg = s.sql(
      """SELECT
        |  date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS window_start,
        |  event_type, count(1) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        |FROM stream_events_face
        |GROUP BY window(ts, '1 hour', '15 minutes'), event_type""".stripMargin)
    val q = agg.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("complete")
      .format("memory")
      .queryName("q_sql_face_stream_sliding_mem")
      .start()
    q.awaitTermination()
    s.table("q_sql_face_stream_sliding_mem")
      .orderBy($"window_start", $"event_type")
  }

  // ------------------------------------------------- q_stream_interval_join
  /** DRIVER-VISIBLE stream-stream correlation: the view→click interval
    * join runs as a REAL two-sided streaming join (both sides
    * watermarked, event-time-bounded buffers, AvailableNow over the
    * static fixture) and the oracle computes the same correlation as a
    * batch self-join — the stream-stream state machine becomes a
    * hash-compared CORRECTNESS row, not just a spec claim. Timestamps
    * emit as exact epoch micros. A static directory processes in one
    * AvailableNow pass, so the inner join's emission is complete and
    * deterministic on any partitioning. */
  private def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    runIntervalJoinAvailableNow(s, dir + "/events.parquet",
        "view", "click", "q_stream_ij_mem")
      .select($"user_id", $"view_id", $"click_id",
        unix_micros($"view_ts").as("view_us"),
        unix_micros($"click_ts").as("click_us"))
      .orderBy($"view_id", $"click_id")
  }

  private val streamIntervalJoinSql =
    """SELECT v.user_id AS user_id, v.event_id AS view_id,
      |  c.event_id AS click_id,
      |  epoch_us(v.ts) AS view_us, epoch_us(c.ts) AS click_us
      |FROM events v JOIN events c
      |  ON v.user_id = c.user_id
      |  AND v.event_type = 'view' AND c.event_type = 'click'
      |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
      |ORDER BY view_id, click_id""".stripMargin

  // ------------------------------------------------- q_stream_dedup_replay
  /** DRIVER-VISIBLE streaming exactly-once dedup: the fixture's events
    * file is STAGED TWICE into a scratch directory (an at-least-once
    * upstream, reified), streamed through
    * `dropDuplicatesWithinWatermark(event_id)`, and the oracle is the
    * plain batch read of the ORIGINAL single copy — the duplicates-
    * dropped claim hash-compares against what a correct dedup must
    * reproduce. First-occurrence semantics is trivially deterministic
    * here because the planted duplicates are byte-identical.
    *
    * Scale shape: dedup state holds only ids inside the watermark
    * horizon (arrival-skew-bounded, not history-bounded); the staging
    * copy is fixture plumbing, not part of the measured plan. */
  private def streamDedupReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val src = Paths.get(dir, "events.parquet")
    // Scratch dir keyed on sanitized path + process token (see Scratch:
    // collision-free across fixtures AND across concurrent JVMs).
    val key = graft.Scratch.key(src)
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_stream_dedup_$key")
    def deleteRecursively(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val ls = Files.list(p)
        try ls.forEach(deleteRecursively) finally ls.close()
      }
      Files.delete(p)
    }
    if (Files.exists(stage)) deleteRecursively(stage)
    Files.createDirectories(stage)
    // events.parquet may be a single file OR a directory of part files
    // (readEvents supports both) — copy recursively either way; a
    // shallow Files.copy of a directory would stage an EMPTY dir and
    // silently stream 0 rows.
    def copyInto(from: Path, to: Path): Unit = {
      if (Files.isDirectory(from)) {
        Files.createDirectories(to)
        val ls = Files.list(from)
        try ls.forEach(c => copyInto(c, to.resolve(c.getFileName.toString)))
        finally ls.close()
      } else Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
    }
    copyInto(src, stage.resolve("copy_a.parquet"))
    copyInto(src, stage.resolve("copy_b.parquet"))
    runDedupAvailableNow(s, stage.toString, "q_stream_dedup_mem")
      .select($"event_id", unix_micros($"ts").as("us"),
        $"user_id", $"event_type", $"value")
      .orderBy($"event_id")
  }

  private val streamDedupReplaySql =
    """SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  // -------------------------------------------------- q_stream_left_join
  /** DRIVER-VISIBLE stream-stream LEFT OUTER interval join — the state
    * semantics the inner join (q_stream_interval_join) can't show: an
    * unmatched left row emits with NULL right columns only once the
    * GLOBAL watermark proves no match can still arrive (its join window
    * has passed entirely below the watermark), which is exactly the
    * eviction rule that keeps outer-join state bounded on an unbounded
    * ingest. The oracle replays the rule explicitly: matched pairs are
    * the batch interval join; a view emits unmatched iff it has no
    * click AND view_ts + 10min < the final watermark of
    * the AvailableNow pass — the MIN of the two sides'
    * per-operator maxima (each watermark operator sees only its
    * filtered stream — the global watermark is their minimum),
    * truncated to MILLISECONDS (Spark tracks watermarks in ms),
    * minus 1h — Spark's no-data final micro-batch flushes
    * exactly the windows below it). Views still inside the final
    * horizon are withheld — deliberately: that's the streaming
    * contract, and the oracle encodes it rather than pretending the
    * stream saw a closed input. Boundary note: a view sitting EXACTLY
    * on the watermark microsecond could split the engines on
    * strict-vs-inclusive eviction; the fixture (and any real event
    * stream) has measure-zero probability of that instant, and a
    * mismatch would surface as a hash diff, never a silent wrong
    * answer. */
  private def streamLeftJoin(s: SparkSession, dir: String): DataFrame =
      StreamTune.sized(s, dir + "/events.parquet") {
    import s.implicits._
    val events = readEvents(s, dir + "/events.parquet")
    val v = events.filter($"event_type" === "view")
      .withWatermark("ts", "1 hour")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    val c = events.filter($"event_type" === "click")
      .withWatermark("ts", "1 hour")
      .select($"user_id".as("c_user_id"), $"event_id".as("click_id"),
        $"ts".as("click_ts"))
    val joined = v.join(c,
      $"user_id" === $"c_user_id" &&
        $"click_ts" >= $"view_ts" &&
        $"click_ts" <= $"view_ts" + expr("INTERVAL 10 MINUTES"),
      "left_outer")
    val q = joined
      .select($"user_id", $"view_id", $"click_id",
        unix_micros($"view_ts").as("view_us"),
        unix_micros($"click_ts").as("click_us"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName("q_stream_loj_mem")
      .start()
    q.awaitTermination()
    s.table("q_stream_loj_mem")
      .orderBy($"view_id", $"click_id")
  }

  private val streamLeftJoinSql =
    """WITH v AS (
      |  SELECT user_id, event_id AS view_id, ts AS view_ts
      |  FROM events WHERE event_type = 'view'),
      |c AS (
      |  SELECT user_id, event_id AS click_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |wm AS (
      |  SELECT (epoch_us(least(
      |      (SELECT max(view_ts) FROM v),
      |      (SELECT max(click_ts) FROM c))) // 1000 - 3600000) * 1000
      |    AS w_us),
      |matched AS (
      |  SELECT v.user_id, v.view_id, c.click_id,
      |    epoch_us(v.view_ts) AS view_us, epoch_us(c.click_ts) AS click_us
      |  FROM v JOIN c ON v.user_id = c.user_id
      |    AND c.click_ts >= v.view_ts
      |    AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE),
      |unmatched AS (
      |  SELECT v.user_id, v.view_id, NULL::BIGINT AS click_id,
      |    epoch_us(v.view_ts) AS view_us, NULL::BIGINT AS click_us
      |  FROM v CROSS JOIN wm
      |  WHERE epoch_us(v.view_ts) + 600000000 < wm.w_us
      |    AND NOT EXISTS (
      |      SELECT 1 FROM c WHERE c.user_id = v.user_id
      |        AND c.click_ts >= v.view_ts
      |        AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE))
      |SELECT * FROM matched
      |UNION ALL SELECT * FROM unmatched
      |ORDER BY view_id, click_id""".stripMargin

  // -------------------------------------------------- q_stream_full_join
  /** DRIVER-VISIBLE stream-stream FULL OUTER interval join — completes
    * the join-matrix (inner → left-outer → full-outer) with the one
    * eviction rule the left join can't show: the RIGHT side's. A click
    * can only match views with view_ts ≤ click_ts (the interval is
    * one-sided), so a click is provably unmatchable as soon as the
    * global watermark passes click_ts itself — no +10min grace like the
    * view side, whose match window extends FORWARD. The oracle encodes
    * both rules explicitly against the same final-watermark formula as
    * q_stream_left_join (MIN of the two sides' per-operator maxima,
    * ms-truncated, minus 1h): matched pairs are the batch interval
    * join; a view emits null-extended iff unmatched AND
    * view_ts + 10min < wm; a click emits null-extended iff unmatched
    * AND click_ts < wm. user_id is COALESCEd across sides so the
    * null-extended rows keep their key.
    *
    * Scale shape: identical buffers to the left join — each side's
    * state is watermark-bounded by its own eviction horizon; the
    * asymmetric horizons (wm − 10min vs wm) are exactly why the right
    * buffer stays SMALLER than the left on this condition shape. */
  private def streamFullJoin(s: SparkSession, dir: String): DataFrame =
      StreamTune.sized(s, dir + "/events.parquet") {
    import s.implicits._
    val events = readEvents(s, dir + "/events.parquet")
    val q = intervalJoinOuter(
        events.filter($"event_type" === "view"),
        events.filter($"event_type" === "click"), "full_outer")
      .select($"user_id", $"view_id", $"click_id",
        unix_micros($"view_ts").as("view_us"),
        unix_micros($"click_ts").as("click_us"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName("q_stream_foj_mem")
      .start()
    q.awaitTermination()
    s.table("q_stream_foj_mem")
      .orderBy($"view_id", $"click_id")
  }

  private val streamFullJoinSql =
    """WITH v AS (
      |  SELECT user_id, event_id AS view_id, ts AS view_ts
      |  FROM events WHERE event_type = 'view'),
      |c AS (
      |  SELECT user_id, event_id AS click_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |wm AS (
      |  SELECT (epoch_us(least(
      |      (SELECT max(view_ts) FROM v),
      |      (SELECT max(click_ts) FROM c))) // 1000 - 3600000) * 1000
      |    AS w_us),
      |matched AS (
      |  SELECT v.user_id, v.view_id, c.click_id,
      |    epoch_us(v.view_ts) AS view_us, epoch_us(c.click_ts) AS click_us
      |  FROM v JOIN c ON v.user_id = c.user_id
      |    AND c.click_ts >= v.view_ts
      |    AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE),
      |unmatched_v AS (
      |  SELECT v.user_id, v.view_id, NULL::BIGINT AS click_id,
      |    epoch_us(v.view_ts) AS view_us, NULL::BIGINT AS click_us
      |  FROM v CROSS JOIN wm
      |  WHERE epoch_us(v.view_ts) + 600000000 < wm.w_us
      |    AND NOT EXISTS (
      |      SELECT 1 FROM c WHERE c.user_id = v.user_id
      |        AND c.click_ts >= v.view_ts
      |        AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE)),
      |unmatched_c AS (
      |  SELECT c.user_id, NULL::BIGINT AS view_id, c.click_id,
      |    NULL::BIGINT AS view_us, epoch_us(c.click_ts) AS click_us
      |  FROM c CROSS JOIN wm
      |  WHERE epoch_us(c.click_ts) < wm.w_us
      |    AND NOT EXISTS (
      |      SELECT 1 FROM v WHERE v.user_id = c.user_id
      |        AND c.click_ts >= v.view_ts
      |        AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE))
      |SELECT * FROM matched
      |UNION ALL SELECT * FROM unmatched_v
      |UNION ALL SELECT * FROM unmatched_c
      |ORDER BY view_id, click_id""".stripMargin

  // ------------------------------------------------------ q_stream_chained
  /** DRIVER-VISIBLE CHAINED STATEFUL OPERATORS — Spark 4's
    * multiple-stateful-operators-per-query support, which older
    * releases rejected outright: exactly-once dedup
    * (`dropDuplicatesWithinWatermark`) feeding an event-time windowed
    * aggregation INSIDE ONE streaming query, over the doubled staged
    * input of the q_stream_dedup_replay convention (an at-least-once
    * upstream, reified). The dedup stage must drop every planted
    * duplicate BEFORE the counts aggregate, and the shared event-time
    * watermark must drive both state machines: dedup eviction above it,
    * window finalization below it. The oracle composes the two rows'
    * oracles: hourly counts over the ORIGINAL single copy, windows
    * emitted iff finalized below the final watermark (max ts
    * ms-truncated − 1h — one watermark operator, the full stream).
    * The last in-horizon windows are withheld — the streaming
    * contract, encoded in the oracle as in q_stream_left_join.
    *
    * Scale shape: dedup state is watermark-horizon-bounded ids; window
    * state is open-windows × types; one keyed exchange per stage per
    * micro-batch — the same two exchanges the batch twin plans. */
  private def streamChained(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val src = Paths.get(dir, "events.parquet")
    val key = graft.Scratch.key(src)
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_stream_chained_$key")
    def deleteRecursively(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val ls = Files.list(p)
        try ls.forEach(deleteRecursively) finally ls.close()
      }
      Files.delete(p)
    }
    if (Files.exists(stage)) deleteRecursively(stage)
    Files.createDirectories(stage)
    def copyInto(from: Path, to: Path): Unit = {
      if (Files.isDirectory(from)) {
        Files.createDirectories(to)
        val ls = Files.list(from)
        try ls.forEach(c => copyInto(c, to.resolve(c.getFileName.toString)))
        finally ls.close()
      } else Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
    }
    copyInto(src, stage.resolve("copy_a.parquet"))
    copyInto(src, stage.resolve("copy_b.parquet"))
    StreamTune.sized(s, stage.toString) {
    val q = readEvents(s, stage.toString)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("long")).as("total_cents"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), $"event_type", $"n", $"total_cents")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName("q_stream_chained_mem")
      .start()
    q.awaitTermination()
    s.table("q_stream_chained_mem").orderBy($"window_start", $"event_type")
    }
  }

  private val streamChainedSql =
    """WITH wm AS (
      |  SELECT (epoch_us(max(ts)) // 1000 - 3600000) AS w_ms FROM events),
      |b AS (
      |  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS total_cents
      |  FROM events GROUP BY 1, 2)
      |SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, n, total_cents
      |FROM b CROSS JOIN wm
      |WHERE epoch_ms(bucket) + 3600000 <= wm.w_ms
      |ORDER BY window_start, event_type""".stripMargin

  // ------------------------------------------------------- q_stream_enrich
  /** DRIVER-VISIBLE stream-static enrichment: the event stream joins
    * the static customer dimension (keyed user_id = c_custkey) inside a
    * real Structured Streaming query and the oracle replays it as a
    * batch left join — the stream-static join semantics (per-batch
    * re-plan of the static side, stateless, broadcast) become a
    * hash-compared CORRECTNESS row alongside the windowed-agg,
    * stream-stream-join, dedup, and session rows. Left join, so events
    * from users outside the dimension survive with null attributes —
    * the enrich contract `cleaning.py:85-88` applies batch-side.
    *
    * Scale shape: the static side broadcasts (dimension-sized), the
    * unbounded stream side never shuffles, and the join holds ZERO
    * state — the only enrich shape that stays O(1) state on an
    * unbounded ingest. Append output: rows emit as they arrive. */
  private def streamEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = graft.Tables.customer(s, dir)
      .select($"c_custkey".as("user_id"), $"c_nationkey", $"c_mktsegment")
    runEnrichAvailableNow(s, dir + "/events.parquet", dim,
        "q_stream_enrich_mem")
      .select($"event_id", unix_micros($"ts").as("us"), $"user_id",
        $"event_type", $"value", $"c_nationkey", $"c_mktsegment")
      .orderBy($"event_id")
  }

  private val streamEnrichSql =
    """SELECT e.event_id, epoch_us(e.ts) AS us, e.user_id, e.event_type,
      |  e.value, c.c_nationkey, c.c_mktsegment
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      |ORDER BY e.event_id""".stripMargin

  // ALL streaming rows are benched since round 12: Bench measures each
  // row's fixed AvailableNow startup via the micro-fixture probe and
  // carries the (startup, data-wall) split in the artifact, and
  // BenchRegression gates streaming heads on the DATA wall — so benching
  // no longer times the harness (the pre-split rationale for keeping
  // enrich/left-join/etc unbenched). Every row declares streaming=true
  // explicitly; the flag, not a name substring, keys the split.
  val all: Seq[graft.NamedQuery] = Seq(
    graft.NamedQuery("q_stream_replay", streamReplay, Some(streamReplaySql),
      bench = true, streaming = true),
    graft.NamedQuery("q_stream_interval_join", streamIntervalJoin,
      Some(streamIntervalJoinSql), bench = true, streaming = true),
    graft.NamedQuery("q_stream_dedup_replay", streamDedupReplay,
      Some(streamDedupReplaySql), bench = true, streaming = true),
    graft.NamedQuery("q_stream_enrich", streamEnrich, Some(streamEnrichSql),
      bench = true, streaming = true),
    graft.NamedQuery("q_stream_sliding", streamSliding,
      Some(streamSlidingSql), bench = true, streaming = true),
    graft.NamedQuery("q_stream_ohlc", streamOhlc,
      Some(graft.operators.Indicators.ohlcSql), bench = true, streaming = true),
    graft.NamedQuery("q_stream_bars_nmin", streamBarsNmin,
      Some(streamBarsNminSql), bench = true, streaming = true),
    graft.NamedQuery("q_sql_face_stream_sliding", streamSlidingSqlFace,
      Some(streamSlidingSql), bench = true, streaming = true),
    graft.NamedQuery("q_stream_full_join", streamFullJoin,
      Some(streamFullJoinSql), bench = true, streaming = true),
    graft.NamedQuery("q_stream_left_join", streamLeftJoin,
      Some(streamLeftJoinSql), bench = true, streaming = true),
    graft.NamedQuery("q_stream_chained", streamChained,
      Some(streamChainedSql), bench = true, streaming = true))
}

/** Completion-marker protocol parity (`retrieval.py:156-160`): stage N
  * writes `<stage>_step_completed.txt`; stage N+1 activates only when the
  * marker exists. File-based so any orchestrator (or a file-source
  * stream) can observe it. */
object StageMarker {
  private def markerFile(dir: String, stage: String) =
    new java.io.File(dir, s"${stage}_step_completed.txt")

  def complete(dir: String, stage: String): Unit = {
    val f = markerFile(dir, stage)
    f.getParentFile.mkdirs()
    java.nio.file.Files.writeString(f.toPath,
      s"Completed on: ${java.time.Instant.now()}\n")
  }

  def isComplete(dir: String, stage: String): Boolean =
    markerFile(dir, stage).isFile

  /** Run `stage` only if `upstream`'s marker is present; write this
    * stage's marker on success. Returns whether the stage ran. */
  def runGated(dir: String, upstream: String, stage: String)(body: => Unit): Boolean =
    if (!isComplete(dir, upstream)) false
    else { body; complete(dir, stage); true }
}
