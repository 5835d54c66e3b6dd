package graft

import graft.streaming.{EventStream, StageMarker}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** S8 parity: the streaming variant of q_event_window_agg and the
  * completion-marker stage chaining. */
class StreamingSpec extends GraftSuite {

  /** The file-source stream watches a DIRECTORY (new files arriving =
    * new data, the reference's S3-prefix model); stage `copies` arrivals
    * of the shipped single-file events table into a fresh one. */
  private def stageEvents(copies: Int): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(s"/tmp/graft_stream/${java.util.UUID.randomUUID()}")
    java.nio.file.Files.createDirectories(dir)
    (1 to copies).foreach { i =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/events.parquet"),
        dir.resolve(s"delivery-$i.parquet"))
    }
    dir
  }

  private lazy val eventsDir: String = stageEvents(1).toString

  test("streaming parquet ingest is exactly-once across re-activations") {
    val in = stageEvents(1)
    val base = java.nio.file.Paths.get(s"/tmp/graft_stream/${java.util.UUID.randomUUID()}")
    try {
      val out = s"$base/out"
      val ckpt = s"$base/ckpt"
      EventStream.runParquetIngest(spark, in.toString, out, ckpt)
      val n = spark.read.parquet(out).count()
      assert(n == Tables.events(spark, sf).count())
      // same input, same checkpoint: nothing reprocessed, nothing appended
      EventStream.runParquetIngest(spark, in.toString, out, ckpt)
      assert(spark.read.parquet(out).count() == n,
        "re-activation must not duplicate ingested rows")
    } finally { rmTree(in.toFile); rmTree(base.toFile) }
  }

  test("streaming dedup removes at-least-once replays, matches batch distinct") {
    // duplicate delivery: the same events file arrives twice
    val dir = stageEvents(2)
    try {
      val deduped = EventStream.runDedupAvailableNow(spark, dir.toString, "dedup_stream")
      val original = Tables.events(spark, sf)
      assert(deduped.count() == original.count(),
        "every replayed event must be dropped, every original kept")
      assert(deduped.select("event_id").distinct().count() == original.count())
    } finally rmTree(dir.toFile)
  }

  test("stream-static enrich equals the batch join, holds no state") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = stageEvents(1)
    try {
      // a small static dim keyed like the stream (user tier lookup)
      val dim = Tables.events(spark, sf).select($"user_id").distinct()
        .select($"user_id", concat(lit("tier-"), ($"user_id" % 3)).as("tier"))
      val streamed = EventStream.runEnrichAvailableNow(
        spark, dir.toString, dim, "enrich_stream")
        .select($"event_id", $"tier")
      val batch = EventStream.enrichedEvents(
        Tables.events(spark, sf), dim).select($"event_id", $"tier")
      assertSameRows(streamed, batch)
      // every stream row found its dim row (left join, complete dim)
      assert(streamed.filter($"tier".isNull).count() == 0)
    } finally rmTree(dir.toFile)
  }

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = stageEvents(1)
    try {
      val streamed = EventStream.runIntervalJoinAvailableNow(
        spark, dir.toString, "view", "click", "interval_join_stream")
      val events = Tables.events(spark, sf)
      val batch = EventStream.intervalJoin(
        events.filter($"event_type" === "view"),
        events.filter($"event_type" === "click"))
      assert(streamed.count() > 0, "no view->click pairs within the window")
      assertSameRows(streamed, batch)
    } finally rmTree(dir.toFile)
  }

  test("late arrivals beyond the persisted watermark are dropped; on-time rows pass") {
    import spark.implicits._
    val dir = stageEvents(1) // events span 2024-01; watermark lands at max-1h
    val base = java.nio.file.Paths.get(s"/tmp/graft_stream/${java.util.UUID.randomUUID()}")
    try {
      val out = s"$base/out"
      val ckpt = s"$base/ckpt"
      EventStream.runParquetIngest(spark, dir.toString, out, ckpt,
        EventStream.dedupedEvents)
      val n = spark.read.parquet(out).count()
      assert(n > 0)

      def nanos(iso: String): Long =
        java.time.Instant.parse(iso).toEpochMilli * 1000000L
      // one hopelessly late row (mid-2023) and one on-time row (post-max)
      Seq(
        (900000001L, nanos("2023-06-01T00:00:00Z"), 7L, "click", 1.0, "{}"),
        (900000002L, nanos("2024-02-01T00:00:00Z"), 7L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        // match the driver file's ts format (TIMESTAMP_NTZ micros) so the
        // appended delivery stays readable under the probed stream schema
        .withColumn("ts",
          timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
        .repartition(1)
        .write.mode("append").parquet(dir.toString)

      EventStream.runParquetIngest(spark, dir.toString, out, ckpt,
        EventStream.dedupedEvents)
      val ids = spark.read.parquet(out).select("event_id").as[Long].collect().toSet
      assert(!ids.contains(900000001L),
        "a row older than the persisted watermark must be dropped as late")
      assert(ids.contains(900000002L), "an on-time new id must be emitted")
      assert(spark.read.parquet(out).count() == n + 1)
    } finally { rmTree(dir.toFile); rmTree(base.toFile) }
  }

  test("Trigger.AvailableNow stream agrees with the batch window aggregation") {
    val streamed = EventStream.runAvailableNow(spark, eventsDir, "events_stream_parity")
    val batch = SparkEntry.queries("q_event_window_agg")(spark, sf)
    assertSameRows(streamed, batch)
  }

  test("second AvailableNow activation over the same input is idempotent") {
    val again = EventStream.runAvailableNow(spark, eventsDir, "events_stream_parity2")
    val batch = SparkEntry.queries("q_event_window_agg")(spark, sf)
    assertSameRows(again, batch)
  }

  test("durable checkpoint makes activations incremental (no reprocessing)") {
    val base = s"/tmp/graft_stream/${java.util.UUID.randomUUID()}"
    val watch = java.nio.file.Paths.get(s"$base/in")
    java.nio.file.Files.createDirectories(watch)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      watch.resolve("events-part-0.parquet"))
    val ckpt = Some(s"$base/ckpt")
    val first = EventStream.runAvailableNow(spark, watch.toString, "inc_run1", ckpt).count()
    assert(first > 0)
    // same files, same checkpoint -> nothing new to process: the file
    // source's seen-file log lives in the checkpoint, so NO batch runs and
    // the fresh memory sink stays empty — zero rows re-read or re-emitted
    // (without the checkpoint, the idempotency test above re-emits all
    // `first` windows)
    val q2 = EventStream.runAvailableNow(spark, watch.toString, "inc_run2", ckpt)
    assert(spark.streams.active.isEmpty) // terminated cleanly
    assert(q2.count() == 0, "re-activation with a durable checkpoint must not reprocess")
  }

  test("marker-file stage chaining gates downstream stages") {
    val dir = s"/tmp/graft_markers/${java.util.UUID.randomUUID()}"
    var ran = false
    // downstream must NOT run before the upstream marker exists
    assert(!StageMarker.runGated(dir, "retrieval", "transform") { ran = true })
    assert(!ran && !StageMarker.isComplete(dir, "transform"))
    // upstream completes -> downstream runs and writes its own marker
    StageMarker.complete(dir, "retrieval")
    assert(StageMarker.runGated(dir, "retrieval", "transform") { ran = true })
    assert(ran && StageMarker.isComplete(dir, "transform"))
  }

  test("chained stateful ops: dedup feeds the window agg, duplicates never inflate counts") {
    import org.apache.spark.sql.functions._
    val chained = SparkEntry.queries("q_stream_chained")(spark, sf)
    // batch twin over the ORIGINAL single copy: if the in-query dedup
    // leaked even one planted duplicate into the downstream aggregate,
    // some window's n would be inflated and this comparison would fail
    // before the oracle hash does
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("total_cents"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("event_type"), col("n"), col("total_cents"))
    val b = batch.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val rows = chained.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(b.contains(k), s"streamed window $k unknown to batch")
      assert(b(k) == ((r.getLong(2), r.getLong(3))),
        s"window $k: streamed ${(r.getLong(2), r.getLong(3))} != batch ${b(k)}")
    }
    // the final watermark horizon must WITHHOLD a tail (the streaming
    // contract this row encodes) — emitted strictly fewer than batch
    assert(rows.length < b.size,
      "no windows withheld — the watermark-horizon rule isn't being exercised")
  }
}
