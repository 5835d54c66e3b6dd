package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.functions._

/** Streaming sessionization (flatMapGroupsWithState, EventTimeTimeout)
  * must produce exactly the batch gaps-and-islands sessions. A far-future
  * sentinel event drives the final watermark past every open session so
  * event-time timeouts flush them deterministically. */
class SessionizeSpec extends GraftSuite {
  import spark.implicits._

  test("stream sessions == batch sessions on identical input") {
    // stage events + a watermark-driving sentinel into a watched dir
    val dir = java.nio.file.Paths.get(s"/tmp/graft_stream/${java.util.UUID.randomUUID()}")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events-part-0.parquet"))
    val maxTsNanos = Tables.events(spark, sf)
      .agg(max(unix_micros($"ts"))).collect()(0).getLong(0) * 1000L
    val sentinelNanos = maxTsNanos + 100L * Sessionize.GapMinutes * 60L * 1000000000L
    val sentinelDir = s"/tmp/graft_stream/${java.util.UUID.randomUUID()}-sentinel"
    // write ts in the DRIVER file's format (TIMESTAMP_NTZ micros) so the
    // watched dir stays schema-homogeneous for the probe-based stream
    Seq((999999L, sentinelNanos, -1L, "sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
      .coalesce(1).write.parquet(sentinelDir)
    val part = new java.io.File(sentinelDir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, dir.resolve("events-part-1.parquet"))

    val streamed = Sessionize
      .runSessionStream(spark, dir.toString, "sessions_stream")
      .filter($"user_id" >= 0)
    val batch = Sessionize.sessionizeBatch(Tables.events(spark, sf))
    assertSameRows(streamed, batch)
    // sanity: sessions actually merge events (not all singletons)
    assert(batch.filter($"n_events" > 1).count() > 0)
  }

  test("batch sessionization: session invariants") {
    val s = Sessionize.sessionizeBatch(Tables.events(spark, sf))
    val events = Tables.events(spark, sf).count()
    val total = s.agg(sum($"n_events")).collect()(0).getLong(0)
    assert(total == events, "every event belongs to exactly one session")
    // per-user session starts are strictly increasing and gap-separated
    val rows = s.orderBy($"user_id", $"session_start").collect()
    rows.groupBy(_.getLong(0)).values.foreach { grp =>
      val starts = grp.map(_.getString(1))
      assert(starts.toSeq == starts.sorted.toSeq)
      assert(starts.distinct.length == starts.length)
    }
  }
}
