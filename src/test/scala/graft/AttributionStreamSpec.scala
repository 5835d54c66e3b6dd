package graft

import graft.streaming.Attribute
import org.apache.spark.sql.functions._

/** Streaming last-touch attribution: stream == batch on identical input,
  * and the per-user carry state survives an activation boundary. */
class AttributionStreamSpec extends GraftSuite {
  import spark.implicits._

  private def freshDir(): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(
      s"/tmp/graft_stream/${java.util.UUID.randomUUID()}")
    java.nio.file.Files.createDirectories(dir)
    dir
  }

  test("streaming attribution equals the batch carry window") {
    val in = freshDir()
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/events.parquet"),
        in.resolve("delivery-1.parquet"))
      val streamed = Attribute.runAttributionStream(
        spark, in.toString, "att_parity")
        .groupBy($"campaign")
        .agg(count(lit(1)).as("n_purchases"),
          count_distinct($"user_id").as("n_buyers"))
      val batch = SparkEntry.queries("q_attribution")(spark, sf)
      assertSameRows(streamed, batch)
    } finally rmTree(in.toFile)
  }

  test("the last-view carry crosses activation boundaries via the checkpoint") {
    val base = freshDir()
    val in = base.resolve("in")
    java.nio.file.Files.createDirectories(in)
    val ckpt = s"$base/ckpt"
    def ev(rows: (Long, Long, Long, String, Int)*) =
      rows.toDF("user_id", "sec", "event_id", "event_type", "kv")
        .select($"event_id", ($"sec" * 1000000000L).as("ts"), $"user_id",
          $"event_type", lit(0.0).as("value"),
          format_string("{\"k\": %d}", $"kv").as("props"))
    try {
      val out = s"$base/out"
      // activation 1: only a view for user 7 (campaign 42)
      ev((7L, 100L, 1L, "view", 42)).coalesce(1)
        .write.parquet(s"$in/batch1")
      val out1 = Attribute.runAttributionStreamDurable(
        spark, s"$in/*/", out, ckpt)
      assert(out1.count() == 0, "no purchases yet, nothing to attribute")
      // activation 2: the purchase arrives in a LATER file
      ev((7L, 200L, 2L, "purchase", 0)).coalesce(1)
        .write.parquet(s"$in/batch2")
      val rows = Attribute.runAttributionStreamDurable(
        spark, s"$in/*/", out, ckpt).collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 7L && rows.head.getInt(2) == 42,
        s"carry state must survive the activation boundary: ${rows.toSeq}")
    } finally rmTree(base.toFile)
  }

  test("a late out-of-order view must not regress the carried state") {
    val base = freshDir()
    val in = base.resolve("in")
    java.nio.file.Files.createDirectories(in)
    val ckpt = s"$base/ckpt"
    def ev(rows: (Long, Long, Long, String, Int)*) =
      rows.toDF("user_id", "sec", "event_id", "event_type", "kv")
        .select($"event_id", ($"sec" * 1000000000L).as("ts"), $"user_id",
          $"event_type", lit(0.0).as("value"),
          format_string("{\"k\": %d}", $"kv").as("props"))
    try {
      val out = s"$base/out"
      // activation 1 carries view(ts=200, k=42)
      ev((7L, 200L, 1L, "view", 42)).coalesce(1)
        .write.parquet(s"$in/batch1")
      Attribute.runAttributionStreamDurable(spark, s"$in/*/", out, ckpt)
      // activation 2 delivers a BACKFILLED older view plus the purchase:
      // batch semantics (global event-time order) attribute to k=42
      ev((7L, 100L, 2L, "view", 9), (7L, 300L, 3L, "purchase", 0))
        .coalesce(1).write.parquet(s"$in/batch2")
      val rows = Attribute.runAttributionStreamDurable(
        spark, s"$in/*/", out, ckpt).collect()
      assert(rows.length == 1)
      assert(rows.head.getInt(2) == 42,
        s"an older view must not overwrite a newer carry: ${rows.toSeq}")
    } finally rmTree(base.toFile)
  }

  test("a late purchase older than the carried view is NOT attributed to it") {
    val base = freshDir()
    val in = base.resolve("in")
    java.nio.file.Files.createDirectories(in)
    val ckpt = s"$base/ckpt"
    def ev(rows: (Long, Long, Long, String, Int)*) =
      rows.toDF("user_id", "sec", "event_id", "event_type", "kv")
        .select($"event_id", ($"sec" * 1000000000L).as("ts"), $"user_id",
          $"event_type", lit(0.0).as("value"),
          format_string("{\"k\": %d}", $"kv").as("props"))
    try {
      val out = s"$base/out"
      // activation 1 carries view(ts=200, k=42)
      ev((7L, 200L, 1L, "view", 42)).coalesce(1)
        .write.parquet(s"$in/batch1")
      Attribute.runAttributionStreamDurable(spark, s"$in/*/", out, ckpt)
      // activation 2 delivers a BACKFILLED purchase at ts=100 — event time
      // OLDER than the carried view. Attributing it to the ts=200 view
      // would claim a view caused a purchase that happened before it;
      // the carry has no older view history, so the stream emits -1
      // (the documented divergence from batch, which could attribute it
      // to a pre-ts=100 view if one existed)
      ev((7L, 100L, 2L, "purchase", 0)).coalesce(1)
        .write.parquet(s"$in/batch2")
      val rows = Attribute.runAttributionStreamDurable(
        spark, s"$in/*/", out, ckpt).collect()
      assert(rows.length == 1)
      assert(rows.head.getInt(2) == -1,
        s"a purchase must never be attributed to a FUTURE view: ${rows.toSeq}")
    } finally rmTree(base.toFile)
  }

  test("view-history state recovers batch parity for backfilled purchases") {
    val base = freshDir()
    val in = base.resolve("in")
    java.nio.file.Files.createDirectories(in)
    val ckpt = s"$base/ckpt"
    def ev(rows: (Long, Long, Long, String, Int)*) =
      rows.toDF("user_id", "sec", "event_id", "event_type", "kv")
        .select($"event_id", ($"sec" * 1000000000L).as("ts"), $"user_id",
          $"event_type", lit(0.0).as("value"),
          format_string("{\"k\": %d}", $"kv").as("props"))
    try {
      val out = s"$base/out"
      // activation 1 carries TWO views: ts=100 (k=9) and ts=200 (k=42)
      ev((7L, 100L, 1L, "view", 9), (7L, 200L, 2L, "view", 42))
        .coalesce(1).write.parquet(s"$in/batch1")
      Attribute.runAttributionStreamHistory(spark, s"$in/*/", out, ckpt)
      // activation 2 backfills a purchase BETWEEN them (ts=150): batch
      // attributes it to the ts=100 view (k=9); the single-carry variant
      // emits -1 (spec above); the history variant recovers k=9
      ev((7L, 150L, 3L, "purchase", 0)).coalesce(1)
        .write.parquet(s"$in/batch2")
      val rows = Attribute.runAttributionStreamHistory(
        spark, s"$in/*/", out, ckpt).collect()
      assert(rows.length == 1)
      assert(rows.head.getInt(2) == 9,
        s"history state must attribute the backfilled purchase to the " +
          s"newest OLDER view, matching batch: ${rows.toSeq}")
    } finally rmTree(base.toFile)
  }

  test("view-history state still never attributes to a future view") {
    val base = freshDir()
    val in = base.resolve("in")
    java.nio.file.Files.createDirectories(in)
    val ckpt = s"$base/ckpt"
    def ev(rows: (Long, Long, Long, String, Int)*) =
      rows.toDF("user_id", "sec", "event_id", "event_type", "kv")
        .select($"event_id", ($"sec" * 1000000000L).as("ts"), $"user_id",
          $"event_type", lit(0.0).as("value"),
          format_string("{\"k\": %d}", $"kv").as("props"))
    try {
      val out = s"$base/out"
      ev((7L, 200L, 1L, "view", 42)).coalesce(1)
        .write.parquet(s"$in/batch1")
      Attribute.runAttributionStreamHistory(spark, s"$in/*/", out, ckpt)
      // purchase older than EVERY retained view -> -1, same as batch
      // with no earlier view
      ev((7L, 100L, 2L, "purchase", 0)).coalesce(1)
        .write.parquet(s"$in/batch2")
      val rows = Attribute.runAttributionStreamHistory(
        spark, s"$in/*/", out, ckpt).collect()
      assert(rows.length == 1 && rows.head.getInt(2) == -1, rows.toSeq.toString)
    } finally rmTree(base.toFile)
  }
}
