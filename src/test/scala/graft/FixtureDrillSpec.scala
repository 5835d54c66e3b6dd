package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-generation drill (round 10): the round-5 breakage class was a
  * driver-regenerated `events.parquet` whose `ts` column switched
  * physical type (TIMESTAMP NANOS → Long under
  * `spark.sql.legacy.parquet.nanosAsLong`, vs TIMESTAMP(NTZ, MICROS)).
  * `Tables.events` type-branches over the loaded type; this spec
  * SYNTHESIZES all three generations from the shipped fixture and runs
  * the events-path loaders over each, so the next driver regeneration
  * cannot silently break the batch loader or the streaming schema probe
  * — the drill fails in-suite before any query sees the new fixture.
  *
  * Nanos synthesis note: a true TIMESTAMP(NANOS) column is unwritable
  * from Spark, but under the `nanosAsLong` flag (which Tables.events
  * pins) it LOADS as plain LongType epoch nanos — exactly the frame a
  * raw INT64-nanos file produces, so the loader branch under test is
  * byte-equivalent. Sub-microsecond residue is planted on every row to
  * prove the integer `DIV 1000` truncation (the round-5 ±1µs float bug)
  * rather than relying on residue-free values. */
class FixtureDrillSpec extends GraftSuite {
  import spark.implicits._

  test("events loaders survive all three fixture generations") {
    val canonical = Tables.events(spark, sf)
    assert(canonical.schema("ts").dataType == TimestampType,
      "canonical loader must normalize ts to session-zone micros")
    val expected = canon(
      canonical.select($"event_id", unix_micros($"ts").as("us")))

    val root = java.nio.file.Files
      .createTempDirectory("graft_fixture_drill").toFile
    try {
      // generation 1: INT64 epoch nanos (what TIMESTAMP(NANOS) files
      // surface as under nanosAsLong) WITH planted sub-µs residue
      val nanosDir = new java.io.File(root, "nanos")
      canonical
        .withColumn("ts",
          expr("unix_micros(ts) * 1000L + pmod(event_id, 1000L)"))
        .write.parquet(new java.io.File(nanosDir, "events.parquet").toString)
      // generation 2: TIMESTAMP_NTZ micros (the current driver output)
      val ntzDir = new java.io.File(root, "ntz")
      canonical
        .withColumn("ts", $"ts".cast(TimestampNTZType))
        .write.parquet(new java.io.File(ntzDir, "events.parquet").toString)
      // generation 3: session-zoned TIMESTAMP micros (the passthrough)
      val tzDir = new java.io.File(root, "tz")
      canonical
        .write.parquet(new java.io.File(tzDir, "events.parquet").toString)

      for (d <- Seq(nanosDir, ntzDir, tzDir)) {
        val loaded = Tables.events(spark, d.toString)
        // raw-type sanity: each staged dir really exercises its branch
        val rawTs = spark.read.parquet(s"$d/events.parquet")
          .schema("ts").dataType
        if (d == nanosDir) assert(rawTs == LongType, s"$d raw type")
        if (d == ntzDir) assert(rawTs == TimestampNTZType, s"$d raw type")
        if (d == tzDir) assert(rawTs == TimestampType, s"$d raw type")
        assert(loaded.schema("ts").dataType == TimestampType,
          s"$d: loader must normalize to TimestampType")
        val got = canon(
          loaded.select($"event_id", unix_micros($"ts").as("us")))
        assert(got == expected,
          s"$d: loaded micros differ from the canonical fixture")
        // the STREAMING schema probe must bind the same normalized type
        // (a stream bound before/against the wrong generation was the
        // round-5 failure mode)
        val streamed =
          streaming.EventStream.readEvents(spark, s"$d/events.parquet")
        assert(streamed.isStreaming, s"$d: probe must return a stream")
        assert(streamed.schema("ts").dataType == TimestampType,
          s"$d: streaming probe must normalize ts to TimestampType")
      }
    } finally rmTree(root)
  }
}
