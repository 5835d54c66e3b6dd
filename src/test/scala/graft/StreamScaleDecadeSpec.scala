package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}

/** Scale-decade evidence for the STREAMING state machines — the batch
  * families have three measured decades (ScaleGrowth / ScaleDecade2 /
  * ScaleDecade3); this spec gives the stateful streaming machines their
  * decade: the SAME tranche-staged micro-batch harness StreamBench uses,
  * run at sf0.01 and sf0.1 (10× the events through the identical
  * machine, tranche count FIXED at [[Tranches]] so each micro-batch
  * carries 10× rows), with the claims asserted from the engine's own
  * progress telemetry rather than eyeballed:
  *
  *  1. batch-over-batch walls stay FLAT at the large scale (late-half
  *     median vs early-half median) — per-batch cost is O(batch rows +
  *     live state), never O(processed history); a leak shows up as a
  *     rising tail exactly here;
  *  2. the decade's total fed-batch wall grows ≲ linearly (the suite's
  *     15×-per-10× ceiling, same constant as the batch decades);
  *  3. state rows scale with the KEY SPACE, not the event count:
  *     - windowed OHLC aggregation state counts open windows ×
  *       instruments — both fixtures span the same 30 days with the
  *       same instrument roster, so 10× the events may NOT grow the
  *       state (asserted ≤ 2× for partition-count slack);
  *     - the transformWithState running-totals machine keeps exactly
  *       ONE ValueState row per user, so final state rows must EQUAL
  *       the fixture's distinct-user count at both scales (10× events,
  *       state pinned to users).
  *
  * Same leniency direction as the batch decades: fixed per-batch
  * overhead inflates the SMALL side, so the linearity assert can only
  * flake toward passing on a fast machine, never toward failing. */
class StreamScaleDecadeSpec extends GraftSuite {

  private val Tranches = 6
  private val MaxRatioPerDecade = 15.0

  private val SfSmall = "/root/testdata/sf0.01"
  private val SfLarge = "/root/testdata/sf0.1"

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val ls = Files.list(p)
      try ls.forEach(deleteRecursively) finally ls.close()
    }
    Files.delete(p)
  }

  /** Stage an sf dir's events as `Tranches` time-ordered single-file
    * tranches (the StreamBench recipe — staging is harness plumbing,
    * measured walls start at the first micro-batch). */
  private def stageTranches(sfDir: String, tag: String): Path = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_ssd_${tag}_p${Scratch.processToken}")
    if (Files.exists(root)) deleteRecursively(root)
    val inDir = root.resolve("in")
    Files.createDirectories(inDir)
    val ev = Tables.events(spark, sfDir)
    val n = ev.count()
    val w = org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")
    val assigned = ev.withColumn("__t",
      (((row_number().over(w) - 1) * Tranches) / n).cast("int"))
      .localCheckpoint(true)
    for (i <- 0 until Tranches) {
      val tmp = root.resolve(s"tmp_$i")
      assigned.filter($"__t" === i).drop("__t")
        .repartition(1).write.parquet(tmp.toString)
      val ls = Files.list(tmp)
      val part = try ls.iterator.asScala
        .find(_.getFileName.toString.startsWith("part-")).get
      finally ls.close()
      Files.move(part, inDir.resolve(f"batch_$i%03d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      deleteRecursively(tmp)
    }
    root
  }

  private case class Telemetry(batchMs: Seq[Long], stateRows: Seq[Long],
      inputRows: Seq[Long])

  /** Run `build(source)` as one AvailableNow lifecycle with
    * maxFilesPerTrigger=1 over the staged tranches; return the fed-batch
    * telemetry from the query's own progress events. */
  private def runStaged(root: Path, name: String,
      build: DataFrame => DataFrame): Telemetry = {
    val src = streaming.EventStream.readEvents(spark,
      root.resolve("in").toString, Map("maxFilesPerTrigger" -> "1"))
    val q = build(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName(s"${name}_ssd_mem")
      .option("checkpointLocation", root.resolve(s"ckpt_$name").toString)
      .start()
    q.awaitTermination()
    val fed = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    spark.sql(s"DROP TABLE IF EXISTS ${name}_ssd_mem")
    Telemetry(
      fed.map(_.durationMs.get("triggerExecution").toLong),
      fed.map(_.stateOperators.map(_.numRowsTotal).sum),
      fed.map(_.numInputRows))
  }

  private def runningTotals(src: DataFrame): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    src.select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        round($"value" * 100).cast("long").as("cents"))
      .as[streaming.StateV2.RunEvent]
      .groupByKey(_.user_id)
      .transformWithState(new streaming.StateV2.RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  private def med(xs: Seq[Long]): Long =
    if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)

  private lazy val smallDir = stageTranches(SfSmall, "small")
  private lazy val largeDir = stageTranches(SfLarge, "large")

  private val machines: Seq[(String, DataFrame => DataFrame)] = Seq(
    "ohlc" -> (src => streaming.EventStream.ohlcAgg(src)),
    "running" -> (src => runningTotals(src)))

  for ((name, build) <- machines) {
    test(s"$name: streaming decade — flat batches, ≲linear wall, key-bounded state") {
      // warm-up lifecycle at the small scale: the FIRST streaming query
      // of a session pays stream-planning/classload costs that would
      // otherwise be charged to the small side (leniency-only, but the
      // flatness assert below reads individual batches)
      runStaged(smallDir, s"warm_$name", build)
      val small = runStaged(smallDir, s"small_$name", build)
      val large = runStaged(largeDir, s"large_$name", build)
      assert(small.batchMs.size >= Tranches - 1 &&
        large.batchMs.size >= Tranches - 1,
        s"expected ~$Tranches fed batches, got ${small.batchMs.size} / " +
          s"${large.batchMs.size}")

      // 1. flatness at scale: late-half median vs early-half median
      //    (skip batch 0 — it carries source-init). 2.5x + noise floor.
      val body = large.batchMs.drop(1)
      val (early, late) = body.splitAt(body.size / 2)
      val (me, ml) = (med(early), med(late))
      info(s"$name large per-batch ms: ${large.batchMs.mkString(",")} " +
        s"(early med $me, late med $ml)")
      assert(ml <= 2.5 * me + 300,
        s"late-half batches ($ml ms) grew vs early-half ($me ms) — " +
          "per-batch cost is tracking history, not live state")

      // 2. the decade: total fed-batch wall, 10x rows
      val (ws, wl) = (small.batchMs.sum.toDouble, large.batchMs.sum.toDouble)
      val ratio = wl / math.max(ws, 100.0)
      info(f"$name decade wall: small ${ws}%.0f ms -> large ${wl}%.0f ms " +
        f"(${ratio}%.1fx for 10x events)")
      assert(ratio < MaxRatioPerDecade,
        f"$name fed-batch wall grew $ratio%.1fx for 10x events")

      // 3. state bounded by keys, not events
      val (ss, sl) = (small.stateRows.last, large.stateRows.last)
      info(s"$name final state rows: small $ss, large $sl " +
        s"(events ${small.inputRows.sum} -> ${large.inputRows.sum})")
      name match {
        case "ohlc" =>
          // same 30-day span, same instrument roster at both scales:
          // open-window state may not grow with events
          assert(sl <= 2 * ss,
            s"windowed state grew $ss -> $sl for 10x events — state is " +
              "tracking events, not open windows x instruments")
        case "running" =>
          import org.apache.spark.sql.functions.countDistinct
          val us = Tables.events(spark, SfSmall)
            .agg(countDistinct(col("user_id"))).head().getLong(0)
          val ul = Tables.events(spark, SfLarge)
            .agg(countDistinct(col("user_id"))).head().getLong(0)
          assert(ss == us && sl == ul,
            s"ValueState rows (small $ss, large $sl) must equal distinct " +
              s"users (small $us, large $ul) — one row per key, never " +
              "per event")
        case _ => ()
      }
    }
  }
}
