package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SECOND decade of scale evidence. ScaleGrowthSpec pins sf0.01→sf0.1
  * (one decade); this spec synthesizes an sf1-EQUIVALENT corpus — 10×
  * the sf0.1 rows — and pins sf0.1→sf1 for the top benched heads, so
  * the near-linear-growth claim rests on TWO measured decades (100× end
  * to end), not an extrapolation from one.
  *
  * Synthesis is the shared [[ScaleSynth]] deterministic id-shifted
  * replication (strides keep replicas disjoint with referential
  * integrity; document text goes through a per-replica affine cipher so
  * replicas are isomorphic, non-colliding copies — see ScaleSynth's
  * Scaladoc for why naive replication would corrupt the measurement,
  * and for the id-contract headroom that also holds at 100 replicas).
  *
  * Same methodology as ScaleGrowthSpec: warm-up pass first; fixed
  * per-job overhead inflates the SMALL side, so the bias is
  * leniency-only on slow machines and the assert cannot flake toward
  * failure on a fast one. Ceiling 15× for 10× rows (ScaleGrowthSpec's
  * constant): super-linear pathologies (bucket-occupancy quadratics,
  * round-count creep, plan growth) land near 100×, not 15×.
  */
class ScaleDecade2Spec extends GraftSuite {

  private val Sf01 = ScaleSynth.Sf01
  private val MaxRatioFor10x = 15.0

  private lazy val synthDir: String = ScaleSynth.dir(spark, 10)

  private def wall(name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }

  // q_spatial_join is the one head whose work is NOT linear in rows by
  // design: replicas land in the SAME world square, so 10× points is
  // 10× density — candidate AND result pairs grow ~100× (n²R²/A). The
  // right scale assertion is output-normalized: wall per RESULT pair
  // must stay flat (the blocking bound is per-candidate work, and
  // candidates are proportional to true pairs at fixed R). At a real
  // 100 TB the operator holds density constant by shrinking R or
  // growing the world — documented at Geo.spatialJoin.
  test("q_spatial_join: second-decade growth is output-bound (density regime)") {
    synthDir // force the build before timing anything
    wall("q_spatial_join", sf) // warm-up: JIT, codegen cache
    val small = wall("q_spatial_join", Sf01)
    val large = wall("q_spatial_join", synthDir)
    val outSmall = SparkEntry.queries("q_spatial_join")(spark, Sf01).count()
    val outLarge = SparkEntry.queries("q_spatial_join")(spark, synthDir).count()
    val outGrowth = outLarge.toDouble / math.max(outSmall, 1L)
    val wallRatio = large / math.max(small, 0.1)
    info(f"pairs $outSmall -> $outLarge (${outGrowth}%.0fx), " +
      f"wall $small%.2fs -> $large%.2fs (${wallRatio}%.1fx)")
    assert(outGrowth > 20.0, "density regime should grow pairs ~100x")
    assert(wallRatio < math.max(MaxRatioFor10x, 3.0 * outGrowth),
      f"wall grew $wallRatio%.1fx vs output growth $outGrowth%.0fx — " +
        "per-pair cost exploded; the blocking bound is broken")
  }

  test("synthetic sf1 is a faithful 10x: row counts and disjoint key ranges") {
    val docs = Tables.documents(spark, synthDir)
    val li = Tables.lineitem(spark, synthDir)
    assert(docs.count() == 10 * Tables.documents(spark, Sf01).count())
    assert(li.count() == 10 * Tables.lineitem(spark, Sf01).count())
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0)
    assert(maxDoc < operators.Similarity.PlantOffset,
      s"synth doc ids ($maxDoc) collide with the planted-gate offset")
    // replicas must not collide on shifted keys (disjointness = the
    // iso-copy claim): 10x the distinct keys, or two replicas merged
    val dOrig = Tables.lineitem(spark, Sf01)
      .agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    val dSynth = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(dSynth == 10 * dOrig,
      s"expected ${10 * dOrig} distinct synthetic order keys, got $dSynth")
  }

  // The top benched heads per family (graph / minhash / postings /
  // fingerprint / multimodal layout / decile): each measured sf0.1 →
  // synthetic sf1. q_minhash_dedup doubles its corpus via planting, so
  // it runs 200k banded docs at sf1 — the largest single input any
  // suite exercises.
  for (q <- Seq(
      "q_pagerank", "q_triangle_count", "q_kcore", "q_cluster_star",
      "q_minhash_dedup", "q_containment", "q_novelty", "q_dup_spans",
      "q_winnow", "q_media_shard_pack", "q_abc_analysis",
      // post-training family representative: row-per-response windows
      // over one prompt-keyed exchange, 1M events at sf1
      "q_grpo_advantage",
      // geo density grid + DP clipped mean: row-local + keyed agg
      "q_geo_grid", "q_dp_mean",
      // third-wave heads: iterative keyed-equi-join walks (replica
      // custkeys stay below SupplierOffset, so node spaces remain
      // disjoint at sf1) and broadcast-filtered positional search
      "q_random_walk", "q_phrase_search",
      // indicator family: replicas share the calendar, so 10x rows is
      // 10x ticks PER (instrument, day) cell — the tick-rate regime the
      // bar sub-plan's rate-bounded-group claim is about (the bar grid
      // itself stays 150 rows; q_tick_rule pushes the 10x through the
      // cell-partitioned lag/carry windows as well; q_pair_corr adds
      // the day-keyed grid self-join on top of the same bar sub-plan)
      "q_ohlc", "q_tick_rule", "q_pair_corr")) {
    test(s"$q: second-decade wall growth (sf0.1 -> synthetic sf1) is ~linear") {
      synthDir // force the build before timing anything
      wall(q, sf) // warm-up at sf0.001: JIT, codegen cache, FS metadata
      val small = wall(q, Sf01)
      val large = wall(q, synthDir)
      val ratio = large / math.max(small, 0.1)
      info(f"$q: sf0.1 = $small%.2fs, sf1 = $large%.2fs, ratio = $ratio%.1fx")
      assert(ratio < MaxRatioFor10x,
        f"$q grew $ratio%.1fx for 10x data (sf0.1 $small%.2fs -> sf1 " +
          f"$large%.2fs) — super-linear scaling breaks the 100 TB story")
    }
  }

  // The decade gate must hold in BOTH lineage-cut modes: a preemptible
  // 100 TB fleet runs `reliable` (Dataset.checkpoint through the FS),
  // and a per-round FS write that breaks linearity would make the flag
  // unusable exactly where it's needed. Measured on the heaviest
  // iterative head; CheckpointModeSpec proves bit-equality, this proves
  // the SCALING survives the write tax (r11 verdict item 3).
  test("q_pagerank: second-decade gate holds in RELIABLE checkpoint mode") {
    synthDir
    val prev = spark.conf.getOption(LineageCut.ModeKey)
    spark.conf.set(LineageCut.ModeKey, "reliable")
    try {
      wall("q_pagerank", sf) // warm-up, reliable path (dir init, JIT)
      val small = wall("q_pagerank", Sf01)
      val large = wall("q_pagerank", synthDir)
      val ratio = large / math.max(small, 0.1)
      info(f"reliable mode: sf0.1 = $small%.2fs, sf1 = $large%.2fs, " +
        f"ratio = $ratio%.1fx")
      assert(ratio < MaxRatioFor10x,
        f"q_pagerank in reliable mode grew $ratio%.1fx for 10x data — " +
          "the FS-write tax breaks the decade gate; a preemptible fleet " +
          "could not flip the flag")
    } finally prev match {
      case Some(v) => spark.conf.set(LineageCut.ModeKey, v)
      case None => spark.conf.unset(LineageCut.ModeKey)
    }
  }
}
