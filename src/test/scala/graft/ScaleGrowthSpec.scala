package graft

/** Scale-growth evidence for the ITERATIVE family — the only queries
  * whose cost is round-count-dependent (everything else is a fixed DAG
  * whose scaling Catalyst's plan shape already pins). The 100 TB claim
  * for pageRank / labelProp / clusterStar rests on "one shuffle pair
  * per round, rounds independent of corpus size": if that holds, wall
  * time grows ~linearly in edge count. This spec measures each query at
  * sf0.01 and sf0.1 (10× the lineitem edges) and asserts the growth
  * ratio stays far below quadratic — a super-linear blowup (plan growth
  * across rounds, accidental O(n²) pair step, round count creeping with
  * n) shows up as a ratio near 100, not 15.
  *
  * Methodology: one sf0.001 pass first to JIT/warm each code path, then
  * wall-clock fn+count at each scale. Fixed per-job overhead inflates
  * the SMALL scale's time, so overhead pushes the ratio DOWN — the
  * assert can false-pass only toward leniency on a machine with huge
  * constant costs, never flake toward failure on a fast one. */
class ScaleGrowthSpec extends GraftSuite {

  private val Sf001 = "/root/testdata/sf0.01"
  private val Sf01 = "/root/testdata/sf0.1"
  private val MaxRatioFor10x = 15.0

  private def wall(name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }

  for (q <- Seq("q_pagerank", "q_label_prop", "q_cluster_star")) {
    test(s"$q: wall-time growth over 10x edges is ~linear (< ${MaxRatioFor10x}x)") {
      wall(q, sf) // warm-up at sf0.001: JIT, codegen cache, FS metadata
      val small = wall(q, Sf001)
      val large = wall(q, Sf01)
      val ratio = large / math.max(small, 0.1)
      info(f"$q: sf0.01 = $small%.2fs, sf0.1 = $large%.2fs, ratio = $ratio%.1fx")
      assert(ratio < MaxRatioFor10x,
        f"$q grew $ratio%.1fx for 10x data (sf0.01 $small%.2fs -> sf0.1 " +
          f"$large%.2fs) — super-linear scaling breaks the 100 TB story")
    }
  }

  /** The dedup/text heads: unlike the iterative graph family these are
    * fixed DAGs, but their 100 TB verdict previously rested on
    * plan-shape audits alone — and the dangerous failure modes here are
    * DATA-dependent, not plan-dependent: a shingle/band bucket whose
    * occupancy grows super-linearly feeds a quadratic within-bucket
    * pair step; an n-gram posting list with a corpus-frequency hot key
    * skews one reducer. Measuring 10x-document growth catches exactly
    * those. Same methodology (warm-up pass, fixed overhead inflates the
    * small side → leniency-only bias), same ceiling. */
  for (q <- Seq("q_minhash_dedup", "q_containment", "q_winnow",
      "q_novelty", "q_dup_spans", "q_bpe_roundtrip")) {
    test(s"$q: wall-time growth over 10x documents is ~linear (< ${MaxRatioFor10x}x)") {
      wall(q, sf)
      val small = wall(q, Sf001)
      val large = wall(q, Sf01)
      val ratio = large / math.max(small, 0.1)
      info(f"$q: sf0.01 = $small%.2fs, sf0.1 = $large%.2fs, ratio = $ratio%.1fx")
      assert(ratio < MaxRatioFor10x,
        f"$q grew $ratio%.1fx for 10x data (sf0.01 $small%.2fs -> sf0.1 " +
          f"$large%.2fs) — super-linear scaling breaks the 100 TB story")
    }
  }

  /** The post-training family's representative heads: q_grpo_advantage
    * is the row-per-response output shape (two window specs over one
    * prompt-keyed shuffle — the cost is the one exchange plus the
    * per-partition sorts) and q_dpo_pairs the group-collapsed shape
    * (partial-agg combine before one exchange). Linear growth here
    * pins the "one shuffle, map-side partials" plan claims with a
    * measurement, same methodology as above. */
  for (q <- Seq("q_grpo_advantage", "q_dpo_pairs")) {
    test(s"$q: wall-time growth over 10x responses is ~linear (< ${MaxRatioFor10x}x)") {
      wall(q, sf)
      val small = wall(q, Sf001)
      val large = wall(q, Sf01)
      val ratio = large / math.max(small, 0.1)
      info(f"$q: sf0.01 = $small%.2fs, sf0.1 = $large%.2fs, ratio = $ratio%.1fx")
      assert(ratio < MaxRatioFor10x,
        f"$q grew $ratio%.1fx for 10x data (sf0.01 $small%.2fs -> sf0.1 " +
          f"$large%.2fs) — super-linear scaling breaks the 100 TB story")
    }
  }
}
