package graft

import org.scalatest.funsuite.AnyFunSuite

/** The head-level bench regression gate (BenchRegression), enforced:
  * unit-pins the gate semantics on synthetic history, then replays the
  * gate over the COMMITTED BENCH_HISTORY.jsonl — latest full-bench line
  * vs the medians of its priors — and fails the suite on any hit. This
  * is the encoded form of the builder's manual ">1.5x with >1s absolute"
  * round-over-round scan (round-8's q_cluster_star 4.9 -> 6.9s builder
  * move — 1.42x, under the gate — is exactly the scale of move this
  * catches the moment it crosses the line). No SparkSession needed. */
class BenchRegressionSpec extends AnyFunSuite {
  import BenchRegression._

  private val hist = Seq(
    Map("q_big" -> 5.0, "q_small" -> 0.5, "q_new" -> 4.0),
    Map("q_big" -> 5.2, "q_small" -> 0.6),
    Map("q_big" -> 4.8, "q_small" -> 0.4))

  test("gate fires only on ratio AND absolute move, on >2s heads with >=2 priors") {
    // real regression: 5.0 median -> 9.0 (1.8x, +4s)
    assert(check(hist, Map("q_big" -> 9.0)).contains("q_big"))
    // ratio alone (sub-2s-MEDIAN head): 0.5 -> 1.9 is 3.8x but the
    // head's steady wall is under the 2s floor and the move is under
    // the catastrophic +2s — session-overhead noise, not a regression
    assert(check(hist, Map("q_small" -> 1.9)).isEmpty)
    // small head, catastrophic move: 0.5 median -> 3.2 (6.4x, +2.7s)
    // clears BOTH catastrophic thresholds and fires despite the floor
    assert(check(hist, Map("q_small" -> 3.2)).contains("q_small"))
    // the round-11 host-noise profile: a ~1.2s-median head drifting to
    // ~2.3s (the q_degree_dist / q_tpch_q3 quiet-run draws) must NOT
    // fire — that is era noise the interleaved A/B pinned to the host
    val h3 = Seq(Map("q_tiny" -> 1.2), Map("q_tiny" -> 1.25))
    assert(check(h3, Map("q_tiny" -> 2.3)).isEmpty)
    // absolute alone: 5.0 -> 6.9 (+1.9s) is 1.38x — under the ratio gate
    assert(check(hist, Map("q_big" -> 6.9)).isEmpty)
    // ratio over a tiny base, >2s fresh: 1.5 median... use a 2.2->3.4
    // shaped case via a custom history: +1.2s abs, 1.55x -> fires
    val h2 = Seq(Map("q_mid" -> 2.2), Map("q_mid" -> 2.2))
    assert(check(h2, Map("q_mid" -> 3.4)).contains("q_mid"))
    // single prior observation: no gate (no stable reference yet)
    assert(check(hist, Map("q_new" -> 40.0)).isEmpty)
    // flagged pair carries (fresh, history median)
    val (w, med) = check(hist, Map("q_big" -> 9.0))("q_big")
    assert(w == 9.0 && med == 5.0)
  }

  test("streaming heads gate on the data wall when the split has history") {
    // fresh total wall looks regressed (5.0 median -> 9.0) but the data
    // wall is flat (2.2 -> 2.3): startup drift, not a plan regression
    val histData = Seq(Map("q_big" -> 2.2), Map("q_big" -> 2.2))
    assert(check(hist, Map("q_big" -> 9.0), histData,
      Map("q_big" -> 2.3)).isEmpty)
    // data wall itself regressed (2.2 -> 4.5): fires on the data series
    val r = check(hist, Map("q_big" -> 9.0), histData, Map("q_big" -> 4.5))
    assert(r.get("q_big").contains((4.5, 2.2)))
    // fresh split present but <2 data-wall priors: the ratio gate is off
    // (a 9.0 vs 5.0-median totals move is ordinary startup-semantics
    // noise) ...
    assert(check(hist, Map("q_big" -> 9.0), Seq(Map("q_big" -> 2.0)),
      Map("q_big" -> 8.0)).isEmpty)
    // ... but the catastrophic totals backstop (3x + 2s on the raw wall)
    // still fires while data-wall history accumulates: a genuine blowup
    // in the split's first rounds must not be invisible
    val cat = check(hist, Map("q_big" -> 40.0), Seq(Map("q_big" -> 2.0)),
      Map("q_big" -> 39.0))
    assert(cat.get("q_big").contains((40.0, 5.0)))
    // heads without a fresh split still gate on totals as before
    assert(check(hist, Map("q_big" -> 9.0), histData, Map.empty)
      .contains("q_big"))
  }

  test("queriesMap parses Bench's history-line format exactly") {
    val line = """{"metric":"total","value":1.0,"unit":"sec","queries":{"q_a":1.500,"q_b":0.250},"queries_median":{"q_a":1.600,"q_b":0.300},"bytes":{"q_a":{"scan":10,"shuffle":0}},"sf":"/root/testdata/sf0.1"}"""
    assert(queriesMap(line) == Map("q_a" -> 1.5, "q_b" -> 0.25))
    assert(queriesMap(line, "queries_median") == Map("q_a" -> 1.6, "q_b" -> 0.3))
    assert(queriesMap("""{"queries":{}}""").isEmpty)
    assert(queriesMap("""{"no_queries_here":1}""").isEmpty)
  }

  test("committed history: the latest full-bench line has no regressed head") {
    val path = "BENCH_HISTORY.jsonl"
    val sfDir = "/root/testdata/sf0.1"
    val src = scala.io.Source.fromFile(path)
    val lines =
      try src.getLines().toVector
        .filter(l => l.contains("\"metric\":\"total\"")
          && l.contains("\"sf\":\"" + sfDir + "\""))
        .filter(l => queriesMap(l).nonEmpty)
      finally src.close()
    // the gate needs a latest line plus >= 2 priors to say anything
    assume(lines.size >= 3, s"only ${lines.size} full-bench lines in $path")
    val regs = check(
      lines.init.map(l => queriesMap(l)),
      queriesMap(lines.last),
      lines.init.map(l => queriesMap(l, "stream_data_wall")),
      queriesMap(lines.last, "stream_data_wall"))
    assert(regs.isEmpty,
      "regressed heads vs history medians (fresh, median): " +
        regs.toSeq.sortBy(_._1).map { case (n, (w, m)) =>
          f"$n $w%.2fs vs $m%.2fs"
        }.mkString("; "))
  }
}
