package graft

/** Head-level bench regression gate — the builder's manual round-over-
  * round convention (">1.5x its history median AND >1s absolute, on
  * heads over 2s"), encoded so it runs on every bench and every test
  * pass instead of by hand. Two enforcement points:
  *
  *   - `graft.Bench` calls [[check]] against the committed
  *     BENCH_HISTORY.jsonl before appending its own line, emits a
  *     `"regressions"` map + `"n_regressed"` count into the full JSON
  *     artifact, and prints each hit loudly to stderr (the run still
  *     exits 0 — a noisy machine must not turn the round's bench
  *     artifact into a failure; the SPEC is the hard gate);
  *   - `BenchRegressionSpec` replays the same check over the committed
  *     history (latest full line vs its priors) and FAILS the suite on
  *     any hit, so a regressed head cannot be committed quietly.
  *
  * The gate needs >= 2 prior observations of a head before it can fire
  * (a brand-new query has no history), uses the per-query MIN estimator
  * (what the history lines carry), and takes the median across rounds
  * as the reference — one noisy historical sample cannot shift the
  * gate the way a mean would.
  */
object BenchRegression {
  /** Only heads whose HISTORY MEDIAN exceeds this are ratio-gated: the
    * floor classifies heads by their steady wall, not by today's draw.
    * (Until round 11 the floor applied to the FRESH wall, which made
    * every sub-2s head a lottery ticket: a 1.2s-median head that noised
    * up to 2.3s entered the gate precisely because it was noisy — the
    * round-11 interleaved A/B showed sub-2s-median heads swinging
    * 1.8-2x on host era with ZERO code change, q_tpch_q3 and
    * q_degree_dist both firing on different quiet same-code runs.) */
  val MinHeadWallS = 2.0
  /** Flag when fresh > ratio x history-median ... */
  val RatioGate = 1.5
  /** ... AND the absolute move exceeds this (a 2.1s -> 3.2s move is
    * noise; a 5s -> 8s move is a regression). */
  val AbsGateS = 1.0
  /** Catastrophic clause for heads UNDER the median floor: small heads
    * escape the ratio gate (their noise amplitude covers it), but a
    * genuine blowup — 3x the steady wall AND +2s absolute — still
    * fires. A 1.5s head drifting to 2.3s is host noise; the same head
    * at 6s is a plan regression. */
  val CatRatioGate = 3.0
  val CatAbsGateS = 2.0
  /** The gate's reference is the median of the last N PRIOR lines, not
    * all history: round 12 switched sampling from back-to-back (whose
    * min-of-2 included a warm JIT/page-cache sample) to pass-interleaved
    * (both samples cold, ~20 min apart), a one-time level shift the
    * round-12 verdict asked the medians to re-anchor on — but 23 of the
    * 28 committed lines predate the switch, so an all-history median
    * would keep gating cold samples against warm-era baselines for
    * ~20 more rounds (q_label_prop: all-history median 3.27 s vs 6.9 s
    * across the five interleaved-era lines, same code). Seven lines is
    * wide enough that one noisy round cannot shift the median and
    * narrow enough to track the current methodology; a genuine plan
    * regression fires exactly as before, against current-method walls. */
  val WindowLines = 7

  /** Extract one `"key":{...}` flat map from a bench JSON line without
    * a JSON library: Bench writes query names as plain quoted strings
    * and walls as %.3f decimals, so a brace-free body split is exact.
    * Returns empty on absent key or empty body. */
  def queriesMap(line: String, key: String = "queries"): Map[String, Double] = {
    val re = ("\"" + key + "\":\\{([^}]*)\\}").r
    re.findFirstMatchIn(line).map(_.group(1)).filter(_.nonEmpty) match {
      case None => Map.empty
      case Some(body) =>
        body.split(",").iterator.flatMap { kv =>
          kv.split(":") match {
            case Array(k, v) =>
              val name = k.trim.stripPrefix("\"").stripSuffix("\"")
              v.toDoubleOption.map(name -> _)
            case _ => None
          }
        }.toMap
    }
  }

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** The gate: name -> (fresh wall, history median) for every head that
    * trips BOTH the ratio and absolute thresholds.
    *
    * Streaming heads gate on their DATA wall (total − measured
    * AvailableNow startup; Bench's micro-fixture probe) when both the
    * fresh run and ≥2 history lines carry the split — startup drift is
    * harness behavior, not a plan regression, and the round-10 gate hit
    * proved the conflation (steady per-batch walls flat while the total
    * moved). A head with a fresh data wall but <2 data-wall priors gets
    * no RATIO gate that round (totals mix startup semantics, the ratio
    * would gate on noise) — but the CATASTROPHIC clause (3x + 2s) still
    * runs against the raw-wall history as a backstop, so a genuine
    * blowup landing in the split's first rounds is not invisible
    * (round-11 advisor note). The gate migrates fully to the split as
    * data-wall history accumulates. */
  def check(history0: Seq[Map[String, Double]],
      fresh: Map[String, Double],
      historyData0: Seq[Map[String, Double]] = Nil,
      freshData: Map[String, Double] = Map.empty): Map[String, (Double, Double)] = {
    val history = history0.takeRight(WindowLines)
    val historyData = historyData0.takeRight(WindowLines)
    def gate(name: String, w: Double, prior: Seq[Double]) =
      if (prior.size >= 2) {
        val med = median(prior)
        val ratioHit = med > MinHeadWallS &&
          w > RatioGate * med && w - med > AbsGateS
        val catHit = w > CatRatioGate * med && w - med > CatAbsGateS
        if (ratioHit || catHit) Some(name -> (w, med)) else None
      } else None
    def catOnly(name: String, w: Double, prior: Seq[Double]) =
      if (prior.size >= 2) {
        val med = median(prior)
        if (w > CatRatioGate * med && w - med > CatAbsGateS)
          Some(name -> (w, med)) else None
      } else None
    fresh.flatMap { case (name, w) =>
      freshData.get(name) match {
        case Some(dw) =>
          val dwPriors = historyData.flatMap(_.get(name))
          if (dwPriors.size >= 2) gate(name, dw, dwPriors)
          // <2 data-wall priors: catastrophic-only backstop on the RAW
          // wall history — a 3x+2s blowup fires even before the
          // data-wall series arms; ordinary ratio moves wait for it
          else catOnly(name, w, history.flatMap(_.get(name)))
        case None => gate(name, w, history.flatMap(_.get(name)))
      }
    }
  }

  /** Per-query maps of the committed full-bench lines for one sf dir
    * (stream_steady_state and other non-"total" lines are skipped).
    * `key` selects which flat map to extract — "queries" (the walls) or
    * "stream_data_wall" (the startup-split series); lines predating the
    * split simply contribute nothing for the latter. */
  def historyFor(path: String, sfDir: String,
      key: String = "queries"): Seq[Map[String, Double]] = {
    val f = new java.io.File(path)
    if (!f.exists) Nil
    else {
      val src = scala.io.Source.fromFile(f)
      try src.getLines().toVector
        .filter(l => l.contains("\"metric\":\"total\"")
          && l.contains("\"sf\":\"" + sfDir + "\""))
        .map(l => queriesMap(l, key)).filter(_.nonEmpty)
      finally src.close()
    }
  }
}
