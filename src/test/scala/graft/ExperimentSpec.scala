package graft

/** Experimentation ops (Experiment.scala): the statistical contracts
  * behind the oracle hashes — conformal coverage must land near its
  * distribution-free target, and CUPED must adjust without moving the
  * pooled metric. */
class ExperimentSpec extends GraftSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_conformal_interval: coverage lands near the 90% target") {
    val r = run("q_conformal_interval").collect().head
    val nCal = r.getAs[Long]("n_cal")
    val nTest = r.getAs[Long]("n_test")
    assert(nCal > 0 && nTest > 0)
    assert(r.getAs[Long]("qhat_cents") > 0)
    assert(r.getAs[Long]("n_covered") <= nTest)
    val ppm = r.getAs[Long]("coverage_ppm")
    // finite-sample fluctuation around the 1-alpha guarantee; the smoke
    // fixture is deterministic, so this is a regression tripwire, not a
    // statistical test
    assert(ppm >= 820000L && ppm <= 980000L,
      s"coverage $ppm ppm implausibly far from the 900000 target")
  }

  test("q_cuped: adjustment reduces nothing it shouldn't") {
    val rows = run("q_cuped").collect()
    assert(rows.map(_.getAs[Long]("treat")).toSet == Set(0L, 1L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      val raw = r.getAs[Long]("mean_y_milli")
      val adj = r.getAs[Long]("mean_y_adj_milli")
      // theta is fit on pre-period covariance of a near-independent
      // fixture — the adjustment must be a small correction, never a
      // rewrite of the metric (a unit bug lands orders off)
      assert(math.abs(adj - raw) < 10000L,
        s"treat ${r.getAs[Long]("treat")}: adjustment moved the mean " +
          s"$raw -> $adj milli — implausibly large")
    }
  }

  test("q_uplift_bands: accounting closes; null-treatment coin is balanced-ish") {
    val rows = run("q_uplift_bands").collect()
    assert(rows.nonEmpty)
    val (nt, nc) = (rows.map(_.getAs[Long]("n_t")).sum,
      rows.map(_.getAs[Long]("n_c")).sum)
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(nt + nc == users, "every user lands in exactly one band+arm")
    rows.foreach { r =>
      assert(r.getAs[Long]("conv_t") <= r.getAs[Long]("n_t"))
      assert(r.getAs[Long]("conv_c") <= r.getAs[Long]("n_c"))
    }
    // md5 coin: neither arm should be grossly starved at any scale
    assert(nt * 3 > nc && nc * 3 > nt, s"coin implausibly skewed: $nt/$nc")
  }

  test("q_policy_replay: the preferred-arm policy must beat the behavior log") {
    val r = run("q_policy_replay").collect().head
    assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_logged"))
    // uniform logging over 4 arms matches ~25% of events
    val matchPpm = r.getAs[Long]("match_ppm")
    assert(matchPpm > 150000L && matchPpm < 350000L)
    // the candidate plays each user's planted preferred arm: its replay
    // value must exceed the behavior average (which mixes 3/4 quartered
    // rewards) — the ordering the estimator exists to detect
    assert(r.getAs[Long]("policy_millicents") >
      r.getAs[Long]("behavior_millicents"))
  }
}
