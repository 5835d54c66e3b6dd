package graft

/** Privacy family (Privacy.scala): the release-mechanics contracts —
  * noise stays within the binomial envelope, suppression actually
  * suppresses, clipping actually clips, and the RR estimator debiases
  * to within its sampling envelope. */
class PrivacySpec extends GraftSuite {

  import graft.operators.Privacy

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_dp_counts: noise bounded by the binomial envelope; accounting closes") {
    val rows = run("q_dp_counts").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val noise = r.getAs[Long]("noise")
      assert(math.abs(noise) <= Privacy.NoiseBits / 2,
        s"noise $noise outside ±${Privacy.NoiseBits / 2}")
      assert(r.getAs[Long]("n_noisy") == r.getAs[Long]("n_true") + noise)
    }
    assert(rows.map(_.getAs[Long]("n_true")).sum ==
      Tables.events(spark, sf).count())
  }

  test("q_dp_histogram: every released cell clears tau; suppression bites") {
    import org.apache.spark.sql.functions._
    val released = run("q_dp_histogram").collect()
    assert(released.nonEmpty)
    released.foreach { r =>
      assert(r.getAs[Long]("n_noisy") >= Privacy.SuppressTau)
      assert(math.abs(r.getAs[Long]("n_noisy") - r.getAs[Long]("n_true"))
        <= Privacy.NoiseBits / 2)
    }
    val trueCells = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT) DIV 2000").as("b"))
      .distinct().count()
    assert(released.length < trueCells,
      s"threshold ${Privacy.SuppressTau} suppressed nothing " +
        s"($trueCells cells, ${released.length} released)")
  }

  test("q_dp_mean: clipping bites; released mean is the documented quotient") {
    val r = run("q_dp_mean").collect().head
    val n = r.getAs[Long]("n_users")
    val nClipped = r.getAs[Long]("n_clipped")
    assert(nClipped > 0, s"clip at ${Privacy.ClipCents} never bites")
    // partial bite needs the sf0.01+ user population; the 15-user smoke
    // fixture concentrates ~67 events on every user, so all clip there
    if (n > 100) assert(nClipped < n,
      s"clip at ${Privacy.ClipCents} should not bite every user ($nClipped/$n)")
    assert(r.getAs[Long]("clipped_mass") > 0)
    assert(math.abs(r.getAs[Long]("noise_n")) <= Privacy.NoiseBits / 2)
    assert(math.abs(r.getAs[Long]("noise_sum")) <=
      (Privacy.NoiseBits / 2) * (Privacy.ClipCents / Privacy.NoiseBits))
    assert(r.getAs[Long]("mean_noisy_cents") ==
      Math.floorDiv(r.getAs[Long]("sum_clipped") + r.getAs[Long]("noise_sum"),
        n + r.getAs[Long]("noise_n")))
    assert(r.getAs[Long]("mean_clipped_cents") ==
      Math.floorDiv(r.getAs[Long]("sum_clipped"), n))
  }

  test("q_rr_debias: estimator error stays inside its sampling envelope") {
    val r = run("q_rr_debias").collect().head
    val n = r.getAs[Long]("n")
    assert(n == Tables.events(spark, sf).select("user_id").distinct().count())
    assert(r.getAs[Long]("n_true") <= n && r.getAs[Long]("n_reported") <= n)
    // var of the RR estimate of the rate is ~3/(16n); allow ~5 sigma.
    val sigmaPpm = (math.sqrt(3.0 / (16.0 * n)) * 1e6).toLong
    assert(math.abs(r.getAs[Long]("err_ppm")) <= 5 * sigmaPpm,
      s"err ${r.getAs[Long]("err_ppm")} ppm vs 5σ = ${5 * sigmaPpm}")
  }
}
