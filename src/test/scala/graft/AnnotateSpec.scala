package graft

/** Label-vote resolution semantics: majority, tie-break, and the
  * planted-noise structure the oracle replays. */
class AnnotateSpec extends GraftSuite {

  private lazy val rows =
    SparkEntry.queries("q_label_vote")(spark, sf).collect()

  test("label vote: majority always equals a cast vote or the tie minimum") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (l1, l2, l3, maj) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val votes = Seq(l1, l2, l3)
      val counts = votes.groupBy(identity).view.mapValues(_.size)
      if (counts.values.max >= 2)
        assert(counts(maj) >= 2, s"majority $maj must have >= 2 votes in $votes")
      else
        assert(maj == votes.min, s"3-way tie must break to min, got $maj of $votes")
    }
  }

  test("label vote: the 3-way-tie path genuinely occurs in the plant") {
    // with ~20% flip noise per annotator over 4 classes, all-distinct
    // triples must exist — otherwise the tie-break rule is untested
    assert(rows.exists(r => Set(r.getLong(1), r.getLong(2), r.getLong(3)).size == 3),
      "plant produced no 3-way tie; tie-break rule is vacuous")
    assert(rows.exists(_.getBoolean(6)), "no unanimous docs")
    assert(rows.exists(r => !r.getBoolean(6)), "all docs unanimous — noise dead")
  }

  test("leaderboard: ranking recovers the planted strength order exactly") {
    val lb = SparkEntry.queries("q_leaderboard")(spark, sf).collect()
    assert(lb.map(_.getLong(0)).toSeq == (0L until 8L),
      "win-ppm ranking must equal the planted strength order 0..7")
    lb.foreach(r => assert(r.getLong(1) == r.getLong(2) +
      (r.getLong(1) - r.getLong(2)), s"games/wins inconsistent: $r"))
    val totalGames = lb.map(_.getLong(1)).sum
    assert(totalGames == 2 * graft.operators.Annotate.NumTrials,
      "every trial must contribute exactly two sides")
  }

  test("pref bias: audit detects the planted 7/10 length preference") {
    val r = SparkEntry.queries("q_pref_bias")(spark, sf).collect().head
    val ppm = r.getLong(2)
    assert(ppm > 550000 && ppm < 850000,
      s"planted ~70% chosen-longer rate out of envelope: $ppm ppm")
    assert(r.getLong(3) > 0, "length delta must be positive under the plant")
  }

  test("kappa: matches a brute-force recomputation and sits below raw agreement") {
    val out = SparkEntry.queries("q_kappa")(spark, sf).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("1-2", "1-3", "2-3"))
    val labels = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = labels.length.toLong
    def brute(la: ((Long, Long, Long)) => Long, lb: ((Long, Long, Long)) => Long) = {
      val agree = labels.count(t => la(t) == lb(t)).toLong
      val ca = labels.groupBy(la).map { case (c, g) => c -> g.size.toLong }
      val cb = labels.groupBy(lb).map { case (c, g) => c -> g.size.toLong }
      val peNum = ca.map { case (c, x) => x * cb.getOrElse(c, 0L) }.sum
      val po = agree * 1000000L / n
      val pe = peNum * 1000000L / (n * n)
      (agree, po, pe, (po - pe) * 1000000L / (1000000L - pe))
    }
    val expect = Seq(brute(_._1, _._2), brute(_._1, _._3), brute(_._2, _._3))
    out.zip(expect).foreach { case (r, (agree, po, pe, k)) =>
      assert(r.getLong(1) == n && r.getLong(2) == agree)
      assert(r.getLong(3) == po && r.getLong(4) == pe && r.getLong(5) == k)
      assert(k < po, "chance correction must lower the statistic")
      // two independent 20%-noise annotators: po ~ .68, pe ~ .25+, kappa ~ .57
      assert(k > 350000 && k < 800000, s"kappa out of plant envelope: $k")
    }
  }

  test("bradley-terry: recovers the planted order with positive normalized strengths") {
    val out = SparkEntry.queries("q_bradley_terry")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == (0L until 8L),
      "BT strengths must rank models in the planted order 0..7")
    val s = out.map(_.getLong(3))
    assert(s.forall(_ > 0), "strengths must stay positive through MM rounds")
    assert(s.toSeq == s.sortBy(-_).toSeq && s.distinct.length == s.length,
      "strengths must be strictly decreasing in rank")
    val tot = s.sum
    // renormalized each round to models*1e6, minus one DIV floor per model
    assert(tot <= 8000000L && tot > 8000000L - 8,
      s"strength mass $tot escaped the normalization envelope")
    // the strength RATIO between adjacent models must exceed the win-ppm
    // gap direction: strongest model strictly above the uniform unit
    assert(s.head > graft.operators.Annotate.BtUnit && s.last <
      graft.operators.Annotate.BtUnit, "fit did not spread around the unit")
    val wins = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lb = SparkEntry.queries("q_leaderboard")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(wins == lb, "BT win totals must equal the leaderboard's")
  }

  test("label vote: majority recovers the true label on a strong majority of docs") {
    // per-annotator flip rate is 2/10; P(majority wrong) = P(>=2 flips)
    // = 3(0.2^2)(0.8) + 0.2^3 = 0.104 — assert well inside the envelope
    val correct = rows.count(_.getBoolean(7))
    assert(correct.toDouble / rows.length > 0.8,
      s"majority vote recovered only $correct/${rows.length}")
  }
}
