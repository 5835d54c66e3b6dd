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

  test("label vote: majority recovers the true label on a strong majority of docs") {
    // per-annotator flip rate is 2/10; P(majority wrong) = P(>=2 flips)
    // = 3(0.2^2)(0.8) + 0.2^3 = 0.104 — assert well inside the envelope
    val correct = rows.count(_.getBoolean(7))
    assert(correct.toDouble / rows.length > 0.8,
      s"majority vote recovered only $correct/${rows.length}")
  }
}
