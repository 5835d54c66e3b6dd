package graft

/** Post-training data ops (PostTrain.scala) + the MapState streaming
  * row: structural invariants the DuckDB hash-compare can't express as
  * clearly — margin gates actually gate, regret is one-signed, rank
  * advantages hit their exact endpoints, largest-remainder allocations
  * sum to the budget bit-for-bit, and the MapState machine equals its
  * batch window twin frame-for-frame. */
class PostTrainSpec extends GraftSuite {
  import org.apache.spark.sql.functions._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("collapsed-key envelope: every fixture sits inside the 1e12 key bounds") {
    // the cents*1e12 -/+ event_id collapse (q_dpo_pairs, q_best_of_n,
    // q_grpo_advantage) is faithful only while event_id < M (a bigger
    // id would outweigh a real 1-cent reward gap — tie-break inversion)
    // and |cents|*M + event_id fits a Long (overflow). Assert both per
    // shipped fixture, with a decade of headroom on the id bound, so a
    // regenerated corpus that drifts toward the envelope fails here
    // before it can silently flip an argmax.
    val M = 1000000000000L
    for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")
        .map(s => s"/root/testdata/$s")
        .filter(d => new java.io.File(d).exists)) {
      val r = Tables.events(spark, dir)
        .agg(max(abs(col("event_id"))).as("id_max"),
          max(abs(round(col("value") * 100).cast("long"))).as("cents_max"))
        .collect().head
      val (idMax, centsMax) = (r.getLong(0), r.getLong(1))
      assert(idMax < M / 10, s"$dir: event_id $idMax within a decade of the $M collapse bound")
      assert(centsMax < (Long.MaxValue - idMax) / M,
        s"$dir: cents $centsMax would overflow the collapsed key")
    }
  }

  test("q_dpo_pairs: margins gate, chosen strictly beats rejected, ids differ") {
    val rows = run("q_dpo_pairs").collect()
    assert(rows.nonEmpty, "margin gate dropped everything at smoke scale")
    rows.foreach { r =>
      val margin = r.getAs[Long]("margin_cents")
      assert(margin >= operators.PostTrain.MarginCents)
      assert(r.getAs[Long]("chosen_cents") > r.getAs[Long]("rejected_cents"))
      assert(r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id"))
      assert(r.getAs[Long]("n_responses") >= 2)
    }
  }

  test("q_best_of_n: sampling cap holds and regret is never negative") {
    val rows = run("q_best_of_n").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nSampled = r.getAs[Long]("n_sampled")
      assert(nSampled >= 1 && nSampled <= operators.PostTrain.BestN)
      assert(nSampled <= r.getAs[Long]("n_responses"))
      assert(r.getAs[Long]("regret_cents") >= 0,
        "best-of-N cannot beat the full pool")
    }
    // the regret must be genuinely positive SOMEWHERE at smoke scale —
    // otherwise the first-N restriction isn't being exercised
    assert(rows.exists(_.getAs[Long]("regret_cents") > 0))
  }

  test("q_grpo_advantage: rank endpoints exact, advantages centered") {
    val df = run("q_grpo_advantage")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("rank_adv_ppm")
      assert(ppm >= -1000000L && ppm <= 1000000L)
      assert(r.getAs[Long]("n_group") >= 2)
    }
    // per group: exactly one -1e6 (worst) and one +1e6 (best) endpoint
    val perGroup = df.groupBy("user_id")
      .agg(min("rank_adv_ppm").as("lo"), max("rank_adv_ppm").as("hi"))
      .collect()
    perGroup.foreach { g =>
      assert(g.getAs[Long]("lo") == -1000000L, "worst rank must map to -1e6")
      assert(g.getAs[Long]("hi") == 1000000L, "best rank must map to +1e6")
    }
    // floor-mean centering: per group, sum of adv_cents lies in [0, n)
    // (each row drops < 1 floor unit; truncation is one-sided)
    val sums = df.groupBy("user_id")
      .agg(sum("adv_cents").as("s"), max("n_group").as("n")).collect()
    sums.foreach { g =>
      val s = g.getAs[Long]("s")
      assert(s >= 0 && s < g.getAs[Long]("n"),
        s"floor-mean residual out of range: $s")
    }
  }

  test("q_pref_transitivity: triad accounting closes over the planted arena") {
    val r = run("q_pref_transitivity").collect().head
    val models = operators.Annotate.NumModels.toLong
    val nTriads = r.getAs[Long]("n_triads")
    assert(nTriads == models * (models - 1) * (models - 2) / 6,
      "every (a<b<c) triple must be assembled exactly once")
    val complete = r.getAs[Long]("n_complete")
    val cyclic = r.getAs[Long]("n_cyclic")
    assert(complete <= nTriads && cyclic <= complete)
    assert(r.getAs[Long]("n_decided_pairs") <= models * (models - 1) / 2)
    // the arena plants a strict strength order at ~178 games/pair —
    // cyclicity should be rare (deterministic; loose bound, exact value
    // is hash-pinned by the oracle)
    assert(cyclic * 5 <= complete, s"cyclic=$cyclic of complete=$complete")
  }

  test("q_mix_anneal: allocations sum to the budget; endpoints are exact") {
    val df = run("q_mix_anneal")
    val perPhase = df.groupBy("phase")
      .agg(sum("alloc_chars").as("total")).collect()
    assert(perPhase.length == operators.PostTrain.AnnealPhases)
    perPhase.foreach { p =>
      assert(p.getAs[Long]("total") == operators.PostTrain.PhaseBudgetChars,
        s"phase ${p.get(0)}: largest-remainder must hit the budget exactly")
    }
    // final phase = uniform ppm bit-for-bit; phase 0 = natural ppm
    val sCnt = df.filter(col("phase") === 0).count()
    val uniform = 1000000L / sCnt
    val lastPhase = operators.PostTrain.AnnealPhases - 1
    df.filter(col("phase") === lastPhase).collect().foreach { r =>
      assert(r.getAs[Long]("w_ppm") == uniform,
        "anneal must land exactly on uniform at the final phase")
    }
    val natural = Tables.documents(spark, sf)
      .groupBy("source").agg(sum("n_chars").as("c"))
    val ctot = natural.agg(sum("c")).collect().head.getLong(0)
    val nat = natural.collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("c") * 1000000L / ctot)
      .toMap
    df.filter(col("phase") === 0).collect().foreach { r =>
      assert(r.getAs[Long]("w_ppm") == nat(r.getAs[String]("source")),
        "phase 0 must reproduce the natural mix exactly")
    }
  }

  test("q_stream_type_counts equals its batch window twin") {
    val streamed = run("q_stream_type_counts")
    val batch = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(spark, sf)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"),
          row_number().over(w).cast("long").as("type_n"),
          sum(col("c")).over(w).as("type_cents"))
    }
    assert(canon(streamed) == canon(batch))
  }

  test("q_stream_restart_types: a restart changes nothing for MapState") {
    val restarted = run("q_stream_restart_types")
    val single = run("q_stream_type_counts")
    assert(canon(restarted) == canon(single))
  }
}
