package graft

/** Round-8 additions:
  *  - natural-regime ANN recall@10 rows: structural invariants + the
  *    calibrated per-family floors (the pinned-oracle values are the
  *    exact gate; the floors catch a regression in-suite before the
  *    driver sees it, and document the honest natural-regime ordering
  *    LSH < PQ < IVF at these index budgets);
  *  - SQL-face rows: the pure-`spark.sql` spellings must produce
  *    byte-identical frames to their column-API siblings (two
  *    independent Spark spellings, one answer);
  *  - transformWithState restart-recovery: the two-lifecycle
  *    checkpointed run must equal the single-lifecycle row exactly —
  *    a restart changes NOTHING.
  */
class Round8OpsSpec extends GraftSuite {
  import org.apache.spark.sql.functions._

  private def one(name: String) =
    SparkEntry.queries(name)(spark, sf).collect().head

  test("natural recall rows: roster/pair invariants hold at the smoke scale") {
    val n = Tables.embeddings(spark, sf).count()
    val roster = math.min(n, operators.Similarity.NatQueryCount.toLong)
    for (q <- Seq("q_ann_lsh_recall10", "q_ann_ivf_recall10", "q_ann_pq_recall10")) {
      val r = one(q)
      assert(r.getLong(0) == roster, s"$q n_queries")
      assert(r.getLong(1) == roster * 10, s"$q n_exact_pairs")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1), s"$q n_hits bounds")
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1), s"$q ppm arithmetic")
    }
  }

  test("natural recall floors: calibrated per-family minima at the pinned scales") {
    // floors are deliberately below the measured values (Similarity
    // .Nat*Hits Scaladoc) so they fail only on a REGRESSION, not noise —
    // the pipeline is deterministic, so any change is a code change
    import operators.Similarity._
    def ppm(m: Map[(Long, Long), Long], k: (Long, Long)) =
      m(k) * 1000000L / (NatQueryCount * 10L)
    for (k <- Seq(NatFpSf0001, NatFpSf001, NatFpSf01)) {
      assert(ppm(NatLshHits, k) >= 10000L, s"LSH natural recall floor @$k")
      assert(ppm(NatPqHits, k) >= 80000L, s"PQ natural recall floor @$k")
      assert(ppm(NatIvfHits, k) >= 150000L, s"IVF natural recall floor @$k")
      // the documented ordering at these budgets
      assert(NatLshHits(k) < NatPqHits(k) && NatPqHits(k) < NatIvfHits(k),
        s"family ordering @$k")
      // the measured recall dial: re-cutting 64 planes as 8x8 instead
      // of 4x16 must lift natural recall over the dedup point
      assert(NatLsh8Hits(k) > NatLshHits(k), s"8x8 LSH lift @$k")
      // the IVF probe dial: nprobe 4 -> 16 buys ~4x candidates and must
      // lift recall strictly (measured ~19% -> ~52-57%)
      assert(NatIvf16Hits(k) > NatIvfHits(k), s"nprobe-16 IVF lift @$k")
    }
  }

  test("pinned-oracle fingerprint coverage: every shipped fixture is calibrated") {
    // the pinned-measurement oracles (ANN natural recall@10, compress
    // ratio) key on a CONTENT fingerprint, not bare row count — the
    // shipped sf0.001 and sf0.01 fixtures share row counts with
    // different content. This test recomputes each fixture's
    // fingerprint in Spark and fails if any pin map lacks the key, so
    // a regenerated/added fixture can't silently hit the NULL branch.
    import operators.Similarity._
    val fixtureDirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s"/root/testdata/$s").filter(d => new java.io.File(d).exists)
    assert(fixtureDirs.nonEmpty)
    for (dir <- fixtureDirs) {
      val eFp = Tables.embeddings(spark, dir)
        .agg(count(lit(1)).as("n"),
          sum(floor(element_at(col("embedding"), 1) * 1000000L).cast("long"))
            .as("fp"))
        .collect().head
      val eKey = (eFp.getLong(0), eFp.getLong(1))
      for ((fam, m) <- Seq("lsh" -> NatLshHits, "ivf" -> NatIvfHits,
          "pq" -> NatPqHits, "lsh8" -> NatLsh8Hits, "ivf16" -> NatIvf16Hits))
        assert(m.contains(eKey), s"$fam pin missing for $dir key=$eKey")
      val dFp = Tables.documents(spark, dir)
        .agg(count(lit(1)).as("n"),
          sum(octet_length(col("text")).cast("long")).as("tb"))
        .collect().head
      val dKey = (dFp.getLong(0), dFp.getLong(1))
      assert(operators.Scoring.compressPins.contains(dKey),
        s"compress pin missing for $dir key=$dKey")
    }
  }

  test("SQL-face rows equal their column-API siblings bit-for-bit") {
    for ((face, sibling) <- Seq(
        "q_sql_face_industry_avg" -> "q_industry_avg",
        "q_sql_face_minhash_dedup" -> "q_minhash_dedup",
        "q_sql_face_filter_funnel" -> "q_filter_funnel",
        "q_sql_face_random_walk" -> "q_random_walk",
        // the STREAMING face: a pure-SQL sliding-window aggregation over
        // a streaming temp view must equal the DataFrame spelling
        "q_sql_face_stream_sliding" -> "q_stream_sliding")) {
      assertSameRows(
        SparkEntry.queries(face)(spark, sf),
        SparkEntry.queries(sibling)(spark, sf))
    }
  }

  test("restart-recovery run equals the single-lifecycle row exactly") {
    assertSameRows(
      SparkEntry.queries("q_stream_restart_running")(spark, sf),
      SparkEntry.queries("q_stream_running")(spark, sf))
  }

  test("timer-machine restart equals the single-lifecycle digest exactly") {
    assertSameRows(
      SparkEntry.queries("q_stream_restart_digest")(spark, sf),
      SparkEntry.queries("q_stream_digest")(spark, sf))
  }

  test("restart-recovery staged both tranches (the split is non-degenerate)") {
    // guards the fixture assumption behind the restart row: the ts
    // midpoint must actually split the corpus, or lifecycle 2 would
    // test nothing (an empty tranche B degrades the row to a re-run)
    val e = Tables.events(spark, sf)
    val mm = e.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val cut = (mm.getLong(0) + mm.getLong(1)) / 2
    val below = e.filter(unix_micros(col("ts")) <= cut).count()
    val total = e.count()
    assert(below > 0 && below < total,
      s"degenerate tranche split: $below of $total at/below midpoint")
  }

  test("q_class_balance: caps bind on the majority class only; lottery is layout-invariant") {
    val rows = SparkEntry.queries("q_class_balance")(spark, sf).collect()
    assert(rows.nonEmpty)
    val cap = rows.head.getAs[Long]("cap")
    rows.foreach { r =>
      assert(r.getAs[Long]("cap") == cap, "one global cap")
      assert(r.getAs[Long]("n_kept") ==
        math.min(r.getAs[Long]("n_before"), cap),
        "kept = min(before, cap) exactly — the rank lottery never " +
          "under- or over-fills")
    }
    // minority class must survive whole; majority must actually shrink
    // when the fixture is imbalanced past the ratio
    val minN = rows.map(_.getAs[Long]("n_before")).min
    assert(rows.filter(_.getAs[Long]("n_before") == minN)
      .forall(r => r.getAs[Long]("kept_ppm") == 1000000L))
  }

  test("q_phrase_search: index intersection finds real, distinct top phrases") {
    val rows = SparkEntry.queries("q_phrase_search")(spark, sf).collect()
    assert(rows.length == operators.TextAnalysis.PhraseTopK,
      "the full roster must be found — every top trigram occurs by construction")
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[String]("phrase")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[String]("phrase").split(" ").length == 3)
      val (d, h) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_hits"))
      assert(d >= 1 && h >= d && d <= nDocs,
        s"occurrence accounting: docs=$d hits=$h")
    }
  }

  test("q_random_walk: every step of every path is a real edge; no walker dies") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_random_walk")(spark, sf).collect()
    assert(rows.nonEmpty)
    // symmetrized edge set, same derivation as the query
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("a"),
        ($"l_suppkey" + operators.Graph.SupplierOffset).as("b"))
      .distinct().collect()
    val edges = pairs.flatMap(r => Seq((r.getLong(0), r.getLong(1)),
      (r.getLong(1), r.getLong(0)))).toSet
    rows.foreach { r =>
      val path = r.getAs[String]("path").split(",").map(_.toLong)
      assert(path.length == operators.Graph.WalkSteps + 1,
        "a walk on a degree>=1 graph never dies")
      assert(path.head == r.getAs[Long]("walker"))
      assert(path.last == r.getAs[Long]("final_node"))
      path.sliding(2).foreach { case Array(u, v) =>
        assert(edges.contains((u, v)), s"non-edge step $u -> $v")
      }
    }
    // one walk per qualifying start node, none lost mid-flight
    val starts = edges.map(_._1)
      .count(n => n < operators.Graph.SupplierOffset &&
        n % operators.Graph.WalkStartMod == 1L)
    assert(rows.length == starts, s"${rows.length} walks for $starts starts")
  }

  test("q_skipgram_pairs: exact pair-count identity and histogram symmetry") {
    val rows = SparkEntry.queries("q_skipgram_pairs")(spark, sf).collect()
    val walks = SparkEntry.queries("q_random_walk")(spark, sf).count()
    // path length L = WalkSteps+1, window w: ordered pairs per walk =
    // L*(2w) - 2*(w + (w-1) + ... + 1) boundary losses = 22 for L=7, w=2
    val L = operators.Graph.WalkSteps + 1
    val w = operators.Graph.SkipgramWindow
    val perWalk = (0 until L).map(i =>
      (math.max(0, i - w) to math.min(L - 1, i + w)).count(_ != i)).sum
    assert(rows.map(_.getAs[Long]("n")).sum == walks * perWalk,
      s"every walk contributes exactly $perWalk ordered pairs")
    // (i, j) and (j, i) are both generated -> the histogram is symmetric
    val m = rows.map(r => (r.getAs[Long]("center"), r.getAs[Long]("context"))
      -> r.getAs[Long]("n")).toMap
    m.foreach { case ((c, x), n) =>
      assert(m.get((x, c)).contains(n), s"asymmetry at ($c, $x)")
    }
  }

  test("q_stream_sliding: every event lands in exactly window/slide = 4 windows") {
    val rows = SparkEntry.queries("q_stream_sliding")(spark, sf).collect()
    val events = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == 4 * events,
      "sliding-window multiplicity must be exact")
    val tumbling = SparkEntry.queries("q_stream_replay")(spark, sf).count()
    assert(rows.length > tumbling,
      "overlap must produce strictly more (window_start, type) groups")
  }

  test("q_stream_full_join extends q_stream_left_join by exactly the evicted clicks") {
    val full = SparkEntry.queries("q_stream_full_join")(spark, sf).collect()
    val left = SparkEntry.queries("q_stream_left_join")(spark, sf).collect()
    def key(r: org.apache.spark.sql.Row) =
      (0 until r.length).map(i => if (r.isNullAt(i)) "∅" else r.get(i).toString)
        .mkString("|")
    val fullSet = full.map(key).toSet
    assert(full.length == fullSet.size, "full-outer emits no duplicate rows")
    val leftSet = left.map(key).toSet
    assert(leftSet.subsetOf(fullSet),
      "every left-join row (matched + null-extended views) must appear in the full join")
    val extra = full.filter(r => !leftSet.contains(key(r)))
    assert(extra.nonEmpty, "the fixture has unmatched clicks below the watermark")
    extra.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("view_id")) &&
        r.isNullAt(r.fieldIndex("view_us")) &&
        !r.isNullAt(r.fieldIndex("click_id")),
        "full-minus-left rows are exactly the null-extended clicks")
    }
  }
}
