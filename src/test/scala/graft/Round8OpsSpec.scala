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

  test("natural recall rows: per-query frame invariants at the smoke scale") {
    val n = Tables.embeddings(spark, sf).count()
    val roster = math.min(n, operators.Similarity.NatQueryCount.toLong)
    for (q <- Seq("q_ann_lsh_recall10", "q_ann_ivf_recall10", "q_ann_pq_recall10")) {
      val rows = SparkEntry.queries(q)(spark, sf).collect()
      assert(rows.length == roster, s"$q one row per roster vector")
      assert(rows.forall(_.getLong(1) == 10L), s"$q n_exact = 10 per query")
      assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 10L),
        s"$q n_hits bounds")
    }
  }

  test("natural recall floors: live per-family minima, ordering, and dial lifts") {
    // floors are deliberately below the measured values so they fail
    // only on a REGRESSION, not noise — the pipeline is deterministic,
    // so any change is a code change. Computed LIVE from the per-query
    // frames (the pinned-expectation maps these floors used to read
    // were deleted in round 10 when the oracles became full independent
    // DuckDB replays).
    def hits(q: String): Long = SparkEntry.queries(q)(spark, sf)
      .agg(sum("n_hits")).collect().head.getLong(0)
    val total = operators.Similarity.NatQueryCount * 10L
    val lsh = hits("q_ann_lsh_recall10")
    val ivf = hits("q_ann_ivf_recall10")
    val pq = hits("q_ann_pq_recall10")
    assert(lsh * 1000000L / total >= 10000L, "LSH natural recall floor")
    assert(pq * 1000000L / total >= 80000L, "PQ natural recall floor")
    assert(ivf * 1000000L / total >= 150000L, "IVF natural recall floor")
    // the documented ordering at these budgets
    assert(lsh < pq && pq < ivf, s"family ordering lsh=$lsh pq=$pq ivf=$ivf")
    // the measured recall dial: re-cutting 64 planes as 8x8 instead of
    // 4x16 must lift natural recall over the dedup point
    assert(hits("q_ann_lsh8_recall10") > lsh, "8x8 LSH lift")
    // the IVF probe dial: nprobe 4 -> 16 buys ~4x candidates and must
    // lift recall strictly (measured ~19% -> ~52-57%)
    val ivf16 = hits("q_ann_ivf16_recall10")
    assert(ivf16 > ivf, "nprobe-16 IVF lift")
    // the IVF-PQ composition: wide routing + PQ re-score prune. Its
    // candidate set is a SUBSET of ivf16's (so recall <= ivf16 and
    // < exact) and the measured recall must beat the nprobe-4 single —
    // the "between IVF-alone and exact" contract of the production shape
    val ivfpq = hits("q_ann_ivfpq_recall10")
    assert(ivfpq > ivf,
      s"IVF-PQ ($ivfpq) must beat the nprobe-4 single ($ivf)")
    assert(ivfpq <= ivf16,
      s"IVF-PQ ($ivfpq) candidates are a subset of nprobe-16's ($ivf16)")
    assert(ivfpq < total, s"IVF-PQ ($ivfpq) stays below exact ($total)")
  }

  test("pinned-oracle fingerprint coverage: every shipped fixture is calibrated") {
    // the one REMAINING pinned-measurement oracle (compress ratio — no
    // DuckDB zlib twin exists) keys on a CONTENT fingerprint, not bare
    // row count. This test recomputes each fixture's fingerprint in
    // Spark and fails if the pin map lacks the key, so a regenerated/
    // added fixture can't silently hit the NULL branch. (The ANN
    // natural-recall pins this test also covered are gone — those
    // oracles are full independent DuckDB replays since round 10.)
    val fixtureDirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s"/root/testdata/$s").filter(d => new java.io.File(d).exists)
    assert(fixtureDirs.nonEmpty)
    for (dir <- fixtureDirs) {
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
        // the reshape faces: SQL UNPIVOT INCLUDE NULLS vs Dataset
        // .unpivot, SQL PIVOT vs groupBy().pivot()
        "q_sql_face_unpivot" -> "q_unpivot_compare",
        "q_sql_face_pivot" -> "q_pivot_attrs",
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
