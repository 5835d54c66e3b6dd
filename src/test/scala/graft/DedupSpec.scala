package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Specs for dedup operators — in particular the LSH path, which has no
  * SQL oracle: candidates must be a superset of the truly-similar pairs
  * (recall), and the pipeline must be deterministic run-to-run. */
class DedupSpec extends GraftSuite {
  import spark.implicits._

  test("exact dedup: group count equals distinct text count; copies sum to row count") {
    val docs = Tables.documents(spark, sf)
    val df = SparkEntry.queries("q_dedup_exact")(spark, sf)
    assert(df.count() == docs.select($"text").distinct().count())
    val copies = df.agg(sum($"n_copies")).collect()(0).getLong(0)
    assert(copies == docs.count())
  }

  test("minhash LSH candidates achieve high recall of jaccard>=0.5 pairs") {
    // ground truth from the brute-force n-gram path (bounded n at sf0.001)
    val truth = SparkEntry.queries("q_ngram_jaccard")(spark, sf)
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashCandidates(
      Tables.documents(spark, sf), numHashes = 16, rowsPerBand = 2)
      .select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (truth.nonEmpty) {
      val recall = truth.intersect(cand).size.toDouble / truth.size
      assert(recall >= 0.9, s"LSH recall $recall over ${truth.size} true pairs")
    } else {
      // data has no >=0.5 pairs at this SF — at least assert the machinery runs
      assert(cand != null)
    }
  }

  test("minhash dedup result is deterministic across runs") {
    val a = canon(SparkEntry.queries("q_minhash_dedup")(spark, sf))
    val b = canon(SparkEntry.queries("q_minhash_dedup")(spark, sf))
    assert(a == b)
  }

  test("minhash dedup pairs are genuinely similar (precision of verified output)") {
    val df = SparkEntry.queries("q_minhash_dedup")(spark, sf)
    // the output is jaccard-verified, so every reported pair carries its
    // true jaccard — assert the top pairs are non-trivially similar
    val top = df.limit(5).collect()
    top.foreach(r => assert(r.getDouble(2) > 0.1, s"suspicious pair $r"))
  }

  test("embedding near-dup agrees with direct cosine computation") {
    val df = SparkEntry.queries("q_dedup_embedding")(spark, sf).limit(3).collect()
    val embMap = Tables.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    df.foreach { r =>
      val (a, b, sim) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (va, vb) = (embMap(a), embMap(b))
      val dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(va.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(vb.map(x => x.toDouble * x.toDouble).sum)
      val expected = BigDecimal(dot / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(sim - expected) < 1e-9, s"pair ($a,$b): $sim vs $expected")
    }
  }

  test("minhash candidate generation shuffles no array payloads (id-only exchanges)") {
    // VERDICT r1: shingle arrays must not ride the LSH band shuffle —
    // candidates are (id, id) pairs; payloads re-join after distinct().
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cand = Dedup.minhashCandidateIds(Tables.documents(spark, sf), 16, 2)
      val exchanges = cand.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "expected shuffles in the candidate plan")
      exchanges.foreach { e =>
        val arrays = e.output.filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        assert(arrays.isEmpty, s"array columns in exchange: ${arrays.map(_.name).mkString(",")}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("simhash banding finds EXACTLY the hamming<=3 pairs (pigeonhole recall 1.0)") {
    import graft.functions.TextImpl
    val docs = Tables.documents(spark, sf)
    // brute-force truth: all-pairs hamming over driver-collected fingerprints
    val fps = docs.collect().map { r =>
      val toks = r.getAs[String]("text").split(" ", -1)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)))
      r.getAs[Long]("doc_id") -> TextImpl.simhash(arr)
    }
    val truth = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b && TextImpl.hamming(fa, fb) <= Dedup.SimHashMaxHamming
    } yield (a, b)).toSet
    val found = Dedup.simhashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == truth,
      s"banded simhash must match brute force exactly: missing=${truth -- found}, extra=${found -- truth}")
  }

  test("simhash dedup query is deterministic and within threshold") {
    val a = canon(SparkEntry.queries("q_simhash_dedup")(spark, sf))
    assert(a == canon(SparkEntry.queries("q_simhash_dedup")(spark, sf)))
    SparkEntry.queries("q_simhash_dedup")(spark, sf).collect()
      .foreach(r => assert(r.getInt(2) <= Dedup.SimHashMaxHamming))
  }

  test("LSH skew guard: degenerate buckets are dropped before the pair join") {
    // all-identical docs would otherwise create a quadratic bucket
    val dup = Seq.tabulate(50)(i => (i.toLong, "same text for every row"))
      .toDF("doc_id", "text")
    val guarded = Dedup.minhashCandidates(dup, numHashes = 16, rowsPerBand = 2)
    // bucket of 50 < MaxBucket -> kept: candidates exist
    assert(guarded.count() > 0)
  }

  // ---------------------------------------------------------- cluster resolution
  test("resolveClusters: transitive chains collapse to the min-id component") {
    val pairs = Seq(
      (2L, 1L), (2L, 3L),            // component {1,2,3} via 2
      (10L, 11L), (11L, 12L), (12L, 13L), // chain -> {10..13}
      (20L, 21L))                    // simple pair
      .toDF("doc_a", "doc_b")
    val got = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("resolveClusters: long chain converges within the iteration cap") {
    // worst-case diameter: a 15-node path
    val chain = (0L until 14L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.resolveClusters(chain, maxIter = 20).collect()
    assert(got.length == 15 && got.forall(_.getLong(1) == 0L))
  }

  test("resolveClusters fails loudly when a component exceeds the iteration cap") {
    val longChain = (0L until 24L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Dedup.resolveClusters(longChain, maxIter = 3).collect()
    }
  }

  test("q_dedup_clusters: every doc in one cluster, keep-doc is the min member") {
    val out = SparkEntry.queries("q_dedup_clusters")(spark, sf).collect()
    assert(out.nonEmpty, "sf0.001 must contain at least one verified near-dup pair")
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(0)).min == cid, s"cluster $cid id is not its min member")
      assert(rows.forall(_.getLong(2) == rows.length), s"cluster $cid size column wrong")
    }
    // one row per doc
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }

  test("resolveClusters on an empty pair set returns an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.resolveClusters(empty).count() == 0)
  }

  // ------------------------------------------------- star contraction resolver
  test("resolveClustersStar matches propagation on chains, cliques, and pairs") {
    val pairs = Seq(
      (2L, 1L), (2L, 3L),                 // component {1,2,3} via 2
      (10L, 11L), (11L, 12L), (12L, 13L), // chain -> {10..13}
      (20L, 21L), (21L, 20L),             // duplicate edge both directions
      (30L, 30L),                         // self-loop-only node
      (40L, 41L), (40L, 42L), (41L, 42L)) // triangle
      .toDF("doc_a", "doc_b")
    val star = canon(Dedup.resolveClustersStar(pairs))
    val prop = canon(Dedup.resolveClusters(pairs))
    assert(star == prop, s"star vs propagation labeling differs:\n$star\nvs\n$prop")
  }

  test("resolveClustersStar converges in O(log d) rounds on a deep chain " +
      "that exceeds propagation's default cap") {
    // a 64-edge path: diameter 64 — propagation at its default 20-round
    // cap must refuse it; star contraction needs ~2·log₂(64) rounds
    val deep = (0L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Dedup.resolveClusters(deep).collect()
    }
    val star = canon(Dedup.resolveClustersStar(deep, maxIter = 16))
    val truth = canon(Dedup.resolveClusters(deep, maxIter = 80))
    assert(star == truth, "star labeling must equal uncapped propagation")
    assert(star.forall(_.startsWith("0|")), "chain must collapse to cluster 0")
  }

  test("resolveClustersStar on an empty pair set returns an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.resolveClustersStar(empty).count() == 0)
  }

  test("q_cluster_star: planted deep chains resolve to id-arithmetic clusters") {
    val out = SparkEntry.queries("q_cluster_star")(spark, sf).collect()
    val docIds = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(out.map(_.getLong(0)).toSeq == docIds.toSeq,
      "every original doc must root exactly one cluster")
    out.foreach { r =>
      val expected = Dedup.StarChainBase + 1 + r.getLong(0) % Dedup.StarChainMod
      assert(r.getLong(1) == expected,
        s"cluster ${r.getLong(0)}: size ${r.getLong(1)} != $expected")
    }
  }

  test("resolveClusters batched convergence polling: same labels, fewer driver jobs") {
    // a 10-node chain needs ~9 propagation rounds — deep enough that
    // polling every 3rd round visibly cuts driver barriers
    val pairs = (0 until 9).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    def countJobs(f: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        f
        // listener-bus delivery is async: wait until the count has been
        // stable for a full poll interval (bounded), not a fixed sleep —
        // a loaded host can lag delivery well past any fixed constant
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var last = -1
        while (n.get() != last && System.nanoTime() < deadline) {
          last = n.get()
          Thread.sleep(500)
        }
      } finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    var perRound: Seq[String] = null
    var batched: Seq[String] = null
    val jobsPerRound = countJobs {
      perRound = canon(Dedup.resolveClusters(pairs, maxIter = 20, checkEvery = 1))
    }
    val jobsBatched = countJobs {
      batched = canon(Dedup.resolveClusters(pairs, maxIter = 20, checkEvery = 3))
    }
    assert(perRound == batched, "batched polling changed the labeling")
    // canon sorts columns by name: cluster_id|doc_id — all labels must be 0
    assert(batched.forall(_.startsWith("0|")), "chain must collapse to cluster 0")
    assert(jobsBatched < jobsPerRound,
      s"batched polling should launch fewer driver jobs: $jobsBatched vs $jobsPerRound")
  }

  test("all-pairs oracle baselines refuse unbounded inputs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bound").toFile
    try {
      val n = Dedup.MaxBruteForceRows + 1
      spark.range(n).select($"id".as("doc_id"), lit("en").as("lang"),
          lit("s").as("source"), lit("x y z").as("text"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      spark.range(n).select($"id".as("vec_id"), lit(0).as("label"),
          array(lit(1.0f), lit(0.5f)).as("embedding"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      Seq("q_ngram_jaccard", "q_simhash_recall", "q_dedup_embedding").foreach { q =>
        val ex = intercept[IllegalArgumentException] {
          SparkEntry.queries(q)(spark, dir.toString)
        }
        assert(ex.getMessage.contains("bounded"), s"$q: ${ex.getMessage}")
      }
    } finally rmTree(dir)
  }

  test("minhash recall gate: non-vacuous and every planted near-dup found") {
    val rows = SparkEntry.queries("q_minhash_recall")(spark, sf).collect()
    assert(rows.nonEmpty, "no planted pair passed the jaccard threshold")
    assert(rows.forall(_.getBoolean(2)),
      "LSH banding missed a planted near-duplicate")
    // jaccard column really is the exact truncation similarity: high but < 1
    // for most docs (empty/short docs hit 1.0 exactly)
    assert(rows.forall(r => r.getDouble(1) >= Dedup.MinHashRecallJaccard))
  }

  test("simhash recall gate: banded == brute, non-vacuously") {
    val r = SparkEntry.queries("q_simhash_recall")(spark, sf).collect()
    assert(r.length == 1)
    val Array(nBanded, nBrute, onlyBanded, onlyBrute) =
      Array(r.head.getLong(0), r.head.getLong(1), r.head.getLong(2),
        r.head.getLong(3))
    assert(nBanded == nBrute && onlyBanded == 0 && onlyBrute == 0,
      s"banded/brute disagree: $nBanded vs $nBrute, diffs $onlyBanded/$onlyBrute")
    assert(nBanded > 0, "fixture must contain at least one hamming<=3 pair " +
      "or the equivalence is vacuous")
  }

  test("edit distance: zero iff equal prefixes, bounded by prefix length") {
    import org.apache.spark.sql.functions.substring
    val rows = SparkEntry.queries("q_edit_distance")(spark, sf).collect()
    assert(rows.nonEmpty)
    val prefix = Tables.documents(spark, sf)
      .select($"doc_id",
        substring($"text", 1, graft.operators.Dedup.EditPrefixChars).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (a, b, d) = (r.getLong(2), r.getLong(3), r.getInt(4))
      val (pa, pb) = (prefix(a), prefix(b))
      assert((d == 0) == (pa == pb), s"pair ($a,$b): d=$d but equal=${pa == pb}")
      assert(d >= 0 && d <= math.max(pa.length, pb.length))
      // sim is the exact complement of the normalized distance
      assert(r.getDouble(5) == 1.0 - d.toDouble / math.max(pa.length, pb.length))
    }
  }

  test("dupNgramFractions kernel: exact copies 1.0, unique docs 0.0, overlap counted once") {
    import org.apache.spark.sql.functions.col
    // w0..w9 gives 3 distinct 8-grams per 10-word doc
    def words(off: Int, n: Int): String =
      (off until off + n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(0, 10)),   // copied by doc 2 → every gram duplicated
      (2L, words(0, 10)),
      (3L, words(100, 10)), // unique vocabulary → no gram duplicated
      (4L, words(0, 8) + " " + words(200, 2)),  // shares exactly w0..w7
      (5L, words(300, 7))   // too short: < 8 words → excluded
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramFractions(docs, "text", "doc_id", 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 3L, 1.0)))
    assert(out(3L) == ((3L, 0L, 0.0)))
    // doc 4: grams {w0..w7, w1..w7 w200, w2..w7 w200 w201}; only the first
    // also lives in docs 1/2
    assert(out(4L) == ((3L, 1L, 1.0 / 3)))
  }

  test("dupNgramFractions: within-doc repetition alone is not duplication") {
    import org.apache.spark.sql.functions.col
    val rep = (0 until 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // doc 1 contains its 8-gram block twice — still only ONE doc has it
      (1L, rep + " " + rep),
      (2L, (100 until 110).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramFractions(docs, "text", "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 0.0, "self-repetition must not count as cross-doc dup")
    assert(out(2L) == 0.0)
  }

  test("q_dup_ngrams: layout-independent and consistent with exact-dup copies") {
    val df = SparkEntry.queries("q_dup_ngrams")(spark, sf)
    val base = canon(df)
    assert(base.nonEmpty)
    // every doc that q_dedup_exact reports as a multi-copy text must show
    // dup_fraction 1.0 (all its grams exist in its copy)
    val copies = SparkEntry.queries("q_dedup_exact")(spark, sf)
      .filter($"n_copies" >= 2).select($"keep_id")
      .collect().map(_.getLong(0)).toSet
    if (copies.nonEmpty) {
      val fr = df.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      copies.filter(fr.contains).foreach { id =>
        assert(fr(id) == 1.0, s"doc $id has an exact copy but dup_fraction ${fr(id)}")
      }
    }
    // repartitioned input → identical answer
    val re = Dedup.dupNgramFractions(
      Tables.documents(spark, sf).repartition(7), "text", "doc_id",
      graft.operators.Dedup.DupNgramWidth).orderBy($"doc_id")
    assert(canon(re) == base)
  }

  test("line dedup: first occurrence wins, losers rebuilt without shared segments") {
    // segWords=3: doc1 = [a b c][d e f]; doc2 = [a b c][x y z]; doc3 = [a b c]
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "a b c")
    ).toDF("doc_id", "text")
    val out = operators.Dedup.lineDedup(docs, "text", "doc_id", segWords = 3)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0) == ((1L, 2L, 2L, m("a b c d e f"))), s"doc1: ${out(0)}")
    assert(out(1) == ((2L, 2L, 1L, m("x y z"))), s"doc2: ${out(1)}")
    // doc3 loses its only segment: empty rebuild hashes the empty string
    assert(out(2) == ((3L, 1L, 0L, m(""))), s"doc3: ${out(2)}")
  }

  test("line dedup: within-doc repeats collapse; layout-invariant") {
    val docs = Seq((7L, "p q r p q r p q r")).toDF("doc_id", "text")
    val one = operators.Dedup.lineDedup(docs, "text", "doc_id", segWords = 3)
      .collect()(0)
    assert(one.getLong(1) == 3 && one.getLong(2) == 1,
      s"only the first of three identical segments survives: $one")
    val base = canon(operators.Dedup.lineDedup(
      Tables.documents(spark, sf), "text", "doc_id"))
    val re = canon(operators.Dedup.lineDedup(
      Tables.documents(spark, sf).repartition(7), "text", "doc_id"))
    assert(re == base, "winner election must not depend on partitioning")
  }

  test("golden record: original survives, mirror loses, provenance kept") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_golden_record")(spark, sf).collect()
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).count()
    assert(out.length == planted, "one merged group per planted mirror copy")
    out.foreach { r =>
      assert(r.getLong(0) % 10 == 0, s"survivor must be the original id: $r")
      assert(r.getLong(1) == 2, s"groups are (original, mirror) pairs: $r")
      assert(r.getString(2) == r.getString(3).split('|').min,
        s"the lexicographically-first source must win: $r")
      assert(r.getString(3).split('|').contains("mirror"),
        s"provenance must record the losing source: $r")
    }
  }
  // --------------------------------------------------------------- q_containment
  test("q_containment: full replay from raw shingle sets") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length >= 3) (0 to w.length - 3)
        .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
      else Set(w.mkString(" "))
    }
    val grams = docs.view.mapValues(shingles).toMap
    val df = grams.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val informative = grams.view
      .mapValues(_.filter(g => df(g) <= Dedup.ContainmentDfCap)).toMap
    val expected = (for {
      a <- docs.keys; b <- docs.keys if a < b
      shared = (informative(a) & informative(b)).size.toLong if shared > 0
      na = informative(a).size.toLong; nb = informative(b).size.toLong
      ca = shared * 1000000L / na; cb = shared * 1000000L / nb
      if ca >= Dedup.ContainmentMinPpm || cb >= Dedup.ContainmentMinPpm
    } yield (a, b) -> (na, nb, shared, ca, cb)).toMap
    val rows = SparkEntry.queries("q_containment")(spark, sf).collect()
    assert(rows.nonEmpty, "fixture must contain near-containment pairs")
    assert(rows.length == expected.size, "pair set must match brute force")
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(expected(k) == ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))), s"pair $k")
    }
  }

  // ----------------------------------------------------------------- q_dup_spans
  test("q_dup_spans: reported spans are real shared token runs") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val rows = SparkEntry.queries("q_dup_spans")(spark, sf).collect()
    assert(rows.nonEmpty, "fixture must contain long shared spans")
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (r.getLong(2).toInt, r.getLong(3).toInt)
      val span = r.getLong(4).toInt
      assert(span >= graft.operators.Dedup.DupSpanMinTokens)
      val (wa, wb) = (docs(a), docs(b))
      assert(sa + span - 1 <= wa.length && sb + span - 1 <= wb.length,
        s"span exceeds doc bounds for ($a,$b)")
      // 1-based starts: the claimed runs must be byte-identical token-wise
      val runA = wa.slice(sa - 1, sa - 1 + span)
      val runB = wb.slice(sb - 1, sb - 1 + span)
      assert(runA.sameElements(runB), s"span mismatch for pair ($a,$b)")
    }
  }
  // -------------------------------------------------------------------- q_novelty
  test("q_novelty: one claimer per gram; earliest doc fully novel") {
    val rows = SparkEntry.queries("q_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"novel > grams at ${r.getLong(0)}")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
    // every distinct gram is claimed as novel by exactly its first doc
    val distinctGrams = Tables.documents(spark, sf)
      .selectExpr("doc_id", """explode(element_at(transform(
          array(split(text, ' ', -1)), w -> CASE WHEN size(w) >= 8
            THEN transform(sequence(1, size(w) - 7),
                           i -> array_join(slice(w, i, 8), ' '))
            ELSE array() END), 1)) AS gram""")
      .select($"gram").distinct().count()
    assert(rows.map(_.getLong(2)).sum == distinctGrams,
      "novel counts must partition the distinct gram universe")
    // the lowest-id doc with grams has nothing before it
    assert(rows.minBy(_.getLong(0)).getLong(3) == 1000000L)
  }
}
