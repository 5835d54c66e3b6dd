package graft

import graft.functions.{TextFunctions, TextImpl}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Prop.forAll
import org.scalacheck.Properties

/** Specs for text hashing/fingerprinting primitives + the text-analysis
  * queries (the parts with no SQL oracle). */
class TextAnalysisSpec extends GraftSuite {
  import spark.implicits._

  private def utf8(s: String) = UTF8String.fromString(s)

  test("hash64 is deterministic and seed-sensitive") {
    assert(TextImpl.hash64(utf8("hello"), 0L) == TextImpl.hash64(utf8("hello"), 0L))
    assert(TextImpl.hash64(utf8("hello"), 0L) != TextImpl.hash64(utf8("hello"), 1L))
    assert(TextImpl.hash64(utf8("hello"), 0L) != TextImpl.hash64(utf8("hellp"), 0L))
  }

  test("hash64 expression matches the JVM impl (interpreted + codegen paths)") {
    val rows = Seq("alpha", "beta gamma", "").toDF("s")
      .select($"s", TextFunctions.hash64($"s", 7L).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == TextImpl.hash64(utf8(r.getString(0)), 7L))
    }
  }

  test("nfc normalize: composes known sequences, identity on normalized text") {
    val decomposed = "cafe\u0301 re\u0301sume\u0301"
    val composed = "caf\u00e9 r\u00e9sum\u00e9"
    val rows = Seq(decomposed, composed, "plain ascii", "")
      .toDF("s")
      .select($"s", TextFunctions.nfcNormalize($"s").as("n"))
      .collect()
    assert(rows(0).getString(1) == composed, "must compose combining marks")
    assert(rows(1).getString(1) == composed, "composed input is a fixed point")
    assert(rows(2).getString(1) == "plain ascii")
    assert(rows(3).getString(1) == "")
    // matches the JVM kernel through the codegen path
    rows.foreach { r =>
      assert(r.getString(1) == java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC))
    }
    // digest keys collide across byte forms after normalization
    val digests = Seq(decomposed, composed).toDF("s")
      .select(md5(TextFunctions.nfcNormalize($"s"))).distinct().count()
    assert(digests == 1L, "NFC must make canonical-equivalent texts collide")
  }

  test("simhash of identical token arrays is identical; near-dup is Hamming-close") {
    val base = (1 to 50).map(i => s"tok$i")
    val nearDup = base.updated(3, "changed")
    val far = (1 to 50).map(i => s"other$i")
    val df = Seq(base, nearDup, far).toDF("toks")
      .select(TextFunctions.simhash64($"toks").as("h"))
    val Array(h0, h1, h2) = df.collect().map(_.getLong(0))
    val near = TextImpl.hamming(h0, h1)
    val distant = TextImpl.hamming(h0, h2)
    assert(near < distant, s"near=$near distant=$distant")
    assert(near <= 16, s"near-dup hamming too large: $near")
  }

  test("rolling fingerprint: equal text -> equal fingerprint; stable under run") {
    val df = Tables.documents(spark, sf)
      .select($"doc_id", TextFunctions.rollingFingerprint($"text", 16).as("fp"))
    val a = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("trigram expressions: edge cases (null, empty, <3 words) and set/sig agreement") {
    val df = Seq(Some(""), Some("one"), Some("one two"), Some("one two three four"),
      Option.empty[String])
      .toDF("s")
      .select($"s",
        TextFunctions.trigramHashes($"s").as("hs"),
        TextFunctions.trigramMinhash($"s", 16).as("sig"))
    val rows = df.collect()
    // null text -> null outputs
    assert(rows(4).isNullAt(1) && rows(4).isNullAt(2))
    // <3 words -> exactly one whole-text hash
    (0 to 2).foreach(i => assert(rows(i).getSeq[Long](1).length == 1, s"row $i"))
    // 4 words -> 2 trigrams
    assert(rows(3).getSeq[Long](1).length == 2)
    // signature is always numHashes long, never nulls
    rows.take(4).foreach(r => assert(r.getSeq[Long](2).length == 16))
    // sets are sorted distinct
    rows.take(4).foreach { r =>
      val hs = r.getSeq[Long](1)
      assert(hs == hs.sorted && hs.distinct == hs)
    }
  }

  test("trigram minhash matches the JVM impl on real docs (codegen path)") {
    val rows = Tables.documents(spark, sf).limit(20)
      .select($"text", TextFunctions.trigramMinhash($"text", 16).as("sig"))
      .collect()
    rows.foreach { r =>
      val expected = TextImpl.minhashSig(utf8(r.getString(0)), 16)
        .toLongArray().toSeq
      assert(r.getSeq[Long](1) == expected)
    }
  }

  test("equal shingle sets give equal minhash signatures; jaccard tracks overlap") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    // same word sequence -> identical sig
    val df = Seq(a, a, a.replace("quick", "slow")).toDF("s")
      .select(TextFunctions.trigramMinhash($"s", 16).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("rolling fingerprint handles degenerate inputs (empty, shorter than window)") {
    assert(TextImpl.rollingMinHash(utf8(""), 16) == TextImpl.mix64(0L))
    val short = TextImpl.rollingMinHash(utf8("abc"), 16)
    assert(short == TextImpl.mix64(TextImpl.hash64(utf8("abc"), 1L)))
  }

  test("q_lang_id: deterministic prediction, is_match computed correctly") {
    // the synthetic corpus's `lang` column is random metadata (all texts
    // draw from the same token pool), so accuracy vs ground truth is not
    // meaningful here — what must hold: same input -> same prediction,
    // and is_match == (lang = lang_pred).
    val df = SparkEntry.queries("q_lang_id")(spark, sf)
    assert(canon(df) == canon(SparkEntry.queries("q_lang_id")(spark, sf)))
    assert(df.filter($"is_match" =!= ($"lang" === $"lang_pred")).count() == 0)
    // the marker-based classifier does fire: en docs dominate predictions
    assert(df.filter($"lang_pred" === "en").count() > 0)
  }

  test("q_text_stats: computed char length equals stored n_chars") {
    val df = SparkEntry.queries("q_text_stats")(spark, sf)
    assert(df.filter($"n_chars_computed" =!= $"n_chars").count() == 0)
  }

  test("q_token_count: bpe tokens >= whitespace tokens never holds trivially but counts are positive") {
    val df = SparkEntry.queries("q_token_count")(spark, sf)
    assert(df.filter($"ws_tokens" <= 0 || $"bpe_tokens" <= 0).count() == 0)
  }

  test("text stats / fingerprint plans are shuffle-free (narrow, scan-speed)") {
    Seq("q_text_stats", "q_fingerprint").foreach { q =>
      // drop the output ordering (added only for oracle determinism) —
      // the operator itself must not exchange
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.optimizedPlan.toString
      val core = plan.linesIterator.filterNot(_.contains("Sort")).mkString("\n")
      assert(!core.contains("Exchange"), s"$q shuffles:\n$plan")
    }
  }

  test("q_llm_corpus: funnel counts are monotone and consistent with the stage queries") {
    val rows = SparkEntry.queries("q_llm_corpus")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(raw, canon0, lang, kept) = (1 to 4).map(r.getLong)
      assert(raw >= canon0 && canon0 >= lang && lang >= kept,
        s"funnel must be monotone: $r")
      assert(kept == 0 || r.getLong(5) > 0, s"kept docs but zero tokens: $r")
    }
    // cross-check totals against the already-verified stage queries
    val nRaw = rows.map(_.getLong(1)).sum
    val nCanon = rows.map(_.getLong(2)).sum
    assert(nRaw == Tables.documents(spark, sf).count())
    assert(nCanon == SparkEntry.queries("q_dedup_exact")(spark, sf).count())
  }

  test("redact masks emails, phones, and long ids but not prose") {
    import graft.operators.TextAnalysis
    val rows = Seq(
      (1L, "contact john.doe+spam@example.co.uk or call 555-867-5309 now"),
      (2L, "ssn-ish 123456789 and a longer 9876543210123 run"),
      (3L, "clean text with short 123 numbers and no at signs"))
      .toDF("id", "t")
      .select($"id", TextAnalysis.redact($"t").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "contact <EMAIL> or call <PHONE> now")
    assert(rows(2L) == "ssn-ish <ID> and a longer <ID> run")
    assert(rows(3L) == "clean text with short 123 numbers and no at signs")
  }

  // ----------------------------------------------------------------------- bm25
  test("bm25: only term-bearing docs score, higher tf at equal length wins, " +
      "rarer terms weigh more") {
    val out = SparkEntry.queries("q_bm25")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= TextAnalysis.Bm25TopK)
    // every returned doc carries at least one query term, score > 0
    out.foreach { r =>
      val tfSum = (0 until TextAnalysis.Bm25Terms.length)
        .map(i => r.getInt(r.fieldIndex(s"tf$i"))).sum
      assert(tfSum > 0 && r.getDouble(r.fieldIndex("score")) > 0)
    }
    // descending by score
    val scores = out.map(_.getDouble(out.head.fieldIndex("score")))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("normalizeText is idempotent and case/whitespace-insensitive") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val raw = Seq("  Hello,   WORLD!! ", "tabs\tand\nnewlines here",
      "already clean text.", "Unicode café × stripped")
      .toDF("text")
    val once = raw.select(TextAnalysis.normalizeText($"text").as("n1"))
    val twice = once.select($"n1".as("text"))
      .select(TextAnalysis.normalizeText($"text").as("n1"))
    assertSameRows(once, twice)
    val vals = once.as[String].collect().toSeq
    assert(vals.forall(v => v == v.toLowerCase), "must be lowercase")
    assert(vals.forall(!_.contains("  ")), "no whitespace runs")
    assert(vals.forall(v => v == v.trim), "trimmed")
    // case/extra-space variants of the same content collide
    val a = Seq("Hello,  World!").toDF("text")
      .select(TextAnalysis.normalizeText($"text")).as[String].head()
    val b = Seq("hello, world!").toDF("text")
      .select(TextAnalysis.normalizeText($"text")).as[String].head()
    assert(a == b)
  }

  test("bm25 is partitioning-invariant: one-row stats frame, exact tf/df") {
    val docs = Tables.documents(spark, sf)
    val a = canon(TextAnalysis.bm25Score(docs, TextAnalysis.Bm25Terms))
    val b = canon(TextAnalysis.bm25Score(docs.repartition(13),
      TextAnalysis.Bm25Terms))
    assert(a == b, "scores must be bit-identical on any layout")
  }

  test("winnowing guarantee: docs sharing >= k+w-1 words share a fingerprint") {
    // the SIGMOD'03 theorem: any common substring of at least k+w-1
    // tokens forces at least one common selected fingerprint — the
    // property that makes winnowing usable for copy detection at all
    val shared = "alpha bravo charlie delta echo foxtrot golf"  // 7 = k+w-1
    val docs = Seq(
      (1L, s"one two three $shared nine ten eleven twelve"),
      (2L, s"red green blue $shared purple orange maroon"),
      (3L, "no overlap here at all just unrelated words entirely"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, k = 4, w = 4)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(2)).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "shared 7-word run must surface a shared fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty,
      "disjoint vocabulary must not collide")
  }

  test("winnow matches: ordered pairs, threshold respected, finds the natural near-dups") {
    val out = SparkEntry.queries("q_winnow_matches")(spark, sf).collect()
    assert(out.nonEmpty, "fixture's natural near-dup pairs must surface")
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"pair must be ordered: $r")
      assert(r.getLong(2) >= 2, s"below threshold: $r")
    }
  }

  test("winnowing selections are a subset of gram positions, dense in windows") {
    val docs = Tables.documents(spark, sf).limit(50)
    val fp = TextAnalysis.winnowFingerprints(docs)
    val rows = fp.collect()
    assert(rows.nonEmpty)
    // every selected pos is a valid gram index and fingerprints are
    // layout-stable: same selections after a repartition
    val again = TextAnalysis.winnowFingerprints(docs.repartition(7))
    assert(canon(fp) == canon(again), "selection must be layout-invariant")
    // winnowing density: between 1 selection per window-span and one per
    // gram — 2/(w+1) expected; assert the sane envelope per doc
    val grams = docs.select($"doc_id",
        expr("greatest(size(regexp_extract_all(lower(text), '[a-z]+', 0)) - 3, 0)")
          .as("ng")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (d, sel) =>
      val ng = grams(d)
      if (ng >= 4)
        assert(sel.length <= ng && sel.length >= (ng - 3 + 3) / 4,
          s"doc $d: ${sel.length} selections from $ng grams out of envelope")
    }
  }

  test("vocab overlap: matches a driver-side brute-force Jaccard per source pair") {
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val pat = graft.operators.Scoring.WordPat.r
    val vocab = docs.groupBy(_._1).map { case (s, g) =>
      s -> g.flatMap(d => pat.findAllIn(d._2.toLowerCase)).toSet
    }
    val out = SparkEntry.queries("q_vocab_overlap")(spark, sf).collect()
    val srcs = vocab.keys.toSeq.sorted
    assert(out.length == srcs.length * (srcs.length - 1) / 2,
      "one row per unordered source pair")
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (va, vb) = (vocab(a), vocab(b))
      val inter = (va & vb).size.toLong
      assert(r.getLong(2) == inter, s"($a,$b) intersection")
      assert(r.getLong(3) == va.size.toLong && r.getLong(4) == vb.size.toLong)
      assert(r.getLong(5) ==
        inter * 1000000L / (va.size + vb.size - inter), s"($a,$b) jaccard")
    }
  }

  // --------------------------------------------------------- q_inverted_index
  test("q_inverted_index: df floor, postings cap, sorted numeric postings") {
    val rows = SparkEntry.queries("q_inverted_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val postings = r.getString(2).split(",").map(_.toLong).toSeq
      assert(df >= TextAnalysis.InvIndexDfMin)
      assert(r.getLong(3) == math.min(df, TextAnalysis.InvIndexPostingsCap.toLong),
        "stored postings must be the capped prefix")
      assert(postings.size.toLong == r.getLong(3))
      assert(postings == postings.sorted, "postings sorted by doc_id")
      assert(postings.distinct.size == postings.size)
    }
  }
  // ---------------------------------------------------------- q_langid_confusion
  test("q_langid_confusion: cells partition docs; diagonal agrees with q_lang_id") {
    val rows = SparkEntry.queries("q_langid_confusion")(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sf).count())
    // per-language shares sum to ~1e6 (minus DIV truncation)
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val s = cells.map(_.getLong(3)).sum
      assert(s > 999990L && s <= 1000000L, s"$lang shares sum $s")
    }
    // diagonal mass equals q_lang_id's is_match count
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    val matches = SparkEntry.queries("q_lang_id")(spark, sf)
      .filter($"is_match").count()
    assert(diag == matches, s"diagonal $diag vs per-doc matches $matches")
  }

  // -------------------------------------------------------------------- q_fertility
  test("q_fertility: token and word counts replayed per language") {
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val pat = TextAnalysis.BpeTokenPattern.r
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val t = ds.map(d => pat.findAllIn(d._2).size.toLong).sum
      val w = ds.map(_._2.split(" ", -1).length.toLong).sum
      lang -> (ds.length.toLong, t, w, t * 1000000L / w)
    }
    val rows = SparkEntry.queries("q_fertility")(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      assert(expected(r.getString(0)) ==
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))),
        r.getString(0))
    }
  }

  // -------------------------------------------------------------------- q_oov_rate
  test("q_oov_rate: per-source replay against a hand-built vocabulary") {
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).toSeq))
    val counts = docs.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(TextAnalysis.OovVocabK).map(_._1).toSet
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val toks = ds.flatMap(_._2)
      val oov = toks.count(w => !vocab(w)).toLong
      src -> (toks.length.toLong, oov, oov * 1000000L / toks.length)
    }
    val rows = SparkEntry.queries("q_oov_rate")(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      assert(expected(r.getString(0)) ==
        ((r.getLong(1), r.getLong(2), r.getLong(3))), r.getString(0))
    }
  }
}

/** Property tests for the hash primitives (ScalaCheck, run natively by
  * sbt's scalacheck framework support). */
object TextPropertySpec extends Properties("TextImpl") {
  private def utf8(s: String) = UTF8String.fromString(s)

  property("hash64 pure function of (input, seed)") = forAll { (s: String, seed: Long) =>
    TextImpl.hash64(utf8(s), seed) == TextImpl.hash64(utf8(s), seed)
  }

  property("mix64 collision-free on sequential inputs") = {
    val n = 10000
    (0 until n).map(i => TextImpl.mix64(i.toLong)).distinct.size == n
  }

  property("hamming symmetric, bounded, zero iff equal") = forAll { (a: Long, b: Long) =>
    val d = TextImpl.hamming(a, b)
    d == TextImpl.hamming(b, a) && d >= 0 && d <= 64 && ((d == 0) == (a == b))
  }
}
