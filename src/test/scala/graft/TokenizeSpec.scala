package graft

import graft.functions.{BpeFunctions, BpeImpl}
import graft.operators.Tokenize

/** BPE tokenizer: training merge order, rank-priority encoding, exact
  * decode, and layout-invariance of the distributed training path. */
class TokenizeSpec extends GraftSuite {
  import spark.implicits._

  private val M = BpeImpl.Marker.toString

  test("trainMerges: hand-computed merge sequence, frequency then lexicographic") {
    // words: "ab" x5, "abc" x3 (marker-prefixed internally)
    // pairs round 1: (M,a)=8, (a,b)=8, (b,c)=3 -> tie breaks to (a,b)
    // round 2: (M,ab)=8, (ab,c)=3 -> (M,ab)
    // round 3: (Mab,c)=3 -> merge; then nothing repeats -> early stop
    val merges = BpeImpl.trainMerges(Seq(("ab", 5L), ("abc", 3L)), 10)
    assert(merges == Seq(("a", "b"), (M, "ab"), (M + "ab", "c")),
      s"got $merges")
  }

  test("training stops when no pair occurs at least twice") {
    val merges = BpeImpl.trainMerges(Seq(("xy", 1L)), 10)
    assert(merges.isEmpty, s"singleton pairs must not merge: $merges")
  }

  test("encodeWord merges by RANK priority, not leftmost position") {
    // ranks: (b,c)=0 beats (a,b)=1 even though (a,b) appears first
    val ranks = BpeImpl.buildRanks(Seq(("b", "c"), ("a", "b")))
    assert(BpeImpl.encodeWord("abc", ranks) == Seq("a", "bc"))
    // with only (a,b): merge applies at every non-overlapping site
    val ranks2 = BpeImpl.buildRanks(Seq(("a", "b")))
    assert(BpeImpl.encodeWord("ababab", ranks2) == Seq("ab", "ab", "ab"))
  }

  test("frequent corpus words collapse to single marker-prefixed tokens") {
    val docs = Tables.documents(spark, sf)
    val merges = Tokenize.trainBpe(docs)
    val ranks = BpeImpl.buildRanks(merges)
    // the most frequent corpus word must have become one '▁word' token
    val topWord = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ", -1)).as("w"))
      .groupBy($"w").count().orderBy($"count".desc, $"w")
      .head().getString(0)
    assert(BpeImpl.encodeWord(M + topWord, ranks) == Seq(M + topWord),
      s"'$topWord' should be a single token after ${merges.size} merges")
  }

  test("q_bpe_roundtrip: every doc decodes exactly; tokens compress vs chars") {
    val out = SparkEntry.queries("q_bpe_roundtrip")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(2)), "all docs must round-trip exactly")
    // compression: with 200 merges the token stream is far shorter than
    // the character stream (frequent words are single tokens)
    val docs = Tables.documents(spark, sf)
    val merges = Tokenize.trainBpe(docs)
    val totals = docs.select(
      org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.size(
        BpeFunctions.bpeEncode($"text", merges))).as("toks"),
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length($"text")).as("chars"))
      .head()
    assert(totals.getLong(0) * 2 < totals.getLong(1),
      s"expected >2x char->token compression, got ${totals.getLong(0)} tokens " +
        s"over ${totals.getLong(1)} chars")
  }

  test("training is layout-invariant: same merges from a repartitioned corpus") {
    val docs = Tables.documents(spark, sf)
    assert(Tokenize.trainBpe(docs) == Tokenize.trainBpe(docs.repartition(13)))
  }

  test("distributed trainer produces the driver loop's merge table exactly") {
    // the no-cap shuffle-side trainer (round 10) must be bit-identical
    // to the collected-vocab loop on any corpus the cap doesn't
    // truncate — same counts, tie-breaks, stop rule, merge application;
    // a real training run (non-trivial merge count), not a toy
    val docs = Tables.documents(spark, sf)
    val drv = Tokenize.trainBpe(docs)
    val dist = Tokenize.trainBpeDistributed(docs)
    assert(dist.nonEmpty && dist.size >= 50,
      s"expected a real merge table, got ${dist.size} merges")
    assert(dist == drv,
      s"trainer divergence at index ${dist.zip(drv).indexWhere(p => p._1 != p._2)}")
    // layout-invariance holds for the distributed path too
    assert(Tokenize.trainBpeDistributed(docs.repartition(13)) == drv)
  }

  test("codegen and interpreted encode agree; empty and multi-space texts round-trip") {
    val ranks = BpeImpl.buildRanks(Seq(("a", "b")))
    val df = Seq((1L, "ab ab"), (2L, ""), (3L, "a  b"), (4L, "ab"))
      .toDF("id", "text")
    val enc = df.select($"id",
      BpeFunctions.bpeEncode($"text", Seq(("a", "b"))).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // interpreted reference: BpeImpl.encodeWord word by word
    assert(enc(1L) == Seq(M, "ab", M, "ab"))
    assert(enc(2L) == Seq(M))
    assert(enc(3L) == Seq(M, "a", M, M, "b"))
    assert(enc(4L) == Seq(M, "ab"))
    // decode each exactly
    enc.foreach { case (id, toks) =>
      val text = df.filter($"id" === id).head().getString(1)
      assert(toks.mkString.replace(BpeImpl.Marker, ' ').drop(1) == text)
    }
  }

  // ---------------------------------------------- unigram-LM trainer

  test("unigram segment: maximal munch picks the longest piece, always total") {
    import graft.functions.{UnigramFunctions, UnigramImpl}
    val vocab = Seq("a", "b", "n", "d", "an", "ana", "band")
    val df = Seq("banana", "bandana", "bd", "xyz").toDF("w")
    val got = df.select($"w",
        UnigramFunctions.unigramSegment($"w", vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // banana: no 4/3-char piece at pos 0 ('bana'/'ban' absent) -> 'b',
    // then 'ana' (len 3 beats 'an'), leaving 'n' + 'a'
    assert(got("banana") == Seq("b", "ana", "n", "a"))
    // bandana: 'band' (len 4) wins at pos 0, then 'ana' covers the rest
    assert(got("bandana") == Seq("band", "ana"))
    assert(got("bd") == Seq("b", "d"))
    // out-of-alphabet characters fall back to themselves (totality)
    assert(got("xyz") == Seq("x", "y", "z"))
    // pieces always concatenate back to the word
    got.foreach { case (w, ps) => assert(ps.mkString == w) }
    assert(UnigramImpl.MaxPieceLen == 4,
      "oracle SQL unrolls exactly four length-ordered joins")
  }

  test("trainUnigram: prune rungs bite, singles survive, layout-invariant") {
    val docs = Tables.documents(spark, sf)
    val (vocab1, vocab2) = Tokenize.trainUnigram(docs)
    val s1 = vocab1.filter(_.length == 1).toSet
    val s2 = vocab2.filter(_.length == 1).toSet
    assert(s1 == s2, "the alphabet is never pruned (totality guarantee)")
    val m1 = vocab1.count(_.length > 1)
    val m2 = vocab2.count(_.length > 1)
    assert(m1 <= Tokenize.UniV1 && m2 <= Tokenize.UniV2)
    assert(m2 > 0, "round-2 vocabulary kept no multi-char piece")
    assert(m2 <= m1, "round 2 must not grow the piece set")
    // deterministic on any input layout
    val (r1, r2) = Tokenize.trainUnigram(docs.repartition(7))
    assert(r1 == vocab1 && r2 == vocab2)
  }

  test("q_unigram_roundtrip: every document round-trips, token counts bounded") {
    val rows = SparkEntry.queries("q_unigram_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"doc ${r.getLong(0)} failed roundtrip")
      // tokens can never exceed characters (pieces are >= 1 char)
      assert(r.getLong(2) <= r.getInt(1).toLong,
        s"doc ${r.getLong(0)}: ${r.getLong(2)} tokens > ${r.getInt(1)} chars")
    }
  }
}
