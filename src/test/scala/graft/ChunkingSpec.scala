package graft

import graft.operators.Chunking
import org.apache.spark.sql.functions._

/** Chunk windows and packing bins: overlap, coverage, and conservation. */
class ChunkingSpec extends GraftSuite {
  import spark.implicits._

  test("word chunks: stride overlap and full coverage on a known text") {
    val words = (1 to 150).map(i => s"w$i")
    val df = Seq(words.mkString(" ")).toDF("text")
      .select(Chunking.wordChunks($"text", width = 64, stride = 48).as("chunks"))
    val chunks = df.collect()(0).getSeq[String](0).map(_.split(" ").toSeq)
    // starts at 0, 48, 96 — 1 + ceil((150-64)/48) = 3 windows
    assert(chunks.length == 3)
    assert(chunks(0) == words.slice(0, 64))
    assert(chunks(1) == words.slice(48, 112))
    assert(chunks(2) == words.slice(96, 150)) // trailing partial window
    // consecutive windows overlap by width - stride = 16 tokens
    assert(chunks(0).takeRight(16) == chunks(1).take(16))
    // every word appears in at least one chunk
    assert(chunks.flatten.toSet == words.toSet)
  }

  test("short and empty documents yield exactly one chunk") {
    val df = Seq("only three words", "").toDF("text")
      .select(Chunking.wordChunks($"text", 64, 48).as("c"))
    df.collect().foreach(r => assert(r.getSeq[String](0).length == 1))
  }

  test("invalid chunk geometry is rejected") {
    intercept[IllegalArgumentException](Chunking.wordChunks(lit("x"), 4, 8))
    intercept[IllegalArgumentException](Chunking.wordChunks(lit("x"), 0, 0))
  }

  test("packing conserves tokens and fills bins contiguously") {
    val out = SparkEntry.queries("q_pack_sequences")(spark, sf).collect()
    val toks = Tables.documents(spark, sf)
      .select($"lang", size(split($"text", " ", -1)).as("n"))
      .groupBy($"lang").agg(sum($"n").as("total")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getString(0)).foreach { case (lang, bins) =>
      // conservation: bin tokens sum to the stratum's total
      assert(bins.map(_.getLong(3)).sum == toks(lang), s"$lang loses tokens")
      // bins are contiguous from 0
      val ids = bins.map(_.getLong(1)).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq, s"$lang bins not contiguous")
      // every bin except possibly the last is filled past capacity start
      assert(bins.forall(_.getLong(2) > 0))
    }
  }
}
