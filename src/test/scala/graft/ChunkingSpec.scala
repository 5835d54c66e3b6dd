package graft

import graft.operators.Chunking
import org.apache.spark.sql.functions._

/** Chunk windows and packing bins: overlap, coverage, and an exact
  * driver-side recomputation of the packing assignment. */
class ChunkingSpec extends GraftSuite {
  import spark.implicits._

  test("word chunks: stride overlap and full coverage on a known text") {
    val words = (1 to 150).map(i => s"w$i")
    val df = Seq(words.mkString(" ")).toDF("text")
      .select(split($"text", " ", -1).as("words"))
      .select(Chunking.wordChunks($"words", width = 64, stride = 48).as("chunks"))
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
      .select(Chunking.wordChunks(split($"text", " ", -1), 64, 48).as("c"))
    df.collect().foreach(r => assert(r.getSeq[String](0).length == 1))
  }

  test("invalid chunk geometry is rejected") {
    intercept[IllegalArgumentException](
      Chunking.chunkStarts(lit(Array("x")), 4, 8))
    intercept[IllegalArgumentException](
      Chunking.chunkStarts(lit(Array("x")), 0, 0))
  }

  test("packing matches an exact driver-side recomputation of the assignment") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", size(split($"text", " ", -1)).as("n"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // reference implementation of the same greedy rule: bin of a doc =
    // floor(start_offset / capacity) in doc_id order within the stratum
    val expected = docs.groupBy(_._2).flatMap { case (lang, rs) =>
      var running = 0L
      rs.sortBy(_._1).map { case (_, _, n) =>
        val bin = running / Chunking.BinCapacity
        running += n
        (lang, bin, n)
      }
    }.toSeq.groupBy(t => (t._1, t._2))
      .map { case ((lang, bin), ts) => (lang, bin) -> ((ts.length, ts.map(_._3.toLong).sum)) }
    val got = SparkEntry.queries("q_pack_sequences")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2).toInt, r.getLong(3)))).toMap
    assert(got == expected)
    // conservation follows, but assert it explicitly for the error message
    assert(got.values.map(_._2).sum == docs.map(_._3.toLong).sum)
  }
}
