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
  // --------------------------------------------------------------- q_cdc_chunks
  test("q_cdc_chunks: chunking replayed in Scala; chunks reassemble the text") {
    import graft.operators.Chunking
    import graft.functions.TextImpl
    import org.apache.spark.unsafe.types.UTF8String
    def low64(s: String): Long =
      TextImpl.md5Lower64(UTF8String.fromString(s)) & Long.MaxValue
    def chunk(t: String): Seq[String] = {
      val w = Chunking.CdcWindow
      val breaks =
        if (t.length < w) Seq.empty
        else (w to t.length).filter(j =>
          low64(t.substring(j - w, j)) % Chunking.CdcModulus == 0L)
      val cuts = (breaks :+ t.length).distinct
      val froms = 0 +: cuts.dropRight(1)
      froms.zip(cuts).map { case (a, b) => t.substring(a, b) }
        .filter(_.nonEmpty)
    }
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // reassembly invariant: chunks concatenate back to the document
    docs.take(50).foreach { case (_, t) =>
      assert(chunk(t).mkString == t)
    }
    val perSource = docs.groupBy(_._1).map { case (src, ds) =>
      val chunks = ds.flatMap(d => chunk(d._2))
      val distinct = chunks.distinct
      src -> (chunks.length.toLong, distinct.length.toLong,
        chunks.map(_.length.toLong).sum, distinct.map(_.length.toLong).sum)
    }
    val all = {
      val chunks = docs.flatMap(d => chunk(d._2))
      val distinct = chunks.distinct
      ("__all__", (chunks.length.toLong, distinct.length.toLong,
        chunks.map(_.length.toLong).sum, distinct.map(_.length.toLong).sum))
    }
    val expected = perSource + all
    val rows = SparkEntry.queries("q_cdc_chunks")(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      assert(expected(r.getString(0)) ==
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))),
        s"source ${r.getString(0)}")
    }
    // dedup must actually fire somewhere (repeated chunks exist)
    assert(rows.exists(r => r.getLong(1) > r.getLong(2)),
      "no duplicate chunks anywhere — vacuous")
  }
}
