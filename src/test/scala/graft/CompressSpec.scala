package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** graft_deflate_len + q_compress_ratio: no DuckDB twin exists for
  * zlib, so these pins replace the oracle — exact agreement with
  * driver-side java.util.zip, the monotonicity that makes the signal a
  * usable filter, and SQL-path parity through the registry. */
class CompressSpec extends GraftSuite {

  import graft.operators.Scoring

  test("graft_deflate_len agrees exactly with driver-side java.util.zip") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      Seq.tabulate(64)(i => (i * 2654435761L).toHexString).mkString(" "))
    def driverLen(t: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(t.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192); var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val got = spark.createDataFrame(samples.map(Tuple1(_))).toDF("t")
      .select(graft.functions.CompressFunctions.deflateLen(col("t")))
      .collect().map(_.getLong(0))
    assert(got.toSeq == samples.map(driverLen),
      "expression must equal the reference zlib pass byte-for-byte")
    assert(graft.functions.CompressImpl.deflateLen(
      UTF8String.fromString(samples.head)) == driverLen(samples.head))
  }

  test("repetition compresses far below high-entropy noise") {
    val repetitive = "spark shuffle spark shuffle " * 100
    val noise = Seq.tabulate(200)(i =>
      java.util.UUID.nameUUIDFromBytes(Array(i.toByte)).toString)
      .mkString("")
    def ratioPpm(t: String): Long =
      graft.functions.CompressImpl.deflateLen(UTF8String.fromString(t)) *
        1000000L / t.getBytes("UTF-8").length
    assert(ratioPpm(repetitive) < Scoring.CompressLowPpm,
      "boilerplate must land in the low tail")
    assert(ratioPpm(noise) > ratioPpm(repetitive) * 5,
      "entropy noise must compress far worse than repetition")
  }

  test("q_compress_ratio: per-source accounting closes; ratios sane") {
    val rows = SparkEntry.queries("q_compress_ratio")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_ratio_ppm") > 0)
      assert(r.getAs[Long]("min_ratio_ppm") <= r.getAs[Long]("mean_ratio_ppm"))
      assert(r.getAs[Long]("mean_ratio_ppm") <= r.getAs[Long]("max_ratio_ppm"))
      assert(r.getAs[Long]("max_ratio_ppm") < 1200000L,
        "deflate overhead cannot exceed 20% on real text")
      assert(r.getAs[Long]("n_low") + r.getAs[Long]("n_high")
        <= r.getAs[Long]("n_docs"))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
  }

  test("SQL path: registered graft_deflate_len matches the Column API") {
    graft.functions.GraftFunctionRegistry.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_deflate_len('abcabcabcabcabc')").collect().head.getLong(0)
    assert(viaSql == graft.functions.CompressImpl.deflateLen(
      UTF8String.fromString("abcabcabcabcabc")))
  }
}
