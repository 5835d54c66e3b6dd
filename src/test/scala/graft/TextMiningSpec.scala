package graft

import org.apache.spark.sql.functions._

/** Term-weighting family: TF-IDF and the Zipf head replayed driver-side
  * from raw document text (independent of both the Spark plan and the
  * DuckDB oracle), plus the structural identities each screen claims. */
class TextMiningSpec extends GraftSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Raw (doc_id, whitespace tokens) from the fixture. */
  private lazy val docs: Seq[(Long, Seq[String])] =
    Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
      .toSeq

  test("q_tfidf: driver replay of the full top-3 ranking") {
    val nDocs = docs.size.toLong
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (id, t) -> xs.size.toLong }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    val expected = docs.flatMap { case (id, ts) =>
      ts.distinct.map { t =>
        val score = tf((id, t)) * (nDocs * 1000L / df(t))
        (id, t, tf((id, t)), df(t), score)
      }.sortBy(x => (-x._5, x._2)).zipWithIndex
        .filter(_._2 < 3)
        .map { case ((i, t, f, d, sc), rk) => (i, rk + 1L, t, f, d, sc) }
    }.sortBy(x => (x._1, x._2))
    val rows = run("q_tfidf").collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rnk").toLong, r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(rows.size == expected.size)
    rows.zip(expected).foreach { case (got, want) =>
      assert(got == want, s"tfidf row mismatch: $got vs $want")
    }
  }

  test("q_zipf: driver replay + rank identities") {
    val freq: Map[String, Long] = docs.flatMap(_._2)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val top20 = freq.toSeq.sortBy(x => (-x._2, x._1)).take(20)
    val topFreq = top20.head._2
    val rows = run("q_zipf").collect()
    assert(rows.length == math.min(20, freq.size))
    rows.zip(top20).zipWithIndex.foreach { case ((r, (term, f)), i) =>
      assert(r.getAs[Int]("rnk").toLong == i + 1L)
      assert(r.getAs[String]("term") == term)
      assert(r.getAs[Long]("freq") == f)
      assert(r.getAs[Long]("rank_x_freq") == (i + 1L) * f)
      assert(r.getAs[Long]("ppm_of_top") == f * 1000000L / topFreq)
    }
    // frequencies non-increasing down the rank axis
    val fs = rows.map(_.getAs[Long]("freq"))
    fs.sliding(2).foreach(p => if (p.size == 2) assert(p(0) >= p(1)))
  }
}
