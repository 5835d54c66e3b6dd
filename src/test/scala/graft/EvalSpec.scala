package graft

import graft.functions.TextImpl
import graft.operators.Eval
import org.apache.spark.unsafe.types.UTF8String

/** Model-evaluation metrics: every number recomputed independently in
  * Scala from the planted classifier's closed form (md5 + id
  * arithmetic), so a drift in either the plant or the metric math fails
  * here even before the oracle sees it. */
class EvalSpec extends GraftSuite {
  import spark.implicits._

  /** The planted (label, score) pairs, replayed from doc_id alone. */
  private def plantedPairs(): Array[(Long, Long)] =
    Tables.documents(spark, sf).select($"doc_id").as[Long].collect()
      .map { id =>
        val noise = TextImpl.md5Lower64(
          UTF8String.fromString(s"scr:$id")) & Long.MaxValue
        (id % 2, noise % 600000L + (id % 2) * 300000L)
      }

  test("q_confusion: every cell recomputed from the planted closed form") {
    val pairs = plantedPairs()
    val rows = SparkEntry.queries("q_confusion")(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val c = r.getLong(0)
      val support = pairs.count(_._1 == c).toLong
      val pred = pairs.count(p => (if (p._2 >= Eval.Threshold) 1L else 0L) == c)
      val tp = pairs.count(p =>
        p._1 == c && (if (p._2 >= Eval.Threshold) 1L else 0L) == c).toLong
      assert(r.getLong(1) == support && r.getLong(2) == pred.toLong)
      assert(r.getLong(3) == tp)
      val prec = tp * 1000000L / pred
      val rec = tp * 1000000L / support
      assert(r.getLong(4) == prec && r.getLong(5) == rec)
      assert(r.getLong(6) == 2 * prec * rec / (prec + rec))
      // non-degenerate: both error kinds exist
      assert(tp < support && tp < pred, s"class $c is degenerate")
    }
  }

  test("q_auc: rank-sum identity equals the brute-force pairwise count") {
    val pairs = plantedPairs()
    val pos = pairs.filter(_._1 == 1).map(_._2)
    val neg = pairs.filter(_._1 == 0).map(_._2)
    val u2 = pos.iterator.map { p =>
      neg.count(n => p > n) * 2L + neg.count(n => p == n).toLong
    }.sum
    val r = SparkEntry.queries("q_auc")(spark, sf).collect().head
    assert(r.getLong(0) == pos.length.toLong)
    assert(r.getLong(1) == neg.length.toLong)
    assert(r.getLong(2) == u2, "rank-sum u2 != pairwise u2")
    assert(r.getLong(3) == u2 * 1000000L / (2L * pos.length * neg.length))
    // the plant must actually rank positives higher than chance
    assert(r.getLong(3) > 600000L, s"planted AUC too weak: ${r.getLong(3)}")
  }

  test("q_calibration: buckets partition the corpus, gaps exact") {
    val rows = SparkEntry.queries("q_calibration")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 8L),
      "all nine score deciles must be populated")
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
      assert(r.getLong(4) == r.getLong(0) * 100000L + 50000L)
      assert(r.getLong(5) == r.getLong(3) - r.getLong(4))
    }
  }
  // ------------------------------------------------------------------ q_ab_test
  test("q_ab_test: planted conversion counts replayed; lift detected") {
    import graft.operators.Eval
    import graft.functions.TextImpl
    import org.apache.spark.unsafe.types.UTF8String
    val ids = Tables.documents(spark, sf).select($"doc_id")
      .collect().map(_.getLong(0))
    def conv(id: Long): Boolean = {
      val u = TextImpl.md5Lower64(UTF8String.fromString(s"ab:$id")) &
        Long.MaxValue
      u % 1000000L < Eval.AbBaseRatePpm + (id % 2) * Eval.AbPlantedLiftPpm
    }
    val (a, b) = ids.partition(_ % 2 == 0)
    val r = SparkEntry.queries("q_ab_test")(spark, sf).collect().head
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    assert(r.getLong(2) == a.count(conv).toLong)
    assert(r.getLong(3) == b.count(conv).toLong)
    // the planted 3pp lift should surface as a positive realized lift
    assert(r.getLong(6) > 0L, s"realized lift ${r.getLong(6)} not positive")
    assert(!r.isNullAt(7) && !r.getDouble(7).isNaN)
  }
}
