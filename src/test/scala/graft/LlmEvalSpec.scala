package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** LlmEval family: the estimator semantics the oracle can confirm but
  * not explain — pass@k's combinatorial identity replayed in plain
  * Scala, rejection sampling's order statistics recomputed driver-side,
  * KTO's accounting identities, and the dialogue digest recomputed from
  * an independently-sorted transcript — plus the integer envelopes the
  * exact arithmetic depends on. */
class LlmEvalSpec extends GraftSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_pass_at_k: estimator equals the direct combinatorial value; envelope holds") {
    val k = operators.LlmEval.PassK
    val rows = run("q_pass_at_k").collect()
    assert(rows.nonEmpty)
    def choose(n: Long, r: Long): BigInt =
      (0L until r).map(i => BigInt(n - i)).product / (1L to r).map(BigInt(_)).product
    rows.foreach { r =>
      val (n, c) = (r.getAs[Long]("n_attempts"), r.getAs[Long]("n_solved"))
      val (p1, p4) = (r.getAs[Long]("pass1_ppm"), r.getAs[Long]("pass4_ppm"))
      assert(n >= k && c >= 0 && c <= n)
      assert(p1 == c * 1000000L / n)
      // direct BigInt replay of 1 - C(n-c,k)/C(n,k) at ppm grain
      val expected4 =
        if (n - c < k) 1000000L
        else (BigInt(1000000) -
          choose(n - c, k) * 1000000 / choose(n, k)).toLong
      assert(p4 == expected4, s"pass@4 mismatch at n=$n c=$c: $p4 vs $expected4")
      assert(p4 >= p1, s"pass@k must be monotone in k (n=$n c=$c)")
      // BIGINT envelope of the falling-factorial spelling
      assert(BigInt(n - c).pow(k) * 1000000 < BigInt(Long.MaxValue),
        s"falling-factorial product would overflow at n=$n")
    }
  }

  test("q_rejection_sampling: top-quarter order statistics recompute exactly") {
    val rows = run("q_rejection_sampling").collect()
    assert(rows.nonEmpty)
    // independent driver-side replay on raw events
    val byPrompt = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val prompt = r.getAs[Long]("prompt_id")
      val sorted = byPrompt(prompt).sortBy(t => (-t._3, t._2))
      val keep = (sorted.size + 3) / 4
      val accepted = sorted.take(keep)
      assert(r.getAs[Long]("n_responses") == sorted.size.toLong)
      assert(r.getAs[Long]("n_accepted") == keep.toLong)
      assert(r.getAs[Long]("cutoff_cents") == accepted.map(_._3).min)
      assert(r.getAs[Long]("sum_accepted_cents") == accepted.map(_._3).sum)
      assert(r.getAs[Long]("acceptance_ppm") ==
        keep.toLong * 1000000L / sorted.size)
    }
  }

  test("q_kto_pairs: split and weight identities close per prompt") {
    val rows = run("q_kto_pairs").collect()
    assert(rows.nonEmpty)
    val perPrompt = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refs = rows.map(_.getAs[Long]("ref_cents")).distinct
    assert(refs.length == 1, "the KTO reference point is global")
    rows.foreach { r =>
      val (d, u) = (r.getAs[Long]("n_desirable"), r.getAs[Long]("n_undesirable"))
      assert(d + u == perPrompt(r.getAs[Long]("prompt_id")),
        "every response lands on exactly one side")
      assert(r.getAs[Long]("desirable_ppm") == d * 1000000L / (d + u))
      if (d > 0) assert(r.getAs[Long]("w_desirable_ppm") == 1000000L / d)
      else assert(r.isNullAt(r.fieldIndex("w_desirable_ppm")))
      if (u > 0) assert(r.getAs[Long]("w_undesirable_ppm") == 1000000L / u)
      else assert(r.isNullAt(r.fieldIndex("w_undesirable_ppm")))
    }
  }

  test("q_dialog_flatten: digest recomputes from an independently-sorted transcript") {
    val rows = run("q_dialog_flatten").collect()
    assert(rows.nonEmpty)
    val turns = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        concat(col("event_type"), lit(":"),
          round(col("value") * 100).cast("long").cast("string")).as("turn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    rows.foreach { r =>
      val user = r.getAs[Long]("user_id")
      val ordered = turns(user).sortBy(t => (t._2, t._3))
      val transcript = ordered.map(_._4).mkString("|")
      assert(r.getAs[Long]("n_turns") == ordered.size.toLong)
      assert(r.getAs[Long]("span_us") ==
        ordered.map(_._2).max - ordered.map(_._2).min)
      assert(r.getAs[Long]("n_chars") == transcript.length.toLong)
      assert(r.getAs[Long]("transcript_digest") ==
        (graft.functions.TextImpl.md5Lower64(
          UTF8String.fromString(transcript)) & Long.MaxValue),
        s"digest mismatch for user $user — turn order diverged")
    }
  }
}
