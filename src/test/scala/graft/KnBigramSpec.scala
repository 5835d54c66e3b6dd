package graft

import org.apache.spark.sql.functions._

/** q_kn_bigram: the Kneser–Ney estimate replayed from raw tokens in
  * BigInt, the normalization identity Σ_w2 P(w2|w1) = 1 proven exactly
  * on the cleared-denominator form, and the BIGINT envelope asserted. */
class KnBigramSpec extends GraftSuite {

  /** Driver-side bigram counts from raw documents (same tokenizer:
    * space split, both words ≥ 4 chars). */
  private lazy val bigrams: Map[(String, String), Long] = {
    val texts = Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0))
    val counts = collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      ws.iterator.zip(ws.iterator.drop(1)).foreach { case (a, b) =>
        if (a.length >= 4 && b.length >= 4)
          counts((a, b)) = counts.getOrElse((a, b), 0L) + 1L
      }
    }
    counts.toMap
  }

  test("q_kn_bigram: every emitted row replays from raw-token counts") {
    val rows = SparkEntry.queries("q_kn_bigram")(spark, sf).collect()
    assert(rows.nonEmpty)
    val c1 = bigrams.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val cont = bigrams.keys.groupBy(_._1).map { case (w, ks) => w -> ks.size.toLong }
    val hist = bigrams.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val nTypes = bigrams.size.toLong
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val c12 = bigrams((w1, w2))
      assert(r.getAs[Long]("c12") == c12)
      assert(r.getAs[Long]("c1") == c1(w1))
      assert(r.getAs[Long]("cont_w1") == cont(w1))
      assert(r.getAs[Long]("hist_w2") == hist(w2))
      assert(r.getAs[Long]("n_types") == nTypes)
      val num = BigInt(math.max(4 * c12 - 3, 0L)) * nTypes +
        BigInt(3) * cont(w1) * hist(w2)
      assert(r.getAs[Long]("pkn_ppm") ==
        (num * 1000000 / (BigInt(4) * c1(w1) * nTypes)).toLong)
      assert(c12 >= 3, "support floor")
    }
  }

  test("KN normalization: sum over continuations closes to 4*c1*N exactly") {
    // the cleared-denominator identity behind Σ_w2 P(w2|w1) = 1:
    //   Σ_{w2 observed} max(4c12−3, 0)·N  +  3·cont(w1)·Σ_{all w2} hist(w2)
    //     = (4c1 − 3·cont(w1))·N + 3·cont(w1)·N = 4·c1·N
    val nTypes = BigInt(bigrams.size)
    val histSum = bigrams.keys.groupBy(_._2).values.map(_.size.toLong).sum
    assert(BigInt(histSum) == nTypes, "Σ hist(w2) must equal N_types")
    bigrams.groupBy(_._1._1).foreach { case (w1, m) =>
      val c1 = m.values.sum
      val contW1 = m.size.toLong
      val observed = m.values.map(c => BigInt(math.max(4 * c - 3, 0L)) * nTypes).sum
      val unobservedMass = BigInt(3) * contW1 * nTypes // Σ over ALL w2 of hist
      assert(observed + unobservedMass == BigInt(4) * c1 * nTypes,
        s"normalization broken at context '$w1'")
    }
  }

  test("q_good_turing: trigram freq-of-freqs replays; mass identity closes") {
    val rows = SparkEntry.queries("q_good_turing")(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver-side trigram counts with the same tokenizer
    val texts = Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0))
    val uni = collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      (0 to ws.length - 3).foreach { i =>
        val g = s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}"
        uni(g) = uni.getOrElse(g, 0L) + 1L
      }
    }
    val fof = uni.values.groupBy(identity).map { case (r, xs) => r -> xs.size.toLong }
    rows.foreach { row =>
      val r = row.getAs[Long]("r")
      assert(row.getAs[Long]("n_r") == fof(r), s"N_$r")
      fof.get(r + 1) match {
        case Some(n1) =>
          assert(row.getAs[Long]("r_star_ppm") ==
            (r + 1) * n1 * 1000000L / fof(r), s"r* at r=$r")
        case None => assert(row.isNullAt(row.fieldIndex("r_star_ppm")))
      }
      assert(r >= 1 && r <= 20)
    }
    // Good-Turing mass identity: sum r*N_r over ALL r = token count
    assert(fof.map { case (r, n) => r * n }.sum == uni.values.sum)
  }

  test("BIGINT envelope: tokens x types stays far inside the *1e6 headroom") {
    val nTypes = bigrams.size.toLong
    val maxC1 = bigrams.groupBy(_._1._1).map(_._2.values.sum).max
    // numerator bound: (4·c12 + 3·cont·hist/N ≤ ~8·c1)·N, then ×1e6
    assert(BigInt(8) * maxC1 * nTypes * 1000000 < BigInt(Long.MaxValue),
      s"envelope: maxC1=$maxC1 types=$nTypes")
  }
}
