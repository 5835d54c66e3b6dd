package graft

import graft.operators.{KllImpl, QuantileSketch}

/** The quantile sketch's load-bearing property is its EXACT merge law —
  * that is what makes it a distributed/streaming state primitive rather
  * than a single-pass estimator. This spec proves the algebra directly
  * on KllImpl (no Spark needed for the law itself), then checks the
  * Spark operator's two branches on the fixtures: the not-full branch
  * (sf0.001: estimates are EXACT) and the binding branch's rank-error
  * bound (sf0.01). */
class KllSpec extends GraftSuite {
  import org.apache.spark.sql.functions._

  /** Deterministic synthetic items: md5-style hash avalanche via the
    * same md5Lower64 the operator uses, values a skewed ramp. */
  private def items(n: Int, seed: String): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val h = graft.functions.TextImpl.md5Lower64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$seed:$i")) &
        Long.MaxValue
      (h, (i.toLong * i) % 1000)
    }

  private def sketchOf(xs: Seq[(Long, Long)], k: Int): (Int, Set[(Long, Long)]) = {
    val (b, kept) = KllImpl.prune(xs, xs.size.toLong, 63, k)
    (b, kept.toSet)
  }

  test("merge law: sketch(A ∪ B) == prune(kept(A) ∪ kept(B)), any grouping") {
    val k = 64
    val all = items(5000, "ml")
    val direct = sketchOf(all, k)
    // two-way, three-way, and skewed splits, merged in different orders
    for (splits <- Seq(Seq(2500, 2500), Seq(100, 1900, 3000), Seq(4999, 1))) {
      var off = 0
      val parts = splits.map { sz => val p = all.slice(off, off + sz); off += sz; p }
      // per-part sketches
      val sk = parts.map(p => (p.size.toLong, KllImpl.prune(p, p.size.toLong, 63, k)))
      // fold-merge left-to-right and right-to-left
      for (order <- Seq(sk, sk.reverse)) {
        val (n, (b, kept)) = order.reduce { (x, y) =>
          val nTot = x._1 + y._1
          val bCap = math.min(x._2._1, y._2._1)
          (nTot, KllImpl.prune(x._2._2 ++ y._2._2, nTot, bCap, k))
        }
        assert(n == all.size.toLong)
        assert((b, kept.toSet) == direct,
          s"merged sketch (splits=$splits) != direct: b=$b vs ${direct._1}")
      }
    }
  }

  test("incremental insert (the streaming processor's fold) equals batch") {
    val k = 64
    val all = items(3000, "inc")
    val direct = sketchOf(all, k)
    // simulate micro-batches of uneven sizes, carrying (b, n, kept)
    var b = 63
    var n = 0L
    var kept = Seq.empty[(Long, Long)]
    for (batch <- all.grouped(701)) {
      n += batch.size
      val (b2, kept2) = KllImpl.prune(kept ++ batch, n, b, k)
      b = b2; kept = kept2
    }
    assert((b, kept.toSet) == direct)
  }

  test("not-full sketch keeps everything at b=63 and quantiles are exact") {
    val xs = items(50, "small")
    val (b, kept) = KllImpl.prune(xs, 50L, 63, 64)
    assert(b == 63 && kept.toSet == xs.toSet)
    val qs = KllImpl.quantiles(kept, Seq(50)).head._2
    val exact = xs.map(_._2).sorted.apply(((50 * 50 + 99) / 100) - 1)
    assert(qs == exact)
  }

  test("q_kll_quantiles: not-full branch is exact at sf0.001") {
    import spark.implicits._
    val out = SparkEntry.queries("q_kll_quantiles")(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    assert(n <= QuantileSketch.KllK, "fixture grew past the sketch; retune")
    // b pinned to 63, n_kept == n_total == est_total == exact count
    out.foreach { r =>
      assert(r.getAs[Int]("lvl_b") == 63)
      assert(r.getAs[Long]("n_kept") == n)
      assert(r.getAs[Long]("est_total") == n)
    }
    // and the estimates ARE the exact percentiles
    val cents = spark.read.parquet(s"$sf/events.parquet")
      .select(round($"value" * 100).cast("long").as("v"))
      .orderBy($"v").collect().map(_.getLong(0))
    out.foreach { r =>
      val pct = r.getAs[Int]("pct")
      val exp = cents(((pct * n + 99) / 100).toInt - 1)
      assert(r.getAs[Long]("est_v") == exp,
        s"pct $pct: est ${r.getAs[Long]("est_v")} != exact $exp")
    }
  }

  test("q_kll_quantiles: binding branch rank error is within 3% at sf0.01") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q_kll_quantiles")(spark, dir).collect()
    val cents = spark.read.parquet(s"$dir/events.parquet")
      .select(round($"value" * 100).cast("long").as("v"))
      .orderBy($"v").collect().map(_.getLong(0))
    val n = cents.length
    assert(n > QuantileSketch.KllK, "binding branch needs n > K")
    out.foreach { r =>
      assert(r.getAs[Int]("lvl_b") < 63) // threshold actually bound
      val pct = r.getAs[Int]("pct")
      val est = r.getAs[Long]("est_v")
      // rank position of the estimate in the TRUE distribution
      val lo = cents.count(_ < est).toDouble / n
      val hi = cents.count(_ <= est).toDouble / n
      val target = pct / 100.0
      assert(target >= lo - 0.03 && target <= hi + 0.03,
        s"pct $pct: est $est sits at true mass [$lo, $hi]")
      // HT total estimate within 15% of the exact count (K=4096 sample)
      val estTotal = r.getAs[Long]("est_total")
      assert(math.abs(estTotal - n).toDouble / n < 0.15,
        s"est_total $estTotal vs exact $n")
    }
  }
}
