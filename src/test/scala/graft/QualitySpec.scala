package graft

import org.apache.spark.sql.functions._

/** Percentile profiling, cutoff filtering, and rare-term ranking. */
class QualitySpec extends GraftSuite {
  import spark.implicits._

  test("exact percentile matches a hand computation on a known frame") {
    val df = Seq(1, 2, 3, 4, 100).map(("g", _)).toDF("g", "v")
    val r = df.groupBy($"g").agg(
      expr("percentile(v, 0.5)").as("med"),
      expr("percentile(v, 0.25)").as("q1")).collect()(0)
    assert(r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 2.0) // (n-1)*0.25 = 1 -> exactly the 2nd value
  }

  test("approx_percentile is the bounded-memory scale path: within 5% of exact") {
    val docs = Tables.documents(spark, sf)
    val rows = docs.groupBy($"lang").agg(
      expr("percentile(n_chars, 0.75)").as("exact"),
      expr("approx_percentile(n_chars, 0.75, 1000)").as("approx")).collect()
    rows.foreach { r =>
      val (e, a) = (r.getDouble(1), r.getLong(2).toDouble)
      assert(math.abs(e - a) / e < 0.05, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }

  test("quality cutoff keeps ~25% per language, all above threshold") {
    val out = SparkEntry.queries("q_quality_cutoff")(spark, sf).collect()
    val totals = Tables.documents(spark, sf).groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (lang, p75, kept, minKept) =
        (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))
      assert(minKept >= p75, s"$lang kept a doc below threshold")
      val rate = kept.toDouble / totals(lang)
      assert(rate > 0.1 && rate < 0.45, s"$lang kept rate $rate")
    }
  }

  test("rare terms: every doc gets <= 3 ranked terms, rarest first") {
    val out = SparkEntry.queries("q_rare_terms")(spark, sf)
      .filter($"doc_id" < 20).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length))
      // df non-decreasing with rank
      assert(byRank.map(_.getLong(4)).toSeq ==
        byRank.map(_.getLong(4)).sortBy(identity).toSeq)
    }
  }

  test("madProfile: hand-computed median/MAD on a planted group; outlier flagged") {
    import spark.implicits._
    // values 1..9 plus one wild 1000: median = 5th smallest = 5,
    // deviations sorted 0,1,1,2,2,3,3,4,4,995 → MAD = 5th = 2,
    // bound = 2 * 4.4478 ≈ 8.9 → only the 1000 is outside
    val df = ((1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 1000.0)).toDF("g", "v")
    val r = graft.operators.Quality.madProfile(df, "g", "v").collect()(0)
    assert(r.getString(0) == "a")
    assert(r.getDouble(1) == 5.0, "median")
    assert(r.getDouble(2) == 2.0, "mad")
    assert(r.getLong(3) == 10L)
    assert(r.getLong(4) == 1L, "only the wild value is an outlier")
  }

  test("madProfile is robust: one wild value cannot move the median or MAD") {
    import spark.implicits._
    val base = (1 to 99).map(v => ("a", v.toDouble))
    val clean = graft.operators.Quality.madProfile(base.toDF("g", "v"), "g", "v")
      .collect()(0)
    val dirty = graft.operators.Quality.madProfile(
      (base :+ (("a", 1e12))).toDF("g", "v"), "g", "v").collect()(0)
    // median 50 and MAD 25 stay put (rank shifts by at most one place)
    assert(math.abs(dirty.getDouble(1) - clean.getDouble(1)) <= 1.0)
    assert(math.abs(dirty.getDouble(2) - clean.getDouble(2)) <= 1.0)
  }

  test("rare-terms df table joins broadcast — corpus explode never shuffles twice") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_rare_terms")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"df join should broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // ---------------------------------------------------------------- standardize
  test("standardize: z-scores have zero mean / unit variance per group; " +
      "min_max spans [0,1]") {
    import graft.operators.Quality
    val out = Quality.standardize(Tables.customer(spark, sf),
      "c_mktsegment", "c_acctbal")
    val byGroup = out.select($"c_mktsegment", $"z_score", $"min_max")
      .collect().groupBy(_.getString(0))
    byGroup.foreach { case (g, rows) =>
      val zs = rows.map(_.getDouble(1))
      val n = zs.length
      assert(math.abs(zs.sum / n) < 1e-9, s"group $g: z mean != 0")
      assert(math.abs(zs.map(z => z * z).sum / (n - 1) - 1.0) < 1e-9,
        s"group $g: z variance != 1")
      val mm = rows.map(_.getDouble(2))
      assert(math.abs(mm.min) < 1e-12 && math.abs(mm.max - 1.0) < 1e-12,
        s"group $g: min_max must span [0,1] exactly")
    }
  }

  test("standardize is partitioning-invariant (exact decimal moments)") {
    import graft.operators.Quality
    val c = Tables.customer(spark, sf)
    val a = canon(Quality.standardize(c, "c_mktsegment", "c_acctbal"))
    val b = canon(Quality.standardize(c.repartition(13), "c_mktsegment",
      "c_acctbal"))
    assert(a == b, "scaled values must be bit-identical on any layout")
  }

  test("standardize broadcasts the stats frame — facts never shuffle") {
    import graft.operators.Quality
    val plan = Quality.standardize(Tables.customer(spark, sf),
      "c_mktsegment", "c_acctbal").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"group stats must re-attach by broadcast:\n$plan")
  }

  test("drift TVD: rates are exact integer ppm, eras partition the orders") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_drift_tvd")(spark, sf).collect()
    val (totA, totB) = (out.map(_.getLong(1)).sum, out.map(_.getLong(2)).sum)
    val nOrders = Tables.orders(spark, sf).count()
    assert(totA + totB == nOrders, "every order must land in exactly one era")
    assert(totA > 0 && totB > 0, "both eras must be populated for drift to mean anything")
    out.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * 1000000L / totA, s"rate_a in $r")
      assert(r.getLong(4) == r.getLong(2) * 1000000L / totB, s"rate_b in $r")
      assert(r.getLong(5) == math.abs(r.getLong(3) - r.getLong(4)), s"gap in $r")
    }
    // TVD in ppm: half the gap mass; bounded by construction
    val tvd = out.map(_.getLong(5)).sum / 2
    assert(tvd >= 0 && tvd <= 1000000L, s"TVD must be a probability in ppm: $tvd")
  }

  test("gini: matches a driver-side brute-force recomputation exactly") {
    val out = SparkEntry.queries("q_gini")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val docs = Tables.documents(spark, sf)
      .select($"source", $"lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val counts = rows.groupBy(_._2).map(_._2.size.toLong)
      val n = counts.sum
      val (gN, gL, gG, gM) = out(src)
      assert(gN == n && gL == counts.size)
      assert(gG == 1000000L - counts.map(c => c * c).sum * 1000000L / (n * n))
      assert(gM == counts.max * 1000000L / n)
      assert(gG >= 0 && gG <= 800000L, s"$src gini out of 5-class range: $gG")
    }
  }

  test("ks statistic: equals the brute-force max CDF gap; zero against itself") {
    val r = SparkEntry.queries("q_ks_test")(spark, sf).collect()(0)
    val (sa, sb) = (r.getString(0), r.getString(1))
    val docs = Tables.documents(spark, sf)
      .select($"source", $"n_chars").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val a = docs.filter(_._1 == sa).map(_._2).sorted
    val b = docs.filter(_._1 == sb).map(_._2).sorted
    val (n, m) = (a.length.toLong, b.length.toLong)
    assert(r.getLong(2) == n && r.getLong(3) == m)
    val dNum = (a ++ b).distinct.map { x =>
      math.abs(a.count(_ <= x) * m - b.count(_ <= x) * n)
    }.max
    assert(r.getLong(4) == dNum, s"KS numerator ${r.getLong(4)} != $dNum")
    assert(r.getLong(5) == dNum * 1000000L / (n * m))
    // degenerate identity check: a sample against itself has D = 0
    val self = a.distinct.map(x =>
      math.abs(a.count(_ <= x) * n - a.count(_ <= x) * n)).max
    assert(self == 0L)
  }

  test("pareto front: survivors undominated, non-survivors dominated (brute force)") {
    import graft.functions.TextFunctions
    val pts = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"n_chars",
        (TextFunctions.md5Lower64(concat(lit("pq:"), $"doc_id".cast("string")))
          .bitwiseAND(lit(Long.MaxValue)) % 1000).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val sky = SparkEntry.queries("q_pareto_front")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val skyIds = sky.map(_._1).toSet
    def dominates(a: (Long, String, Long, Long), b: (Long, String, Long, Long)) =
      a._2 == b._2 && a._3 >= b._3 && a._4 >= b._4 &&
        (a._3 > b._3 || a._4 > b._4)
    pts.foreach { p =>
      val dominated = pts.exists(o => dominates(o, p))
      assert(skyIds.contains(p._1) == !dominated,
        s"doc ${p._1}: on-front=${skyIds.contains(p._1)} dominated=$dominated")
    }
    assert(sky.nonEmpty && sky.length < pts.length,
      "frontier must be a proper nonempty subset")
  }

  test("code detect: flags exactly the planted code docs, zero prose false positives") {
    val out = SparkEntry.queries("q_code_detect")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val flagged = r.getBoolean(7)
      assert(flagged == (id % 7 == 0),
        s"doc $id: is_code=$flagged but planted=${id % 7 == 0} " +
          s"(kw=${r.getLong(4)} indent_ppm=${r.getLong(5)} sym_ppm=${r.getLong(6)})")
    }
  }

  // ------------------------------------------------------------- q_readability
  test("q_readability: flesch formula recomputed row-exact, bands consistent") {
    val rows = SparkEntry.queries("q_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, sn, sy) = (r.getInt(2), r.getInt(3), r.getInt(4))
      assert(w >= 1 && sn >= 1 && sy >= 1)
      val f = 206835L - (1015L * w) / sn - (84600L * sy) / w
      assert(r.getLong(5) == f, s"flesch mismatch for doc ${r.get(0)}")
      val band = if (f >= 60000L) "easy" else if (f >= 30000L) "medium" else "hard"
      assert(r.getString(6) == band)
    }
  }

  // ----------------------------------------------------------- q_mann_whitney
  test("q_mann_whitney: u2 brute-forced from raw lengths for every pair") {
    val rows = SparkEntry.queries("q_mann_whitney")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySource = Tables.documents(spark, sf)
      .select($"source", $"n_chars").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1))).toMap
    val k = bySource.size
    assert(rows.length == k * (k - 1) / 2, "one row per unordered pair")
    rows.foreach { r =>
      val va = bySource(r.getAs[String]("src_a"))
      val vb = bySource(r.getAs[String]("src_b"))
      val u2 = va.iterator.map { x =>
        vb.count(y => x > y) * 2L + vb.count(y => x == y).toLong
      }.sum
      assert(r.getAs[Long]("u2") == u2,
        s"u2 for (${r.getAs[String]("src_a")}, ${r.getAs[String]("src_b")})")
      assert(r.getAs[Long]("n_a") == va.length.toLong)
      assert(r.getAs[Long]("n_b") == vb.length.toLong)
      val eff = u2 * 1000000L / (2L * va.length * vb.length)
      assert(r.getAs[Long]("effect_ppm") == eff)
    }
  }

  // --------------------------------------------------------- q_weighted_median
  test("q_weighted_median: lower weighted median recomputed from lineitem") {
    import org.apache.spark.sql.types.DecimalType
    val rows = SparkEntry.queries("q_weighted_median")(spark, sf).collect()
    assert(rows.nonEmpty)
    val data = Tables.lineitem(spark, sf)
      .select($"l_returnflag",
        ($"l_extendedprice".cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"),
        $"l_quantity".cast("long").as("w"))
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val xs = data(r.getString(0)).map(x => (x.getLong(1), x.getLong(2)))
        .sortBy(_._1)
      val total = xs.map(_._2).sum
      var cum = 0L
      val med = xs.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
      assert(r.getLong(1) == med, s"median for ${r.getString(0)}")
      assert(r.getLong(2) == total)
    }
  }
  // ----------------------------------------------------------------- q_spearman
  test("q_spearman: doubled-rank sufficient statistics replayed in Scala") {
    val per = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("x"),
        (sum($"o_totalprice".cast("decimal(28,2)")) * 100)
          .cast("long").as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sorted = cnt.keys.toSeq.sorted
      val cum = sorted.scanLeft(0L)((acc, v) => acc + cnt(v))
      sorted.zip(cum).map { case (v, below) =>
        v -> (2L * below + cnt(v) + 1L) }.toMap
    }
    val rx = rank2(per.map(_._1))
    val ry = rank2(per.map(_._2))
    val n = per.length.toLong
    val (sxy, sxx, syy, sx, sy) = per.foldLeft((0L, 0L, 0L, 0L, 0L)) {
      case ((a, b, c, d, e), (x, y)) =>
        val (r2x, r2y) = (rx(x), ry(y))
        (a + r2x * r2y, b + r2x * r2x, c + r2y * r2y, d + r2x, e + r2y)
    }
    val rho = math.rint(((n.toDouble * sxy - sx.toDouble * sy) /
      (math.sqrt(n.toDouble * sxx - sx.toDouble * sx) *
        math.sqrt(n.toDouble * syy - sy.toDouble * sy))) * 1e9) / 1e9
    val r = SparkEntry.queries("q_spearman")(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == sxy && r.getLong(2) == sxx && r.getLong(3) == syy)
    assert(math.abs(r.getDouble(4) - rho) < 2e-9,
      s"rho ${r.getDouble(4)} vs replayed $rho")
    // doubled average ranks of n items must sum to n(n+1)
    assert(sx == n * (n + 1) && sy == n * (n + 1), "rank-sum identity")
  }
  // ------------------------------------------------------------------ q_simpson
  test("q_simpson: unbiased diversity replayed; differs from gini plug-in") {
    val counts = Tables.documents(spark, sf)
      .groupBy($"source", $"lang").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val rows = SparkEntry.queries("q_simpson")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cs = counts(r.getString(0)).map(_._3)
      val n = cs.sum
      val expect = 1000000L - cs.map(c => c * (c - 1)).sum * 1000000L /
        (n * (n - 1))
      assert(r.getLong(1) == n && r.getLong(2) == cs.length.toLong)
      assert(r.getLong(3) == expect, s"simpson for ${r.getString(0)}")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
  }
  // --------------------------------------------------------- q_quantile_transform
  test("q_quantile_transform: monotone in value, ties share, uniform-ish") {
    val rows = SparkEntry.queries("q_quantile_transform")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == Tables.documents(spark, sf).count())
    // same length -> same quantile; larger length -> never smaller quantile
    val byLen = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byLen.values.forall(_.size == 1), "ties must share a quantile")
    val sorted = byLen.toSeq.sortBy(_._1).map(_._2.head)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a < b },
      "quantile must be strictly increasing across distinct lengths")
    assert(rows.map(_._3).min == 0L, "smallest value maps to quantile 0")
    assert(rows.map(_._3).max < 1000000L)
  }
  // ---------------------------------------------------------------- q_iqr_fences
  test("q_iqr_fences: quartiles replayed as exact order statistics") {
    val per = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_custkey")
      .agg((sum($"o_totalprice".cast("decimal(28,2)")) * 100)
        .cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val rows = SparkEntry.queries("q_iqr_fences")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = per.filter(_._1 == r.getString(0)).map(_._2).sorted
      val n = xs.length.toLong
      def stat(mult: Long, of: Long): Long =
        xs(xs.indices.find(i => (i + 1).toLong * of >= n * mult).get)
      val (q1, q2, q3) = (stat(1, 4), stat(2, 4), stat(3, 4))
      val iqr = q3 - q1
      val (lo, hi) = (q1 - (iqr + iqr / 2), q3 + (iqr + iqr / 2))
      assert(r.getLong(1) == n)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((q1, q2, q3)))
      assert((r.getLong(5), r.getLong(6)) == ((lo, hi)))
      assert(r.getLong(7) == xs.count(x => x < lo || x > hi).toLong)
    }
    assert(rows.exists(_.getLong(7) > 0L), "no outliers anywhere — vacuous")
  }
}
