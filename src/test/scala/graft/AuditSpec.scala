package graft

import graft.operators.{Analytics, Audit}
import org.apache.spark.sql.functions._

/** Governance audits + behavioral analytics: funnel chaining semantics on
  * hand-built streams, and structural properties of the k-anonymity,
  * profiler, cohort, and co-occurrence queries (whose cell-exact answers
  * the DuckDB oracle checks).
  */
class AuditSpec extends GraftSuite {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "sec")
      .select($"user_id", $"event_type", timestamp_seconds($"sec").as("ts"))

  test("funnel kernel: steps must complete strictly in order") {
    // user 1: view BEFORE signup only -> reaches stage 1, not stage 2.
    // user 2: signup -> view -> click in order -> reaches stage 3.
    // user 3: signup and view at the SAME second -> tie is not 'after'.
    val e = ev(
      (1L, "view", 5L), (1L, "signup", 10L),
      (2L, "signup", 10L), (2L, "view", 20L), (2L, "click", 30L),
      (3L, "signup", 10L), (3L, "view", 10L))
    val stages = Analytics.funnelUsers(e, Seq("signup", "view", "click"))
    val byStep = stages.map { case (k, df) =>
      k -> df.select($"user_id").as[Long].collect().sorted.toSeq
    }.toMap
    assert(byStep("signup") == Seq(1L, 2L, 3L))
    assert(byStep("view") == Seq(2L), "pre-signup and same-instant views must not count")
    assert(byStep("click") == Seq(2L))
  }

  test("funnel kernel: later re-occurrences can complete a stage") {
    // view before AND after signup: the post-signup one counts.
    val e = ev((1L, "view", 5L), (1L, "signup", 10L), (1L, "view", 15L))
    val stages = Analytics.funnelUsers(e, Seq("signup", "view")).toMap
    val t = stages("view").select($"t_prev").as[java.sql.Timestamp].collect()
    assert(t.map(_.getTime).toSeq == Seq(15000L))
  }

  test("q_funnel: counts are monotone non-increasing, base converts at 1e6 ppm") {
    val rows = SparkEntry.queries("q_funnel")(spark, sf).collect()
    assert(rows.length == 4)
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse, s"funnel must narrow: $counts")
    assert(rows.head.getLong(2) == 1000000L)
  }

  test("q_cohort_retention: month-0 row IS the cohort size, cells sum to activity") {
    val out = SparkEntry.queries("q_cohort_retention")(spark, sf)
    val m0 = out.filter($"months_since" === 0)
    assert(m0.filter($"n_active" =!= $"cohort_n").count() == 0,
      "every cohort member is active in the cohort month")
    assert(m0.filter($"retention_ppm" =!= 1000000L).count() == 0)
    val totalCells = out.agg(sum($"n_active")).as[Long].head()
    val distinctActive = Tables.orders(spark, sf)
      .select($"o_custkey", date_format($"o_orderdate", "yyyy-MM")).distinct()
      .count()
    assert(totalCells == distinctActive,
      "retention cells must partition the distinct (customer, month) activity")
  }

  test("q_k_anonymity: flags agree with recomputed group sizes") {
    val out = SparkEntry.queries("q_k_anonymity")(spark, sf)
    assert(out.filter($"at_risk_full" =!= ($"k_full" < Audit.KThreshold))
      .count() == 0)
    assert(out
      .filter($"at_risk_generalized" =!= ($"k_generalized" < Audit.KThreshold))
      .count() == 0)
    // generalization can only merge groups: k_generalized >= k_full
    assert(out.filter($"k_generalized" < $"k_full").count() == 0)
    val total = Tables.customer(spark, sf).count()
    val summed = out.agg(sum($"k_full")).as[Long].head()
    assert(summed == total, "full-QI groups must partition the table")
  }

  test("q_profile_columns: null counts, key uniqueness, typed extrema slots") {
    val out = SparkEntry.queries("q_profile_columns")(spark, sf).collect()
    assert(out.length == 6)
    val n = Tables.orders(spark, sf).count()
    out.foreach { r =>
      assert(r.getLong(1) == n, s"n_rows must be the table count: $r")
      assert(r.getLong(2) == 0L, s"synthetic orders has no nulls: $r")
      val isText = r.getString(0) == "o_orderstatus" ||
        r.getString(0) == "o_orderpriority"
      assert(r.isNullAt(if (isText) 4 else 6),
        s"extrema must land in exactly one typed slot: $r")
    }
    val keyRow = out.find(_.getString(0) == "o_orderkey").get
    assert(keyRow.getLong(3) == n, "o_orderkey must profile as unique")
  }

  test("q_l_diversity: accounting identities against the customer table") {
    val out = SparkEntry.queries("q_l_diversity")(spark, sf)
    val total = Tables.customer(spark, sf).count()
    assert(out.agg(sum($"k")).as[Long].head() == total,
      "QI groups must partition the table")
    assert(out.filter($"l_distinct" < 1 || $"l_distinct" > 5).count() == 0,
      "distinct segments per nation bounded by the 5-value domain")
    assert(out.filter($"at_risk" =!= ($"l_distinct" < Audit.LThreshold))
      .count() == 0)
    // top segment share can't be below the uniform floor 1/l
    assert(out.filter($"top_segment_ppm" * $"l_distinct" <
      lit(1000000L) - $"l_distinct").count() == 0)
  }

  test("q_attribution: every purchase lands in exactly one campaign bucket") {
    val out = SparkEntry.queries("q_attribution")(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(out.map(_.getLong(1)).sum == purchases,
      "attribution must account for every purchase, attributed or not")
    out.foreach { r =>
      assert(r.getInt(0) >= -1 && r.getInt(0) <= 99, s"campaign domain: $r")
      assert(r.getLong(2) <= r.getLong(1),
        s"buyers cannot exceed purchases: $r")
    }
  }

  test("q_cooccurrence agrees with a positions self-join formulation") {
    val docs = Tables.documents(spark, sf)
    val pos = docs.select($"doc_id",
        posexplode(split($"text", " ", -1)).as(Seq("pos", "word")))
      .filter(length($"word") >= 4)
    val a = pos.select($"doc_id", $"pos".as("pa"), $"word".as("wa"))
    val b = pos.select($"doc_id", $"pos".as("pb"), $"word".as("wb"))
    val expected = a.join(b, Seq("doc_id"))
      .filter($"pb" - $"pa" === 1 || $"pb" - $"pa" === 2)
      .select(least($"wa", $"wb").as("w1"), greatest($"wa", $"wb").as("w2"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"w1", $"w2").limit(50)
    assertSameRows(SparkEntry.queries("q_cooccurrence")(spark, sf), expected)
  }

  test("redactPii: counts, masking, ordering, and idempotence") {
    import graft.operators.Audit
    val df = Seq(
      (1L, "mail me at jo.do+x@corp.io or jane@a.co thanks"),
      (2L, "call 555-1234 or 555-9876"),
      (3L, "ssn 123-45-6789 but phone 555-1234 too"),
      (4L, "clean text no pii at all"),
      (5L, "digits 12345 and 123-456 are not pii shapes")
    ).toDF("doc_id", "text")
    val out = Audit.redactPii(df, "text").orderBy($"doc_id").collect()
    def r(i: Int) = out(i)
    assert(r(0).getAs[Int]("n_emails") == 2 && r(0).getAs[Int]("n_phones") == 0)
    assert(r(0).getAs[String]("text") == "mail me at <EMAIL> or <EMAIL> thanks")
    assert(r(1).getAs[Int]("n_phones") == 2 && r(1).getAs[Int]("n_ssns") == 0)
    // SSN must win over the phone-shaped tail it contains (order fixed)
    assert(r(2).getAs[Int]("n_ssns") == 1 && r(2).getAs[Int]("n_phones") == 1)
    assert(r(2).getAs[String]("text") == "ssn <SSN> but phone <PHONE> too")
    assert(r(3).getAs[String]("text") == "clean text no pii at all")
    assert(r(4).getAs[Int]("n_emails") + r(4).getAs[Int]("n_phones") +
      r(4).getAs[Int]("n_ssns") == 0, "loose digit runs are not PII shapes")
    // idempotence: redacting already-redacted text changes nothing
    val once = Audit.redactPii(df, "text").select($"doc_id", $"text")
    val twice = Audit.redactPii(once, "text").select($"doc_id", $"text")
    assertSameRows(once, twice)
  }

  test("q_pii_redact: every planted identifier is caught, none survive") {
    val out = SparkEntry.queries("q_pii_redact")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val (e, p, s) = (r.getInt(1), r.getInt(2), r.getInt(3))
      val expected = (id % 4) match {
        case 1 => (1, 0, 0); case 2 => (0, 1, 0); case 3 => (0, 0, 1)
        case _ => (0, 0, 0)
      }
      assert((e, p, s) == expected, s"doc $id: counts ($e,$p,$s) != $expected")
    }
  }

  test("forget cascade: counts reconcile and no deleted-customer data survives") {
    import spark.implicits._
    val out = SparkEntry.queries("q_forget_cascade")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("customer", "orders", "lineitem"))
    out.values.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"before != deleted + after in $r")
    }
    // independent replay of the cascade frontier on the fixture
    val reqs = Tables.customer(spark, sf)
      .filter($"c_custkey" % 97 === 0).select($"c_custkey")
    val nReq = reqs.count()
    assert(out("customer").getLong(2) == nReq)
    val delOrders = Tables.orders(spark, sf)
      .join(reqs, $"o_custkey" === $"c_custkey", "left_semi")
    assert(out("orders").getLong(2) == delOrders.count())
    val delLines = Tables.lineitem(spark, sf)
      .join(delOrders.select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey", "left_semi")
    assert(out("lineitem").getLong(2) == delLines.count())
    assert(nReq > 0, "plant selected no deletion requests — audit is vacuous")
  }

  test("chi-square audit: margins reconcile and the rollup row is the cell sum") {
    val out = SparkEntry.queries("q_chi_square")(spark, sf).collect()
    val (cells, totals) = out.partition(_.getString(0) != "__total__")
    assert(totals.length == 1)
    val total = totals.head
    val n = Tables.documents(spark, sf).count()
    // every (source, lang) combination present exactly once — zero cells included
    val srcs = cells.map(_.getString(0)).distinct.length
    val langs = cells.map(_.getString(1)).distinct.length
    assert(cells.length == srcs * langs, "contingency table is not complete")
    assert(cells.map(_.getLong(2)).sum == n, "observed mass != corpus size")
    assert(total.getLong(2) == n)
    assert(total.getLong(3) == cells.map(_.getLong(3)).sum)
    assert(total.getLong(4) == cells.map(_.getLong(4)).sum)
    cells.foreach { r =>
      assert(r.getLong(4) >= 0, s"negative chi-square term in $r")
      // expected mass in milli-units: cell expectation stays below the
      // corpus (rt*ct <= N*min(rt,ct) => E <= min margin <= N)
      assert(r.getLong(3) <= n * 1000, s"expected mass exceeds corpus in $r")
    }
    // the expected-mass rollup reconstructs ~N up to one DIV-floor per cell
    assert(math.abs(total.getLong(3) - n * 1000) <= cells.length,
      s"expected mass total ${total.getLong(3)} vs ${n * 1000}")
    // dependence exists in the fixture: at least one cell deviates
    assert(total.getLong(4) > 0, "chi-square statistic is exactly zero")
  }

  // ------------------------------------------------------------ q_t_closeness
  test("q_t_closeness: t is a TVD in [0,1e6], groups partition the table") {
    val rows = SparkEntry.queries("q_t_closeness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getLong(2)
      assert(t >= 0L && t <= 1000000L, "TVD is bounded by the full mass")
      assert(r.getBoolean(3) == (t > Audit.TClosenessPpm))
    }
    assert(rows.map(_.getLong(1)).sum == Tables.customer(spark, sf).count(),
      "QI group sizes must partition the table")
  }
}
