package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.operators.Web

/** Web-curation kernels: registered-domain rule on both suffix shapes,
  * HTML strip semantics (entity decode order, idempotence on clean
  * text), and the blocklist join's broadcast-anti plan shape. */
class WebSpec extends GraftSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("registered domain: plain TLD keeps two labels, two-level suffix keeps three") {
    val hosts = Seq(
      "www.site9.com" -> "site9.com",
      "blog.a.site3.co.uk" -> "site3.co.uk",
      "site1.co.uk" -> "site1.co.uk", // exactly suffix+label, no subdomain
      "docs.site2.io" -> "site2.io",
      "site7.net" -> "site7.net",
      "deep.sub.host.site4.com.au" -> "site4.com.au")
    val got = hosts.map(_._1).toDF("host")
      .select($"host", Web.registeredDomain($"host").as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    hosts.foreach { case (h, want) => assert(got(h) == want, s"host=$h") }
  }

  test("co.uk with only two labels falls back to the two-label rule") {
    // a bare public suffix as host is malformed input; the rule must not
    // index past the label array (n >= 3 guard)
    val got = Seq("co.uk").toDF("host")
      .select(Web.registeredDomain($"host")).as[String].head()
    assert(got == "co.uk")
  }

  test("entity decode order: &amp;lt; stays literal &lt;, never double-decodes to <") {
    val got = Seq("a &amp;lt; b &lt; c").toDF("t")
      .select(Web.stripHtml($"t")).as[String].head()
    assert(got == "a &lt; b < c")
  }

  test("stripHtml removes script bodies entirely, tags without their text") {
    val got = Seq("<script>var hidden = 1;</script><p>kept <b>bold</b></p>")
      .toDF("t").select(Web.stripHtml($"t")).as[String].head()
    assert(got == "kept bold")
    assert(!got.contains("hidden"))
  }

  test("stripHtml is idempotent on already-clean text") {
    val clean = Seq("plain words only here").toDF("t")
      .select(Web.stripHtml($"t").as("c"))
    val twice = clean.select(Web.stripHtml($"c")).as[String].head()
    assert(twice == "plain words only here")
  }

  test("url parse round-trips the planted decomposition") {
    val df = Seq(6L, 7L, 12L, 45L).toDF("doc_id")
      .select($"doc_id", Web.plantUrl($"doc_id").as("url"))
      .select($"doc_id", $"url",
        Web.urlScheme($"url").as("scheme"),
        Web.urlHost($"url").as("host"),
        Web.urlPath($"url").as("path"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> ((r.getString(2), r.getString(3), r.getString(4)))).toMap

    // doc 6: even -> https; 6%4=2 -> blog.; 6%97=6; 6%5=1 -> org; path 6
    assert(rows(6L) == ("https", "blog.site6.org", "/p/6"))
    // doc 7: odd -> http; 7%4=3 -> docs.; 7%5=2 -> co.uk
    assert(rows(7L) == ("http", "docs.site7.co.uk", "/p/7"))
    // doc 12: 12%4=0 -> bare host; 12%3=0 -> has ?ref, path must exclude it
    assert(rows(12L) == ("https", "site12.co.uk", "/p/12"))
    // doc 45: 45%3=0 -> ref present
    val ref45 = df.filter($"doc_id" === 45)
      .select(regexp_extract($"url", "[?&]ref=([^&#]*)", 1)).as[String].head()
    assert(ref45 == "r3") // 45 % 7 = 3
  }

  test("blocklist filter plans as a broadcast LEFT ANTI join (corpus side never shuffles)") {
    val q = SparkEntry.queries("q_blocklist_filter")(spark, sf)
    q.collect() // materialize so AQE finalizes the plan
    val plan = q.queryExecution.executedPlan
    def broadcasts(p: SparkPlan): Seq[BroadcastHashJoinExec] =
      collectWithSubqueries(p) { case b: BroadcastHashJoinExec => b }
    val anti = broadcasts(plan).filter(_.joinType.sql.contains("ANTI"))
    assert(anti.nonEmpty, s"expected a broadcast anti join in:\n$plan")
  }

  test("blocklist drops exactly the domains whose site number is 3 mod 7") {
    val all = Tables.documents(spark, sf)
      .select($"doc_id",
        Web.registeredDomain(Web.urlHost(Web.plantUrl($"doc_id")))
          .as("reg_domain"))
    val survivorsDomains = all
      .filter(regexp_extract($"reg_domain", "^site([0-9]+)\\.", 1)
        .cast("long") % 7 =!= 3)
      .count()
    val keptTotal = SparkEntry.queries("q_blocklist_filter")(spark, sf)
      .agg(sum($"n_kept")).as[Long].head()
    assert(keptTotal == survivorsDomains)
  }
}
