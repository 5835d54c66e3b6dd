package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{NamedQuery, Tables}

/** Web-corpus curation operators — the URL-level half of a crawl
  * pipeline (CCNet/C4-style): parse URLs into scheme/host/path, extract
  * the REGISTERED domain (public-suffix aware), aggregate per-domain
  * stats, and filter against a domain blocklist.
  *
  * The fixture `documents` table carries no URL column, so deterministic
  * URLs are PLANTED by id arithmetic (the q_pii_redact precedent:
  * the REAL parse/extract kernel runs over planted values whose expected
  * decomposition is pure id arithmetic, so the oracle replays plant +
  * parse from first principles and any regex or suffix-rule defect fails
  * the hash compare).
  *
  * Scale shape: parsing is row-local chained regexp/split inside
  * whole-stage codegen — scan-speed at 100 TB, zero shuffle. Domain
  * stats shuffle one slim (domain, counts) frame. The blocklist join is
  * a BROADCAST anti join: a blocklist is domain-sized (thousands to
  * millions of rows, MBs), never corpus-sized, so the corpus side never
  * shuffles. */
object Web {

  // ------------------------------------------------------------ URL planting
  /** Deterministic URL per doc: subdomain/site/tld/path/query all id
    * arithmetic. tld rotation includes a TWO-LEVEL public suffix
    * (`co.uk`) so the registered-domain rule is exercised on both
    * shapes. */
  def plantUrl(docId: Column): Column = {
    val scheme = when(docId % 2 === 0, "https").otherwise("http")
    val sub = element_at(
      array(lit(""), lit("www."), lit("blog."), lit("docs.")),
      (docId % 4).cast("int") + 1)
    val tld = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("io"), lit("net")),
      (docId % 5).cast("int") + 1)
    val query = when(docId % 3 === 0,
      concat(lit("?ref=r"), (docId % 7).cast("string"))).otherwise(lit(""))
    concat(scheme, lit("://"), sub, lit("site"), (docId % 97).cast("string"),
      lit("."), tld, lit("/p/"), (docId % 1000).cast("string"), query)
  }

  /** The identical plant in DuckDB SQL. */
  val PlantUrlSql: String =
    """CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END || '://'
      | || ['', 'www.', 'blog.', 'docs.'][CAST(doc_id % 4 AS INTEGER) + 1]
      | || 'site' || CAST(doc_id % 97 AS VARCHAR) || '.'
      | || ['com', 'org', 'co.uk', 'io', 'net'][CAST(doc_id % 5 AS INTEGER) + 1]
      | || '/p/' || CAST(doc_id % 1000 AS VARCHAR)
      | || CASE WHEN doc_id % 3 = 0 THEN '?ref=r' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END"""
      .stripMargin.replace("\n", "")

  // ------------------------------------------------------------- URL parsing
  /** Two-level public suffixes the registered-domain rule recognizes.
    * A real deployment ships the full Mozilla public-suffix list as a
    * broadcast lookup; the RULE (longest matching suffix + one label) is
    * what is under test and is identical at any list size. */
  val TwoLevelSuffixes: Seq[String] = Seq("co.uk", "com.au", "co.jp")

  def urlScheme(url: Column): Column = regexp_extract(url, "^([a-z]+)://", 1)
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/?#]+)", 1)
  def urlPath(url: Column): Column =
    regexp_extract(url, "^[a-z]+://[^/?#]+([^?#]*)", 1)

  /** Registered domain = public suffix + one label: `blog.site9.co.uk`
    * -> `site9.co.uk`, `www.site9.com` -> `site9.com`. Row-local array
    * ops over the split host — no shuffle, no lookup join needed for the
    * two-level rule. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(lastTwo.isin(TwoLevelSuffixes: _*) && n >= 3,
      concat_ws(".", element_at(labels, -3), lastTwo))
      .otherwise(lastTwo)
  }

  /** registeredDomain in DuckDB SQL over a `host` column. */
  def registeredDomainSql(host: String): String = {
    val inList = TwoLevelSuffixes.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN len(string_split($host, '.')) >= 3
       | AND (string_split($host, '.')[-2] || '.' || string_split($host, '.')[-1]) IN ($inList)
       |THEN string_split($host, '.')[-3] || '.' || string_split($host, '.')[-2] || '.' || string_split($host, '.')[-1]
       |ELSE string_split($host, '.')[-2] || '.' || string_split($host, '.')[-1] END"""
      .stripMargin.replace("\n", "")
  }

  // ------------------------------------------------------------- q_url_parse
  private def urlParse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = Tables.documents(s, dir)
      .select($"doc_id", plantUrl($"doc_id").as("url"))
    val host = urlHost($"url")
    planted.select(
      $"doc_id", $"url",
      urlScheme($"url").as("scheme"),
      host.as("host"),
      registeredDomain(host).as("reg_domain"),
      urlPath($"url").as("path"),
      regexp_extract($"url", "[?&]ref=([^&#]*)", 1).as("ref"))
      .orderBy($"doc_id")
  }

  private val urlParseSql =
    s"""WITH u AS (SELECT doc_id, $PlantUrlSql AS url FROM documents),
       |h AS (SELECT doc_id, url,
       |  regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
       |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       |  regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref
       |FROM u)
       |SELECT doc_id, url, scheme, host,
       |  ${registeredDomainSql("host")} AS reg_domain, path, ref
       |FROM h ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- q_domain_stats
  /** Per-registered-domain corpus profile — the aggregation a crawl
    * quality pass ranks domains by. One slim shuffle keyed on domain;
    * at 100 TB the shuffle rows are O(domains), not O(pages). */
  private def domainStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val host = urlHost(plantUrl($"doc_id"))
    docs
      .select($"doc_id", $"source", $"n_chars", host.as("host"),
        registeredDomain(host).as("reg_domain"))
      .groupBy($"reg_domain")
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct($"host").as("n_hosts"),
        count_distinct($"source").as("n_sources"),
        sum($"n_chars").as("total_chars"))
      .orderBy($"reg_domain")
  }

  private val domainStatsSql =
    s"""WITH u AS (
       |  SELECT doc_id, source, n_chars,
       |    regexp_extract($PlantUrlSql, '^[a-z]+://([^/?#]+)', 1) AS host
       |  FROM documents),
       |d AS (SELECT doc_id, source, n_chars, host,
       |  ${registeredDomainSql("host")} AS reg_domain FROM u)
       |SELECT reg_domain, COUNT(*) AS n_docs,
       |  COUNT(DISTINCT host) AS n_hosts,
       |  COUNT(DISTINCT source) AS n_sources,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM d GROUP BY reg_domain ORDER BY reg_domain""".stripMargin

  // ------------------------------------------------------- q_blocklist_filter
  /** Domain-blocklist filtering — drop every page whose registered
    * domain is listed. The blocklist (site number % 7 == 3, pure id
    * arithmetic so the oracle rebuilds it independently) stays
    * domain-sized, so it is explicitly `broadcast()` and the corpus side
    * of the LEFT ANTI join never shuffles — the only viable shape when
    * the corpus is 100 TB and the blocklist is MBs. Survivor counts are
    * reported per source so the gate sees both kept and dropped mass. */
  private def blocklistFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val regDom = registeredDomain(urlHost(plantUrl($"doc_id")))
    val tagged = docs.select($"doc_id", $"source", $"n_chars",
      regDom.as("reg_domain"))
    val blocklist = tagged
      .select($"reg_domain")
      .filter(regexp_extract($"reg_domain", "^site([0-9]+)\\.", 1)
        .cast("long") % 7 === 3)
      .distinct()
    val kept = tagged.join(broadcast(blocklist), Seq("reg_domain"), "left_anti")
    kept.groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("kept_chars"))
      .orderBy($"source")
  }

  private val blocklistFilterSql =
    s"""WITH u AS (
       |  SELECT doc_id, source, n_chars,
       |    regexp_extract($PlantUrlSql, '^[a-z]+://([^/?#]+)', 1) AS host
       |  FROM documents),
       |d AS (SELECT doc_id, source, n_chars,
       |  ${registeredDomainSql("host")} AS reg_domain FROM u),
       |kept AS (
       |  SELECT * FROM d
       |  WHERE CAST(regexp_extract(reg_domain, '^site([0-9]+)\\.', 1) AS BIGINT) % 7 <> 3)
       |SELECT source, COUNT(*) AS n_kept,
       |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
       |FROM kept GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q_html_strip
  /** HTML-to-text extraction — strip script blocks, then tags, then
    * decode the five core entities, then collapse whitespace. Entity
    * decode order matters and is pinned: `&amp;` is decoded LAST so
    * `&amp;lt;` yields the literal text `&lt;` (single-pass decode
    * semantics), not `<`. Markup is PLANTED by id arithmetic over the
    * markup-free fixture text, so expected tag counts and the cleaned
    * digest are both independently replayable. Row-local chained codegen
    * regexp passes — scan-speed, zero shuffle. */
  val TagPat = "<[^>]*>"
  val ScriptPat = "<script>.*?</script>"

  def plantHtml(docId: Column, text: Column): Column = {
    val wrapped = when(docId % 3 === 0, concat(lit("<p>"), text, lit("</p>")))
      .when(docId % 3 === 1,
        concat(lit("<div class=\"a\">"), text, lit("</div><br/>")))
      .otherwise(text)
    val entity = element_at(
      array(lit(" &amp; more"), lit(" 5 &lt; 6 &gt; 4"),
        lit(" say &quot;hi&quot;"), lit(" it&#39;s &amp;lt; safe")),
      (docId % 4).cast("int") + 1)
    val script = when(docId % 5 === 0,
      lit("<script>var x = 1;</script>")).otherwise(lit(""))
    concat(script, wrapped, entity)
  }

  val PlantHtmlSql: String =
    """CASE WHEN doc_id % 5 = 0 THEN '<script>var x = 1;</script>' ELSE '' END
      | || CASE WHEN doc_id % 3 = 0 THEN '<p>' || text || '</p>'
      |         WHEN doc_id % 3 = 1 THEN '<div class="a">' || text || '</div><br/>'
      |         ELSE text END
      | || [' &amp; more', ' 5 &lt; 6 &gt; 4', ' say &quot;hi&quot;',
      |     ' it&#39;s &amp;lt; safe'][CAST(doc_id % 4 AS INTEGER) + 1]"""
      .stripMargin.replace("\n", "")

  /** Kernel: markup + entities -> clean text. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, ScriptPat, " ")
    val noTags = regexp_replace(noScript, TagPat, " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(decoded, " +", " "))
  }

  private def htmlStrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", plantHtml($"doc_id", $"text").as("html"))
      .select($"doc_id",
        regexp_count($"html", lit(TagPat)).as("n_tags"),
        stripHtml($"html").as("clean"))
      .select($"doc_id", $"n_tags", length($"clean").as("len_clean"),
        md5($"clean").as("clean_md5"))
      .orderBy($"doc_id")
  }

  private val htmlStripSql =
    s"""WITH h AS (SELECT doc_id, $PlantHtmlSql AS html FROM documents),
       |c AS (SELECT doc_id,
       |  CAST(len(regexp_extract_all(html, '$TagPat')) AS INTEGER) AS n_tags,
       |  trim(regexp_replace(
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      regexp_replace(regexp_replace(html, '$ScriptPat', ' ', 'g'),
       |        '$TagPat', ' ', 'g'),
       |      '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
       |      '&#39;', chr(39), 'g'), '&amp;', '&', 'g'),
       |    ' +', ' ', 'g')) AS clean
       |FROM h)
       |SELECT doc_id, n_tags, length(clean) AS len_clean, md5(clean) AS clean_md5
       |FROM c ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- q_url_canonical
  /** URL canonicalization + duplicate-URL detection — the crawl-side
    * dedup that runs BEFORE content ever downloads (a canonical-URL
    * collision is free; a content hash costs a fetch): lowercase the
    * host, strip tracking query parameters, fragments, and trailing
    * slashes. Non-vacuous by construction: every base URL is planted
    * alongside a VARIANT that differs in exactly the noise
    * canonicalization must erase (upper-cased host, ?ref/utm tracking
    * tail, #fragment, trailing slash), so the output must collapse
    * every pair — one group per doc, n_variants = 2, and any
    * canonicalization bug splits a group and breaks the hash compare.
    *
    * Scale shape: canonicalization is row-local regexp/string ops; the
    * only shuffle is the canonical-key aggregation (digest-sized). */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(urlScheme(url))
    val host = lower(urlHost(url))
    // path without query/fragment, trailing slashes stripped
    val path = regexp_replace(urlPath(url), "/+$", "")
    concat(scheme, lit("://"), host, path)
  }

  /** The variant: same logical URL, different bytes — upper host,
    * tracking query, fragment, trailing slash. */
  private def plantVariantUrl(docId: Column): Column = {
    val scheme = when(docId % 2 === 0, "https").otherwise("http")
    val sub = element_at(
      array(lit(""), lit("WWW."), lit("BLOG."), lit("DOCS.")),
      (docId % 4).cast("int") + 1)
    val tld = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("io"), lit("net")),
      (docId % 5).cast("int") + 1)
    concat(scheme, lit("://"), sub, lit("SITE"), (docId % 97).cast("string"),
      lit("."), tld, lit("/p/"), (docId % 1000).cast("string"),
      lit("/?utm_source=feed&ref=x#top"))
  }

  private val plantVariantUrlSql: String =
    """CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END || '://'
      | || ['', 'WWW.', 'BLOG.', 'DOCS.'][CAST(doc_id % 4 AS INTEGER) + 1]
      | || 'SITE' || CAST(doc_id % 97 AS VARCHAR) || '.'
      | || ['com', 'org', 'co.uk', 'io', 'net'][CAST(doc_id % 5 AS INTEGER) + 1]
      | || '/p/' || CAST(doc_id % 1000 AS VARCHAR)
      | || '/?utm_source=feed&ref=x#top'"""
      .stripMargin.replace("\n", "")

  private def urlCanonical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val urls = docs.select($"doc_id", plantUrl($"doc_id").as("url"))
      .unionByName(docs.select($"doc_id", plantVariantUrl($"doc_id").as("url")))
    urls.select($"doc_id", canonicalUrl($"url").as("canonical"))
      .groupBy($"canonical")
      .agg(count(lit(1)).as("n_variants"), min($"doc_id").as("rep_doc"))
      .filter($"n_variants" >= 2)
      .orderBy($"rep_doc")
  }

  private val urlCanonicalSql =
    s"""WITH urls AS (
       |  SELECT doc_id, $PlantUrlSql AS url FROM documents
       |  UNION ALL
       |  SELECT doc_id, $plantVariantUrlSql AS url FROM documents),
       |canon AS (
       |  SELECT doc_id,
       |    lower(regexp_extract(url, '^([a-z]+)://', 1)) || '://'
       |      || lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1))
       |      || regexp_replace(
       |           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1),
       |           '/+$$', '') AS canonical
       |  FROM urls)
       |SELECT canonical, COUNT(*) AS n_variants, MIN(doc_id) AS rep_doc
       |FROM canon GROUP BY canonical HAVING COUNT(*) >= 2
       |ORDER BY rep_doc""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_url_parse", urlParse, Some(urlParseSql), bench = true),
    NamedQuery("q_domain_stats", domainStats, Some(domainStatsSql), bench = true),
    NamedQuery("q_blocklist_filter", blocklistFilter, Some(blocklistFilterSql),
      bench = true),
    NamedQuery("q_html_strip", htmlStrip, Some(htmlStripSql), bench = true),
    NamedQuery("q_url_canonical", urlCanonical, Some(urlCanonicalSql),
      bench = true))
}
