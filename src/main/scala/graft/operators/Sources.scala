package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources and sinks beyond the Parquet tables (SURVEY.md §2.1):
  * CSV scan (S3), the SQL serving path over registered views (S6), and —
  * spec-covered, since an embedded DB isn't SQL-oracle-able — the JDBC
  * sink/source round-trip (S5, JdbcSpec).
  */
object Sources {

  // ---------------------------------------------------------------- q_csv_scan
  /** Fixture CSV in the reference's ticker-list shape
    * (`/root/reference/retrieval.py:76-79`: header CSV, `ticker_name`
    * column, upper-cased on read). Written as a plain single file so the
    * DuckDB oracle reads the identical bytes. */
  val CsvFixturePath = "/tmp/graft_fixtures/tickers.csv"
  private val tickerRows =
    Seq("aapl", "amzn", "brk.b", "googl", "jnj", "msft", "nvda", "tsla", "v", "xom")

  private def writeCsvFixture(): Unit = {
    val f = new java.io.File(CsvFixturePath)
    f.getParentFile.mkdirs()
    java.nio.file.Files.writeString(f.toPath,
      ("ticker_name" +: tickerRows).mkString("", "\n", "\n"))
  }

  /** S3 + F2/F10: header CSV scan -> upper(ticker) projection. */
  private def csvScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    writeCsvFixture()
    s.read.option("header", "true").csv(CsvFixturePath)
      .select(upper($"ticker_name").as("ticker"))
      .orderBy($"ticker")
  }

  private val csvScanSql =
    s"SELECT upper(ticker_name) AS ticker FROM read_csv('$CsvFixturePath', header=true) ORDER BY ticker"

  // ---------------------------------------------------------------- q_json_scan
  /** JSONL (newline-delimited) source — the other ubiquitous ingest
    * format next to CSV/Parquet. Schema is inferred (string/long/double)
    * exactly as DuckDB's read_json infers, so the oracle reads the same
    * bytes. */
  val JsonFixturePath = "/tmp/graft_fixtures/quotes.jsonl"
  private val quoteRows = Seq(
    """{"ticker":"aapl","price":189.25,"volume":51234}""",
    """{"ticker":"msft","price":420.5,"volume":23001}""",
    """{"ticker":"nvda","price":878.01,"volume":40112}""",
    """{"ticker":"tsla","price":177.8,"volume":92412}""",
    """{"ticker":"xom","price":113.4,"volume":15712}""")

  private def writeJsonFixture(): Unit = {
    val f = new java.io.File(JsonFixturePath)
    f.getParentFile.mkdirs()
    java.nio.file.Files.writeString(f.toPath, quoteRows.mkString("", "\n", "\n"))
  }

  private def jsonScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    writeJsonFixture()
    s.read.json(JsonFixturePath)
      .select(upper($"ticker").as("ticker"), $"price", $"volume")
      .orderBy($"ticker")
  }

  private val jsonScanSql =
    s"""SELECT upper(ticker) AS ticker, price, volume
       |FROM read_json('$JsonFixturePath', format='newline_delimited')
       |ORDER BY ticker""".stripMargin

  // ------------------------------------------------------------- q_sql_serving
  /** S6: the serving path — `spark.sql` over the registered table views,
    * in the shape of the reference's `industry_averages` dashboard query
    * (`/root/reference/Frontend.py:60-69`). The reference interpolates
    * user input into the SQL via f-strings (an injection vector); here the
    * segment is bound as a NAMED PARAMETER (`:seg`), the idiomatic and
    * safe Spark equivalent. Same exact-aggregation SQL spellings run on
    * both engines. */
  private def sqlServing(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    val sql =
      s"""SELECT c.c_mktsegment AS segment,
         |  COUNT(*) AS n_rows,
         |  ${sqlDavg("c.c_acctbal")} AS avg_acctbal,
         |  ${sqlDavg("o.o_totalprice")} AS avg_order_price,
         |  ${sqlIavg("o.o_orderkey")} AS avg_orderkey
         |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
         |WHERE c.c_mktsegment = :seg
         |GROUP BY c.c_mktsegment
         |ORDER BY segment""".stripMargin
    s.sql(sql, Map("seg" -> "BUILDING"))
  }

  private val sqlServingSql =
    s"""SELECT c.c_mktsegment AS segment,
       |  COUNT(*) AS n_rows,
       |  ${sqlDavg("c.c_acctbal")} AS avg_acctbal,
       |  ${sqlDavg("o.o_totalprice")} AS avg_order_price,
       |  ${sqlIavg("o.o_orderkey")} AS avg_orderkey
       |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       |WHERE c.c_mktsegment = 'BUILDING'
       |GROUP BY c.c_mktsegment
       |ORDER BY segment""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    // csv/json scans read 10-row serving fixtures, not sf-scaled tables —
    // a timing on them measures fixture IO, so they are correctness-only
    NamedQuery("q_csv_scan", csvScan, Some(csvScanSql)),
    NamedQuery("q_json_scan", jsonScan, Some(jsonScanSql)),
    NamedQuery("q_sql_serving", sqlServing, Some(sqlServingSql), bench = true))
}
