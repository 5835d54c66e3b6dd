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

  // ------------------------------------------------------------- q_bad_records
  /** Malformed-input handling — the bad-records channel every real
    * ingest needs: a CSV with unparsable numerics and under-arity rows
    * is read PERMISSIVE with a corrupt-record column, and rows split
    * into good/bad with per-channel accounting instead of failing the
    * job (or silently dropping, DROPMALFORMED's trap). The oracle
    * re-derives the same split from the RAW LINES (DuckDB reads the file
    * un-delimited and applies the explicit goodness rule: at least two
    * fields — extra tokens are dropped, Spark's PERMISSIVE behavior —
    * and a parseable price), so the two engines agree on the
    * classification from first principles, not shared parser quirks.
    * Good-channel totals route through DECIMAL as always. */
  val BadCsvFixturePath = "/tmp/graft_fixtures/prices_dirty.csv"
  private val dirtyRows = Seq(
    "aapl,189.25",
    "msft,notanumber",   // unparsable numeric -> bad
    "nvda,878.01",
    ",77.10",            // empty ticker -> structurally fine, null ticker
    "tsla,177.80,extra", // EXTRA tokens are tolerated (Spark drops them)
    "amzn",              // missing field -> bad
    "xom,113.40")

  private def writeBadCsvFixture(): Unit = {
    val f = new java.io.File(BadCsvFixturePath)
    f.getParentFile.mkdirs()
    java.nio.file.Files.writeString(f.toPath,
      ("ticker,price" +: dirtyRows).mkString("", "\n", "\n"))
  }

  private def badRecords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    writeBadCsvFixture()
    val schema = "ticker STRING, price DOUBLE, _corrupt STRING"
    val raw = s.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(BadCsvFixturePath)
    // the channel rule is EXPLICIT — a required field present and
    // parseable — not the parser's corrupt flag alone: Spark PERMISSIVE
    // pads missing trailing tokens with null WITHOUT flagging them, so
    // "price IS NULL" is part of the contract, matching the oracle's
    // first-principles rule exactly
    raw
      .select(when($"_corrupt".isNull && $"price".isNotNull, "good")
        .otherwise("bad").as("status"), $"price")
      .groupBy($"status")
      .agg(count(lit(1)).as("n_rows"),
        dsum(when($"status" === "good", $"price")).as("good_price_total"))
      .orderBy($"status")
  }

  private val badRecordsSql =
    s"""WITH raw AS (
       |  SELECT raw FROM read_csv('$BadCsvFixturePath',
       |    columns={'raw': 'VARCHAR'}, delim='', header=false, quote='')
       |  WHERE raw <> 'ticker,price'),
       |parsed AS (
       |  SELECT string_split(raw, ',') AS parts FROM raw),
       |judged AS (
       |  SELECT CASE WHEN len(parts) >= 2
       |                AND TRY_CAST(parts[2] AS DOUBLE) IS NOT NULL
       |              THEN 'good' ELSE 'bad' END AS status,
       |    CASE WHEN len(parts) >= 2 THEN TRY_CAST(parts[2] AS DOUBLE) END AS price
       |  FROM parsed)
       |SELECT status, COUNT(*) AS n_rows,
       |  ${sqlDsum("CASE WHEN status = 'good' THEN price END")}
       |    AS good_price_total
       |FROM judged GROUP BY status ORDER BY status""".stripMargin

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

  // --------------------------------------------------------- q_partitioned_scan
  /** Hive-style partitioned layout end to end, driver-visible: events
    * write once to a scratch dir PARTITIONED BY day (the layout any
    * 100 TB event lake uses), then one day is aggregated back — the
    * partition-pruned read path (directory pruning at planning time —
    * non-selected days are never opened; PartitioningSpec asserts the
    * pruned file count on this same layout) hash-compares against the
    * oracle's WHERE-filtered scan of the original file. The scratch
    * write is fixture plumbing keyed on the sf dir (the stream-dedup
    * staging recipe) and skipped when already present.
    *
    * Partition values round-trip as STRINGS deliberately: a
    * date-formatted partition directory name (`day=2024-01-15`) is the
    * universal lake convention, immune to partition-column type
    * inference differences across engines. */
  val PartitionedDay = "2024-01-15"

  private def partitionedScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val key = graft.Scratch.key(java.nio.file.Paths.get(dir))
    val scratch = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_part_events_$key")
    val marker = new java.io.File(scratch, "_SUCCESS")
    if (!marker.exists()) {
      Tables.events(s, dir)
        .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("day")
        .parquet(scratch.toString)
    }
    s.read.parquet(scratch.toString)
      .filter($"day" === PartitionedDay)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .orderBy($"event_type")
  }

  private val partitionedScanSql =
    s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM events
       |WHERE strftime(ts, '%Y-%m-%d') = '$PartitionedDay'
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------ q_orc_roundtrip
  /** ORC as the second columnar lake format (many warehouses are
    * ORC-resident): lineitem's measure columns round-trip through an
    * ORC scratch write and aggregate back per return flag; the oracle
    * computes the same aggregate from the original parquet, so any
    * value corruption in the ORC write/read path (type mapping,
    * predicate pushdown, vectorized reader) breaks the hash compare.
    * Scratch keyed on the sf dir, skipped when present. */
  private def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val key = graft.Scratch.key(java.nio.file.Paths.get(dir))
    val scratch = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_orc_lineitem_$key")
    val marker = new java.io.File(scratch, "_SUCCESS")
    if (!marker.exists()) {
      Tables.lineitem(s, dir)
        .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
        .write.mode("overwrite").orc(scratch.toString)
    }
    s.read.orc(scratch.toString)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  private val orcRoundtripSql =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_price
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------ q_schema_merge
  /** Parquet schema EVOLUTION end to end: two batches of the same feed
    * land with different schemas (the later batch adds `event_type` —
    * the standard additive evolution), the reader merges footers
    * (`mergeSchema`), and rows from the pre-evolution batch surface the
    * new column as NULL. The oracle recomputes per-batch aggregates
    * from the original table with the evolution rule applied, so a
    * wrong merge (dropped column, misaligned nulls, type clash) breaks
    * the hash compare. Batch membership is event_id parity; the layout
    * is a Hive `batch=` partition dir per schema generation (how
    * evolving feeds actually land).
    *
    * Scratch keyed on the sf dir, written once (the q_partitioned_scan
    * recipe). */
  private def schemaMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val key = graft.Scratch.key(java.nio.file.Paths.get(dir))
    val scratch = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_schema_merge_$key")
    if (!new java.io.File(scratch, "_DONE").exists()) {
      val e = Tables.events(s, dir)
        .select($"event_id", $"user_id", $"value", $"event_type")
      e.filter($"event_id" % 2 === 0).drop("event_type")
        .write.mode("overwrite").parquet(s"$scratch/batch=0")
      e.filter($"event_id" % 2 === 1)
        .write.mode("overwrite").parquet(s"$scratch/batch=1")
      new java.io.File(scratch, "_DONE").createNewFile()
    }
    s.read.option("mergeSchema", "true")
      .option("basePath", scratch.toString)
      .parquet(s"$scratch/batch=0", s"$scratch/batch=1")
      .groupBy($"batch")
      .agg(count(lit(1)).as("n_rows"),
        count($"event_type").as("n_typed"),
        dsum($"value").as("total_value"))
      .orderBy($"batch")
  }

  private val schemaMergeSql =
    s"""SELECT event_id % 2 AS batch, COUNT(*) AS n_rows,
       |  CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_typed,
       |  ${sqlDsum("value")} AS total_value
       |FROM events GROUP BY 1 ORDER BY batch""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    // csv/json scans read 10-row serving fixtures, not sf-scaled tables —
    // a timing on them measures fixture IO, so they are correctness-only
    NamedQuery("q_csv_scan", csvScan, Some(csvScanSql)),
    NamedQuery("q_json_scan", jsonScan, Some(jsonScanSql)),
    NamedQuery("q_bad_records", badRecords, Some(badRecordsSql)),
    NamedQuery("q_sql_serving", sqlServing, Some(sqlServingSql), bench = true),
    NamedQuery("q_partitioned_scan", partitionedScan,
      Some(partitionedScanSql)),
    NamedQuery("q_orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql)),
    NamedQuery("q_schema_merge", schemaMerge, Some(schemaMergeSql)))
}
