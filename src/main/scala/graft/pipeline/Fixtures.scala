package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Reference-shaped raw fixtures (FIXTURES.md §A; schemas from
  * `/root/reference/retrieval.py:10-66`): the wide string-typed `info`
  * table, the monthly `stock_price` series, and string-typed quarterly
  * `financial_statements`. Deterministic literals, written as parquet so
  * Spark and the DuckDB oracle read identical bytes.
  *
  * Coverage demanded by FIXTURES.md §A3: ≥2 quarters per ticker
  * (latest-quarter selection), a zero `current_liabilities` row
  * (div-by-zero), nulls in measures (AVG/derivation null-skip), a
  * non-numeric string ("n/a") for cast-tolerance, and a ticker present
  * in `info` but absent from statements (left-join retention).
  */
object Fixtures {
  val RawDir = "/tmp/graft_fixtures/raw"

  def infoRows(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("AAPL", "Apple Inc.", "https://apple.example", "Consumer Electronics",
        "Designs and sells devices.", "164000", "15000000000", "190.5",
        "99000000000", "110000000000", "0.0055", "29.5", "176.3", "0.21", "1.47"),
      ("MSFT", "Microsoft Corp.", "https://msft.example", "Software",
        "Builds software platforms.", "n/a", "7430000000", "410.2",
        "67000000000", "87000000000", "0.008", "35.1", "47.1", "0.18", "0.43"),
      ("NOFS", "NoStatements Co.", null, "Holding",
        "Has no filed statements yet.", "12", "200000", "5.5",
        null, null, null, null, null, null, null),
      ("ZED", "Zed Industries", null, "Industrial",
        null, null, "1000000", "10.0", null, "5000000", null, null, "12.0",
        "0.05", "0.07"))
      .toDF("ticker", "shortname", "website", "industry", "longbusinesssummary",
        "fulltimeemployees", "sharesoutstanding", "previousclose",
        "freecashflow", "operatingcashflow", "dividendyield", "trailingpe",
        "debttoequity", "returnonassets", "returnonequity")
  }

  def stockRows(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("2025-05", "AAPL", 185.0, 190.5, 195.2, 182.1),
      ("2025-06", "AAPL", 190.5, 195.3, 199.9, 188.0),
      ("2025-05", "MSFT", 400.0, 405.7, 412.0, 396.4),
      ("2025-06", "MSFT", 405.7, 410.2, 418.8, 401.2),
      ("2025-05", "ZED", 9.5, 9.8, 10.4, 9.1),
      ("2025-06", "ZED", 9.8, 10.0, 10.6, 9.6))
      .toDF("month", "ticker", "open", "close", "high", "low")
  }

  def statementRows(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("2025-03", "AAPL", "29900000000", "32500000000", "24160000000",
        "76000000000", "104600000000", "135400000000", "133200000000"),
      ("2025-06", "AAPL", "27800000000", "31200000000", "23400000000",
        "70100000000", "98200000000", "125400000000", "124800000000"),
      ("2025-06", "MSFT", "17480000000", null, "24100000000",
        "44900000000", "97800000000", "159700000000", "118600000000"),
      ("2025-03", "ZED", "500000", "1200000", "300000",
        "700000", "900000", "2000000", "1500000"),
      ("2025-06", "ZED", "450000", "1100000", "280000",
        "650000", "850000", "1800000", "0"))
      .toDF("month", "ticker", "cash_and_cash_equivalents", "ebitda",
        "net_income", "net_debt", "total_debt", "current_assets",
        "current_liabilities")
  }

  /** Write the three raw datasets as single-file parquet dirs (overwrite,
    * idempotent — same bytes every call). */
  def writeRaw(s: SparkSession): Unit = synchronized {
    Seq(
      "info" -> infoRows(s),
      "stock_price" -> stockRows(s),
      "financial_statements" -> statementRows(s)
    ).foreach { case (name, df) =>
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$RawDir/$name")
    }
  }
}
