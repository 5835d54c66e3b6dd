package graft.pipeline

import graft.NamedQuery
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Pipeline parity (SURVEY.md §7.1 phase 3): the reference's
  * retrieval→cleaning→TableTransform chain re-expressed as composable
  * lazy `DataFrame => DataFrame` stages over reference-shaped fixtures
  * (FIXTURES.md §A):
  *
  *  - 4 column-mapping conformances (`/root/reference/cleaning.py:21-57,66-79`)
  *  - `current_ratio` / `market_cap` / `ev_to_ebitda` derivations
  *    (`cleaning.py:59,82,87`)
  *  - latest-quarter selection via group-max + natural join
  *    (`cleaning.py:62-63`)
  *  - per-table Parquet overwrite checkpoints (`cleaning.py:101-104` +
  *    the delete-prefix-then-upload S3 idempotency, `cleaning.py:108-117`
  *    — Spark's `SaveMode.Overwrite` has the same contract)
  *  - JDBC "replace" load of all four tables (`TableTransform.py:26-29`),
  *    exercised against embedded Derby in PipelineSpec.
  *
  * Semantics notes vs pandas (SURVEY.md §1.2): string→double casts are
  * null-on-failure (ANSI off = `astype` tolerance); double division by
  * zero yields NULL (pandas produces ±inf — we keep the SQL-engine
  * convention, which DuckDB shares, and document the deviation here).
  */
object FinancialPipeline {

  /** Apply a src→dst column mapping (projection + rename — the
    * `df[mapping.keys()].rename(columns=mapping)` conformance shape). */
  private def conform(df: DataFrame, mapping: Seq[(String, String)]): DataFrame =
    df.select(mapping.map { case (src, dst) => col(src).as(dst) }: _*)

  private def castMeasures(df: DataFrame, keys: Set[String]): DataFrame =
    df.select(df.columns.toIndexedSeq.map { c =>
      if (keys(c)) col(c) else col(c).cast(DoubleType).as(c)
    }: _*)

  /** cleaning.py:21-30 — company dimension. */
  def conformCompanyInfo(info: DataFrame): DataFrame =
    castMeasures(
      conform(info, Seq(
        "ticker" -> "ticker",
        "shortname" -> "company_nm",
        "website" -> "website",
        "industry" -> "industry",
        "longbusinesssummary" -> "company_info",
        "fulltimeemployees" -> "full_time_employees")),
      keys = Set("ticker", "company_nm", "website", "industry", "company_info"))

  /** cleaning.py:33-42 — monthly OHLC series. */
  def conformStockPrice(raw: DataFrame): DataFrame =
    castMeasures(
      conform(raw, Seq(
        "ticker" -> "ticker",
        "month" -> "month",
        "open" -> "opening_price",
        "close" -> "closing_price",
        "high" -> "month_high",
        "low" -> "month_low")),
      keys = Set("ticker", "month"))

  /** cleaning.py:45-63 — quarterly facts: conform, cast, derive
    * current_ratio, keep each ticker's latest quarter, drop month. */
  def conformFinancialStatements(raw: DataFrame): DataFrame = {
    val measures = Seq("cash_and_cash_equivalents", "ebitda", "net_income",
      "net_debt", "total_debt", "current_assets", "current_liabilities")
    val conformed = castMeasures(
      conform(raw, ("ticker" -> "ticker") +: ("month" -> "month") +:
        measures.map(m => m -> m)),
      keys = Set("ticker", "month"))
      .withColumn("current_ratio", col("current_assets") / col("current_liabilities"))
    val latest = conformed.groupBy("ticker").agg(max("month").as("month"))
    conformed.join(latest, Seq("ticker", "month"), "inner").drop("month")
  }

  /** cleaning.py:66-88 — valuation ratios: conform+cast from the wide
    * info table, derive market_cap, then ev_to_ebitda via the statement
    * join, left-joined back so every ticker keeps a row. */
  def deriveRatios(info: DataFrame, financialStatements: DataFrame): DataFrame = {
    val r = castMeasures(
      conform(info, Seq(
        "ticker" -> "ticker",
        "sharesoutstanding" -> "outstanding_shares",
        "previousclose" -> "latest_closing_price",
        "freecashflow" -> "free_cash_flow",
        "operatingcashflow" -> "operating_cash_flow",
        "dividendyield" -> "dividend_yield",
        "trailingpe" -> "trailing_pe",
        "debttoequity" -> "debt_to_equity",
        "returnonassets" -> "return_on_assets",
        "returnonequity" -> "return_on_equity")),
      keys = Set("ticker"))
      .withColumn("market_cap", col("outstanding_shares") * col("latest_closing_price"))
    val t = financialStatements
      .select("ticker", "total_debt", "cash_and_cash_equivalents", "ebitda", "current_ratio")
      .join(r.select("ticker", "market_cap"), Seq("ticker"), "inner")
      .withColumn("ev_to_ebitda",
        (col("market_cap") + col("total_debt") - col("cash_and_cash_equivalents")) / col("ebitda"))
    r.join(t.select("ticker", "current_ratio", "ev_to_ebitda"), Seq("ticker"), "left")
  }

  /** Full chain with per-table Parquet overwrite checkpoints
    * (cleaning.py:101-117): returns the four conformed tables re-read
    * from their checkpoints, so downstream consumers see durable state. */
  def runAll(s: SparkSession, info: DataFrame, stock: DataFrame,
             statements: DataFrame, outDir: String): Map[String, DataFrame] = {
    val fs = conformFinancialStatements(statements)
    val tables = Map(
      "company_info" -> conformCompanyInfo(info),
      "stock_price" -> conformStockPrice(stock),
      "financial_statements" -> fs,
      "ratios" -> deriveRatios(info, fs))
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name")
    }
    tables.keys.map(n => n -> s.read.parquet(s"$outDir/$n")).toMap
  }

  /** TableTransform.py:26-29 — load all conformed tables into the serving
    * database with replace semantics. */
  def loadToServing(tables: Map[String, DataFrame], jdbcUrl: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.format("jdbc").option("url", jdbcUrl)
        .option("dbtable", name).mode(SaveMode.Overwrite).save()
    }

  // ----------------------------------------------------------------- queries
  // Oracle-checked parity queries: Spark runs the pipeline stages over the
  // raw fixture parquet; DuckDB reproduces the SAME transformation in SQL
  // over the SAME files — a true end-to-end differential test.

  private def raw(s: SparkSession, name: String): DataFrame =
    s.read.parquet(s"${Fixtures.RawDir}/$name")

  private def qCompany(s: SparkSession, dir: String): DataFrame = {
    Fixtures.writeRaw(s)
    conformCompanyInfo(raw(s, "info")).orderBy("ticker")
  }

  private val qCompanySql =
    s"""SELECT ticker, shortname AS company_nm, website, industry,
       |  longbusinesssummary AS company_info,
       |  TRY_CAST(fulltimeemployees AS DOUBLE) AS full_time_employees
       |FROM read_parquet('${Fixtures.RawDir}/info/*.parquet')
       |ORDER BY ticker""".stripMargin

  private def qStock(s: SparkSession, dir: String): DataFrame = {
    Fixtures.writeRaw(s)
    conformStockPrice(raw(s, "stock_price")).orderBy("ticker", "month")
  }

  private val qStockSql =
    s"""SELECT ticker, month, CAST(open AS DOUBLE) AS opening_price,
       |  CAST(close AS DOUBLE) AS closing_price, CAST(high AS DOUBLE) AS month_high,
       |  CAST(low AS DOUBLE) AS month_low
       |FROM read_parquet('${Fixtures.RawDir}/stock_price/*.parquet')
       |ORDER BY ticker, month""".stripMargin

  private val fsOracleCte =
    s"""fs_cast AS (
       |  SELECT ticker, month,
       |    TRY_CAST(cash_and_cash_equivalents AS DOUBLE) AS cash_and_cash_equivalents,
       |    TRY_CAST(ebitda AS DOUBLE) AS ebitda,
       |    TRY_CAST(net_income AS DOUBLE) AS net_income,
       |    TRY_CAST(net_debt AS DOUBLE) AS net_debt,
       |    TRY_CAST(total_debt AS DOUBLE) AS total_debt,
       |    TRY_CAST(current_assets AS DOUBLE) AS current_assets,
       |    TRY_CAST(current_liabilities AS DOUBLE) AS current_liabilities
       |  FROM read_parquet('${Fixtures.RawDir}/financial_statements/*.parquet')),
       |fs_ratio AS (
       |  SELECT *, current_assets / current_liabilities AS current_ratio FROM fs_cast),
       |latest AS (SELECT ticker, max(month) AS month FROM fs_ratio GROUP BY ticker),
       |fs AS (
       |  SELECT f.ticker, f.cash_and_cash_equivalents, f.ebitda, f.net_income,
       |    f.net_debt, f.total_debt, f.current_assets, f.current_liabilities,
       |    f.current_ratio
       |  FROM fs_ratio f JOIN latest USING (ticker, month))""".stripMargin

  private def qFs(s: SparkSession, dir: String): DataFrame = {
    Fixtures.writeRaw(s)
    conformFinancialStatements(raw(s, "financial_statements")).orderBy("ticker")
  }

  private val qFsSql =
    s"""WITH $fsOracleCte
       |SELECT * FROM fs ORDER BY ticker""".stripMargin

  private def qRatios(s: SparkSession, dir: String): DataFrame = {
    Fixtures.writeRaw(s)
    deriveRatios(raw(s, "info"),
      conformFinancialStatements(raw(s, "financial_statements")))
      .orderBy("ticker")
  }

  private val qRatiosSql =
    s"""WITH $fsOracleCte,
       |r0 AS (
       |  SELECT ticker,
       |    TRY_CAST(sharesoutstanding AS DOUBLE) AS outstanding_shares,
       |    TRY_CAST(previousclose AS DOUBLE) AS latest_closing_price,
       |    TRY_CAST(freecashflow AS DOUBLE) AS free_cash_flow,
       |    TRY_CAST(operatingcashflow AS DOUBLE) AS operating_cash_flow,
       |    TRY_CAST(dividendyield AS DOUBLE) AS dividend_yield,
       |    TRY_CAST(trailingpe AS DOUBLE) AS trailing_pe,
       |    TRY_CAST(debttoequity AS DOUBLE) AS debt_to_equity,
       |    TRY_CAST(returnonassets AS DOUBLE) AS return_on_assets,
       |    TRY_CAST(returnonequity AS DOUBLE) AS return_on_equity
       |  FROM read_parquet('${Fixtures.RawDir}/info/*.parquet')),
       |r1 AS (
       |  SELECT *, outstanding_shares * latest_closing_price AS market_cap FROM r0),
       |t AS (
       |  SELECT f.ticker, f.total_debt, f.cash_and_cash_equivalents, f.ebitda,
       |    f.current_ratio, r1.market_cap
       |  FROM fs f JOIN r1 USING (ticker)),
       |t2 AS (
       |  SELECT *,
       |    (market_cap + total_debt - cash_and_cash_equivalents) / ebitda AS ev_to_ebitda
       |  FROM t)
       |SELECT r1.ticker, r1.outstanding_shares, r1.latest_closing_price,
       |  r1.free_cash_flow, r1.operating_cash_flow, r1.dividend_yield,
       |  r1.trailing_pe, r1.debt_to_equity, r1.return_on_assets,
       |  r1.return_on_equity, r1.market_cap, t2.current_ratio, t2.ev_to_ebitda
       |FROM r1 LEFT JOIN t2 USING (ticker)
       |ORDER BY ticker""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    // the pipeline queries replay cleaning.py over its small FIXTURE
    // parquet (not the sf-scaled tables) — timing them measures fixture
    // IO, so they are correctness-only
    NamedQuery("q_pipeline_company", qCompany, Some(qCompanySql)),
    NamedQuery("q_pipeline_stock", qStock, Some(qStockSql)),
    NamedQuery("q_pipeline_fs", qFs, Some(qFsSql)),
    NamedQuery("q_pipeline_ratios", qRatios, Some(qRatiosSql)))
}
