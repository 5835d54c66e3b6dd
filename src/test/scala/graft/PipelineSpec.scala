package graft

import graft.pipeline.{Fixtures, FinancialPipeline => P}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** End-to-end golden test of the retrieval→cleaning→TableTransform parity
  * chain (SURVEY.md §7.1 phase 3) over the reference-shaped fixtures:
  * conformances, derivations, latest-quarter selection, Parquet
  * checkpoints, and the JDBC serving load — asserted against hand-computed
  * expected values. */
class PipelineSpec extends GraftSuite {
  import spark.implicits._

  private lazy val infoDf = Fixtures.infoRows(spark)
  private lazy val stock = Fixtures.stockRows(spark)
  private lazy val stmts = Fixtures.statementRows(spark)

  private def cell(r: Row, name: String): Any = r.get(r.fieldIndex(name))
  private def d(r: Row, name: String): Double = r.getDouble(r.fieldIndex(name))

  test("company_info conformance: schema, rename, tolerant cast") {
    val ci = P.conformCompanyInfo(infoDf).orderBy("ticker")
    assert(ci.columns.toSeq == Seq("ticker", "company_nm", "website",
      "industry", "company_info", "full_time_employees"))
    val rows = ci.collect()
    assert(rows.length == 4)
    val aapl = rows(0)
    assert(cell(aapl, "company_nm") == "Apple Inc.")
    assert(d(aapl, "full_time_employees") == 164000.0)
    // "n/a" must cast to null (pandas astype tolerance / ANSI off)
    assert(cell(rows(1), "full_time_employees") == null)
  }

  test("financial_statements: latest quarter per ticker, month dropped, ratio derived") {
    val fs = P.conformFinancialStatements(stmts).orderBy("ticker")
    assert(!fs.columns.contains("month"))
    val rows = fs.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("AAPL", "MSFT", "ZED"))
    val aapl = rows(0)
    // 2025-06 row won over 2025-03
    assert(d(aapl, "current_assets") == 125400000000.0)
    assert(math.abs(d(aapl, "current_ratio") - 125400000000.0 / 124800000000.0) < 1e-12)
    // ZED latest quarter divides by zero liabilities -> NULL (documented
    // deviation from pandas inf; matches DuckDB/SQL convention)
    assert(cell(rows(2), "current_ratio") == null)
    // MSFT ebitda was a null string -> null double
    assert(cell(rows(1), "ebitda") == null)
  }

  test("ratios: market_cap and ev_to_ebitda derivations, left-join retention") {
    val fs = P.conformFinancialStatements(stmts)
    val r = P.deriveRatios(infoDf, fs).orderBy("ticker")
    val rows = r.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("AAPL", "MSFT", "NOFS", "ZED"))
    val aapl = rows(0)
    assert(d(aapl, "market_cap") == 15000000000.0 * 190.5)
    val expectedEv = (15000000000.0 * 190.5 + 98200000000.0 - 27800000000.0) / 31200000000.0
    assert(math.abs(d(aapl, "ev_to_ebitda") - expectedEv) < 1e-12)
    // MSFT: null ebitda -> null ev_to_ebitda
    assert(cell(rows(1), "ev_to_ebitda") == null)
    // NOFS: no statements -> left join keeps the row with null ratio cols
    assert(cell(rows(2), "current_ratio") == null && cell(rows(2), "ev_to_ebitda") == null)
    // ZED: ev still computable even though current_ratio is null
    assert(math.abs(d(rows(3), "ev_to_ebitda") - (10000000.0 + 850000.0 - 450000.0) / 1100000.0) < 1e-12)
  }

  test("runAll checkpoints all four tables and re-reads durable state") {
    val out = s"/tmp/graft_pipeline_test/${java.util.UUID.randomUUID()}"
    val tables = P.runAll(spark, infoDf, stock, stmts, out)
    assert(tables.keySet == Set("company_info", "stock_price",
      "financial_statements", "ratios"))
    assertSameRows(tables("company_info"), P.conformCompanyInfo(infoDf))
    assertSameRows(tables("stock_price"), P.conformStockPrice(stock))
    assertSameRows(tables("ratios"),
      P.deriveRatios(infoDf, P.conformFinancialStatements(stmts)))
    // overwrite idempotency: a second run replaces, not duplicates
    val again = P.runAll(spark, infoDf, stock, stmts, out)
    assert(again("stock_price").count() == stock.count())
  }

  test("serving load: all four tables land in the database with replace semantics") {
    val url = s"jdbc:derby:/tmp/graft_derby/${java.util.UUID.randomUUID()};create=true"
    val out = s"/tmp/graft_pipeline_test/${java.util.UUID.randomUUID()}"
    val tables = P.runAll(spark, infoDf, stock, stmts, out)
    P.loadToServing(tables, url)
    P.loadToServing(tables, url) // replace, not append
    val sp = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "stock_price").load()
    assert(sp.count() == stock.count())
    val ratios = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "ratios").load()
    assert(ratios.count() == 4)
  }
}
