package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. AQE handles skewed JOINS by splitting
  * partitions, but a skewed WINDOW (top-k per key with one hot key) still
  * funnels the hot key's entire row set through a single task — the
  * classic straggler at 100 TB. The standard fix is salting: a two-phase
  * reduction where phase 1 computes per-(key, salt) top-k across
  * `saltBuckets` parallel tasks, and phase 2 reduces the bounded
  * `saltBuckets * k` survivors per key. Result is IDENTICAL to the plain
  * window whenever the sort order is total (tie-broken) — asserted in
  * SkewSpec against both the shipped data and a synthetic hot-key frame.
  */
object Skew {

  /** Two-phase salted top-k per key.
    *
    * @param keyCol      grouping key column name
    * @param sortExprs   total order (include a tie-breaker!), best first
    * @param saltOn      expression whose hash spreads the hot key's rows
    *                    (a unique id column; must not correlate with rank)
    * @param k           rows to keep per key
    * @param saltBuckets parallelism of phase 1 over a single key
    */
  def saltedTopKPerKey(df: DataFrame, keyCol: String, sortExprs: Seq[Column],
                       saltOn: Column, k: Int, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltOn), lit(saltBuckets)))
    val w1 = Window.partitionBy(col(keyCol), col("__salt")).orderBy(sortExprs: _*)
    val survivors = salted
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k)
      .drop("__rn", "__salt")
    // phase 2 input is <= saltBuckets * k rows per key, hot or not
    val w2 = Window.partitionBy(col(keyCol)).orderBy(sortExprs: _*)
    survivors
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
  }

  // ------------------------------------------------------------ q_topk_per_key
  /** Top-3 orders per customer by price — executed through the salted
    * two-phase path; the oracle is the plain one-window SQL, proving the
    * salted formulation is result-identical. */
  private def topkPerKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    saltedTopKPerKey(
      Tables.orders(s, dir), "o_custkey",
      Seq($"o_totalprice".desc, $"o_orderkey".asc),
      saltOn = $"o_orderkey", k = 3, saltBuckets = 8)
      .select($"o_custkey".as("custkey"), $"o_orderkey".as("orderkey"),
        $"o_totalprice".as("totalprice"), $"rank")
      .orderBy($"custkey", $"rank")
  }

  private val topkPerKeySql =
    """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
      |  o_totalprice AS totalprice, rn AS rank
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey
      |                               ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY custkey, rank""".stripMargin

  // ------------------------------------------------------------ q_skew_report
  /** Join-key skew diagnosis — the report a pipeline runs BEFORE picking
    * a join strategy (broadcast / salt / AQE-split): for each candidate
    * key of `lineitem`, the distinct-key count, the hottest key's row
    * count, and its corpus share in ppm. A share over ~1/partitions is
    * the straggler warning. Two-level aggregation per key (per-key counts
    * partial-agg map-side, then a 4-number rollup); the three key reports
    * run as independent branches of one union. Integer throughout. */
  private def skewReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    def report(keyCol: String): DataFrame =
      li.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("n"))
        .agg(
          count(lit(1)).as("n_distinct_keys"),
          max($"n").as("max_key_rows"),
          sum($"n").as("n_rows"))
        .select(
          lit(keyCol).as("key_name"), $"n_distinct_keys", $"max_key_rows",
          expr("max_key_rows * 1000000 DIV n_rows").as("max_share_ppm"))
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(report)
      .reduce(_.unionByName(_))
      .orderBy($"key_name")
  }

  private val skewReportSql = {
    def rep(c: String) =
      s"""SELECT '$c' AS key_name, COUNT(*) AS n_distinct_keys,
         |  MAX(n) AS max_key_rows,
         |  CAST(MAX(n) * 1000000 // SUM(n) AS BIGINT) AS max_share_ppm
         |FROM (SELECT $c, COUNT(*) AS n FROM lineitem GROUP BY 1)""".stripMargin
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(rep)
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_name")
  }

  // ------------------------------------------------------------- q_join_size
  /** Exact join-cardinality prediction WITHOUT running the join —
    * |A ⋈ₖ B| = Σₖ n_A(k)·n_B(k): two per-key count aggregations and a
    * key-cardinality-sized merge, versus materializing the (possibly
    * explosive) join itself. This is the sizing check a pipeline runs
    * with q_skew_report before committing to a join strategy — at 100 TB
    * the formula costs two partial-agg shuffles of slim count rows while
    * the join it predicts could be unrunnable. The validation IS the
    * cross-engine compare: Spark runs ONLY the formula (the shipped
    * operator — no join materialization on this side at all, so the
    * bench times the formula), while the ORACLE materializes the real
    * join in DuckDB and counts it; the two integers must hash-match. */
  private def joinSize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val oCounts = Tables.orders(s, dir)
      .groupBy($"o_orderkey".as("k")).agg(count(lit(1)).as("n_a"))
    val lCounts = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey".as("k")).agg(count(lit(1)).as("n_b"))
    // coalesce: an empty key intersection must predict 0, matching COUNT(*)
    oCounts.join(lCounts, "k")
      .agg(coalesce(sum($"n_a" * $"n_b"), lit(0L)).as("join_rows"))
  }

  private val joinSizeSql =
    """SELECT COUNT(*) AS join_rows
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin

  // ------------------------------------------------------------ q_salted_join
  /** Salted fact↔dim equi-join — the manual skew fix for when one join
    * key carries a disproportionate share of the fact side and even
    * AQE's skew split can't help (e.g. the dim side is too big to
    * broadcast but a handful of keys dominate): the FACT side gets a
    * deterministic salt in [0, B) hashed from a row-unique column, the
    * DIM side is replicated ×B with every salt value, and the join runs
    * on (key, salt) — the hot key's rows now spread over B reducers.
    * Result is IDENTICAL to the plain join by construction; the oracle
    * runs the PLAIN join, so the equivalence is hash-checked, not
    * claimed. Salt = pmod(xxhash64(unique col), B) — deterministic on
    * any partitioning, no RNG.
    *
    * Scale shape: dim replication costs ×B dim rows (B = 8 here — dim
    * stays tiny relative to the fact side); both sides shuffle once on
    * (key, salt); downstream aggregation is unchanged. */
  val JoinSaltBuckets = 8

  /** Fact↔dim inner equi-join with fact-side salting and ×B dim
    * replication; key column must exist on both sides. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltOn: Column, buckets: Int): DataFrame = {
    val saltedFact = fact
      .withColumn("__salt", pmod(xxhash64(saltOn), lit(buckets.toLong)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }

  private def saltedJoinQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fact = Tables.lineitem(s, dir)
      .select($"l_suppkey".as("skey"), $"l_orderkey", $"l_extendedprice")
    val dim = Tables.supplier(s, dir)
      .select($"s_suppkey".as("skey"), $"s_nationkey")
    saltedJoin(fact, dim, "skey", $"l_orderkey", JoinSaltBuckets)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Exact.dsum($"l_extendedprice").as("revenue"))
      .orderBy($"s_nationkey")
  }

  private val saltedJoinSql =
    s"""SELECT s_nationkey, COUNT(*) AS n_lines,
       |  ${graft.functions.Exact.sqlDsum("l_extendedprice")} AS revenue
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_topk_per_key", topkPerKey, Some(topkPerKeySql), bench = true),
    NamedQuery("q_skew_report", skewReport, Some(skewReportSql), bench = true),
    NamedQuery("q_join_size", joinSize, Some(joinSizeSql), bench = true),
    NamedQuery("q_salted_join", saltedJoinQuery, Some(saltedJoinSql),
      bench = true))
}
