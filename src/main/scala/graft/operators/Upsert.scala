package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** SCD-1 upsert (MERGE semantics without transactional storage): rows
  * from `updates` replace same-key rows in `existing` wholesale, new
  * keys insert, untouched existing rows survive. Expressed as a
  * full-outer join on the key + row-provenance selection — the
  * engine-agnostic MERGE formulation when the table format has no
  * transaction log. At scale both sides shuffle once on the key, or
  * neither does when the snapshot is bucketed by it (BucketingSpec);
  * the refreshed snapshot then overwrites its checkpoint (S2/S4
  * idempotent-overwrite semantics, like the reference's delete-prefix-
  * then-upload).
  *
  * Whole-row replacement, not per-column COALESCE: an update carrying a
  * legitimate NULL must null the field, not leak the old value.
  */
object Upsert {

  /** Eager precondition on a mutation batch: keys present and unique —
    * SQL MERGE raises on multiple source matches, and a NULL key would
    * silently survive as an all-NULL row through the outer join. One
    * aggregation job; cheap insurance before a destructive overwrite. */
  private def requireUniqueKeys(batch: DataFrame, key: String, what: String): Unit = {
    val r = batch.agg(
      count(lit(1)).as("n"),
      count_distinct(col(key)).as("n_keys"),
      count(when(col(key).isNull, 1)).as("n_null")).collect()(0)
    require(r.getLong(2) == 0, s"$what contains ${r.getLong(2)} NULL ${key}s")
    require(r.getLong(0) == r.getLong(1),
      s"$what has ${r.getLong(0) - r.getLong(1)} duplicate ${key}s — " +
        "MERGE semantics require one row per key")
  }

  def upsert(existing: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = existing.columns.toIndexedSeq
    require(updates.columns.toIndexedSeq == cols,
      s"schema mismatch: ${cols.mkString(",")} vs ${updates.columns.mkString(",")}")
    require(cols.contains(key), s"key '$key' not in schema")
    requireUniqueKeys(updates, key, "updates")
    val e = existing.select(cols.map(c => col(c).as(s"__e_$c")): _*)
    val u = updates.select(cols.map(c => col(c).as(s"__u_$c")): _*)
    e.join(u, col(s"__e_$key") === col(s"__u_$key"), "full_outer")
      .select(cols.map { c =>
        when(col(s"__u_$key").isNotNull, col(s"__u_$c"))
          .otherwise(col(s"__e_$c")).as(c)
      }: _*)
  }

  /** SCD-2 historization: apply a change batch to a versioned dimension.
    * `current` carries (key, payload..., valid_from, valid_to) with
    * valid_to NULL marking the open version; `changes` carries (key,
    * payload..., `effectiveCol`). Matched open rows close at the change's
    * effective date and the change opens a new version; unmatched open
    * rows and already-closed history pass through untouched.
    *
    * Scale shape: key-partitioned (or auto-broadcast, when the batch is
    * small) join passes over the OPEN slice only — closed history is
    * never touched; at scale it's a separate partition pruned away. */
  def scd2(current: DataFrame, changes: DataFrame, key: String,
           effectiveCol: String): DataFrame = {
    val payload = current.columns.toIndexedSeq
      .filterNot(c => c == key || c == "valid_from" || c == "valid_to")
    require(changes.columns.toIndexedSeq == (key +: payload :+ effectiveCol),
      s"changes must be ($key, ${payload.mkString(", ")}, $effectiveCol)")
    requireUniqueKeys(changes, key, "changes")
    val open = current.filter(col("valid_to").isNull)
    // a change effective before the version it closes would create an
    // inverted validity interval — reject the batch
    val inverted = open.select(col(key), col("valid_from"))
      .join(changes.select(col(key), col(effectiveCol)), Seq(key))
      .filter(col(effectiveCol) < col("valid_from")).count()
    require(inverted == 0,
      s"$inverted changes are effective before the open version they close")
    val closedHistory = current.filter(col("valid_to").isNotNull)
    val closing = open.drop("valid_to")
      .join(changes.select(col(key), col(effectiveCol).as("valid_to")), Seq(key))
      .select(current.columns.map(col): _*)
    val stillOpen = open.join(changes.select(col(key)), Seq(key), "left_anti")
    val newOpen = changes
      .withColumnRenamed(effectiveCol, "valid_from")
      .withColumn("valid_to", lit(null).cast(current.schema("valid_to").dataType))
      .select(current.columns.map(col): _*)
    closedHistory.unionByName(closing).unionByName(stillOpen).unionByName(newOpen)
  }

  // --------------------------------------------------------------------- q_upsert
  /** Deterministic update batch synthesized from the snapshot itself:
    * every 100th customer gets a balance adjustment (update), every
    * 500th spawns a new key (insert). */
  private def upsertQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val snapshot = Tables.customer(s, dir)
    val adjusted = snapshot.filter($"c_custkey" % 100 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 1000.0)
    val inserts = snapshot.filter($"c_custkey" % 500 === 0)
      .withColumn("c_custkey", $"c_custkey" + 10000000L)
    upsert(snapshot, adjusted.unionByName(inserts), "c_custkey")
      .orderBy($"c_custkey")
  }

  private val upsertSql =
    """WITH updates AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
      |         c_mktsegment
      |  FROM customer WHERE c_custkey % 100 = 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 500 = 0)
      |SELECT
      |  COALESCE(u.c_custkey, e.c_custkey) AS c_custkey,
      |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE e.c_name END AS c_name,
      |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE e.c_nationkey END AS c_nationkey,
      |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE e.c_acctbal END AS c_acctbal,
      |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE e.c_mktsegment END AS c_mktsegment
      |FROM customer e FULL JOIN updates u ON e.c_custkey = u.c_custkey
      |ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------------------------- q_scd2
  /** Versioned customer dimension: seed every customer as one open
    * version from 2020-01-01, then apply a balance change for every
    * 100th customer effective 2024-06-01 — those keys end with a closed
    * 2020..2024 version plus a new open one. */
  private def scd2Query(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val current = Tables.customer(s, dir)
      .select($"c_custkey", $"c_name", $"c_acctbal",
        to_date(lit("2020-01-01")).as("valid_from"),
        lit(null).cast("date").as("valid_to"))
    val changes = Tables.customer(s, dir)
      .filter($"c_custkey" % 100 === 0)
      .select($"c_custkey", $"c_name", ($"c_acctbal" + 500.0).as("c_acctbal"),
        to_date(lit("2024-06-01")).as("effective"))
    scd2(current, changes, "c_custkey", "effective")
      // render dates as strings: pandas reads DuckDB DATE as Timestamp,
      // so raw date cells would never hash-match cross-engine
      .select($"c_custkey", $"c_name", $"c_acctbal",
        date_format($"valid_from", "yyyy-MM-dd").as("valid_from"),
        date_format($"valid_to", "yyyy-MM-dd").as("valid_to"))
      .orderBy($"c_custkey", $"valid_from")
  }

  private val scd2Sql =
    """WITH current AS (
      |  SELECT c_custkey, c_name, c_acctbal,
      |    DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
      |  FROM customer),
      |changes AS (
      |  SELECT c_custkey, c_name, c_acctbal + 500.0 AS c_acctbal,
      |    DATE '2024-06-01' AS effective
      |  FROM customer WHERE c_custkey % 100 = 0)
      |SELECT c_custkey, c_name, c_acctbal,
      |  strftime(valid_from, '%Y-%m-%d') AS valid_from,
      |  strftime(valid_to, '%Y-%m-%d') AS valid_to
      |FROM (
      |  SELECT cu.c_custkey, cu.c_name, cu.c_acctbal, cu.valid_from,
      |    ch.effective AS valid_to
      |  FROM current cu JOIN changes ch USING (c_custkey)
      |  UNION ALL
      |  SELECT cu.* FROM current cu
      |  WHERE NOT EXISTS (SELECT 1 FROM changes ch WHERE ch.c_custkey = cu.c_custkey)
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_acctbal, effective AS valid_from,
      |    CAST(NULL AS DATE) AS valid_to
      |  FROM changes)
      |ORDER BY c_custkey, valid_from""".stripMargin

  /** Point-in-time ("as was") join: each fact row joined to the dim
    * VERSION valid at its event date — the read side of SCD-2, and the
    * lookup every backtest / training-data snapshot needs (joining
    * today's attributes onto historical events is label leakage).
    *
    * Scale shape: this is deliberately NOT a range join. The version
    * interval predicate rides as a residual filter on a plain KEY
    * equi-join — per key there are only a handful of versions, so the
    * equi-join bounds the multiplicity and Spark plans a hash/sort-merge
    * join on the key (broadcast when the dim fits), never an
    * interval-bucketed or nested-loop plan. The fact side arrives
    * already partitioned by the join key and is never re-shuffled for
    * the validity check. */
  def pointInTime(facts: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, eventCol: String): DataFrame = {
    val valid = facts(eventCol) >= dim("valid_from") &&
      (dim("valid_to").isNull || facts(eventCol) < dim("valid_to"))
    facts.join(dim, facts(factKey) === dim(dimKey) && valid)
      .drop(dim(dimKey))
  }

  // ------------------------------------------------------------------ q_scd2_pit
  /** Orders joined to the customer balance "as was" on the order date:
    * the SCD-2 dim seeds every customer open from 1992-01-01, every
    * 100th customer re-versions effective 1995-06-01 (+500 balance) —
    * so TPC-H order dates (1992-1998) straddle the version boundary and
    * both the closed and the open slice are exercised. One row per
    * order; a wrong-version pick changes aswas_acctbal and fails the
    * hash compare. */
  private def scd2PitQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seed = Tables.customer(s, dir)
      .select($"c_custkey", $"c_acctbal",
        to_date(lit("1992-01-01")).as("valid_from"),
        lit(null).cast("date").as("valid_to"))
    val changes = Tables.customer(s, dir)
      .filter($"c_custkey" % 100 === 0)
      .select($"c_custkey", ($"c_acctbal" + 500.0).as("c_acctbal"),
        to_date(lit("1995-06-01")).as("effective"))
    val dim = scd2(seed, changes, "c_custkey", "effective")
    val facts = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate".cast("date").as("o_date"))
    pointInTime(facts, dim, "o_custkey", "c_custkey", "o_date")
      .select($"o_orderkey", $"o_custkey",
        date_format($"o_date", "yyyy-MM-dd").as("order_date"),
        $"c_acctbal".as("aswas_acctbal"),
        date_format($"valid_from", "yyyy-MM-dd").as("version_from"))
      .orderBy($"o_orderkey")
  }

  private val scd2PitSql =
    """WITH dim AS (
      |  SELECT c_custkey, c_acctbal,
      |    DATE '1992-01-01' AS valid_from,
      |    CASE WHEN c_custkey % 100 = 0 THEN DATE '1995-06-01' END AS valid_to
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal + 500.0, DATE '1995-06-01', NULL
      |  FROM customer WHERE c_custkey % 100 = 0)
      |SELECT o_orderkey, o_custkey,
      |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
      |  c_acctbal AS aswas_acctbal,
      |  strftime(valid_from, '%Y-%m-%d') AS version_from
      |FROM orders JOIN dim ON o_custkey = c_custkey
      |  AND CAST(o_orderdate AS DATE) >= valid_from
      |  AND (valid_to IS NULL OR CAST(o_orderdate AS DATE) < valid_to)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------- q_incremental_agg
  /** Incremental materialized-aggregate maintenance — the
    * streaming-materialized-view shape in batch: a stored per-customer
    * aggregate STATE (count + DECIMAL spend sum) is merged with the
    * partial aggregate of a NEW batch, without rescanning history facts.
    * Works because (count, decimal-sum) is a MERGEABLE state: the merge
    * is itself a sum, associative and exact — merging daily batches in
    * any order, or recomputing from scratch, gives bit-identical results
    * (UpsertSpec proves the associativity on a 3-way split; the oracle
    * IS the from-scratch recompute over all facts).
    *
    * Scale shape: the new batch partial-aggregates map-side to at most
    * one row per touched key before the merge shuffle, and the state
    * side is aggregate-sized (keys, not facts) — the cost per refresh is
    * O(batch + touched keys), independent of history volume. This is
    * the batch analog of q_event_window_agg's streaming aggregation and
    * the digest-only q_incremental_dedup. */
  val IncrementalSplit = "2001-01-01"

  /** Mergeable per-key state: (n_orders, spend as DECIMAL(28,2)). */
  def orderAggState(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(28, 2))).as("spend_dec"))

  /** Merge any number of mergeable states (union + re-sum). */
  def mergeAggStates(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeAggStates needs at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(col("o_custkey"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("spend_dec")).as("spend_dec"))
  }

  private def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val cut = to_timestamp(lit(IncrementalSplit))
    val state = orderAggState(orders.filter($"o_orderdate" < cut))
    val batch = orderAggState(orders.filter($"o_orderdate" >= cut))
    mergeAggStates(Seq(state, batch))
      .select($"o_custkey", $"n_orders",
        $"spend_dec".cast("double").as("total_spend"))
      .orderBy($"o_custkey")
  }

  private val incrementalAggSql =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
      |    AS total_spend
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------------- q_cdc_apply
  /** CDC changelog application — the lakehouse MERGE a streaming
    * ingest compacts to: an ordered log of (seq, op ∈ I/U/D, key,
    * payload) collapses to final table state by LAST-OP-WINS per key,
    * with a terminal D deleting the row. This is the op-log complement
    * to q_upsert (clean snapshot in) and q_scd2 (history out).
    *
    * The changelog is built deterministically from `customer`: an insert
    * for every row, an update (balance + 1000) for every 5th key, a
    * delete for every 7th — so the oracle holds the complete expected
    * answer. Apply = one key-partitioned window (max seq), one filter;
    * the only shuffle is keyed by the primary key, partial-agg'd — the
    * plan that survives a TB-scale changelog. */
  private def cdcApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val inserts = c.select($"c_custkey".as("key"), lit(1L).as("seq"),
      lit("I").as("op"), $"c_acctbal".as("bal"))
    val updates = c.filter($"c_custkey" % 5 === 0)
      .select($"c_custkey".as("key"), lit(2L).as("seq"),
        lit("U").as("op"), ($"c_acctbal" + 1000.0).as("bal"))
    val deletes = c.filter($"c_custkey" % 7 === 0)
      .select($"c_custkey".as("key"), lit(3L).as("seq"),
        lit("D").as("op"), lit(null).cast("double").as("bal"))
    val log = inserts.unionByName(updates).unionByName(deletes)
    val w = Window.partitionBy($"key").orderBy($"seq".desc)
    log
      .withColumn("__r", row_number().over(w))
      .filter($"__r" === 1 && $"op" =!= "D")
      .select($"key", $"op".as("last_op"), $"bal")
      .orderBy($"key")
  }

  private val cdcApplySql =
    """WITH log AS (
      |  SELECT c_custkey AS key, 1 AS seq, 'I' AS op, c_acctbal AS bal
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 2, 'U', c_acctbal + 1000.0
      |  FROM customer WHERE c_custkey % 5 = 0
      |  UNION ALL
      |  SELECT c_custkey, 3, 'D', NULL
      |  FROM customer WHERE c_custkey % 7 = 0),
      |last AS (
      |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS r
      |  FROM log)
      |SELECT key, op AS last_op, bal FROM last
      |WHERE r = 1 AND op <> 'D' ORDER BY key""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_cdc_apply", cdcApply, Some(cdcApplySql), bench = true),
    NamedQuery("q_upsert", upsertQuery, Some(upsertSql), bench = true),
    NamedQuery("q_scd2", scd2Query, Some(scd2Sql), bench = true),
    NamedQuery("q_scd2_pit", scd2PitQuery, Some(scd2PitSql), bench = true),
    NamedQuery("q_incremental_agg", incrementalAgg, Some(incrementalAggSql),
      bench = true))
}
