package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  def upsert(existing: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = existing.columns.toIndexedSeq
    require(updates.columns.toIndexedSeq == cols,
      s"schema mismatch: ${cols.mkString(",")} vs ${updates.columns.mkString(",")}")
    require(cols.contains(key), s"key '$key' not in schema")
    val e = existing.select(cols.map(c => col(c).as(s"__e_$c")): _*)
    val u = updates.select(cols.map(c => col(c).as(s"__u_$c")): _*)
    e.join(u, col(s"__e_$key") === col(s"__u_$key"), "full_outer")
      .select(cols.map { c =>
        when(col(s"__u_$key").isNotNull, col(s"__u_$c"))
          .otherwise(col(s"__e_$c")).as(c)
      }: _*)
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

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_upsert", upsertQuery, Some(upsertSql), bench = true))
}
