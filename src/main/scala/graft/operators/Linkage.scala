package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage: blocked fuzzy matching of a dirty entity table
  * against a clean reference — the classic entity-resolution shape
  * (dedupe customer lists, reconcile vendor feeds, match scraped names
  * to a catalog).
  *
  * Scale design (100 TB):
  *  - candidate generation is an EQUI-join on a deterministic blocking
  *    key — the only shuffle; edit distance never runs outside a block,
  *    so cost is Σ |dirty_block|·|clean_block|, not |dirty|·|clean|;
  *  - the verify step is codegen'd `levenshtein` on the candidate pairs
  *    only, followed by a per-dirty-row window to keep the single best
  *    match (min distance, then min reference id — a total order);
  *  - unmatched rows survive via a left join against the winners: a
  *    blocking miss is visible in the output as a NULL match, never a
  *    silently dropped row. Blocking recall is the operator's knob —
  *    tighter keys cut cost, looser keys cut misses; both engines see
  *    the same key so the oracle pins whichever trade the caller made.
  */
object Linkage {

  /** Best fuzzy match per dirty row: equi-join on `block`, verify with
    * levenshtein <= maxDist, keep the (distance, ref id) minimum; dirty
    * rows with no candidate within budget emit NULL matches.
    *
    * Inputs must carry (id, name, block) columns with the given names.
    */
  def fuzzyJoin(dirty: DataFrame, clean: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 8,
      s"maxDist must be in [0, 8], got $maxDist — a loose verify budget " +
        "turns blocking misses into wrong matches instead of NULLs")
    val cand = dirty
      .join(clean
          .withColumnRenamed("id", "match_id")
          .withColumnRenamed("name", "match_name"),
        Seq("block"))
      .withColumn("dist", levenshtein(col("dirty_name"), col("match_name")))
      .filter(col("dist") <= maxDist)
    val wBest = Window.partitionBy(col("dirty_id"))
      .orderBy(col("dist"), col("match_id"))
    val best = cand
      .withColumn("__rk", row_number().over(wBest))
      .filter(col("__rk") === 1)
      .select(col("dirty_id"), col("match_id"), col("match_name"), col("dist"))
    dirty.select(col("dirty_id"), col("dirty_name"))
      .join(best, Seq("dirty_id"), "left")
  }

  // ------------------------------------------------------------------ q_fuzzy_join
  /** Customers re-matched from a deterministically corrupted copy of
    * their own names: every name gets OCR-style noise (o -> 0), every
    * 5th additionally a leading stray character (distance 2), every 7th
    * a corrupted tail digit — which changes the blocking key, so those
    * rows MUST surface as unmatched NULLs (the honest failure mode of
    * blocked linkage). Blocking key = last 6 name characters (the
    * discriminative digit tail). */
  val FuzzyMaxDist = 2

  private def dirtyCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir).select(
      $"c_custkey".as("dirty_id"),
      when($"c_custkey" % 7 === 0,
          concat(substring($"c_name", 1, 17), lit("X")))
        .when($"c_custkey" % 5 === 0,
          concat(lit("Z"), translate($"c_name", "o", "0")))
        .otherwise(translate($"c_name", "o", "0"))
        .as("dirty_name"))
      .withColumn("block", substring($"dirty_name", -6, 6))
  }

  private def fuzzyJoinQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val clean = Tables.customer(s, dir)
      .select($"c_custkey".as("id"), $"c_name".as("name"))
      .withColumn("block", substring($"name", -6, 6))
    fuzzyJoin(dirtyCustomers(s, dir), clean, FuzzyMaxDist)
      .orderBy($"dirty_id")
  }

  private val fuzzyJoinSql =
    s"""WITH dirty AS (
       |  SELECT c_custkey AS dirty_id,
       |    CASE
       |      WHEN c_custkey % 7 = 0 THEN substring(c_name, 1, 17) || 'X'
       |      WHEN c_custkey % 5 = 0 THEN 'Z' || replace(c_name, 'o', '0')
       |      ELSE replace(c_name, 'o', '0')
       |    END AS dirty_name
       |  FROM customer),
       |db AS (SELECT dirty_id, dirty_name, dirty_name[-6:] AS block FROM dirty),
       |clean AS (
       |  SELECT c_custkey AS id, c_name AS name, c_name[-6:] AS block
       |  FROM customer),
       |cand AS (
       |  SELECT db.dirty_id, db.dirty_name, clean.id AS match_id,
       |    clean.name AS match_name,
       |    levenshtein(db.dirty_name, clean.name) AS dist
       |  FROM db JOIN clean USING (block)
       |  WHERE levenshtein(db.dirty_name, clean.name) <= $FuzzyMaxDist),
       |best AS (
       |  SELECT dirty_id, match_id, match_name, dist,
       |    ROW_NUMBER() OVER (PARTITION BY dirty_id
       |                       ORDER BY dist, match_id) AS rk
       |  FROM cand)
       |SELECT db.dirty_id, db.dirty_name, b.match_id, b.match_name,
       |  CAST(b.dist AS INT) AS dist
       |FROM db LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (dirty_id)
       |ORDER BY db.dirty_id""".stripMargin

  // --------------------------------------------------------- q_sorted_neighborhood
  /** Sorted-neighborhood record linkage — the BLOCK-FREE complement to
    * q_fuzzy_join's equi-blocking: sort all records by a key, candidate
    * pairs are the records within `SnmWindow` ranks of each other, verify
    * on the candidates only. The method of choice when no clean blocking
    * key exists; cost is n·w pairs instead of Σ block².
    *
    * Scale shape: the global sort rank comes from Corpus.globalIndex
    * (range repartition + per-partition numbering — NO single-task
    * window over the data), pair generation explodes w rank probes per
    * row and equi-joins on rank (id-only rows through the shuffle), and
    * the levenshtein verify runs on candidates only. A corruption can
    * displace a record's sort position — the known SNM weakness, handled
    * in production with multi-pass keys — so the gate's tail corruption
    * is chosen to displace at most `SnmWindow` ranks.
    *
    * Gate: every 10th customer gets a copy (id + PlantOffset) with its
    * name's LAST char overwritten; match rule = levenshtein ≤ 1 AND
    * equal balance (synthetic sibling names also sit at distance 1, so
    * the balance equality is what separates a planted twin from sort
    * neighbors). The oracle replays rank/window/verify from first
    * principles; found=TRUE for every plant is asserted in LinkageSpec. */
  val SnmWindow = 10

  private def sortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    Similarity.requirePlantable(c, "c_custkey", "sortedNeighborhood")
    val P = Similarity.PlantOffset
    val base = c.select($"c_custkey".as("id"), $"c_name".as("name"),
      $"c_acctbal".as("bal"))
    val planted = base.unionByName(
      base.filter($"id" % 10 === 0).select(
        ($"id" + P).as("id"),
        concat(substring($"name", 1, 17), lit("X")).as("name"), $"bal"))
    val ranked = Corpus.globalIndex(planted, "name")
      .select($"global_idx".as("rank"), $"id", $"name", $"bal")
    val probes = ranked.select($"rank", $"id", $"name", $"bal",
        explode(expr(s"sequence(rank + 1, rank + $SnmWindow)")).as("probe"))
    val pairs = probes.join(
        ranked.select($"rank".as("probe"), $"id".as("id_b"),
          $"name".as("name_b"), $"bal".as("bal_b")), Seq("probe"))
      .filter(levenshtein($"name", $"name_b") <= 1 && $"bal" === $"bal_b")
      .select($"id".as("a"), $"id_b".as("b"))
    val hits = pairs
      .filter($"b" === $"a" + P).select($"a".as("id"))
      .unionByName(pairs.filter($"a" === $"b" + P).select($"b".as("id")))
      .distinct()
      .withColumn("__hit", lit(true))
    base.filter($"id" % 10 === 0).select($"id")
      .join(hits, Seq("id"), "left")
      .select($"id", coalesce($"__hit", lit(false)).as("found"))
      .orderBy($"id")
  }

  private val sortedNeighborhoodSql =
    s"""WITH planted AS (
       |  SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal
       |  FROM customer
       |  UNION ALL
       |  SELECT c_custkey + ${Similarity.PlantOffset},
       |    substring(c_name, 1, 17) || 'X', c_acctbal
       |  FROM customer WHERE c_custkey % 10 = 0),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY name) AS rank FROM planted),
       |pairs AS (
       |  SELECT a.id AS a, b.id AS b
       |  FROM ranked a JOIN ranked b
       |    ON b.rank BETWEEN a.rank + 1 AND a.rank + $SnmWindow
       |  WHERE levenshtein(a.name, b.name) <= 1 AND a.bal = b.bal),
       |hits AS (
       |  SELECT a AS id FROM pairs WHERE b = a + ${Similarity.PlantOffset}
       |  UNION
       |  SELECT b FROM pairs WHERE a = b + ${Similarity.PlantOffset})
       |SELECT c_custkey AS id, c_custkey IN (SELECT id FROM hits) AS found
       |FROM customer WHERE c_custkey % 10 = 0
       |ORDER BY id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_fuzzy_join", fuzzyJoinQuery, Some(fuzzyJoinSql), bench = true),
    NamedQuery("q_sorted_neighborhood", sortedNeighborhood,
      Some(sortedNeighborhoodSql), bench = true))
}
