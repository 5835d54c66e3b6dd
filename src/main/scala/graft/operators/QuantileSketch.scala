package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGEABLE QUANTILE SKETCH — the missing member of the sketch family
  * (frequency = q_cms, cardinality = KMV/HLL, membership = bloom, heavy
  * hitters = Misra-Gries; quantiles = HERE), in the same deterministic
  * integer doctrine: md5-lower-64 hashing (= DuckDB `md5_number_lower`),
  * integer arithmetic only, and a full SQL oracle replay so a one-bit
  * drift anywhere hash-fails.
  *
  * Design: a KLL-SHAPED LEVEL SAMPLER with hash-deterministic level
  * assignment instead of KLL's coin-flip compaction. Each row's 63-bit
  * key hash h places it at geometric level `floor(log2 h)`; the sketch
  * keeps exactly the rows under a POWER-OF-TWO threshold 2^b, where b is
  * the largest exponent keeping ≤ K rows. That is a uniform row sample
  * at rate 2^(b-63) (so multiplicities are handled — every ROW is
  * sampled independently by its own key, not per distinct value), and
  * the empirical quantiles of the kept rows estimate the population
  * quantiles with the O(1/√K) error of KLL's sampler levels.
  *
  * What the hash-threshold buys over real KLL/t-digest (both of which
  * are insertion-order- and merge-order-dependent): an EXACT,
  * ORDER-INDEPENDENT MERGE LAW —
  *
  *     sketch(A ∪ B) = prune(kept(A) ∪ kept(B))
  *
  * bit-for-bit, because (1) thresholds only shrink under merge
  * (b* ≤ min(bA, bB): each side's data is a subset of the union, so the
  * union's count at any threshold is ≥ each side's, and each side chose
  * its b maximally), and (2) below min(bA, bB) both kept sets are
  * COMPLETE, so the union retains every row the from-scratch sketch
  * would keep. That makes it a true distributed/streaming state
  * primitive: per-partition sketches, per-batch sketches, and the
  * global batch sketch all converge to the same bytes — asserted by
  * KllSpec and by `q_stream_kll`'s oracle being the plain batch SQL.
  * (KLL proper is ~4x tighter in space for the same ε; the trade is
  * deliberate and documented — reproducibility and mergeability are
  * what a 100 TB multi-engine pipeline audits against.)
  *
  * Scale shape: hashing and level assignment are codegen'd map-side
  * work; threshold selection aggregates a ≤63-row LEVEL HISTOGRAM
  * (map-side combine into 63 groups — never a corpus-scale sort or a
  * global row_number over the data); the kept sample is ≤ K rows by
  * construction, and everything downstream of the threshold filter
  * (ranking, percentile picks) runs on that K-row frame. One full scan,
  * one 63-row shuffle, one ≤K-row shuffle.
  */
object QuantileSketch {
  import graft.functions.TextFunctions

  /** Batch sketch capacity: kept-sample bound. 4096 rows ⇒ ~1.6%
    * standard error on mid quantiles — and a sketch that is ~64 KB of
    * (long, long) regardless of input size. */
  val KllK = 4096
  /** Streaming per-key capacity (state-store resident, so smaller; at
    * the fixture scales this also makes the pruning branch BIND — ~2k
    * events/type at sf0.01 vs K=256 — while sf0.001's ~200/type keeps
    * the exact small-sketch branch driver-visible). */
  val KllStreamK = 256
  /** Reported percentiles. */
  val KllPcts = Seq(1, 25, 50, 75, 90, 99)

  /** 63-bit nonnegative row hash — the KMV doctrine byte-for-byte:
    * md5-lower-64 of a seeded key string, sign-masked. */
  private def rowHash(key: org.apache.spark.sql.Column) =
    TextFunctions.md5Lower64(concat(lit("kll:"), key.cast("string")))
      .bitwiseAND(lit(Long.MaxValue))

  /** floor(log2 h) via bit-smear + popcount — exact INTEGER arithmetic
    * on both engines (log2-on-doubles rounds differently near powers of
    * two; bit ops cannot). h = 0 pins to level 0. Spelled as chained
    * lateral columns s1..s6 so the oracle SQL reads the same shape. */
  private def withLvl(df: DataFrame): DataFrame = df
    .withColumn("s1", expr("h | shiftright(h, 1)"))
    .withColumn("s2", expr("s1 | shiftright(s1, 2)"))
    .withColumn("s3", expr("s2 | shiftright(s2, 4)"))
    .withColumn("s4", expr("s3 | shiftright(s3, 8)"))
    .withColumn("s5", expr("s4 | shiftright(s4, 16)"))
    .withColumn("s6", expr("s5 | shiftright(s5, 32)"))
    .withColumn("lvl", expr("greatest(bit_count(s6) - 1, 0)"))
    .drop("s1", "s2", "s3", "s4", "s5", "s6")

  private def lvlSqlCols: String =
    """h | (h >> 1) AS s1,
      |    s1 | (s1 >> 2) AS s2,
      |    s2 | (s2 >> 4) AS s3,
      |    s3 | (s3 >> 8) AS s4,
      |    s4 | (s4 >> 16) AS s5,
      |    s5 | (s5 >> 32) AS s6,
      |    greatest(bit_count(s6) - 1, 0) AS lvl""".stripMargin

  // ------------------------------------------------------ q_kll_quantiles
  // audited-global-window(q_kll_quantiles): both windows are bounded by
  // construction — the cum window runs over the ≤63-row level histogram,
  // the rank window over the ≤KllK-row kept sample.
  // audited-bnlj(q_kll_quantiles): 1-row threshold/stat frames (and the
  // 6-row percentile axis) crossed back onto bounded frames.
  /** Sketch-estimated percentiles of event value cents: the kept-sample
    * row, its threshold exponent, and the Horvitz-Thompson total
    * estimate n_kept · 2^(63−b) next to the exact row count — when the
    * sketch isn't full (n ≤ K, e.g. sf0.001) b pins to 63 and the
    * estimates are EXACT, the small-sketch branch KMV also keeps
    * driver-visible. */
  private def kllQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = KllK
    val hashed = withLvl(Tables.events(s, dir).select(
      round($"value" * 100).cast("long").as("v"),
      rowHash($"event_id").as("h")))
    val levels = hashed.groupBy($"lvl").agg(count(lit(1)).as("c"))
    val cum = levels.withColumn("cum",
      sum($"c").over(Window.orderBy($"lvl")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // b = largest exponent with ≤ K rows under 2^b: the max qualifying
    // HISTOGRAM level + 1 (thresholds between present levels keep the
    // same rows; the canonical choice is the smallest such threshold,
    // which the merge law and the incremental pruner both re-derive)
    val bRow = cum.agg(sum($"c").as("n_total"),
        max(when($"cum" <= k, $"lvl")).as("maxq"))
      .select(
        when($"n_total" <= k, lit(63))
          .otherwise(coalesce($"maxq" + 1, lit(1))).cast("int").as("b"),
        $"n_total")
    val kept = hashed.crossJoin(broadcast(bRow))
      .filter($"h" <= when($"b" >= 63, lit(Long.MaxValue))
        .otherwise(expr("shiftleft(CAST(1 AS BIGINT), b) - 1")))
      .select($"v", $"h", $"b", $"n_total")
    val ranked = kept.withColumn("r",
      row_number().over(Window.orderBy($"v", $"h")))
    val stats = kept.agg(count(lit(1)).as("n_kept"))
    val targets = KllPcts.toDF("pct")
      .crossJoin(broadcast(stats))
      .select($"pct", $"n_kept",
        expr("(pct * n_kept + 99) DIV 100").as("tr"))
    targets.join(ranked, $"tr" === $"r")
      .select($"pct".cast("int").as("pct"),
        $"v".cast("long").as("est_v"),
        $"n_kept".cast("long").as("n_kept"),
        $"b".cast("int").as("lvl_b"),
        expr("shiftleft(n_kept, 63 - b)").cast("long").as("est_total"),
        $"n_total".cast("long").as("n_total"))
      .orderBy($"pct")
  }

  private def kllSqlPrefix(k: Int, perType: Boolean): String = {
    val key = if (perType) "event_type, " else ""
    val part = if (perType) "PARTITION BY event_type " else ""
    val joinB = if (perType) "JOIN b ON l.event_type = b.event_type"
      else "CROSS JOIN b"
    s"""hashed AS (
       |  SELECT ${key}CAST(round(value * 100) AS BIGINT) AS v,
       |    CAST(md5_number_lower('kll:' || CAST(event_id AS VARCHAR))
       |      & ${Long.MaxValue}::UBIGINT AS BIGINT) AS h
       |  FROM events),
       |lv AS (
       |  SELECT ${key}v, h,
       |    $lvlSqlCols
       |  FROM hashed),
       |levels AS (
       |  SELECT ${key}lvl, COUNT(*) AS c FROM lv GROUP BY ALL),
       |cum AS (
       |  SELECT ${key}lvl, c,
       |    SUM(c) OVER (${part}ORDER BY lvl ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM levels),
       |b AS (
       |  SELECT ${key}CASE WHEN SUM(c) <= $k THEN 63
       |    ELSE COALESCE(MAX(CASE WHEN cum <= $k THEN lvl END) + 1, 1) END AS b,
       |    SUM(c) AS n_total
       |  FROM cum${if (perType) " GROUP BY event_type" else ""}),
       |kept AS (
       |  SELECT ${if (perType) "l.event_type, " else ""}l.v, l.h, b.b, b.n_total
       |  FROM lv l $joinB
       |  WHERE l.h <= CASE WHEN b.b >= 63 THEN ${Long.MaxValue}
       |               ELSE (CAST(1 AS BIGINT) << b.b) - 1 END),
       |ranked AS (
       |  SELECT ${key}v, b, n_total,
       |    ROW_NUMBER() OVER (${part}ORDER BY v, h) AS r,
       |    COUNT(*) OVER (${part.trim.stripSuffix(" ")}) AS n_kept
       |  FROM kept)""".stripMargin
  }

  private val kllQuantilesSql =
    s"""WITH ${kllSqlPrefix(KllK, perType = false)}
       |SELECT CAST(p.pct AS INTEGER) AS pct, CAST(rk.v AS BIGINT) AS est_v,
       |  CAST(rk.n_kept AS BIGINT) AS n_kept, CAST(rk.b AS INTEGER) AS lvl_b,
       |  CAST(rk.n_kept << (63 - rk.b) AS BIGINT) AS est_total,
       |  CAST(rk.n_total AS BIGINT) AS n_total
       |FROM (SELECT UNNEST([${KllPcts.mkString(", ")}]) AS pct) p
       |JOIN ranked rk ON rk.r = (p.pct * rk.n_kept + 99) // 100
       |ORDER BY pct""".stripMargin

  /** Per-type batch replay of the STREAMING sibling: because the merge
    * law is exact, the final per-key state after any AvailableNow batch
    * split equals the from-scratch batch sketch — so the oracle for
    * `q_stream_kll` is plain batch SQL with no batch-boundary modeling. */
  val streamKllSql: String =
    s"""WITH ${kllSqlPrefix(KllStreamK, perType = true)}
       |SELECT rk.event_type, CAST(p.pct AS INTEGER) AS pct,
       |  CAST(rk.v AS BIGINT) AS est_v,
       |  CAST(rk.n_kept AS BIGINT) AS n_kept, CAST(rk.b AS INTEGER) AS lvl_b,
       |  CAST(rk.n_kept << (63 - rk.b) AS BIGINT) AS est_total,
       |  CAST(rk.n_total AS BIGINT) AS n_total
       |FROM (SELECT UNNEST([${KllPcts.mkString(", ")}]) AS pct) p
       |JOIN ranked rk ON rk.r = (p.pct * rk.n_kept + 99) // 100
       |ORDER BY event_type, pct""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_kll_quantiles", kllQuantiles, Some(kllQuantilesSql),
      bench = true))
}

/** Pure-Scala twin of the sketch algebra, shared by the streaming
  * processor and KllSpec's merge-law assertions. Every rule mirrors the
  * SQL spelling exactly (same level function, same threshold rule, same
  * rank arithmetic) — the two implementations are hash-compared through
  * `q_stream_kll`'s batch-SQL oracle. */
object KllImpl {
  /** floor(log2 h), h = 0 → 0 — numberOfLeadingZeros is the JVM's exact
    * integer form of the oracle's bit-smear + popcount. */
  def lvl(h: Long): Int =
    if (h <= 0L) 0 else 63 - java.lang.Long.numberOfLeadingZeros(h)

  /** Rows kept under exponent b: h ≤ mask(b). */
  def mask(b: Int): Long = if (b >= 63) Long.MaxValue else (1L << b) - 1

  /** The threshold rule on a (complete-below-2^bCap) item multiset:
    * b = 63 while the sketch isn't full; else the max qualifying
    * histogram level + 1, never above bCap (levels ≥ bCap are
    * incomplete in the incremental/merge path and must not qualify —
    * below bCap the counts are exact, which is why the incremental
    * result equals the from-scratch batch sketch). */
  def chooseB(hs: Iterable[Long], nTotal: Long, bCap: Int, k: Int): Int = {
    if (nTotal <= k) 63
    else {
      val counts = new Array[Long](64)
      hs.foreach(h => counts(lvl(h)) += 1)
      var cum = 0L
      var best = -1
      var l = 0
      while (l < bCap && l < 63) {
        cum += counts(l)
        if (counts(l) > 0 && cum <= k) best = l
        l += 1
      }
      math.min(if (best < 0) 1 else best + 1, bCap)
    }
  }

  /** prune(items ∪ …) — the merge/insert step: re-derive b on the
    * union (capped by the incoming completeness bound) and drop rows
    * above the new mask. Order-independent and exact (see the operator
    * scaladoc's merge-law argument). */
  def prune(items: Seq[(Long, Long)], nTotal: Long, bCap: Int, k: Int)
      : (Int, Seq[(Long, Long)]) = {
    val b = chooseB(items.map(_._1), nTotal, bCap, k)
    val m = mask(b)
    (b, items.filter(_._1 <= m))
  }

  /** Percentile rows from a kept sample: the ⌈pct·n/100⌉-th smallest
    * value under (v, h) order — the SQL rank arithmetic verbatim. */
  def quantiles(kept: Seq[(Long, Long)], pcts: Seq[Int])
      : Seq[(Int, Long)] = {
    val sorted = kept.sortBy(t => (t._2, t._1)).map(_._2).toIndexedSeq
    val n = sorted.length.toLong
    if (n == 0) Seq.empty
    else pcts.map { p => (p, sorted(((p * n + 99) / 100).toInt - 1)) }
  }
}
