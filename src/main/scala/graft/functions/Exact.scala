package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-independent ("exact") floating-point aggregation.
  *
  * Distributed double sums are order-dependent in the last ulps: Spark's
  * partial/final hash aggregation adds values in partition order, a
  * single-threaded oracle (DuckDB) adds them in scan order, so the raw
  * doubles can disagree in the low bits and any hash-compare flakes.
  *
  * Routing the sum through DECIMAL makes addition associative and exact:
  * the input doubles carry <= `scale` true decimal digits (prices and
  * quantities in the test tables are 2-dp; 2-dp x 2-dp products are 4-dp),
  * so double -> DECIMAL(28,scale) recovers the intended value identically
  * in every engine, the decimal sum is exact, and the final
  * DECIMAL -> DOUBLE cast is deterministic. AVG is expressed as
  * exact-sum / count — a single IEEE division on bit-identical inputs.
  *
  * Cost (measured at sf0.1, 8-agg TPC-H-Q1 shape, 32 cores): the wide
  * sum buffer (28+10 -> capped 38 digits) stores as variable-length
  * bytes in the UnsafeRow and adds via BigDecimal — 1.30s vs 0.22s for
  * raw double sums. The alternatives were measured and rejected:
  *  - narrow decimal (input p<=8, sum buffer p+10<=18 -> compact-long
  *    fast path, 0.61s): caps VALUES at 10^(8-scale) — already exceeded
  *    by re-aggregated measures in this repo (per-customer spend sums
  *    ~1.5e6 > 1e6), and a breach nulls the whole group silently;
  *  - scaled-long sums (0.53s): sum(round(c*10^s) as long) overflows by
  *    silent WRAPAROUND (no ANSI-off check on long sums) at ~9e(18-s) —
  *    a 100 TB 6dp money sum sits within 100x of that cliff.
  * A wrong-but-plausible total on a 1000-executor run is the worst
  * failure mode a pipeline can have, so the wide buffer stays the
  * default; the ~1s/query at sf0.1 amortizes against scan + shuffle at
  * real scale, and it buys reproducible results on any partitioning,
  * which matters for a 100 TB pipeline as much as for oracle agreement.
  */
object Exact {
  /** Exact sum of a double column carrying <= `scale` decimal digits. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Exact average: exact sum / non-null count (nulls skipped like AVG). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** Average of an integral column (exact long sum / count). */
  def iavg(c: Column): Column =
    sum(c).cast(DoubleType) / count(c)

  /** DuckDB oracle-SQL spellings of the same three aggregates. */
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(28,$scale))) AS DOUBLE)"
  def sqlDavg(e: String, scale: Int = 2): String =
    s"${sqlDsum(e, scale)}/COUNT($e)"
  def sqlIavg(e: String): String =
    s"CAST(SUM($e) AS DOUBLE)/COUNT($e)"
}
