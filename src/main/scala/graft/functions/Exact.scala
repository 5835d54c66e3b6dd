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
  * Cost: decimal hash-agg instead of double hash-agg — still whole-stage
  * codegen'd, one extra conversion per row; negligible against scan +
  * shuffle at any scale, and it buys reproducible results on a 1000-way
  * cluster (run-to-run stable regardless of partitioning), which matters
  * for a 100 TB pipeline as much as for oracle agreement.
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
