package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability = one named query over the shared test tables.
  *
  * @param name   key in SparkEntry.queries / oracleSql / BENCH json
  * @param fn     (spark, sfDir) => result DataFrame. Results are
  *               deterministically ordered and every computed column is
  *               aliased identically in `fn` and `oracle`.
  * @param oracle equivalent DuckDB SQL over the same parquet tables;
  *               None for ops with no SQL equivalent (driver then records
  *               a weaker rows-only check; a ScalaTest spec covers them).
  * @param bench  include in the headline Bench run at sf0.1
  * @param streaming true iff `fn` runs a Structured Streaming
  *               AvailableNow lifecycle (readStream → writeStream →
  *               read back). Bench keys the startup/data-wall split and
  *               the data-wall regression gate off this flag — an
  *               explicit per-row declaration, not a name substring, so
  *               a future "q_streamlined_x" batch head can't silently
  *               opt into stream-gate semantics (round-11 advisor note).
  */
final case class NamedQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false,
    streaming: Boolean = false)
