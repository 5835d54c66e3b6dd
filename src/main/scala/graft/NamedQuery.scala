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
  */
final case class NamedQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)
