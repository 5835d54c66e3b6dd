package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  * One parquet file per table under `\$sfDir/`. All queries read through
  * here so scans stay uniform (vectorized parquet reader, pushdown-able).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is Parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default — read it as an epoch-nanos long and convert to a microsecond
    * TimestampType column (hour-level bucketing is unaffected). Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true`: pinned in the in-repo
    * session builders (Verify/Bench/SparkSpec), and set here once for
    * externally built sessions (guarded — no repeated conf mutation). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (s.conf.getOption(key).forall(_ != "true")) s.conf.set(key, "true")
    // integer DIV, not `/1000` — epoch NANOS (~1.7e18) exceeds a double's
    // 53-bit integer range, so float division can land ±1µs off the
    // truncated value DuckDB's epoch_us computes
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (used by SQL-entry tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
