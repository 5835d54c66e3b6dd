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
  /** `events.ts` normalizes to a microsecond TimestampType (LTZ, session
    * TZ pinned UTC) column regardless of how the fixture was written —
    * driver generations have shipped it both as Parquet TIMESTAMP(NANOS)
    * (read as an epoch-nanos long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) and as TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ). Branching on the LOADED type keeps every
    * downstream `unix_micros(ts)` identical across generations. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (s.conf.getOption(key).forall(_ != "true")) s.conf.set(key, "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer DIV, not `/1000` — epoch NANOS (~1.7e18) exceeds a
        // double's 53-bit integer range, so float division can land ±1µs
        // off the truncated value DuckDB's epoch_us computes
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // NTZ micros reinterpreted in the UTC session zone — bit-identical
        // micros, and DuckDB reads the same file as a plain timestamp
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (used by SQL-entry tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Round-robin spread of a SMALL scan whose expensive per-row
    * expression pipeline would otherwise run inside a single-task scan
    * stage. The fixture tables are single-file, SINGLE-ROW-GROUP parquet
    * (measured round 13), so `spark.sql.files.maxPartitionBytes` cannot
    * split them — a CPU-heavy fused pipeline (shingle hashing, gram
    * contributions, JL dot products) then serializes on one core while
    * the other 31 idle. The spread only fires when the scan has FEWER
    * partitions than the session's parallelism — at production scale the
    * scan partition count exceeds the cap and the frame passes through
    * untouched, so no 100 TB corpus is ever round-robin-shuffled by
    * this. Row order is not semantics for any caller (every head
    * aggregates and/or sorts its output). */
  def spread(df: DataFrame): DataFrame = {
    val cap = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= cap) df else df.repartition(cap)
  }
}
