package graft

import org.apache.spark.sql.SparkSession

/** The ONE SparkSession recipe for every entry point (Verify, Bench,
  * Explain, tests). The driver-contract semantics pins live here and
  * nowhere else:
  *  - ANSI off — reference semantics (SURVEY.md §1.2): null-on-bad-cast,
  *    no div-by-zero error; pandas/Postgres-tolerant, oracle uses TRY_CAST;
  *  - UTC session timezone — oracle (DuckDB) compares timestamps in UTC;
  *  - nanosAsLong — events.parquet carries TIMESTAMP(NANOS), which
  *    Spark 4 only reads with the legacy flag;
  *  - shuffle.partitions sized to cores (not the 200 default) for the
  *    local[32] harness.
  */
object GraftSession {
  /** Cores from the driver env, default 32 (the documented harness). */
  def envCpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def create(appName: String, cpus: Int = envCpus,
             adaptive: Boolean = true,
             shufflePartitions: Option[Int] = None): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // default: sized to cores (cpus tracks SPARK_GRAFT_CPUS, so the
      // driver's low-core scaling runs shrink it too); the env override
      // exists for isolated measurement sweeps only — the driver never
      // sets it
      .config("spark.sql.shuffle.partitions",
        shufflePartitions
          .orElse(sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.toInt))
          .getOrElse(cpus).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", adaptive.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // lineage-cut mode (LineageCut.ModeKey): env-selectable so the
      // bench harness can measure the reliable-checkpoint tax without a
      // code change — SPARK_GRAFT_CHECKPOINT_MODE=reliable
      .config(LineageCut.ModeKey,
        sys.env.getOrElse("SPARK_GRAFT_CHECKPOINT_MODE", "local"))
      .getOrCreate()
    // native-expression SQL names (graft_*) available in every entry
    // point, not just sessions that ran the registry spec; idempotent
    // (re-registration overwrites with identical builders)
    graft.functions.GraftFunctionRegistry.register(s)
    s
  }
}
