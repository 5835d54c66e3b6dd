package graft.streaming

import org.apache.spark.sql.SparkSession

/** Input-size-derived state partitioning for streaming queries — the
  * stateful-stream analogue of AQE partition coalescing (guide §2.2/§2.5
  * of the optimization playbook).
  *
  * Spark DISABLES AQE for stateful streaming workloads ("Disabling AQE
  * since AQE is not supported in stateful workloads"), so a streaming
  * query's keyed exchanges — and, more expensively, its STATE STORES —
  * are laid out with exactly `spark.sql.shuffle.partitions` partitions,
  * fixed at query start and pinned into the checkpoint for the query's
  * whole life. Every state partition is a real per-batch cost with or
  * without data: a store instance (HDFSBackedStateStoreProvider map +
  * delta file, or a whole RocksDB instance for transformWithState),
  * a load/commit cycle per micro-batch, a snapshot/maintenance task,
  * and a fetch-side shuffle block. A stream-stream join multiplies it
  * by FOUR stores per partition. Measured round 12 at sf0.1/local[32]
  * (isolated, min-of-2, same host, same harness):
  * q_stream_interval_join 13.2 s at 32 state partitions vs 3.0 s at 2;
  * the left/full outer variants 11.4/12.3 s → 2.7/3.0 s — the
  * partition-count term IS the AvailableNow wall at small input.
  *
  * So: derive the state partition count from the INPUT SIZE, exactly
  * how AQE would size a batch exchange — `ceil(inputBytes / target)`,
  * clamped to [1, spark.sql.shuffle.partitions]. The cap keeps the
  * cluster-parallelism contract (never MORE partitions than the session
  * is configured to fan out to — at 100 TB the cap binds and the layout
  * is identical to today's); the floor-by-size keeps a 2 MB fixture (or
  * a trickle topic) from paying 32 store lifecycles per batch for rows
  * that fit in one. `spark.graft.stream.bytesPerStatePartition`
  * (default 64 MB) is the target; it is a SIZE rule, not a core-count
  * constant, so the same code picks 1 partition for a 2 MB replay and
  * `shuffle.partitions` for any input past cap × 64 MB — scale-adaptive
  * by construction, per the round-12 optimization contract.
  *
  * State-partition count does not affect results: keyed state is
  * partitioned by key hash, every key's rows still meet in exactly one
  * partition, and all registered streaming heads order their output.
  * Restart lifecycles are safe by Spark's own contract: the count is
  * pinned in the checkpoint's offset-log metadata, so lifecycle 2
  * reuses lifecycle 1's layout no matter what this helper computes. */
object StreamTune {
  val BytesPerPartitionKey = "spark.graft.stream.bytesPerStatePartition"
  val DefaultBytesPerPartition: Long = 64L << 20

  /** Total bytes under `path` (file or directory), -1 if unreadable —
    * callers treat a negative probe as "unknown" and fall back to the
    * session's configured parallelism (partitions = cap, today's
    * behavior). NonFatal, not just IOException: a malformed path string
    * throws from Path/getFileSystem before any I/O happens, and an
    * unprobeable source must degrade, not crash the query. */
  def inputBytes(s: SparkSession, path: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    } catch { case scala.util.control.NonFatal(_) => -1L }

  /** ceil(bytes / bytesPerStatePartition) clamped to
    * [1, spark.sql.shuffle.partitions]. */
  def statePartitions(s: SparkSession, path: String): Int = {
    val cap = s.conf.get("spark.sql.shuffle.partitions").toInt
    val bytes = inputBytes(s, path)
    if (bytes < 0) cap
    else {
      val target = s.conf.getOption(BytesPerPartitionKey)
        .map(_.toLong).getOrElse(DefaultBytesPerPartition)
      math.max(1, math.min(cap.toLong,
        (bytes + target - 1) / target)).toInt
    }
  }

  /** Run `body` (build + start + drain one streaming lifecycle over the
    * source at `path`) with `spark.sql.shuffle.partitions` set to the
    * input-sized state partition count, restoring the session value
    * after — the conf is only read at query START, so the wrap can't
    * leak into later batch plans even without the restore, but the
    * restore keeps the session invariant for the next head. */
  def sized[T](s: SparkSession, path: String)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, statePartitions(s, path).toString)
    try body finally s.conf.set(key, prev)
  }

  private val RocksKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** transformWithState requires the RocksDB provider; set it for the
    * lifecycle and RESTORE the previous provider after. Before round 12
    * the TWS heads set it session-wide and never unset it, so every
    * NON-TWS streaming head that ran later in the session (bench pass 2,
    * the startup probes, Verify's later rows) silently paid a RocksDB
    * instance per state partition where the default HDFS-backed map
    * would do — cross-head config contamination, not a modeled cost.
    *
    * Changelog checkpointing rides the same scope: per micro-batch
    * commit RocksDB then uploads the batch's delta instead of a full
    * snapshot (snapshots move to background maintenance) — a recovery-
    * mechanics knob, not a semantics one, and the documented production
    * setting for commit-latency-sensitive RocksDB state. Scoped +
    * restored like the provider so non-TWS heads keep defaults. */
  def withRocksDB[T](s: SparkSession)(body: => T): T = {
    val prev = s.conf.getOption(RocksKey)
    val prevCl = s.conf.getOption(ChangelogKey)
    s.conf.set(RocksKey, RocksProvider)
    s.conf.set(ChangelogKey, "true")
    try body finally {
      prev match {
        case Some(v) => s.conf.set(RocksKey, v)
        case None => s.conf.unset(RocksKey)
      }
      prevCl match {
        case Some(v) => s.conf.set(ChangelogKey, v)
        case None => s.conf.unset(ChangelogKey)
      }
    }
  }
}
