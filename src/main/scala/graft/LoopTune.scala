package graft

import org.apache.spark.sql.SparkSession

/** Loop-scoped execution sizing for ITERATIVE operators — the batch
  * analogue of [[graft.streaming.StreamTune]] (guide §2.2).
  *
  * An iterative resolver (star-CC, label propagation) executes dozens of
  * tiny per-round exchanges whose frames shrink toward the fixed point.
  * Two fixed costs dominate them at small per-round sizes:
  *
  *  - every exchange is laid out at `spark.sql.shuffle.partitions`; AQE
  *    coalesces the post-shuffle side, but the coalescing itself is why
  *    each exchange becomes its OWN job (AQE executes query stages as
  *    separate jobs to re-plan between them) — a 10-round loop ran as 52
  *    jobs of 0.05–0.3 s in the round-13 q_cluster_star profile, with
  *    2.4 s of the 9.4 s wall in inter-job driver/planning gaps;
  *  - per-round re-planning of the same fixed loop body.
  *
  * [[scoped]] runs a loop body (whose eager lineage cuts execute inside
  * it) with shuffle partitions derived from the LOOP STATE SIZE and AQE
  * off, restoring both after. With the exchange count known and tiny,
  * AQE has nothing to re-plan — each round boundary becomes one job with
  * plain sequential stages. The partition count is a size rule
  * (ceil(rowBytes / 8 MB) clamped to [1, shuffle.partitions]), so past
  * cap × 8 MB of state the scope keeps today's layout and only the AQE
  * job-splitting changes; results are partitioning-invariant by the
  * operators' own contracts (keyed aggregations / windows + ordered
  * output).
  */
object LoopTune {
  /** In-memory bytes of loop state per shuffle partition. */
  val BytesPerPartition: Long = 8L << 20

  /** ceil(rows*rowBytes / BytesPerPartition) clamped to
    * [1, spark.sql.shuffle.partitions]. */
  def partitionsForRows(s: SparkSession, rows: Long, rowBytes: Long): Int = {
    val cap = s.conf.get("spark.sql.shuffle.partitions").toInt
    math.max(1L, math.min(cap.toLong,
      (rows * rowBytes + BytesPerPartition - 1) / BytesPerPartition)).toInt
  }

  /** Run `body` with loop-sized shuffle partitions and AQE off,
    * restoring both after. Safe for the same reason StreamTune.sized is:
    * the confs are read at each EXECUTION inside the scope, and the
    * restore keeps the session invariant for the next head. */
  def scoped[T](s: SparkSession, partitions: Int)(body: => T): T = {
    val spKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevSp = s.conf.get(spKey)
    val prevAqe = s.conf.get(aqeKey)
    s.conf.set(spKey, partitions.toString)
    s.conf.set(aqeKey, "false")
    try body
    finally { s.conf.set(spKey, prevSp); s.conf.set(aqeKey, prevAqe) }
  }
}
