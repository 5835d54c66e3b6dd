package graft

import org.apache.spark.sql.Dataset

/** The ONE lineage-cut primitive for every iterative operator (pageRank,
  * k-core, label propagation, star-CC, k-means, BPE, incremental dedup,
  * …): cuts the logical plan at a round boundary so plan depth and
  * re-execution windows stay bounded across iterations.
  *
  * Two modes, switched by the session conf `spark.graft.checkpoint.mode`:
  *
  *  - `local` (default): `Dataset.localCheckpoint` — blocks live on
  *    executors, zero distributed-FS traffic, the right choice for
  *    local[32] and for clusters with stable executors. The trade: the
  *    truncated lineage has NO recompute path, so under executor loss or
  *    dynamic-allocation decommission the job FAILS instead of
  *    recomputing. Fine single-JVM; wrong on a preemptible 1000-executor
  *    fleet.
  *  - `reliable`: `Dataset.checkpoint` — blocks go to the reliable
  *    checkpoint directory (`spark.graft.checkpoint.dir`, or
  *    `sparkContext.setCheckpointDir` if already set; HDFS/S3 on a real
  *    cluster). Survives executor loss and preemption — the shape a
  *    100 TB cluster with spot instances needs — at the cost of one
  *    FS write+read per cut. In-sandbox it targets a per-process scratch
  *    dir under java.io.tmpdir that [[Scratch]]'s shutdown sweep removes.
  *
  * Both modes materialize the SAME rows — the cut is a plan boundary,
  * not a semantic operator — so results are bit-identical; the
  * CheckpointModeSpec proves it on the heaviest iterative head
  * (q_pagerank) by running both modes and hash-comparing frames.
  */
object LineageCut {
  val ModeKey = "spark.graft.checkpoint.mode"
  val DirKey = "spark.graft.checkpoint.dir"

  /** Handle for a [[bulkCut]]: `df` reads the written files; `release()`
    * deletes them once a successor frame is materialized (the loop
    * analogue of unpersisting a superseded block cut). Unreleased dirs
    * die with the process (Scratch's `_p<pid>` shutdown sweep) or, for
    * a custom reliable dir, with the operator's checkpoint-bucket TTL. */
  final case class BulkCut(df: org.apache.spark.sql.DataFrame, path: String) {
    def release(): Unit = Scratch.deleteTree(java.nio.file.Paths.get(path))
  }

  private val bulkSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** COLUMNAR lineage cut for EDGE-SCALE iterative frames: write the
    * frame as parquet into a fresh scratch dir and read it back — a
    * true cut (the new plan is a parquet scan) whose materialization is
    * a columnar encode + vectorized decode instead of the block-cut's
    * per-row `UnsafeRow.copy` + Java-serialized cache blocks.
    *
    * Why this exists (round 12, q_kcore_converged third decade): at a
    * synthetic-sf10 100M-row edge frame, `localCheckpoint` spent 211 s
    * per cut — ~6 GB of transient row copies and 59 s of GC — and even
    * MEMORY_AND_DISK_SER still paid the copy + ObjectStream per row
    * (50–85 s). The same frame parquet-encodes in a fraction of that
    * and reads back vectorized, and the cost scales with BYTES, not
    * OBJECTS. The trade: a fixed write+read+listing latency (~0.3 s)
    * that a node-scale frame would feel — which is why the default
    * [[CutOps.lineageCut]] stays block-based and only the edge-scale
    * loops opt in.
    *
    * Mode-aware like the block cut: `local` targets java.io.tmpdir
    * scratch (single-JVM); `reliable` targets the checkpoint dir — the
    * files ARE the executor-loss-safe copy, same contract as
    * `Dataset.checkpoint` with a better format. */
  def bulkCut(df: org.apache.spark.sql.DataFrame): BulkCut = {
    val spark = df.sparkSession
    val base = spark.conf.get(ModeKey, "local") match {
      case "reliable" => spark.conf.getOption(DirKey).getOrElse(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
          s"graft_ckpt_p${Scratch.processToken}").toString)
      case _ => System.getProperty("java.io.tmpdir")
    }
    val dir = java.nio.file.Paths.get(base,
      s"graft_bulkcut${bulkSeq.incrementAndGet()}_p${Scratch.processToken}")
      .toString
    df.write.mode("overwrite").parquet(dir)
    BulkCut(spark.read.parquet(dir), dir)
  }

  implicit class CutOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Mode-routed lineage cut; `eager = true` materializes now (a
      * blocking job), the round-boundary default everywhere.
      *
      * `ser = true` stores the cut blocks SERIALIZED
      * (MEMORY_AND_DISK_SER) instead of the deserialized default — the
      * right trade ONLY for edge-scale frames read once or twice, where
      * materializing every row as its own heap object is the cost (the
      * round-12 sf10 measurement: ~6 GB of UnsafeRow copies, a 211 s
      * cut stage with 59 s GC). Round 12 made _SER the unconditional
      * storage level and every NODE-SCALE iterative cut paid a
      * deserialize-on-scan tax per round for negligible memory relief —
      * the driver measured q_label_prop 0.65x, q_kmeans 0.56x,
      * q_random_walk 0.80x, q_semdedup 0.73x, q_triangle_count 0.67x
      * with zero code change in those operators (VERDICT r12 #2). The
      * storage level is therefore PER-CALLSITE, deserialized by default
      * (the round-11 behavior those medians come from); frames big
      * enough for _SER to win are better served by the columnar
      * [[LineageCut.bulkCut]], which is where the round-12 edge-scale
      * loops went. */
    def lineageCut(eager: Boolean = true, ser: Boolean = false): Dataset[T] = {
      val spark = ds.sparkSession
      val level =
        if (ser) org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
        else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      spark.conf.get(ModeKey, "local") match {
        case "reliable" =>
          val sc = spark.sparkContext
          if (sc.getCheckpointDir.isEmpty) {
            val dir = spark.conf.getOption(DirKey).getOrElse {
              // _p<pid> suffix joins Scratch's shutdown-sweep contract
              java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
                s"graft_ckpt_p${Scratch.processToken}").toString
            }
            sc.setCheckpointDir(dir)
          }
          // checkpoint-computes-twice: Dataset.checkpoint runs the plan
          // once for the eager materialization and AGAIN when the RDD
          // checkpoint machinery writes the files at job end — unless
          // the rows are already cached. Persist first so the write
          // pass reads cached blocks, then drop the cache once the
          // checkpoint files exist (they carry the data from here on).
          // Trade-off note: checkpoint files accumulate until process
          // exit unless spark.cleaner.referenceTracking.cleanCheckpoints
          // is enabled (off by default); in-sandbox the Scratch shutdown
          // sweep removes the per-process dir, and on a real cluster
          // the conf flag (or a TTL'd checkpoint bucket) is the
          // operator's disk-growth control.
          val cached = ds.persist(level)
          val out = cached.checkpoint(eager)
          if (eager) cached.unpersist(blocking = false)
          out
        case _ => ds.localCheckpoint(eager, level)
      }
    }
  }
}
