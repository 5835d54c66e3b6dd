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

  implicit class CutOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Mode-routed lineage cut; `eager = true` materializes now (a
      * blocking job), the round-boundary default everywhere. */
    def lineageCut(eager: Boolean = true): Dataset[T] = {
      val spark = ds.sparkSession
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
          val cached = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val out = cached.checkpoint(eager)
          if (eager) cached.unpersist(blocking = false)
          out
        case _ => ds.localCheckpoint(eager)
      }
    }
  }
}
