package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the operational maintenance job every
  * file-based lake needs: streaming ingest (EventStream.runParquetIngest)
  * and per-batch writes accumulate many small part files, and at 100 TB
  * the resulting per-file open/footer overhead dominates scan time long
  * before the data does.
  *
  * The rewrite targets a byte size per output file, computed from the
  * dataset's actual parquet bytes (marker/checksum files excluded; row
  * counts mislead across table widths). The swap is rename-based:
  * original -> `__old`, compacted -> original, delete `__old`. A crash
  * between the renames leaves the full data intact under exactly one of
  * the two names — recovery is renaming `__old` back; nothing is ever
  * deleted before the compacted copy is fully in place.
  */
object Compact {

  private def walkFiles(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory)
      Option(f.listFiles()).map(_.toSeq.flatMap(walkFiles)).getOrElse(Seq.empty)
    else Seq(f)

  /** Parquet data bytes of a dataset directory (markers/checksums
    * excluded — they'd bias the output-file sizing). */
  def datasetBytes(path: String): Long =
    walkFiles(new java.io.File(path))
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum

  def parquetFileCount(path: String): Int =
    walkFiles(new java.io.File(path)).count(_.getName.endsWith(".parquet"))

  /** Rewrite `path` so each output file is ~`targetFileBytes` of parquet
    * on disk. Returns the new file count. */
  def compact(s: SparkSession, path: String, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    val old = new java.io.File(path + "__old")
    require(!old.exists(),
      s"$old exists — a previous compaction crashed mid-swap; recover it first")
    val bytes = datasetBytes(path)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = path + "__compacting"
    s.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)

    val target = new java.io.File(path)
    require(target.renameTo(old), s"could not move $path aside")
    if (!new java.io.File(tmp).renameTo(target)) {
      // restore the original before failing — nothing is lost
      old.renameTo(target)
      sys.error(s"could not move compacted data into place at $path")
    }
    walkFiles(old).foreach(_.delete())
    def rmDirs(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmDirs))
      f.delete()
    }
    rmDirs(old)
    parquetFileCount(path)
  }
}
