package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the operational maintenance job every
  * file-based lake needs: streaming ingest (EventStream.runParquetIngest)
  * and per-batch writes accumulate many small part files, and at 100 TB
  * the resulting per-file open/footer overhead dominates scan time long
  * before the data does.
  *
  * The rewrite targets a byte size per output file, computed from the
  * dataset's actual on-disk footprint (not row counts — row width varies
  * wildly across tables). Compaction is idempotent and crash-safe via
  * write-to-temp + atomic-ish swap: the original directory is replaced
  * only after the compacted copy is fully written.
  */
object Compact {

  /** On-disk bytes of a parquet dataset directory (recursive). */
  def datasetBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(path))
  }

  def parquetFileCount(path: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1
      else 0
    walk(new java.io.File(path))
  }

  /** Rewrite `path` so each output file is ~`targetFileBytes` on disk.
    * Returns the new file count. */
  def compact(s: SparkSession, path: String, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    val bytes = datasetBytes(path)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = path + "__compacting"
    val df: DataFrame = s.read.parquet(path)
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    // swap: remove original, move compacted into place
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(path))
    val moved = new java.io.File(tmp).renameTo(new java.io.File(path))
    require(moved, s"failed to move compacted data into place at $path")
    parquetFileCount(path)
  }
}
