package graft

import java.nio.file.Files
import graft.operators.Compact

/** Compaction: many small files in, few right-sized files out, data
  * byte-identical. */
class CompactSpec extends GraftSuite {

  test("compaction collapses a fragmented dataset without changing its rows") {
    val dir = Files.createTempDirectory("graft_compact").toFile
    try {
      val path = dir.getAbsolutePath + "/orders"
      // fragment: 20 small part files
      Tables.orders(spark, sf).repartition(20).write.parquet(path)
      assert(Compact.parquetFileCount(path) == 20)
      val before = canon(spark.read.parquet(path))
      val bytes = Compact.datasetBytes(path)

      val n = Compact.compact(spark, path, targetFileBytes = bytes / 2)
      assert(n <= 3, s"expected ~2 files after compaction, got $n")
      assert(Compact.parquetFileCount(path) == n)
      assert(canon(spark.read.parquet(path)) == before, "compaction must not alter data")
      // no leftover temp directory
      assert(!new java.io.File(path + "__compacting").exists())
    } finally rmTree(dir)
  }

  test("target larger than the dataset yields a single file") {
    val dir = Files.createTempDirectory("graft_compact1").toFile
    try {
      val path = dir.getAbsolutePath + "/region"
      Tables.region(spark, sf).repartition(4).write.parquet(path)
      assert(Compact.compact(spark, path, targetFileBytes = Long.MaxValue / 2) == 1)
    } finally rmTree(dir)
  }
}
