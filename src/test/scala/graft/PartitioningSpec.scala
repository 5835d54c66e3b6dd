package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Partitioned-layout writes and partition pruning — with bucketing
  * (BucketingSpec), the two storage-layout levers that matter at 100 TB:
  * a filter on the partition column must prune directories at planning
  * time, reading none of the skipped data. */
class PartitioningSpec extends GraftSuite {
  import spark.implicits._

  private def withTempDir(f: java.io.File => Unit): Unit = {
    val dir = Files.createTempDirectory("graft_part").toFile
    try f(dir) finally rmTree(dir)
  }

  test("write.partitionBy layout prunes partitions for stratum filters") {
    withTempDir { dir =>
      val path = dir.getAbsolutePath + "/docs"
      Tables.documents(spark, sf)
        .write.partitionBy("lang").mode("overwrite").parquet(path)

      // one directory per stratum on disk
      val langDirs = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
      assert(langDirs.length == 5, langDirs.mkString(","))

      val q = spark.read.parquet(path).filter($"lang" === "en")
      val scan = q.queryExecution.executedPlan.toString
      // the lang predicate must be INSIDE the PartitionFilters list (the
      // list prints even when empty, so containment alone proves nothing)
      assert("PartitionFilters: \\[[^\\]]*lang[^\\]]*en".r.findFirstIn(scan).isDefined,
        s"lang=en not recognized as a partition filter:\n$scan")
      assert(q.count() ==
        Tables.documents(spark, sf).filter($"lang" === "en").count())

      // non-partition filter still pushes down into the parquet scan
      val q2 = spark.read.parquet(path).filter($"n_chars" > 300)
      val scan2 = q2.queryExecution.executedPlan.toString
      assert("PushedFilters: \\[[^\\]]*n_chars".r.findFirstIn(scan2).isDefined,
        s"n_chars predicate not pushed to parquet:\n$scan2")
    }
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // Completes the runtime-optimization proof set (SkewSpec: AQE skew
    // split; RuntimeFilterSpec: bloom runtime filter): a selective filter
    // on a DIMENSION must prune partitions of a fact table partitioned by
    // the join key — planning time cannot know which partitions survive,
    // so the pruning subquery must be injected at runtime. At 100 TB this
    // is the difference between scanning one date partition and all of
    // them whenever the filter sits on the dim side.
    withTempDir { dir =>
      val path = dir.getAbsolutePath + "/docs_by_lang"
      Tables.documents(spark, sf)
        .write.partitionBy("lang").mode("overwrite").parquet(path)
      val fact = spark.read.parquet(path)
      // dim: one row per lang, filtered to a single one NOT by the join
      // column value itself (so static pruning can't see it)
      val dim = Tables.documents(spark, sf)
        .groupBy($"lang").agg(count(lit(1)).as("n"))
        .withColumn("tag", md5($"lang"))
      val selective = dim.filter($"tag" === md5(lit("en")))
      val joined = fact.join(selective, Seq("lang"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") ||
        "PartitionFilters: \\[[^\\]]*dynamicpruning".r.findFirstIn(plan).isDefined,
        s"no dynamic pruning subquery on the fact scan:\n$plan")
      assert(joined.count() ==
        Tables.documents(spark, sf).filter($"lang" === "en").count())
    }
  }

  test("repartition controls output file count (the small-files lever)") {
    // the Spark-native form of the reference's linspace batch sizing
    // (SURVEY.md §2.9 F9): output parallelism is declared, not emergent
    withTempDir { dir =>
      val path = dir.getAbsolutePath + "/orders"
      Tables.orders(spark, sf).repartition(3).write.mode("overwrite").parquet(path)
      val parts = new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length == 3, s"expected 3 part files, got ${parts.length}")
      assert(spark.read.parquet(path).count() == Tables.orders(spark, sf).count())
    }
  }
}
