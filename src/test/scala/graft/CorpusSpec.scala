package graft

import org.apache.spark.sql.functions._

/** Corpus-logistics operators: shard assignment, mixing weights,
  * incremental dedup, token histogram. */
class CorpusSpec extends GraftSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_shard_assign: matches a full driver-side recomputation, bijective") {
    val rows = SparkEntry.queries("q_shard_assign")(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    // (shard, pos) must be unique — it IS the training-corpus address
    assert(rows.map(r => (r.getString(1), r.getInt(2))).distinct.length == n)
    // independent recomputation with plain JVM md5: same shard + position
    val ids = Tables.documents(spark, sf).select($"doc_id")
      .collect().map(_.getLong(0))
    val expected = ids.map(id => (id, md5hex(s"shard:$id")))
      .groupBy(_._2.substring(0, 2)).toSeq
      .flatMap { case (shard, g) =>
        g.sortBy { case (id, k) => (k, id) }.zipWithIndex
          .map { case ((id, _), i) => id -> ((shard, i + 1)) }
      }.toMap
    rows.foreach { r =>
      assert(expected(r.getLong(0)) == ((r.getString(1), r.getInt(2))),
        s"doc ${r.getLong(0)}: got (${r.getString(1)}, ${r.getInt(2)})")
    }
  }

  test("q_mix_weights: ratios are in (0, 1] and the largest source anchors at 1.0") {
    val rows = SparkEntry.queries("q_mix_weights")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ratios = rows.map(_.getDouble(4))
    assert(ratios.forall(r => r > 0.0 && r <= 1.0))
    assert(ratios.max == 1.0)
    // alpha=0.5 flattens: mix ratio of the smallest source exceeds its
    // raw token share (that is the whole point of temperature mixing)
    val tokens = rows.map(_.getLong(2).toDouble)
    val shareMin = tokens.min / tokens.sum
    val ratioMin = ratios(tokens.indexOf(tokens.min)) / ratios.sum
    assert(ratioMin > shareMin)
  }

  test("q_incremental_dedup: survivors are exactly batch-minus-history digests") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", md5($"text").as("digest"),
        substring(md5(concat(lit("split:"), $"doc_id".cast("string"))), 1, 1).as("half"))
      .collect()
    val history = docs.filter(_.getString(2) < "8").map(_.getString(1)).toSet
    val batch = docs.filter(_.getString(2) >= "8")
    assert(history.nonEmpty && batch.nonEmpty, "hash split degenerate at this sf")
    val expected = batch.groupBy(_.getString(1))
      .filter { case (d, _) => !history.contains(d) }
      .map { case (d, g) => (d, g.map(_.getLong(0)).min, g.length.toLong) }
      .toSet
    val got = SparkEntry.queries("q_incremental_dedup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("zorder: known interleaves, codegen agrees with the JVM kernel") {
    import graft.functions.{LayoutFunctions, LayoutImpl}
    // hand-checked Morton values
    assert(LayoutImpl.zorder2(1, 0) == 1L)
    assert(LayoutImpl.zorder2(0, 1) == 2L)
    assert(LayoutImpl.zorder2(3, 3) == 15L)
    assert(LayoutImpl.zorder2(0xFFFF, 0) == 0x55555555L)
    assert(LayoutImpl.zorder2(0, 0xFFFF) == 0xAAAAAAAAL)
    // masking: only the low 16 bits participate
    assert(LayoutImpl.zorder2(0x10001, 0) == 1L)
    val pairs = Seq((5L, 9L), (123L, 456L), (65535L, 65535L), (0L, 0L))
    val got = pairs.toDF("x", "y")
      .select(LayoutFunctions.zorder($"x", $"y")).collect().map(_.getLong(0))
    assert(got.toSeq == pairs.map { case (x, y) => LayoutImpl.zorder2(x, y) })
  }

  test("zorder locality: sorting by zkey keeps 2-D quadrants contiguous") {
    import graft.functions.LayoutImpl
    // 16x16 grid: after a z-sort, every run of 64 consecutive keys is
    // exactly one 8x8 quadrant — the property file-level min/max pruning
    // relies on (a lexicographic (x,y) sort interleaves quadrants instead)
    val cells = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    val sorted = cells.sortBy { case (x, y) => LayoutImpl.zorder2(x, y) }
    sorted.grouped(64).zipWithIndex.foreach { case (quad, _) =>
      val qx = quad.map(_._1 / 8).distinct
      val qy = quad.map(_._2 / 8).distinct
      assert(qx.size == 1 && qy.size == 1,
        s"z-run spans quadrants: x=$qx y=$qy")
    }
  }

  test("zorder layout: a 2-D box filter materializes far fewer rows than a shuffled layout") {
    import graft.functions.LayoutFunctions
    val dir = java.nio.file.Files.createTempDirectory("zorder").toFile
    try {
      val o = Tables.orders(spark, sf)
      val keyed = o.select($"o_orderkey",
        pmod($"o_custkey", lit(65536L)).as("zx"),
        pmod(datediff($"o_orderdate", lit("1992-01-01").cast("date")),
          lit(65536)).cast("long").as("zy"))
        .withColumn("zkey", LayoutFunctions.zorder($"zx", $"zy"))
      keyed.repartitionByRange(8, $"zkey")
        .write.mode("overwrite").parquet(s"$dir/zsorted")
      keyed.repartition(8)
        .write.mode("overwrite").parquet(s"$dir/shuffled")
      // min/max stats prune a 2-D box exactly when a file's (zx, zy)
      // bounding box is small — measure the per-file bounding-box area
      // each layout exposes to the pruner (engine-agnostic, deterministic,
      // unlike scan metrics, which parquet's page-level column indexes
      // zero out for BOTH layouts on selective boxes at test scale)
      def meanBBoxArea(path: String): Double = {
        val areas = spark.read.parquet(path)
          .groupBy(input_file_name())
          .agg(((max($"zx") - min($"zx") + 1) *
            (max($"zy") - min($"zy") + 1)).as("area"))
          .collect().map(_.getLong(1))
        areas.sum.toDouble / areas.length
      }
      val zArea = meanBBoxArea(s"$dir/zsorted")
      val rArea = meanBBoxArea(s"$dir/shuffled")
      assert(zArea < rArea / 4,
        s"z-sort mean file bbox $zArea vs shuffled $rArea — no locality win")
      // and both layouts hold the same rows
      assert(spark.read.parquet(s"$dir/zsorted").count() ==
        spark.read.parquet(s"$dir/shuffled").count())
    } finally rmTree(dir)
  }

  test("q_mix_sample: realized per-source rates track the mix ratios") {
    val ratios = SparkEntry.queries("q_mix_weights")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val totals = Tables.documents(spark, sf).groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = SparkEntry.queries("q_mix_sample")(spark, sf)
      .groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ratios.foreach { case (src, ratio) =>
      val realized = sampled.getOrElse(src, 0L).toDouble / totals(src)
      // small-n binomial noise: allow a wide but meaningful band
      assert(math.abs(realized - ratio) < 0.25,
        s"$src: realized $realized vs ratio $ratio")
    }
    // the anchor source (ratio 1.0) keeps every doc — no edge case
    val anchor = ratios.maxBy(_._2)._1
    assert(ratios(anchor) == 1.0)
    assert(sampled(anchor) == totals(anchor), "anchor source must keep all docs")
  }

  test("bloom incremental dedup: identical answer to the exact path, bloom in plan") {
    val exact = SparkEntry.queries("q_incremental_dedup")(spark, sf)
    val bloom = SparkEntry.queries("q_incremental_dedup_bloom")(spark, sf)
    assertSameRows(exact, bloom)
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from plan:\n$plan")
  }

  test("bloom prefilter: empty history routes every batch digest to definitely-new") {
    import spark.implicits._
    import graft.functions.SketchFunctions
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val history = Seq.empty[String].toDF("digest")
    val bloom = ColumnBridge.scalarSubquery(
      history.agg(SketchFunctions.bloomAgg($"digest", 100L)))
    val out = Seq("d1", "d2").toDF("digest")
      .withColumn("maybe",
        coalesce(SketchFunctions.mightContain(bloom, $"digest"), lit(false)))
      .collect().map(_.getBoolean(1))
    assert(out.forall(_ == false), "NULL bloom must coalesce to definitely-new")
  }

  test("bloom membership: no false negatives on the aggregated set") {
    import spark.implicits._
    import graft.functions.SketchFunctions
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val members = (0 until 1000).map(i => s"digest$i")
    val bloom = ColumnBridge.scalarSubquery(
      members.toDF("digest")
        .agg(SketchFunctions.bloomAgg($"digest", 10000L)))
    val missed = members.toDF("digest")
      .filter(!SketchFunctions.mightContain(bloom, $"digest"))
      .count()
    assert(missed == 0, "bloom false negative — membership guarantee broken")
  }

  test("shard assignment drives a partitioned writer: pruned reads, round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toFile
    try {
      val assigned = SparkEntry.queries("q_shard_assign")(spark, sf)
      assigned.write.mode("overwrite").partitionBy("shard")
        .parquet(dir.getAbsolutePath)
      // reading one shard prunes at planning time — the property that lets
      // a trainer rank open exactly its shard of a 100 TB corpus
      val one = spark.read.parquet(dir.getAbsolutePath).filter($"shard" === "00")
      val plan = one.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*shard".r.findFirstIn(plan).isDefined,
        s"shard predicate must prune partitions, not filter rows:\n$plan")
      // full round trip preserves the exact assignment
      assertSameRows(spark.read.parquet(dir.getAbsolutePath)
        .select($"doc_id", $"shard", $"pos"), assigned)
    } finally rmTree(dir)
  }

  test("q_snapshot_diff: statuses partition the digest space, counts conserve") {
    val rows = SparkEntry.queries("q_snapshot_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet.subsetOf(Set("added", "removed", "kept")))
    // overlapping slices guarantee all three statuses on a non-tiny corpus
    assert(rows.contains("kept"))
    // docs_old covers exactly the old-slice docs; docs_new the new-slice
    val docs = Tables.documents(spark, sf)
      .select($"doc_id",
        substring(md5(concat(lit("snap:"), $"doc_id".cast("string"))), 1, 1).as("s"))
      .collect()
    val oldN = docs.count(_.getString(1) < "8")
    val newN = docs.count(_.getString(1) >= "4")
    assert(rows.values.map(_._2).sum == oldN)
    assert(rows.values.map(_._3).sum == newN)
    // 'added' rows carry no old docs, 'removed' rows no new docs
    rows.get("added").foreach { case (_, o, _) => assert(o == 0L) }
    rows.get("removed").foreach { case (_, _, n) => assert(n == 0L) }
  }

  test("q_winsorize: bounds are real order statistics, clip fractions ~5%") {
    val rows = SparkEntry.queries("q_winsorize")(spark, sf).collect()
    assert(rows.nonEmpty)
    val prices = Tables.orders(spark, sf)
      .select($"o_orderpriority", $"o_totalprice").collect()
      .groupBy(_.getString(0)).map { case (k, g) =>
        k -> g.map(_.getDouble(1)).sorted
      }
    rows.foreach { r =>
      val (p, lo, hi, nBelow, nAbove, n) = (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val v = prices(p)
      assert(v.length == n)
      // the bound IS the ceil(n*p)-th smallest value
      assert(lo == v(math.ceil(n * 0.05).toInt - 1))
      assert(hi == v(math.ceil(n * 0.95).toInt - 1))
      // clipped tails stay under the nominal mass (order statistics bound)
      assert(nBelow < n * 0.05 && nAbove <= n * 0.05)
      // winsorized total equals a driver recomputation at 2dp
      val expect = v.map(x => math.min(math.max(x, lo), hi)).map(x =>
        BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(BigDecimal(r.getDouble(6)).setScale(2, BigDecimal.RoundingMode.HALF_UP) == expect)
    }
  }

  test("q_cap_per_source: exact cap per source, deterministic selection") {
    val rows = SparkEntry.queries("q_cap_per_source")(spark, sf).collect()
    val perSource = Tables.documents(spark, sf).groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getString(1))
    assert(got.keySet == perSource.keySet)
    got.foreach { case (src, g) =>
      // exactly min(n, cap) kept, ranks contiguous from 1
      val expect = math.min(perSource(src), operators.Corpus.MaxDocsPerSource)
      assert(g.length == expect, s"source $src: ${g.length} != $expect")
      assert(g.map(_.getInt(2)).sorted.toSeq == (1 to g.length))
    }
    // deterministic: a second run selects the identical doc set
    val again = SparkEntry.queries("q_cap_per_source")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet)
  }

  test("q_token_histogram: buckets partition the corpus, totals add up") {
    val rows = SparkEntry.queries("q_token_histogram")(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    assert(rows.forall(r => r.getLong(1) % operators.Corpus.HistBucketWidth == 0))
    // every doc's tokens fall inside its bucket: total_tokens bounded by
    // n_docs * [bucket_lo, bucket_lo + width)
    rows.foreach { r =>
      val (lo, n, tot) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tot >= lo * n && tot < (lo + operators.Corpus.HistBucketWidth) * n + n)
    }
  }

  test("globalIndex: contiguous 1..n in key order, layout-invariant") {
    import spark.implicits._
    val base = Tables.orders(spark, sf).select($"o_orderkey")
    val a = operators.Corpus.globalIndex(base, "o_orderkey")
    val b = operators.Corpus.globalIndex(base.repartition(7), "o_orderkey")
    assertSameRows(a, b)
    val rows = a.orderBy($"global_idx")
      .select($"o_orderkey", $"global_idx").as[(Long, Long)].collect()
    assert(rows.map(_._2).toSeq == (1L to rows.length).toSeq,
      "indices must be the contiguous sequence 1..n")
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq,
      "index order must follow key order")
  }

  test("assignSplits: byte-identical texts always share a split (leakage-safe)") {
    import spark.implicits._
    // duplicate content under fresh ids — the leak vector the content
    // hash exists to close
    val base = Tables.documents(spark, sf).select($"doc_id", $"text")
    val dup = base.select(($"doc_id" + 7777777L).as("doc_id"), $"text")
    val assigned = operators.Corpus.assignSplits(base.unionByName(dup), "text")
    val splitsPerText = assigned.groupBy($"text")
      .agg(countDistinct($"split").as("n_splits"))
      .filter($"n_splits" > 1)
    assert(splitsPerText.count() == 0,
      "a text appearing under two ids must land in exactly one split")
    // the three splits all materialize and roughly track 80/10/10
    val counts = assigned.groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet == Set("train", "val", "test"), counts.toString)
    assert(counts("train") / n > 0.6 && counts("val") / n < 0.25 &&
      counts("test") / n < 0.25, s"implausible split sizes: $counts")
  }

  test("globalIndex: correct with physical exchange reuse DISABLED") {
    // the offsets branch and the numbering branch both consume the
    // range-partitioned frame; before the eager localCheckpoint pinned
    // it, correctness silently depended on ReuseExchange deduping two
    // identical subtrees — with reuse off, each branch would sample its
    // own range bounds and the offsets could mismatch the numbering
    // layout (duplicate/gapped indices). This pins the fix.
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val idx = operators.Corpus.globalIndex(
          Tables.orders(spark, sf).select($"o_orderkey").repartition(5),
          "o_orderkey")
        .select($"global_idx").as[Long].collect().sorted
      assert(idx.toSeq == (1L to idx.length).toSeq,
        "indices must stay contiguous 1..n without exchange reuse")
    } finally spark.conf.set("spark.sql.exchange.reuse", saved)
  }

  test("globalIndex: the data-side window is partitioned, never one task") {
    val df = operators.Corpus.globalIndex(
      Tables.orders(spark, sf).select(col("o_orderkey")), "o_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // row_number over the data must be keyed by __pid; the only
    // SinglePartition stage is the offsets frame (partition-count rows)
    assert(plan.contains("row_number"), plan)
    val windowLines = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number")).toSeq
    assert(windowLines.exists(_.contains("__pid")),
      s"data window must partition by __pid:\n$plan")
  }

  test("weighted sample: a 1000x-heavier doc is drawn, a 1-char doc is not") {
    import spark.implicits._
    // one source, 200 docs of weight 10, one doc of weight 100000: under
    // PPS the heavy doc's rank key is ~10000x smaller in expectation than
    // any light doc's, so it must land in the k=20 sample; conversely the
    // probability every light doc outranks a given light doc is symmetric
    // -- only the heavy-doc inclusion is a sound deterministic claim.
    val docs = ((1L to 200L).map(i => (i, "t", "s", 10L))
      :+ (999L, "t", "s", 100000L))
      .toDF("doc_id", "text", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("wsample").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sampled = SparkEntry.queries("q_weighted_sample")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(sampled.contains(999L),
      "PPS must include the dominant-weight doc")
    assert(sampled.size == 20, "k=20 per source")
    rmTree(new java.io.File(dir))
  }

  test("weighted sample: rank keys are integer-exact and layout-invariant") {
    val a = canon(SparkEntry.queries("q_weighted_sample")(spark, sf))
    val shuffled = Tables.documents(spark, sf).repartition(17)
    val dir = java.nio.file.Files.createTempDirectory("wsample2").toString
    shuffled.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val b = canon(SparkEntry.queries("q_weighted_sample")(spark, dir))
    assert(a == b)
    rmTree(new java.io.File(dir))
  }

  test("stratified split: exact per-stratum proportions, disjoint and exhaustive") {
    val out = SparkEntry.queries("q_split_stratified")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val n = Tables.documents(spark, sf).count()
    assert(out.length == n && out.map(_._1).distinct.length == n)
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val m = rows.length.toLong
      val c = rows.groupBy(_._3).map { case (s, g) => s -> g.size.toLong }
      // rn·10 ≤ m·8 ⟺ rn ≤ ⌊0.8m⌋ — sizes are exact, never ±√n
      assert(c.getOrElse("train", 0L) == m * 8 / 10, s"$lang train ${c}")
      assert(c.getOrElse("val", 0L) == m * 9 / 10 - m * 8 / 10, s"$lang val $c")
      assert(c.getOrElse("test", 0L) == m - m * 9 / 10, s"$lang test $c")
    }
  }

  test("token budget: kept set is the maximal greedy quality prefix per source") {
    import graft.functions.TextFunctions
    val scored = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars",
        (TextFunctions.md5Lower64(concat(lit("tb:"), $"doc_id".cast("string")))
          .bitwiseAND(lit(Long.MaxValue)) % 1000).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val kept = SparkEntry.queries("q_token_budget")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
      .map { case (s, g) => s -> g.map(_._1).toSet }
    scored.groupBy(_._2).foreach { case (src, docs) =>
      val budget = docs.map(_._3).sum * 50 / 100
      val prefix = docs.sortBy(d => (-d._4, d._1))
        .scanLeft((0L, -1L)) { case ((cum, _), d) => (cum + d._3, d._1) }
        .drop(1).takeWhile(_._1 <= budget).map(_._2).toSet
      assert(kept.getOrElse(src, Set.empty[Long]) == prefix,
        s"$src: kept ${kept.getOrElse(src, Set.empty)} != greedy $prefix")
    }
    assert(kept.values.map(_.size).sum > 0)
  }

  test("curriculum: a permutation, band-monotone, shuffled within band, layout-invariant") {
    val out = SparkEntry.queries("q_curriculum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.documents(spark, sf).count()
    assert(out.length == n)
    assert(out.map(_._3).sorted.toSeq == (1L to n).toSeq,
      "positions must be a contiguous 1..n permutation")
    // easy -> hard: every band's positions precede every later band's
    val byPos = out.sortBy(_._3).map(_._2)
    assert(byPos.toSeq == byPos.sorted.toSeq,
      "difficulty bands must be non-decreasing along the schedule")
    // within a band the md5 shuffle must break doc_id ingest order
    val biggestBand = out.groupBy(_._2).maxBy(_._2.length)._2
    val idsInOrder = biggestBand.sortBy(_._3).map(_._1)
    assert(idsInOrder.toSeq != idsInOrder.sorted.toSeq,
      "within-band order equals ingest order — shuffle is dead")
    // layout invariance: the schedule survives a repartitioned input
    val dir = java.nio.file.Files.createTempDirectory("curr").toString
    Tables.documents(spark, sf).repartition(13)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val b = SparkEntry.queries("q_curriculum")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    rmTree(new java.io.File(dir))
  }

  test("curriculum: band at the %06d width limit sorts; past it raises") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val charsType = docs.schema("n_chars").dataType
    val minId = docs.agg(min(col("doc_id"))).head.getLong(0)
    // n_chars = 1e8 - 1 -> band 999999: the widest value %06d holds
    val okDir = java.nio.file.Files.createTempDirectory("currok").toString
    docs.withColumn("n_chars",
        when(col("doc_id") === minId, lit(99999999L).cast(charsType))
          .otherwise(col("n_chars")))
      .write.mode("overwrite").parquet(s"$okDir/documents.parquet")
    val atLimit = SparkEntry.queries("q_curriculum")(spark, okDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(atLimit.filter(_._1 == minId).head._2 == 999999L)
    assert(atLimit.maxBy(_._3)._1 == minId,
      "the hardest (longest) doc must land last in the schedule")
    rmTree(new java.io.File(okDir))
    // n_chars = 1e8 -> band 1000000: overflows the key width -> raises
    val ovDir = java.nio.file.Files.createTempDirectory("currov").toString
    docs.withColumn("n_chars",
        when(col("doc_id") === minId, lit(100000000L).cast(charsType))
          .otherwise(col("n_chars")))
      .write.mode("overwrite").parquet(s"$ovDir/documents.parquet")
    val e = intercept[Exception] {
      SparkEntry.queries("q_curriculum")(spark, ovDir).collect()
    }
    assert(e.getMessage != null)
    rmTree(new java.io.File(ovDir))
  }
  // ------------------------------------------------------------------ q_bloom_fpr
  test("q_bloom_fpr: filter replayed bit-for-bit; no false negatives") {
    import graft.operators.Corpus
    import graft.functions.TextImpl
    import org.apache.spark.unsafe.types.UTF8String
    def low64(s: String): Long =
      TextImpl.md5Lower64(UTF8String.fromString(s)) & Long.MaxValue
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), md5hex(r.getString(1))))
    val hist = docs.filter { case (id, _) =>
      md5hex(s"split:$id").substring(0, 1) < "8" }
    val histDigests = hist.map(_._2).toSet
    val bits = (for {
      (_, d) <- hist; i <- 0 until Corpus.BloomFprK
    } yield low64(s"bf$i:$d") % Corpus.BloomFprBits).toSet
    var (member, flagged, falsePos) = (0L, 0L, 0L)
    docs.foreach { case (_, d) =>
      val isMember = histDigests(d)
      val hit = (0 until Corpus.BloomFprK)
        .forall(i => bits(low64(s"bf$i:$d") % Corpus.BloomFprBits))
      if (isMember) {
        member += 1
        assert(hit, "bloom false negative — impossible by construction")
      }
      if (hit) flagged += 1
      if (hit && !isMember) falsePos += 1
    }
    val r = SparkEntry.queries("q_bloom_fpr")(spark, sf).collect().head
    assert(r.getLong(0) == member && r.getLong(1) == docs.length.toLong)
    assert(r.getLong(2) == flagged && r.getLong(3) == 0L)
    assert(r.getLong(4) == falsePos)
  }
  // ---------------------------------------------------------------- q_dataset_card
  test("q_dataset_card: every datasheet field replayed from raw docs") {
    val docs = Tables.documents(spark, sf)
      .select($"source", $"lang", $"n_chars", $"text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val n = docs.length.toLong
    val lens = docs.map(_._3).sorted
    // lower median: smallest v with 2*cum(v) >= n over the histogram
    val medianExpected = {
      val grid = lens.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      grid.collectFirst { case (v, c) if { cum += c; cum * 2 >= n } => v }.get
    }
    val dups = n - docs.map(_._4).distinct.length
    val topLang = docs.groupBy(_._2).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (l, c) => (-c, l) }.head
    val r = SparkEntry.queries("q_dataset_card")(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == docs.map(_._1).distinct.length.toLong)
    assert(r.getLong(2) == docs.map(_._2).distinct.length.toLong)
    assert(r.getLong(3) == docs.map(_._3).sum)
    assert(r.getLong(4) == docs.map(_._3).sum / n)
    assert(r.getLong(5) == medianExpected, s"median ${r.getLong(5)}")
    assert(r.getLong(7) == dups && r.getLong(8) == dups * 1000000L / n)
    assert(r.getString(9) == topLang._1)
    assert(r.getLong(10) == topLang._2 * 1000000L / n)
  }
}
