package graft

import graft.functions.SketchFunctions
import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitter sketch: bounded capacity, superset guarantee
  * under any partitioning (the merge path), and exactness of the two-pass
  * final answer. */
class SketchSpec extends GraftSuite {
  import spark.implicits._

  private def bruteCounts(rows: Seq[String]): Map[String, Long] =
    rows.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("sketch candidates are a superset of > total/k items on every layout") {
    // skewed synthetic stream: 'hot' 40%, 'warm' 20%, tail unique
    val rows = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 400).map(i => s"tail$i")
    val truth = bruteCounts(rows)
    val total = rows.size.toLong
    for (parts <- Seq(1, 3, 8); k <- Seq(2, 5, 50)) {
      val cands = spark.createDataset(rows).toDF("w")
        .repartition(parts)
        .agg(SketchFunctions.misraGries($"w", k).as("c"))
        .collect()(0).getSeq[String](0).toSet
      assert(cands.size <= k, s"parts=$parts k=$k: ${cands.size} > k")
      val mustHave = truth.filter { case (_, n) => n * k > total }.keySet
      assert(mustHave.subsetOf(cands),
        s"parts=$parts k=$k: missing ${mustHave -- cands}")
    }
  }

  test("sketch output is sorted and duplicate-free") {
    val cands = spark.createDataset(Seq.fill(50)("b") ++ Seq.fill(50)("a"))
      .toDF("w").agg(SketchFunctions.misraGries($"w", 4).as("c"))
      .collect()(0).getSeq[String](0)
    assert(cands == cands.sorted)
    assert(cands.distinct == cands)
  }

  test("two-pass heavy hitters are exact and layout-independent") {
    val rows = Seq.fill(300)("x y z") ++ Seq.fill(100)("x q") ++
      (0 until 300).map(i => s"u$i v$i")
    val k = 10
    def run(parts: Int) = Analytics.heavyHitters(
      spark.createDataset(rows).toDF("text").repartition(parts), "text", k)
      .orderBy($"n".desc, $"word")
    val a = canon(run(1))
    val b = canon(run(7))
    assert(a == b, "heavy-hitter answer depends on layout")
    // brute-force ground truth over the token stream
    val tokens = rows.flatMap(_.split(" ", -1))
    val truth = bruteCounts(tokens)
      .filter { case (_, n) => n * k > tokens.size.toLong }
    val got = run(3).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == truth, s"expected $truth got $got")
  }

  test("q_heavy_hitters: every answer word really exceeds total/k") {
    val df = SparkEntry.queries("q_heavy_hitters")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "corpus should have >1% words at every sf")
    val words = Tables.documents(spark, sf)
      .select(explode(split($"text", " ", -1)).as("w"))
    val total = words.count()
    val exact = words.groupBy($"w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (w, n) = (r.getString(0), r.getLong(1))
      assert(exact(w) == n, s"count for '$w' not exact: $n vs ${exact(w)}")
      assert(n * Analytics.HeavyHitterK > total)
    }
    // and nothing above threshold is missing
    val expected = exact.filter { case (_, n) =>
      n * Analytics.HeavyHitterK > total }.keySet
    assert(rows.map(_.getString(0)).toSet == expected)
  }

  test("misra_gries is SQL-callable via the registry") {
    graft.functions.GraftFunctionRegistry.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_mg")
    val arr = spark.sql(
      """SELECT graft_misra_gries(w, 10) FROM
        |  (SELECT explode(split(text, ' ', -1)) AS w FROM docs_mg)""".stripMargin)
      .collect()(0).getSeq[String](0)
    assert(arr.nonEmpty && arr.size <= 10)
  }
}
