package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The full capability inventory lives in `all`; each NamedQuery carries
  * its own DuckDB oracle SQL (or None for non-SQL-expressible ops, which
  * are covered by ScalaTest specs instead). */
object SparkEntry {
  /** Every implemented capability, one NamedQuery each. */
  def all: Seq[NamedQuery] =
    operators.Relational.all ++ operators.TpchExtra.all ++
      operators.TpchExtra2.all ++ operators.TpchExtra3.all ++
      operators.TextAnalysis.all ++
      operators.Dedup.all ++ operators.Similarity.all ++
      operators.Clustering.all ++
      operators.Sources.all ++ operators.Multimodal.all ++
      operators.Skew.all ++ operators.AsOf.all ++ operators.RangeJoin.all ++
      operators.Analytics.all ++ operators.AnalyticsExtra.all ++
      operators.Quality.all ++
      operators.Checks.all ++ operators.Upsert.all ++
      operators.Chunking.all ++ operators.Corpus.all ++
      operators.CurationExtra.all ++ operators.PretrainOps.all ++
      operators.MlData.all ++ operators.PostTrain.all ++
      operators.LlmEval.all ++ operators.Indicators.all ++
      operators.Indicators2.all ++ operators.TextMining.all ++
      operators.Journey.all ++ operators.Experiment.all ++
      operators.Geo.all ++ operators.Privacy.all ++
      operators.Tokenize.all ++ operators.Graph.all ++
      operators.QuantileSketch.all ++
      operators.Linkage.all ++ operators.Audit.all ++
      operators.Web.all ++ operators.Scoring.all ++
      operators.SqlFace.all ++
      operators.Annotate.all ++ operators.Eval.all ++
      streaming.Sessionize.all ++ streaming.EventStream.all ++
      streaming.StateV2.all ++ streaming.KllStream.all ++
      pipeline.FinancialPipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.industryAvg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Headline subset for graft.Bench. */
  def benchQueries: Seq[NamedQuery] = all.filter(_.bench)
}
