package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Annotation aggregation — the label-plumbing half of an RLHF /
  * supervised-fine-tuning data pipeline: several annotators label each
  * document, and the pipeline must resolve them to one training label
  * (majority vote with a deterministic tie-break) while surfacing
  * agreement statistics that gate annotator quality.
  *
  * The fixture carries no annotation table, so annotators are PLANTED
  * by id arithmetic (the q_pii_redact precedent): a true label is
  * doc_id % 4, and each of the 3 annotators flips it ~20% of the time
  * to a deterministic md5-derived wrong label. Every downstream number
  * — votes, majority, tie-breaks, agreement — is replayable by any
  * engine from doc_id alone, so the whole resolution logic is
  * hash-pinned by the oracle, including the tie path (three distinct
  * labels → smallest wins), which genuinely occurs in the plant.
  *
  * Scale shape: entirely row-local integer arithmetic inside
  * whole-stage codegen — zero shuffle. A real deployment would first
  * pivot an (item, annotator, label) table into this wide shape: one
  * keyed aggregation, map-side partial, the shape q_pivot_attrs
  * already covers. */
object Annotate {

  val NumAnnotators = 3
  val NumClasses = 4

  /** Deterministic planted label for one annotator: flip the true label
    * with probability 2/10, choosing one of the other classes by hash. */
  private def plantLabel(a: Int): Column = {
    val t = col("doc_id") % NumClasses
    val noise = TextFunctions
      .md5Lower64(concat(lit(s"lab:$a:"), col("doc_id").cast("string")))
      .bitwiseAND(lit(Long.MaxValue))
    when(noise % 10 < 2,
      (t + 1 + noise % (NumClasses - 1)) % NumClasses).otherwise(t)
  }

  private def plantLabelSql(a: Int): String =
    s"""CASE WHEN CAST(md5_number_lower('lab:$a:' || CAST(doc_id AS VARCHAR))
       | & 9223372036854775807::UBIGINT AS BIGINT) % 10 < 2
       | THEN (doc_id % $NumClasses + 1
       |   + CAST(md5_number_lower('lab:$a:' || CAST(doc_id AS VARCHAR))
       |     & 9223372036854775807::UBIGINT AS BIGINT) % ${NumClasses - 1})
       |   % $NumClasses
       | ELSE doc_id % $NumClasses END""".stripMargin.replace("\n", "")

  // -------------------------------------------------------------- q_label_vote
  private def labelVote(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", plantLabel(1).as("l1"), plantLabel(2).as("l2"),
        plantLabel(3).as("l3"))
      .select($"doc_id", $"l1", $"l2", $"l3",
        // any pair agreeing is a majority of 3; all-distinct ties break
        // to the smallest label (deterministic, engine-free)
        when($"l1" === $"l2" || $"l1" === $"l3", $"l1")
          .when($"l2" === $"l3", $"l2")
          .otherwise(least($"l1", $"l2", $"l3")).as("majority"),
        (($"l1" === $"l2").cast("long") + ($"l1" === $"l3").cast("long") +
          ($"l2" === $"l3").cast("long")).as("n_agree_pairs"))
      .select($"doc_id", $"l1", $"l2", $"l3", $"majority", $"n_agree_pairs",
        ($"n_agree_pairs" === 3).as("unanimous"),
        ($"majority" === $"doc_id" % NumClasses).as("majority_correct"))
      .orderBy($"doc_id")
  }

  private val labelVoteSql =
    s"""WITH l AS (
       |  SELECT doc_id, ${plantLabelSql(1)} AS l1, ${plantLabelSql(2)} AS l2,
       |    ${plantLabelSql(3)} AS l3
       |  FROM documents),
       |v AS (
       |  SELECT doc_id, l1, l2, l3,
       |    CASE WHEN l1 = l2 OR l1 = l3 THEN l1
       |         WHEN l2 = l3 THEN l2
       |         ELSE least(l1, l2, l3) END AS majority,
       |    CAST((CASE WHEN l1 = l2 THEN 1 ELSE 0 END)
       |      + (CASE WHEN l1 = l3 THEN 1 ELSE 0 END)
       |      + (CASE WHEN l2 = l3 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_agree_pairs
       |  FROM l)
       |SELECT doc_id, l1, l2, l3, majority, n_agree_pairs,
       |  n_agree_pairs = 3 AS unanimous,
       |  majority = doc_id % $NumClasses AS majority_correct
       |FROM v ORDER BY doc_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_label_vote", labelVote, Some(labelVoteSql), bench = true))
}
