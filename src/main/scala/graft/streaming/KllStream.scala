package graft.streaming

import graft.operators.{KllImpl, QuantileSketch}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, Trigger, TTLConfig, ValueState}

/** STREAMING quantile sketch — the mergeable-state payoff of
  * [[graft.operators.QuantileSketch]]: a per-event-type KLL-shaped level
  * sampler maintained as transformWithState ValueState, folding each
  * micro-batch's rows into the kept sample and re-deriving the
  * power-of-two threshold with the SAME rule as the batch operator.
  *
  * Because the sketch's merge law is exact and order-independent, the
  * final per-key state is IDENTICAL for any AvailableNow batch split —
  * one batch, file-per-batch, or a restart mid-stream all converge to
  * the from-scratch batch sketch. That is what makes the row
  * driver-visible: the oracle is the plain per-type batch SQL
  * ([[QuantileSketch.streamKllSql]]) with zero batch-boundary modeling,
  * and KllSpec asserts the same equality for explicit multi-tranche
  * splits of the fixture.
  *
  * Scale shape: state is ≤ K (h, v) pairs + two scalars per key —
  * bounded regardless of stream length (the quantile analogue of
  * q_stream_running's one-pair-per-user contract); each micro-batch
  * shuffles once on event_type; all sketch maintenance is per-key local
  * work on ≤ K + batch rows. */
object KllStream {

  case class KllEvent(event_type: String, h: Long, v: Long)
  case class KllState(b: Int, n: Long, hs: Array[Long], vs: Array[Long])
  case class KllOut(event_type: String, pct: Int, est_v: Long, n_kept: Long,
      lvl_b: Int, est_total: Long, n_total: Long)

  /** Fold a batch into the per-key sketch; emit the key's CURRENT
    * percentile rows (the last batch's emission — selected by max
    * n_total on read-back — is the batch-split-invariant final
    * sketch). */
  class KllSketchProcessor(k: Int)
      extends StatefulProcessor[String, KllEvent, KllOut] {
    @transient private var state: ValueState[KllState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KllState](
        "kll", Encoders.product[KllState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KllEvent],
        timerValues: TimerValues): Iterator[KllOut] = {
      val prev = if (state.exists()) state.get()
        else KllState(63, 0L, Array.empty, Array.empty)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < prev.hs.length) { buf += ((prev.hs(i), prev.vs(i))); i += 1 }
      var n = prev.n
      rows.foreach { r => buf += ((r.h, r.v)); n += 1 }
      // bCap = prev.b: the union is complete only below the previous
      // threshold — levels at/above it must not qualify (KllImpl.prune)
      val (b, kept) = KllImpl.prune(buf.toSeq, n, prev.b, k)
      state.update(KllState(b, n, kept.map(_._1).toArray,
        kept.map(_._2).toArray))
      val nk = kept.size.toLong
      if (nk == 0L) Iterator.empty
      else {
        val estTotal = nk << (63 - b)
        KllImpl.quantiles(kept, QuantileSketch.KllPcts).iterator.map {
          case (pct, v) => KllOut(key, pct, v, nk, b, estTotal, n)
        }
      }
    }
  }

  private def streamKll(s: SparkSession, dir: String): DataFrame =
      StreamTune.withRocksDB(s) {
      StreamTune.sized(s, dir + "/events.parquet") {
    import s.implicits._
    import graft.functions.TextFunctions
    val events = EventStream.readEvents(s, dir + "/events.parquet")
      .select($"event_type",
        TextFunctions.md5Lower64(concat(lit("kll:"), $"event_id".cast("string")))
          .bitwiseAND(lit(Long.MaxValue)).as("h"),
        round($"value" * 100).cast("long").as("v"))
      .as[KllEvent]
    val q = events
      .groupByKey(_.event_type)
      .transformWithState(new KllSketchProcessor(QuantileSketch.KllStreamK),
        TimeMode.None(), OutputMode.Append())
      .toDF()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName("q_stream_kll_mem")
      .start()
    q.awaitTermination()
    // final emission per (type, pct): n_total strictly grows with every
    // batch that touches the key, so max-n_total rows are the final state
    val w = Window.partitionBy($"event_type", $"pct")
      .orderBy($"n_total".desc)
    s.table("q_stream_kll_mem")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1).drop("rk")
      .orderBy($"event_type", $"pct")
  } }

  val all: Seq[graft.NamedQuery] = Seq(
    graft.NamedQuery("q_stream_kll", streamKll,
      Some(QuantileSketch.streamKllSql), bench = true, streaming = true))
}
