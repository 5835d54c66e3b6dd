package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a native typed aggregate — the
  * bounded-memory "find heavy hitters in one pass" sketch, the streaming
  * complement of the exact groupBy count.
  *
  * Guarantees (capacity k):
  *  - each partial summary holds at most k counters (fixed memory per
  *    task, regardless of vocabulary size — THE property that makes a
  *    first pass over a 100 TB corpus feasible where a full groupBy
  *    would shuffle the entire vocabulary);
  *  - a maintained count undercounts the true count by at most
  *    total/(k+1), so every item with true frequency > total/(k+1)
  *    survives in the summary: the candidate set is a SUPERSET of the
  *    > total/k heavy hitters;
  *  - summaries are mergeable with the same bound (the subtract-(k+1)th
  *    merge of Agarwal et al., "Mergeable Summaries", PODS 2012), which
  *    is exactly Spark's partial → final aggregation contract.
  *
  * The candidate COUNTS are estimates, so the aggregate deliberately
  * emits only the candidate item set (sorted for determinism). Callers
  * wanting exact answers run the cheap second pass over the candidates
  * (operators.Analytics.heavyHitters) — the final answer is then exact
  * and layout-independent even though intermediate sketch contents are
  * not.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries: capacity must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"misra_gries expects string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k =>
          // the incoming UTF8String may point into a reused row buffer —
          // copy before retaining it across rows
          buf.update(key.clone(), 1L)
        case None =>
          // classic MG decrement step: no free counter, so every counter
          // pays 1 (amortized O(1): each decrement cancels a prior
          // increment)
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace { (_, c) => c - 1 }
          buf.foreach { case (w, c) => if (c == 0) dead += w }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (w, c) =>
      buf.update(w, buf.getOrElse(w, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0:
      // keeps <= k counters and preserves the total/(k+1) undercount
      // bound (mergeable-summaries merge)
      val values = buf.values.toArray
      java.util.Arrays.sort(values)
      val m = values(values.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace { (_, c) => c - m }
      buf.foreach { case (w, c) => if (c <= 0) dead += w }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val arr = buf.keysIterator.toArray
    java.util.Arrays.sort(arr, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) =>
      val bytes = w.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
  override def prettyName: String = "misra_gries"
}

object SketchFunctions {
  /** misra_gries(col, k): sorted candidate-item array containing every
    * value whose true count exceeds total/k (plus possibly some below —
    * run an exact second pass to finalize). */
  def misraGries(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Bloom-filter aggregate over xxhash64(col) — Spark's own runtime-
    * filter sketch (org.apache.spark.util.sketch.BloomFilter), exposed
    * for explicit membership prefilters. `expectedItems` sizes the bit
    * array (~1% fpp at the default bits-per-item). */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ExpressionUtils.expression(org.apache.spark.sql.functions.xxhash64(c)),
        expectedItems).toAggregateExpression())

  /** might_contain(bloomBinary, col): false ⇒ DEFINITELY absent from the
    * aggregated set; true ⇒ present or a false positive. NULL bloom
    * (empty build side) returns NULL — callers decide the semantics
    * (an empty history means "definitely new"). */
  def mightContain(bloom: Column, c: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ExpressionUtils.expression(bloom),
        ExpressionUtils.expression(org.apache.spark.sql.functions.xxhash64(c))))
}
