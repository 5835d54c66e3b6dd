package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal (the Gopher/C4 "compressibility"
  * filter): text that deflates to almost nothing is boilerplate /
  * repetition; text that barely deflates is high-entropy noise (base64
  * blobs, minified junk, random ids). Both tails are what a
  * pretraining curation pass drops, and the DEFLATE length is the
  * standard cheap estimator of per-document entropy.
  *
  * Native Catalyst expression because the hot loop is a per-row zlib
  * pass over the full text: as a UDF it would box every row and fall
  * out of whole-stage codegen; here it is one static primitive-typed
  * call inside the generated code, with a thread-local `Deflater`
  * (level 6, raw stream) so no per-row allocation survives.
  *
  * Determinism: zlib output for a fixed input/level/strategy is
  * deterministic within a JVM build; the LENGTH (all this expression
  * exposes) has been stable across the zlib builds the JDK ships, but
  * that is an observation, not a guarantee — so q_compress_ratio's
  * driver oracle PINS the measured per-fixture rollup
  * (`Scoring.compressPins`) and CompressSpec pins the expression
  * bit-exact against driver-side `java.util.zip` on the running JVM:
  * a zlib change fails the suite first, then the recalibration
  * procedure in the q_compress_ratio Scaladoc refreshes the pins.
  *
  * Native-memory lifecycle: one Deflater per task thread, retained for
  * the executor's life (bounded: threads × ~256 KB zlib state — the
  * standard thread-local-codec trade). A JVM shutdown hook `end()`s
  * every instance so the native state is released deterministically
  * rather than waiting on finalization.
  */
object CompressImpl {
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[java.util.zip.Deflater]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var d = live.poll()
    while (d != null) { d.end(); d = live.poll() }
  }))
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater = {
      val d = new java.util.zip.Deflater(6, true)
      live.add(d)
      d
    }
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Deflated byte length of the UTF-8 text (raw stream, level 6). */
  def deflateLen(s: UTF8String): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val b = buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(b)
    total
  }
}

/** graft_deflate_len(string) -> long: DEFLATE-compressed byte length. */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len expects string, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    CompressImpl.deflateLen(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressImpl.deflateLen($c)")
  override protected def withNewChildInternal(c: Expression): DeflateLen =
    copy(child = c)
}

object CompressFunctions {
  def deflateLen(text: Column): Column =
    ExpressionUtils.column(DeflateLen(ExpressionUtils.expression(text)))
}
