package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave — the multi-dimension clustering key
  * behind Delta/Iceberg-style OPTIMIZE ZORDER BY: sorting by the
  * interleaved key makes rows close in BOTH dimensions land in the same
  * files, so min/max file statistics prune 2-D range predicates that a
  * single-column sort can only prune on its leading column.
  *
  * Inputs are masked to their low 16 bits (z-ordering clusters on COARSE
  * buckets by design — file-level locality needs ~thousands of cells,
  * not billions), which also keeps every shift below 33 so the same
  * arithmetic is exact signed-64-bit in any engine. */
object LayoutImpl {
  /** bit i of x → bit 2i, bit i of y → bit 2i+1 (low 16 bits each). */
  def zorder2(x0: Long, y0: Long): Long = {
    val x = x0 & 0xFFFFL
    val y = y0 & 0xFFFFL
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** graft_zorder(x, y) -> long Morton key of the two low-16-bit values. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder expects two integral columns, got ($l, $r)")
    }
  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
  }
  override def nullSafeEval(x: Any, y: Any): Any =
    LayoutImpl.zorder2(toLong(x), toLong(y))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.LayoutImpl.zorder2((long)($x), (long)($y))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
  override def prettyName: String = "graft_zorder"
}

object LayoutFunctions {
  def zorder(x: Column, y: Column): Column =
    ExpressionUtils.column(ZOrder2(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
}
