package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Vector primitives over `array<float>` embedding columns.
  *
  * Implemented as a native Catalyst expression with `doGenCode` (not a
  * Scala UDF): the generated code is a static call on primitive arrays,
  * so it stays inside whole-stage codegen with no boxing / Row conversion
  * — this is the innermost loop of brute-force similarity (O(n·k·d)
  * evaluations), exactly where UDF overhead would dominate at scale.
  *
  * Math is done in double with a single sequential pass (dot and both
  * norms fused), matching the oracle's explicit-formula spelling.
  */
object VectorImpl {
  /** Cosine similarity; null (NaN boxed to null upstream) on zero norm. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) Double.NaN else dot / denom
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
}

/** cosine(array<float>, array<float>) -> double; null if either input is
  * null or a norm is zero. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = VectorImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (v.isNaN) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ctx.freshName("cos")
      s"""
         |double $v = graft.functions.VectorImpl.cosine($a, $b);
         |if (Double.isNaN($v)) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** Column API: cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
