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

  // ---- random-hyperplane LSH signatures (one native pass per row) ----

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * splitmix64 of the index pair mapped to (-1, 1). No RNG state — every
    * executor regenerates identical planes, nothing is shipped. */
  def planeComponent(plane: Int, dim: Int): Double = {
    val h = TextImpl.mix64(plane.toLong * 131071L + dim.toLong * 524287L + 17L)
    (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** Plane matrix for (numPlanes, dim), built once per executor JVM. */
  private def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((numPlanes, dim),
      _ => Array.tabulate(numPlanes, dim)(planeComponent))

  /** Banded sign-sketch: one int per band, bit j of band b = sign of the
    * dot with plane b*bandBits+j. Equivalent to the HOF spelling
    * (zip_with+aggregate per plane) bit-for-bit — same summation order —
    * but a single fused native loop instead of numPlanes interpreted
    * lambda evaluations per row. */
  def lshBands(emb: ArrayData, numPlanes: Int, bandBits: Int): ArrayData = {
    require(bandBits >= 1 && bandBits <= 31 && numPlanes >= 1 &&
      numPlanes % bandBits == 0,
      s"lsh_bands: need bandBits in 1..31 and numPlanes a positive multiple of it, " +
        s"got (numPlanes=$numPlanes, bandBits=$bandBits)")
    val d = emb.numElements()
    val pl = planes(numPlanes, d)
    val out = new Array[Int](numPlanes / bandBits)
    var p = 0
    while (p < numPlanes) {
      val row = pl(p)
      var s = 0.0
      var i = 0
      while (i < d) { s += emb.getFloat(i).toDouble * row(i); i += 1 }
      if (s > 0) out(p / bandBits) |= (1 << (p % bandBits))
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // ---- int8 symmetric quantization (storage/serving compression) ----

  /** Reconstruction stats for symmetric int8 quantization of one vector:
    * scale = max|x| / 127, q_i = floor(x_i/scale + 0.5) (EXPLICIT floor,
    * not banker's rounding — the one integer-ization spelling both
    * engines compute bit-identically), err = |q*scale - x|. Returns
    * (scale, max_abs_err); every op is a single IEEE double op in index
    * order, so the oracle's list_transform spelling reproduces the exact
    * bits. One fused pass; no per-element HOF-interpreter evaluation of
    * the scale subexpression (the CollapseProject recompute trap). */
  def int8QuantStats(emb: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val d = emb.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < d) {
      val a = math.abs(emb.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    var maxErr = 0.0
    if (scale != 0.0) {
      i = 0
      while (i < d) {
        val x = emb.getFloat(i).toDouble
        val err = math.abs(math.floor(x / scale + 0.5) * scale - x)
        if (err > maxErr) maxErr = err
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, maxErr))
  }

  // ---- IVF coarse quantizer (the second ANN scale path) ----

  /** Deterministic pseudo-random centroid component — same generator
    * family as the LSH planes, offset into a disjoint seed space. */
  def centroidComponent(cell: Int, dim: Int): Double =
    planeComponent(1 << 20 | cell, dim)

  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def centroids(k: Int, dim: Int): Array[Array[Double]] =
    centroidCache.computeIfAbsent((k, dim),
      _ => Array.tabulate(k, dim)(centroidComponent))

  /** IVF cell assignment: ids of the `nprobe` nearest of `k` deterministic
    * centroids by dot product, nearest first (ties -> lowest id). One
    * fused native pass; k*d flops per row. */
  def ivfCells(emb: ArrayData, k: Int, nprobe: Int): ArrayData = {
    require(k >= 1 && nprobe >= 1 && nprobe <= k,
      s"ivf_cells: need 1 <= nprobe <= k, got (k=$k, nprobe=$nprobe)")
    val d = emb.numElements()
    val cs = centroids(k, d)
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val row = cs(c)
      var s = 0.0
      var i = 0
      while (i < d) { s += emb.getFloat(i).toDouble * row(i); i += 1 }
      dots(c) = s
      c += 1
    }
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < nprobe) {
      var best = -1
      var bestV = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!taken(i) && dots(i) > bestV) { bestV = dots(i); best = i }
        i += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

/** lsh_bands(array<float>, numPlanes, bandBits) -> array<int> band values. */
case class LshBands(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, IntegerType) =>
        // surface bad constants at analysis time, not as executor crashes
        (if (second.foldable) Option(second.eval()) else None,
          if (third.foldable) Option(third.eval()) else None) match {
          case (Some(np: Int), Some(bb: Int))
              if bb < 1 || bb > 31 || np < 1 || np % bb != 0 =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
              s"lsh_bands: need bandBits in 1..31 and numPlanes a positive multiple of it, got ($np, $bb)")
          case _ =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        }
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bands expects (array<float>, int, int), got ($a, $b, $c)")
    }
  override def nullSafeEval(emb: Any, np: Any, bb: Any): Any =
    VectorImpl.lshBands(emb.asInstanceOf[ArrayData], np.asInstanceOf[Int], bb.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, np, bb) => s"graft.functions.VectorImpl.lshBands($e, $np, $bb)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LshBands = copy(f, s, t)
}

/** ivf_cells(array<float>, k, nprobe) -> array<int> nearest-centroid ids. */
case class IvfCells(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, IntegerType) =>
        (if (second.foldable) Option(second.eval()) else None,
          if (third.foldable) Option(third.eval()) else None) match {
          case (Some(k: Int), Some(np: Int)) if k < 1 || np < 1 || np > k =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
              s"ivf_cells: need 1 <= nprobe <= k, got (k=$k, nprobe=$np)")
          case _ =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        }
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ivf_cells expects (array<float>, int, int), got ($a, $b, $c)")
    }
  override def nullSafeEval(emb: Any, k: Any, np: Any): Any =
    VectorImpl.ivfCells(emb.asInstanceOf[ArrayData], k.asInstanceOf[Int], np.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, k, np) => s"graft.functions.VectorImpl.ivfCells($e, $k, $np)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): IvfCells = copy(f, s, t)
}

/** int8_quant_stats(array<float>) -> struct<scale: double, max_abs_err:
  * double> — symmetric int8 quantization reconstruction stats. */
case class Int8QuantStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_quant_stats expects array<float>, got $t")
    }
  override def nullSafeEval(emb: Any): Any =
    VectorImpl.int8QuantStats(emb.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.VectorImpl.int8QuantStats($e)")
  override protected def withNewChildInternal(c: Expression): Int8QuantStats =
    copy(child = c)
}

object VectorFunctions {
  import org.apache.spark.sql.functions.lit
  /** Column API: cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  /** Column API: banded random-hyperplane sign-sketch of an embedding. */
  def lshBands(emb: Column, numPlanes: Int, bandBits: Int): Column =
    ExpressionUtils.column(LshBands(
      ExpressionUtils.expression(emb),
      ExpressionUtils.expression(lit(numPlanes)),
      ExpressionUtils.expression(lit(bandBits))))
  /** Column API: IVF cell ids (nprobe nearest centroids, nearest first). */
  def ivfCells(emb: Column, k: Int, nprobe: Int): Column =
    ExpressionUtils.column(IvfCells(
      ExpressionUtils.expression(emb),
      ExpressionUtils.expression(lit(k)),
      ExpressionUtils.expression(lit(nprobe))))
  /** Column API: int8 quantization reconstruction stats struct. */
  def int8QuantStats(emb: Column): Column =
    ExpressionUtils.column(Int8QuantStats(ExpressionUtils.expression(emb)))
  /** Column API: per-subspace product-quantization code array — element
    * m = nearest-centroid id (of k) of the m-th contiguous subvector
    * (dynamic subvector width size/m, no plan-time dimension constant).
    * Composes the IvfCells kernel per slice; the single definition both
    * `Similarity.pqCodes` and the SQL face (`graft_pq_codes`) share, so
    * the two spellings cannot drift. */
  def pqCodes(emb: Column, m: Int, k: Int): Column = {
    import org.apache.spark.sql.functions.{array, element_at, size, slice}
    require(m >= 1 && k >= 1, s"pqCodes needs m, k >= 1, got ($m, $k)")
    val sub = (size(emb) / m).cast("int")
    array((0 until m).map { i =>
      element_at(ivfCells(slice(emb, lit(i) * sub + 1, sub), k, 1), 1)
    }: _*)
  }
}
