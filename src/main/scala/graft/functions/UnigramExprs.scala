package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maximal-munch (longest-match-first) word segmentation against a fixed
  * piece vocabulary — the deterministic inference rule of the unigram-LM
  * tokenizer family (operators/Tokenize.scala trainUnigram; the
  * WordPiece/SentencePiece greedy decode). Row-local and shuffle-free:
  * the vocabulary ships once per executor as a codegen reference object
  * (the compiled-pattern pattern of Spark's own RegExpExtract, same as
  * BpeEncode), so encoding runs at scan speed over any corpus size.
  *
  * The segmentation must agree CHARACTER-FOR-CHARACTER with the DuckDB
  * oracle's recursive-CTE replay (four length-ordered LEFT JOINs +
  * COALESCE): at each position try the longest piece first
  * (min(maxPieceLen, remaining) down to 1); every single character of
  * the corpus is in the vocabulary by construction (candidate
  * generation keeps ALL length-1 substrings), so the scan always
  * advances. The defensive fallback for an out-of-alphabet character
  * (possible only on inputs outside the training corpus) emits the
  * character itself — the same "unknown maps to itself" convention
  * SentencePiece's byte-fallback uses. */
object UnigramImpl {
  val MaxPieceLen = 4

  def buildVocab(pieces: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.size * 2)
    pieces.foreach(s.add)
    s
  }

  /** Greedy longest-match segmentation of one word. Positions are
    * Unicode code points (UTF8String.substringSQL semantics), matching
    * DuckDB's substr/length exactly. */
  def segment(word: UTF8String,
      vocab: java.util.HashSet[String]): ArrayData = {
    val n = word.numChars()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < n) {
      var l = math.min(MaxPieceLen, n - pos)
      var piece: UTF8String = null
      while (l >= 1 && piece == null) {
        val c = word.substringSQL(pos + 1, l)
        if (vocab.contains(c.toString)) piece = c
        else l -= 1
      }
      if (piece == null) { // out-of-alphabet: emit the character itself
        piece = word.substringSQL(pos + 1, 1)
      }
      out += piece
      pos += piece.numChars()
    }
    new GenericArrayData(out.toArray)
  }
}

/** unigram_segment(word) -> array<string> — native codegen expression
  * carrying the learned piece vocabulary. */
case class UnigramSegment(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  @transient private lazy val set = UnigramImpl.buildVocab(vocab)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment expects string, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    UnigramImpl.segment(v.asInstanceOf[UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramImpl.segment($c, $vocabRef)")
  }
  override protected def withNewChildInternal(c: Expression): UnigramSegment =
    copy(child = c)
}

object UnigramFunctions {
  def unigramSegment(word: Column, vocab: Seq[String]): Column =
    ExpressionUtils.column(
      UnigramSegment(ExpressionUtils.expression(word), vocab))
}
