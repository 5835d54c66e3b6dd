package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text hashing primitives for near-dup detection and fingerprinting,
  * as codegen-friendly Catalyst expressions (static primitive-typed
  * calls inside whole-stage codegen; no UDF boxing on the hot path).
  *
  * All hashes are self-contained 64-bit mixes (splitmix64 over FNV-1a),
  * fully deterministic across runs/partitions — a hard requirement for
  * dedup at 100 TB, where signatures computed in different jobs must
  * agree bit-for-bit.
  */
object TextImpl {
  /** FNV-1a 64 over UTF-8 bytes, finalized with splitmix64. */
  def hash64(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    mix64(h)
  }

  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lower 64 bits of MD5 over UTF-8 bytes: the LAST 8 digest bytes,
    * little-endian — bit-for-bit what DuckDB's `md5_number_lower`
    * computes. Chosen as the SimHash token hash (over the faster FNV
    * mix) precisely for that property: fingerprints become CROSS-ENGINE
    * REPLAYABLE, so the q_simhash_* oracles recompute them from raw
    * text instead of trusting ours — and at 100 TB, signatures that any
    * engine can independently reproduce are what make incremental dedup
    * runs auditable. (MD5 here is a hash of already-public text for
    * similarity bucketing, not a security boundary.) */
  def md5Lower64(s: UTF8String): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  /** Content-defined-chunking cut positions: every CHAR position j
    * (1-based, window-end) where md5-lower-64 of the trailing `w`-char
    * window, sign-masked, ≡ 0 (mod `mod`) — plus the text length as the
    * final cut (possibly duplicated; the caller filters empty chunks,
    * matching the SQL oracle's `list_append(list_filter(...), len)`).
    * Char→byte offsets are precomputed once so each window digests a
    * byte SLICE directly — the naive substringSQL-per-position spelling
    * is O(len²) per document and was measured 20× slower. MD5-per-window
    * (vs a rolling Gear/Rabin hash) is the deliberate replayability
    * trade documented at the operator. */
  def cdcCuts(s: UTF8String, w: Int, mod: Long): ArrayData = {
    val bytes = s.getBytes
    // char-start byte offsets: offs(k) = byte offset of char k (0-based)
    val nChars = s.numChars()
    val offs = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (c < nChars) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(nChars) = bytes.length
    val md = Md5.get()
    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    var j = w
    while (j <= nChars) {
      md.reset()
      md.update(bytes, offs(j - w), offs(j) - offs(j - w))
      val d = md.digest()
      var h = 0L
      var i = 15
      while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
      if ((h & Long.MaxValue) % mod == 0L) buf += j
      j += 1
    }
    buf += nChars
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
  }

  /** SimHash over an array of tokens: per 64-bit lane, +1 for a set bit,
    * -1 for a clear bit, output bit = sign of the lane sum. Token hash
    * is [[md5Lower64]], so a SQL oracle replays fingerprints exactly. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Lower64(tokens.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Winnowing-style document fingerprint: Karp-Rabin rolling hash over
    * a `w`-char window of the text, min hash value wins (the classic
    * MOSS/winnowing reduction to a single stable fingerprint). */
  def rollingMinHash(s: UTF8String, w: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length == 0) return mix64(0L)
    if (bytes.length <= w) return mix64(hash64(s, 1L))
    val B = 0x100000001b3L
    // B^(w-1) for the roll-out term
    var bw = 1L
    var k = 0
    while (k < w - 1) { bw *= B; k += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var min = mix64(h)
    while (i < bytes.length) {
      h = (h - (bytes(i - w) & 0xffL) * bw) * B + (bytes(i) & 0xffL)
      val m = mix64(h)
      if (java.lang.Long.compareUnsigned(m, min) < 0) min = m
      i += 1
    }
    min
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---- word-3-gram shingle hashing (one pass over the text) ----
  // The interpreted-HOF formulation (split -> transform -> concat_ws ->
  // hash per seed) re-evaluates the shingle array once per hash function
  // after projection collapse — ~16x the work. These single-pass natives
  // are what actually survives a 100 TB corpus scan.

  private val FnvInit = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** Hash of every word (single-space split, empty tokens kept — same
    * tokenization as split(text, ' ', -1)). */
  private def wordHashes(bytes: Array[Byte]): Array[Long] = {
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') n += 1; i += 1 }
    val out = new Array[Long](n)
    var w = 0
    var h = FnvInit
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') { out(w) = mix64(h); w += 1; h = FnvInit }
      else { h ^= (b & 0xffL); h *= FnvPrime }
      i += 1
    }
    out(w) = mix64(h)
    out
  }

  /** Multiset of word-n-gram hashes, in document order; texts with < n
    * words yield one whole-text hash. Position-sensitive combine chain
    * folded right-to-left: h = mix64(wh(i) + mix64(wh(i+1) + ... )).
    * The single implementation serves both the MinHash shingle basis
    * (n = 3) and decontamination (any n) — one chain, no drift. */
  def wordNGramMultiset(s: UTF8String, n: Int): Array[Long] = {
    require(n >= 1, s"word n-gram width must be >= 1, got $n")
    val wh = wordHashes(s.getBytes)
    if (wh.length < n) return Array(hash64(s, 7L))
    val out = new Array[Long](wh.length - n + 1)
    var i = 0
    while (i < out.length) {
      var h = mix64(wh(i + n - 1))
      var k = n - 2
      while (k >= 0) { h = mix64(wh(i + k) + h); k -= 1 }
      out(i) = h
      i += 1
    }
    out
  }

  def triGramHashMultiset(s: UTF8String): Array[Long] = wordNGramMultiset(s, 3)

  private def sortedDistinct(a: Array[Long]): ArrayData = {
    java.util.Arrays.sort(a)
    var n = 0
    var i = 0
    while (i < a.length) {
      if (i == 0 || a(i) != a(i - 1)) { a(n) = a(i); n += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(a, n))
  }

  /** Sorted distinct 3-gram hashes — the shingle SET for exact-Jaccard
    * verification of LSH candidates (array_intersect on sorted longs). */
  def triGramSet(s: UTF8String): ArrayData = sortedDistinct(triGramHashMultiset(s))

  /** Unicode NFC (canonical composition). Allocation-free when the input
    * is already normalized — the overwhelmingly common case, checked by
    * Normalizer's quick-check pass without building the composed string. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Sorted distinct word-n-gram hashes: one pass over the text, no
    * shingle strings materialized. */
  def wordNGramSet(s: UTF8String, n: Int): ArrayData =
    sortedDistinct(wordNGramMultiset(s, n))

  /** Max supported MinHash signature width. */
  val MaxMinHashes = 64
  // universal-hash family h_k(x) = a_k*x + b_k over Z/2^64 (a_k odd -> bijection)
  private val MinHashA = Array.tabulate(MaxMinHashes)(k => mix64(2L * k + 1) | 1L)
  private val MinHashB = Array.tabulate(MaxMinHashes)(k => mix64(2L * k + 2))

  /** MinHash signature over the 3-gram multiset (min of a multiset equals
    * min of its set, so no dedup needed): numHashes independent affine
    * permutations, elementwise min, one pass. */
  def minhashSig(s: UTF8String, numHashes: Int): ArrayData = {
    require(numHashes >= 1 && numHashes <= MaxMinHashes,
      s"trigram_minhash: numHashes must be in 1..$MaxMinHashes, got $numHashes")
    val grams = triGramHashMultiset(s)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < grams.length) {
      val h = grams(i)
      var k = 0
      while (k < numHashes) {
        val v = h * MinHashA(k) + MinHashB(k)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }
}

/** simhash64(array<string>) -> long */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got $t")
  }
  override def nullSafeEval(v: Any): Any = TextImpl.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextImpl.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** rolling_fingerprint(string, windowBytes) -> long */
case class RollingFingerprint(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint expects (string, int), got ($l, $r)")
    }
  override def nullSafeEval(s: Any, w: Any): Any =
    TextImpl.rollingMinHash(s.asInstanceOf[UTF8String], w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, w) => s"graft.functions.TextImpl.rollingMinHash($s, $w)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RollingFingerprint =
    copy(left = l, right = r)
}

/** graft_cdc_cuts(text, window, modulus) -> array<int> of chunk cut
  * positions (content-defined chunking; see TextImpl.cdcCuts). Native
  * because the per-window MD5 loop runs ~len digests per document — as
  * a higher-order-function lambda it evaluates INTERPRETED, measured
  * ~10x slower at sf0.1. */
case class CdcCuts(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_cuts expects (string, int, long), got ($a, $b, $c)")
    }
  override def nullSafeEval(s: Any, w: Any, m: Any): Any =
    TextImpl.cdcCuts(s.asInstanceOf[UTF8String], w.asInstanceOf[Int],
      m.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, w, m) => s"graft.functions.TextImpl.cdcCuts($s, $w, $m)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): CdcCuts = copy(first = a, second = b, third = c)
}

/** hash64(string, seed) -> long — the seeded token hash behind MinHash. */
case class Hash64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"hash64 expects (string, long), got ($l, $r)")
    }
  override def nullSafeEval(s: Any, seed: Any): Any =
    TextImpl.hash64(s.asInstanceOf[UTF8String], seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, seed) => s"graft.functions.TextImpl.hash64($s, $seed)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hash64 =
    copy(left = l, right = r)
}

/** trigram_minhash(string, numHashes) -> array<long> signature. */
case class TriGramMinHash(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        // validate a constant width at ANALYSIS time, not on an executor
        if (right.foldable) {
          val n = right.eval() match { case i: Int => i; case _ => -1 }
          if (n >= 1 && n <= TextImpl.MaxMinHashes) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"trigram_minhash: numHashes must be a constant in 1..${TextImpl.MaxMinHashes}, got $n")
        } else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"trigram_minhash expects (string, int), got ($l, $r)")
    }
  override def nullSafeEval(s: Any, n: Any): Any =
    TextImpl.minhashSig(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.functions.TextImpl.minhashSig($s, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TriGramMinHash =
    copy(left = l, right = r)
}

/** trigram_hashes(string) -> array<long> — sorted distinct shingle-set hashes. */
case class TriGramHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"trigram_hashes expects string, got $t")
  }
  override def nullSafeEval(v: Any): Any = TextImpl.triGramSet(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextImpl.triGramSet($c)")
  override protected def withNewChildInternal(c: Expression): TriGramHashes = copy(child = c)
}

/** word_ngram_hashes(string, n) -> array<long> — sorted distinct word
  * n-gram hashes; the shingle-hash set behind decontamination. */
case class WordNGramHashes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (right.foldable) {
          val n = right.eval() match { case i: Int => i; case _ => -1 }
          if (n >= 1) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"word_ngram_hashes: n must be a constant >= 1, got $n")
        } else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"word_ngram_hashes expects (string, int), got ($l, $r)")
    }
  override def nullSafeEval(s: Any, n: Any): Any =
    TextImpl.wordNGramSet(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.functions.TextImpl.wordNGramSet($s, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordNGramHashes =
    copy(left = l, right = r)
}

/** md5_lower64(string) -> long — the lower 64 bits of MD5 (last 8
  * digest bytes, little-endian), equal to DuckDB's `md5_number_lower`.
  * The cross-engine-replayable content hash behind SimHash tokens and
  * deterministic split assignment: any engine (or a Python auditor)
  * can recompute the exact value from the text alone. */
case class Md5Lower64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_lower64 expects string, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    TextImpl.md5Lower64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextImpl.md5Lower64($c)")
  override protected def withNewChildInternal(c: Expression): Md5Lower64 =
    copy(child = c)
}

/** nfc_normalize(string) -> string: Unicode canonical composition (NFC).
  * Spark has no normalization builtin, and dedup/digest keys over
  * user-supplied text MUST be normalization-invariant — "café" composed
  * and decomposed are byte-different but the same text. Implemented as a
  * native expression (not a UDF) so it runs inside whole-stage codegen;
  * the common already-normalized case is allocation-free via
  * Normalizer.isNormalized. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    TextImpl.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextImpl.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object TextFunctions {
  import org.apache.spark.sql.functions.lit
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))
  def nfcNormalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))
  def rollingFingerprint(text: Column, window: Int): Column =
    ExpressionUtils.column(RollingFingerprint(
      ExpressionUtils.expression(text), ExpressionUtils.expression(lit(window))))
  def cdcCuts(text: Column, window: Int, modulus: Long): Column =
    ExpressionUtils.column(CdcCuts(ExpressionUtils.expression(text),
      ExpressionUtils.expression(lit(window)),
      ExpressionUtils.expression(lit(modulus))))
  def hash64(s: Column, seed: Long): Column = hash64(s, lit(seed))
  /** Column seed variant — used inside higher-order lambdas where the
    * hash-function index is itself a column. */
  def hash64(s: Column, seed: Column): Column =
    ExpressionUtils.column(Hash64(
      ExpressionUtils.expression(s), ExpressionUtils.expression(seed)))
  def trigramMinhash(text: Column, numHashes: Int): Column = {
    require(numHashes > 0 && numHashes <= TextImpl.MaxMinHashes,
      s"numHashes must be in 1..${TextImpl.MaxMinHashes}")
    ExpressionUtils.column(TriGramMinHash(
      ExpressionUtils.expression(text), ExpressionUtils.expression(lit(numHashes))))
  }
  def trigramHashes(text: Column): Column =
    ExpressionUtils.column(TriGramHashes(ExpressionUtils.expression(text)))
  def md5Lower64(text: Column): Column =
    ExpressionUtils.column(Md5Lower64(ExpressionUtils.expression(text)))
  def wordNgramHashes(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    ExpressionUtils.column(WordNGramHashes(
      ExpressionUtils.expression(text), ExpressionUtils.expression(lit(n))))
  }
}
