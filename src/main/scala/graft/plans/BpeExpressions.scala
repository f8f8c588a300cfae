package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-pair-encoding kernels: the ENCODE side of the BPE tokenizer
 * ([[graft.operators.Bpe]] trains the merge table; this applies it inside
 * whole-stage codegen). Symbols are Unicode CODE POINTS (surrogate pairs
 * never split), each word closed by the single-codepoint end-of-word
 * marker U+E000 (private use; stripped from input words, so a marker in a
 * token is always word-final and decode is an exact string operation).
 *
 * Merge application is the classic deterministic loop: repeatedly merge
 * the present pair with the LOWEST learned rank, all occurrences
 * left-to-right, until no learned pair remains — which reproduces the
 * training-time segmentation of every trained word exactly (training
 * applies merges in the same order with the same left-to-right rule).
 */
object BpeKernels {

  /** End-of-word marker codepoint (U+E000, private use). */
  final val MarkerCp = 0xE000
  final val Marker = new String(Character.toChars(MarkerCp))

  /** Code-point-order string comparison — parity with DuckDB's binary UTF-8
    * collation (Java's String.compareTo is UTF-16 code-unit order, which
    * disagrees for supplementary planes vs [U+E000, U+FFFF]). */
  def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Initial symbol sequence of a word: its code points (marker code points
    * stripped — they are the tokenizer's own alphabet) followed by the
    * end-of-word marker. Null for a word empty after stripping. */
  def initialSymbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      if (cp != MarkerCp) out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    if (out.isEmpty) null
    else { out += Marker; out.toArray }
  }

  /** Merge every left-to-right occurrence of the adjacent pair (l, r). */
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Encode one word: lowest-rank-present merge loop (see object doc). */
  def encodeWord(word: String, vocab: BpeVocab): Array[String] = {
    var syms = initialSymbols(word)
    if (syms == null) return null
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = vocab.rankOf(syms(i), syms(i + 1))
        if (rk >= 0 && rk < bestRank) { bestRank = rk; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = applyMerge(syms, syms(bestIdx), syms(bestIdx + 1))
    }
    syms
  }

  /** Expression kernel: array of (already-tokenized) words → array of BPE
    * tokens; null/empty words are skipped. */
  def encode(words: ArrayData, vocab: BpeVocab): ArrayData = {
    val n = words.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val toks = encodeWord(words.getUTF8String(i).toString, vocab)
        if (toks != null) {
          var j = 0
          while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Learned merge table with O(1) rank lookup; broadcast into generated code
  * via `addReferenceObj`. */
final class BpeVocab(val merges: Array[(String, String)]) extends Serializable {
  @transient private lazy val ranks: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.putIfAbsent(merges(i), Integer.valueOf(i)); i += 1 }
    m
  }
  /** Rank of pair (l, r), or -1 when unlearned. */
  def rankOf(l: String, r: String): Int = {
    val v = ranks.get((l, r))
    if (v == null) -1 else v.intValue()
  }
}

/** `bpe_encode(words)` → array<string> of BPE tokens for an array of words
  * (the output of the standard whitespace tokenization); the merge table is
  * a constructor constant riding the codegen reference array, so the scan
  * stays inside whole-stage codegen with zero per-row model cost. */
case class BpeEncode(child: Expression, mergePairs: Seq[(String, String)])
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val vocab = new BpeVocab(mergePairs.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case other => TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(words: Any): Any =
    BpeKernels.encode(words.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeKernels.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
