package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the dedup hot path: word shingling,
 * MinHash signatures and SimHash — the per-document inner loops of
 * [[graft.operators.Dedup]] / [[graft.operators.TextAnalysis]]. At 100 TB
 * these run once per document over the whole corpus; the previous
 * implementations paid either a Scala-UDF conversion boundary (shingles,
 * simhash vote) or `numHashes` interpreted higher-order array traversals
 * per row (minhash signature: 32 × transform+array_min). These kernels do
 * ONE pass over the UTF8String bytes / shingle array inside whole-stage
 * codegen, with zero String allocation for tokenization.
 *
 * Semantics are BIT-IDENTICAL to the previous implementations (and so to
 * the DuckDB oracles): tokenization is `text.trim.toLowerCase.split("\\s+")`
 * (Java semantics, including the empty-string → [""] edge), string hashing
 * is Spark's `xxhash64` (XXH64, seed 42), and the xor-permutation family
 * uses the same splitmix64 constants. TextExprSpec pins equality against
 * the legacy UDF/HOF paths row-for-row.
 *
 * SQL names: `word_shingles`, `minhash_signature`, `simhash64`
 * ([[GraftFunctions]]).
 */
object TextKernels {

  /** Spark's xxhash64 default seed (XxHash64 expression). */
  private final val Seed = 42L

  private def xxh64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, Seed)

  /** splitmix64 — identical to TextFunctions.mixConstant (oracle parity). */
  def mixConstant(i: Int): Long = {
    var z = i.toLong * 0x9E3779B97F4A7C15L + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Java `\s` bytes — the only token separators after trim. (Java trim
    * strips ALL chars ≤ 0x20 at the ends; interior control chars that are
    * not `\s` stay inside tokens, exactly like `split("\\s+")`.) */
  private def isSep(b: Byte): Boolean = {
    val c = b & 0xff
    c == 0x20 || (c >= 0x09 && c <= 0x0d)
  }

  /**
   * `trim.toLowerCase.split("\\s+")` + n-token windows joined by single
   * spaces, in one byte pass. UTF-8 continuation bytes are ≥ 0x80, so the
   * ASCII separator scan never splits a multibyte char. Fewer than n tokens
   * → empty array (the Java `"".split` → [""] edge collapses there for
   * n ≥ 2, and yields [""] for n = 1, matching the legacy UDF exactly).
   */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    if (text == null || n <= 0) return new GenericArrayData(Array.empty[Any])
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    // Java String.trim: strip chars <= U+0020 from both ends
    var lo = 0
    var hi = bytes.length
    while (lo < hi && (bytes(lo) & 0xff) <= 0x20) lo += 1
    while (hi > lo && (bytes(hi - 1) & 0xff) <= 0x20) hi -= 1
    // token boundaries
    var m = 0
    val starts = new Array[Int](math.max((hi - lo) / 2 + 1, 1))
    val ends = new Array[Int](starts.length)
    var i = lo
    while (i < hi) {
      if (!isSep(bytes(i))) {
        starts(m) = i
        while (i < hi && !isSep(bytes(i))) i += 1
        ends(m) = i
        m += 1
      } else i += 1
    }
    if (m == 0) {
      // trimmed-empty: Java "".split("\s+") is [""] — one empty token
      if (n == 1) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
      return new GenericArrayData(Array.empty[Any])
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var w = 0
    while (w < out.length) {
      var len = n - 1
      var j = 0
      while (j < n) { len += ends(w + j) - starts(w + j); j += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val tl = ends(w + j) - starts(w + j)
        System.arraycopy(bytes, starts(w + j), buf, pos, tl)
        pos += tl
        j += 1
      }
      out(w) = UTF8String.fromBytes(buf)
      w += 1
    }
    new GenericArrayData(out)
  }

  /**
   * DISTINCT character n-grams of `lower(text)` in first-occurrence order
   * — one pass + hash set, replacing the O(len·n) per-row array build +
   * O(len²) `array_distinct` of the HOF formulation (measured ~4× on the
   * trigram posting scan). Code-point slicing (surrogate-aware slow path)
   * matches SQL `substring` and DuckDB `substr` semantics; fewer than n
   * code points → empty array. First-occurrence order is exactly what
   * `array_distinct` preserves, so the replacement is value-identical.
   */
  def charGrams(text: UTF8String, n: Int): ArrayData = {
    if (text == null || n <= 0) return new GenericArrayData(Array.empty[Any])
    val s = text.toLowerCase.toString
    val seen = new java.util.LinkedHashSet[String]()
    val cpCount = s.codePointCount(0, s.length)
    if (cpCount >= n) {
      if (cpCount == s.length) {
        // BMP-only fast path: code points == chars
        var i = 0
        while (i + n <= s.length) { seen.add(s.substring(i, i + n)); i += 1 }
      } else {
        var charIdx = 0
        var cp = 0
        while (cp + n <= cpCount) {
          seen.add(s.substring(charIdx, s.offsetByCodePoints(charIdx, n)))
          charIdx += Character.charCount(s.codePointAt(charIdx))
          cp += 1
        }
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /**
   * MinHash signature in one pass: each shingle is xxhash64'd ONCE; the
   * `numHashes` family members are xor-permutations by splitmix64 constants.
   * Empty input → all-null signature (matching `array_min(empty) = null` in
   * the legacy HOF formulation; callers filter `size(sh) > 0` anyway).
   */
  def minhashSignature(sh: ArrayData, numHashes: Int): ArrayData = {
    val m = sh.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](math.max(numHashes, 0)))
    val consts = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) { consts(j) = mixConstant(j); j += 1 }
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < m) {
      val s = sh.getUTF8String(i)
      // null element → seed, matching Spark's xxhash64(NULL) = seed semantics
      val h = if (s == null) Seed else xxh64(s)
      j = 0
      while (j < numHashes) {
        val v = h ^ consts(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    j = 0
    while (j < numHashes) { out(j) = mins(j); j += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash: hash each token once (xxhash64), majority-vote each bit
    * (strict majority, `2·count > n`). Empty input → 0L. */
  def simHash64(tokens: ArrayData): Long = {
    val m = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < m) {
      val s = tokens.getUTF8String(i)
      val h = if (s == null) Seed else xxh64(s)
      var b = 0
      while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > m) out |= (1L << b); b += 1 }
    out
  }

  /** Unicode normalization via the JDK's standard-conformant Normalizer.
    * `Normalizer.isNormalized` is a cheap scan that short-circuits the
    * common already-normalized case (most crawled text) without the
    * allocate-and-rebuild of `normalize` — the fast path at corpus scale. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** CDC window width in bytes (fixed — part of the chunking contract). */
  final val CdcWindow = 16

  /** Gear table for content-defined chunking: splitmix64 of `0x10000 + b`
    * (a namespace disjoint from the minhash constants) — 256 longs,
    * recomputable in any engine from the published splitmix64 function
    * (the DuckDB oracle inlines them as literals, the SRP-table precedent). */
  def gearConstant(b: Int): Long = mixConstant(0x10000 + b)

  private lazy val GearTable: Array[Long] =
    Array.tabulate(256)(gearConstant)

  /**
   * Content-defined chunking (windowed-Gear variant): a chunk boundary
   * falls AFTER byte `i` (0-based, `i ≥ 15`) iff the windowed hash
   * `h_i = Σ_{j=0..15} gear(b_{i-j}) · 2^j (mod 2^64)` has its TOP
   * `maskBits` bits zero (`h_i >>> (64 − maskBits) == 0`). Top-bit test,
   * not bottom: `gear(b)·2^j mod 2^k` vanishes for `j ≥ k`, so a low-bit
   * mask would degenerate the window to its trailing `maskBits` bytes;
   * the top bits take carries from every term. Boundaries depend only on
   * the local 16-byte window — the property that makes CDC dedup robust
   * to insertions/shifts (a one-byte edit moves at most the two adjacent
   * boundaries, unlike fixed-size blocks where everything downstream
   * shifts) — and position-independence is also what lets the DuckDB
   * oracle replay every boundary as an independent windowed sum.
   *
   * One O(n) pass, O(1) per byte (incremental window update; Long wrap IS
   * mod 2^64). Returns array<struct<start,len>> in BYTE offsets into the
   * UTF-8 encoding; empty text → empty array; text shorter than the
   * window → one whole-text chunk. Expected chunk length ≈ `2^maskBits`.
   */
  def cdcChunks(text: UTF8String, maskBits: Int): ArrayData = {
    if (text == null || maskBits <= 0 || maskBits >= 64)
      return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val w = CdcWindow
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    if (n >= w) {
      // initial window [0, w-1]
      var h = 0L
      var j = 0
      while (j < w) { h += GearTable(bytes(w - 1 - j) & 0xff) << j; j += 1 }
      val shift = 64 - maskBits
      var i = w - 1
      while (i < n) {
        if ((h >>> shift) == 0L) {
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](start, i - start + 1))
          start = i + 1
        }
        i += 1
        if (i < n) {
          // slide: drop b_{i-w}, shift, add b_i
          h = ((h - (GearTable(bytes(i - w) & 0xff) << (w - 1))) << 1) +
            GearTable(bytes(i) & 0xff)
        }
      }
    }
    if (start < n)
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](start, n - start))
    new GenericArrayData(out.toArray)
  }

  /** Karp-Rabin polynomial base — prime > 2^20, so every Unicode codepoint
    * (< 2^21) is injected without aliasing for BMP text. Public: the DuckDB
    * oracle builder replays the identical arithmetic. */
  final val WinnowBase = 1048583L

  /** Karp-Rabin modulus — prime < 2^41, chosen so every intermediate stays
    * inside int64 WITHOUT wraparound in either engine:
    * (Mod−1)·Base + 2^21 < 2^63 (Spark would wrap silently, DuckDB would
    * raise — neither happens), and 41-bit hashes keep birthday collisions
    * negligible at corpus scale (~10^3 among 10^8 grams). */
  final val WinnowMod = 2199023255531L

  /**
   * Robust winnowing selection (Schleimer, Wilkerson & Aiken, SIGMOD 2003)
   * over an ALREADY-NORMALIZED string, in one compiled pass:
   *
   *  1. every codepoint `k`-gram is hashed with an exact Karp-Rabin rolling
   *     polynomial — h = (((c₁·B + c₂)·B + c₃)…) mod M with B=[[WinnowBase]],
   *     M=[[WinnowMod]] — O(1) per position via the rolling update
   *     h' = ((h + M − c_old·Bᵏ⁻¹ mod M)·B + c_new) mod M (the md5-per-gram
   *     formulation this replaces cost a full digest per position);
   *  2. each sliding window of `w` consecutive gram hashes selects its
   *     MINIMUM, ties broken by the RIGHTMOST position (robust winnowing),
   *     via a monotone deque — O(n) total, not O(n·w);
   *  3. repeated selections collapse. The selected position strictly
   *     increases whenever the selection changes (a new rightmost-min is
   *     strictly later), so consecutive-dedup equals global distinct.
   *
   * Documents with ≥ 1 gram but fewer than `w` get one window over all
   * their grams; n < 1 → empty array. Returns array<struct<pos:int,
   * fp:bigint>> with 1-based codepoint gram positions.
   */
  def winnowSelect(nm: UTF8String, k: Int, w: Int): ArrayData = {
    if (nm == null || k < 1 || w < 1)
      return new GenericArrayData(Array.empty[Any])
    val cps = nm.toString.codePoints().toArray
    val n = cps.length - (k - 1)
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val B = WinnowBase
    val M = WinnowMod
    var pow = 1L // B^(k-1) mod M
    var t = 0
    while (t < k - 1) { pow = pow * B % M; t += 1 }
    val hs = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    hs(0) = h
    var p = 1
    while (p < n) {
      // all terms nonnegative and < 2^63: h + M < 2^42, ·B < 2^62
      h = ((h + M - cps(p - 1) * pow % M) * B + cps(p + k - 1)) % M
      hs(p) = h
      p += 1
    }
    val nw = math.max(n - w + 1, 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    // monotone deque of 0-based indices, hash values strictly increasing
    // front→back; pushing pops `>=` so among equal minima the LATEST index
    // survives at the front — exactly the rightmost-min tie-break
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var lastSel = -1
    var j = 0
    var win = 0
    while (win < nw) {
      val end = math.min(win + w - 1, n - 1) // short-doc single window: all grams
      while (j <= end) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j
        tail += 1
        j += 1
      }
      while (dq(head) < win) head += 1
      val sel = dq(head)
      if (sel != lastSel) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](sel + 1, hs(sel)))
        lastSel = sel
      }
      win += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_chunks(text, maskBits)` → array<struct<start:int, len:int>> (byte
  * offsets into the UTF-8 encoding) — see [[TextKernels.cdcChunks]]. */
case class CdcChunks(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = CdcChunks.Schema
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"$prettyName expects (string, int), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(text: Any, maskBits: Any): Any =
    TextKernels.cdcChunks(text.asInstanceOf[UTF8String], maskBits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.plans.TextKernels.cdcChunks($t, $m)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CdcChunks {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)
}

/** `winnow_select(normalizedText)` → array<struct<pos:int, fp:bigint>> —
  * the full robust-winnowing selection in one compiled pass (see
  * [[TextKernels.winnowSelect]]). `k`/`w` are plan-time constants (the
  * [[TextNormalize]] convention), so codegen emits them as int literals. */
case class WinnowSelect(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k >= 1, s"winnow_select: gram size k must be >= 1, got $k")
  require(w >= 1, s"winnow_select: window size w must be >= 1, got $w")
  override def dataType: DataType = WinnowSelect.Schema
  override def prettyName: String = "winnow_select"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(nm: Any): Any =
    TextKernels.winnowSelect(nm.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.TextKernels.winnowSelect($t, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelect {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
}

/** `word_shingles(text, n)` → array<string> (see [[TextKernels.shingles]]).
  * Standard null propagation (null text → null); the public wrapper
  * [[graft.functions.TextFunctions.shingles]] coalesces to an empty array to
  * preserve the legacy UDF contract (`size(sh) > 0` filters). */
case class WordShingles(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"$prettyName expects (string, int), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(text: Any, n: Any): Any =
    TextKernels.shingles(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.plans.TextKernels.shingles($t, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `char_grams(text, n)` → array<string>: distinct character n-grams of
  * lower(text), first-occurrence order ([[TextKernels.charGrams]]). */
case class CharGrams(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"$prettyName expects (string, int), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(text: Any, n: Any): Any =
    TextKernels.charGrams(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.plans.TextKernels.charGrams($t, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `minhash_signature(shingles, numHashes)` → array<bigint>. */
case class MinHashSignature(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"$prettyName expects (array<string>, int), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(sh: Any, num: Any): Any =
    TextKernels.minhashSignature(sh.asInstanceOf[ArrayData], num.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sh, n) => s"graft.plans.TextKernels.minhashSignature($sh, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * `text_normalize(text, form)` → string: Unicode normalization via the
 * JDK's standard-conformant `java.text.Normalizer` (NFC/NFD/NFKC/NFKD),
 * inside whole-stage codegen — the canonicalization pass a crawled corpus
 * runs before tokenization/dedup (decomposed accents, compatibility forms
 * and lookalike codepoints otherwise defeat exact and shingle dedup).
 * `form` is a plan-time constant; the NFC path is DuckDB-oracle-checked
 * (`nfc_normalize` implements the same Unicode standard).
 */
case class TextNormalize(child: Expression, form: String) extends UnaryExpression {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"text_normalize: unknown form $form")
  override def dataType: DataType = StringType
  override def prettyName: String = "text_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    TextKernels.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"""graft.plans.TextKernels.normalize($s, "$form")""")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash64(tokens)` → bigint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any =
    TextKernels.simHash64(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.TextKernels.simHash64($t)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
