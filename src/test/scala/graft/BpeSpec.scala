package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, BpeMerge}
import graft.plans.BpeKernels

/** BPE tokenizer: hand-computed merge sequence, encode/decode laws on
  * adversarial text, artifact roundtrip, determinism, codegen plan. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val M = BpeKernels.Marker

  // the classic BPE fixture: low×5 lower×2 newest×6 widest×3
  private lazy val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("doc_id", "text")

  test("training reproduces the hand-computed merge sequence with tie-breaks") {
    val m = Bpe.trainBpe(corpus, numMerges = 5).merges
    // round 1: (e,s)/(s,t)/(t,M) all 9 — left-asc tie-break picks (e,s)
    // round 2: (es,t)/(t,M) at 9 — 'es' < 't'
    // round 3: (est,M) alone at 9
    // round 4: (l,o)/(o,w) at 7 — 'l' < 'o'
    // round 5: (lo,w) at 7
    assert(m == Seq(
      BpeMerge("e", "s", 9L), BpeMerge("es", "t", 9L), BpeMerge("est", M, 9L),
      BpeMerge("l", "o", 7L), BpeMerge("lo", "w", 7L)))
  }

  test("encoding an UNSEEN word composes learned merges by rank") {
    val model = Bpe.trainBpe(corpus, numMerges = 5)
    val toks = corpus.limit(1)
      .select(Bpe.encode(lit("lowest"), model).as("t"))
      .head().getSeq[String](0)
    // l,o,w,e,s,t,M → (e,s) → (es,t) → (est,M) → (l,o) → (lo,w) → low | estM
    assert(toks == Seq("low", "est" + M))
  }

  test("roundtrip law on adversarial text; tokenize shape") {
    val model = Bpe.trainBpe(corpus, numMerges = 5)
    val tricky = Seq(
      (1L, "  low\t\tnewest   widest\n"), // whitespace runs + edges
      (2L, ""),                            // empty
      (3L, "LoW NeWeSt"),                  // case folding
      (4L, s"mid${M}marker $M lone"),      // marker chars stripped as alphabet
      (5L, "café élève"),   // accents
      (6L, "a😀b 😀"), // supplementary (emoji) codepoints
      (7L, "x")).toDF("doc_id", "text")
    val bad = tricky.select(
      Bpe.decode(Bpe.encode(col("text"), model)).as("rt"),
      Bpe.normalizedText(col("text")).as("nm"))
      .filter(col("rt") =!= col("nm"))
    assert(bad.count() == 0)

    val tk = Bpe.tokenize(tricky, model)
    assert(tk.columns.toSeq == Seq("doc_id", "tokens", "n_tokens"))
    // an unseen single-char word stays (char, marker) — no learned merge
    assert(tk.filter(col("doc_id") === 7L).head().getAs[Int]("n_tokens") == 2)
    assert(tk.filter(col("doc_id") === 2L).head().getAs[Int]("n_tokens") == 0)
  }

  test("model artifact: save -> load -> identical encoding; training is deterministic") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val m1 = Bpe.trainBpe(docs, numMerges = 20)
    val m2 = Bpe.trainBpe(docs, numMerges = 20)
    assert(m1 == m2 && m1.merges.size == 20)

    val path = java.nio.file.Files.createTempDirectory("graft_bpe").toString + "/model"
    try {
      Bpe.saveBpeModel(spark, m1, path)
      val loaded = Bpe.loadBpeModel(spark, path)
      assert(loaded == m1)
      val a = docs.select(Bpe.encode(col("text"), m1).as("t")).collect().map(_.getSeq[String](0))
      val b = docs.select(Bpe.encode(col("text"), loaded).as("t")).collect().map(_.getSeq[String](0))
      assert(a.toSeq == b.toSeq)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(new java.io.File(path).getParent)).deleteRecursively()
    }
  }

  test("encode runs as a native codegen expression — no ScalaUDF in the plan") {
    val model = Bpe.trainBpe(corpus, numMerges = 3)
    val plan = corpus.select(Bpe.encode(col("text"), model).as("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("tokenize-then-pack: chunk boundaries follow the REAL subword counts") {
    import graft.operators.Curation
    import org.apache.spark.sql.functions.size
    val model = Bpe.trainBpe(corpus, numMerges = 1)
    val packed = Curation.packSequencesBy(corpus, seqTokens = 7L,
        idCol = "doc_id", tokensExpr = size(Bpe.encode(col("text"), model)))
      .select(col("doc_id"), col("n_tokens"), col("seq_first"), col("seq_last"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // n_tokens is the encoder's count, not the whitespace heuristic
    val enc = corpus.select(col("doc_id"), size(Bpe.encode(col("text"), model)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    packed.foreach { case (id, n, f, l) =>
      assert(n == enc(id))
      assert(f <= l, s"doc $id: seq_first $f > seq_last $l")
    }
    // concat-then-chunk law: replay greedily in md5(id) order
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    var cum = 0L
    packed.sortBy { case (id, _, _, _) => (md5hex(id.toString), id) }
      .foreach { case (id, n, f, l) =>
        assert(f == cum / 7 && l == (cum + n - 1) / 7, s"doc $id boundaries")
        cum += n
      }
    // whitespace-count packing is the textCol special case of the same path
    val a = Curation.packSequences(corpus, 7L).select(col("doc_id"), col("n_tokens"),
      col("seq_first"), col("seq_last")).collect().toSeq
    val b = Curation.packSequencesBy(corpus, 7L, "doc_id",
        graft.functions.TextFunctions.tokenCount(col("text")))
      .select(col("doc_id"), col("n_tokens"), col("seq_first"), col("seq_last"))
      .collect().toSeq
    assert(a == b)
  }

  test("fertility: hand-computed subwords-per-word on a lang-tagged fixture") {
    // classic fixture tagged with languages; single merge = (e,s).
    // Subwords: low=4, lower=6, newest=7-1=6, widest=7-1=6 (marker char +1,
    // one (e,s) hit each in the -est words).
    //  lang a: 5×low + 2×lower = 32 subwords / 7 words = 4.571429
    //  lang b: 6×newest + 3×widest = 54 subwords / 9 words = 6.0
    val tagged = Seq(
      (1L, "a", "low low low low low"),
      (2L, "a", "lower lower"),
      (3L, "b", "newest newest newest newest newest newest"),
      (4L, "b", "widest widest widest")).toDF("doc_id", "lang", "text")
    val model = Bpe.trainBpe(tagged, numMerges = 1)
    val got = tagged.select(col("lang"),
        size(Bpe.encode(col("text"), model)).cast("long").as("sub"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("w"))
      .groupBy(col("lang"))
      .agg(round(sum(col("sub")).cast("double") / sum(col("w")), 6).as("fertility"),
        sum(col("w")).as("n_words"), sum(col("sub")).as("n_subwords"))
      .orderBy(col("lang"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 4.571429, 7L, 32L), ("b", 6.0, 9L, 54L)))
  }

  test("kernel edges: cpCompare is code-point order; merge exhaustion stops early") {
    // U+FFFF (BMP max) must sort BELOW U+10000 (first supplementary) —
    // UTF-16 code-unit comparison gets this backwards
    assert(BpeKernels.cpCompare(new String(Character.toChars(0xFFFF)),
      new String(Character.toChars(0x10000))) < 0)
    assert(BpeKernels.cpCompare("ab", "ab") == 0)
    assert(BpeKernels.cpCompare("a", "ab") < 0)
    // a one-word corpus exhausts its pairs; training stops without error
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.trainBpe(tiny, numMerges = 100)
    assert(m.merges.size == 2) // (a,b) then (ab,M)
  }
}
