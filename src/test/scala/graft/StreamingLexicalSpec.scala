package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextAnalysis
import graft.streaming.StreamingLexicalServing

case class LexQuery(query_id: Long, terms: Seq[String])

/** Streaming BM25 serving from the persisted lexical index: per-epoch
  * answers must be ROW-IDENTICAL to the batch operator at the same index
  * state, and appended segments must become searchable on the next epoch
  * without a stream restart (growing-index semantics). */
class StreamingLexicalSpec extends SparkSpec {
  import spark.implicits._

  test("streamed BM25 ≡ batch per epoch; appended segment searchable next epoch") {
    val docs = Seq(
      (1L, "spark scan spark merge"), (2L, "scan filter join"),
      (3L, "merge merge merge scan"), (4L, "filter value row"),
      (5L, "spark")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lex_stream").toString
    try {
      TextAnalysis.saveLexicalIndex(docs, dir, nBuckets = 8)
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[LexQuery]
      val epochs = scala.collection.mutable.ArrayBuffer.empty[Set[Seq[Any]]]
      val q = StreamingLexicalServing.serveBm25FromPath(stream.toDF(), dir, k = 3) {
        (ans, _) => epochs += ans.collect().map(_.toSeq).toSet
      }
      try {
        // epoch 0: answers must equal the batch operator on the same index
        val q0 = Seq(LexQuery(1L, Seq("spark", "merge")), LexQuery(2L, Seq("filter")))
        val expected0 = TextAnalysis.bm25QueryIndexBatch(spark, dir,
          q0.toDF("query_id", "terms"), k = 3).collect().map(_.toSeq).toSet
        stream.addData(q0: _*)
        q.processAllAvailable()
        assert(epochs.size == 1 && epochs(0) == expected0 && expected0.nonEmpty)

        // append a segment carrying a term unseen so far; the NEXT epoch
        // must see it (per-batch path re-read, no restart) and the answer
        // must equal the batch operator on the grown index
        TextAnalysis.appendLexicalIndex(
          Seq((6L, "zebra zebra spark"), (7L, "zebra row")).toDF("doc_id", "text"), dir)
        val q1 = Seq(LexQuery(3L, Seq("zebra")))
        val expected1 = TextAnalysis.bm25QueryIndexBatch(spark, dir,
          q1.toDF("query_id", "terms"), k = 3).collect().map(_.toSeq).toSet
        stream.addData(q1: _*)
        q.processAllAvailable()
        assert(epochs.size == 2 && epochs(1) == expected1)
        // the appended docs are the hits, repeated-zebra doc first
        val hits = epochs(1).toSeq.sortBy(_(3).asInstanceOf[Int])
        assert(hits.map(_(1)) == Seq(6L, 7L))

        // malformed queries are data: a batch of only blank-terms queries is
        // skipped (no sink call, stream alive), and a mixed batch drops the
        // unservable query instead of killing serving for everyone
        stream.addData(LexQuery(90L, Seq("", "  ")))
        q.processAllAvailable()
        assert(epochs.size == 2)
        stream.addData(LexQuery(91L, Seq(" ", "")), LexQuery(92L, Seq("spark")))
        q.processAllAvailable()
        assert(epochs.size == 3 && epochs(2).nonEmpty)
        assert(epochs(2).forall(_(0) == 92L))
      } finally q.stop()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("a Generations flip between micro-batches is served next epoch: " +
    "epoch 0 from gen-1, epoch 1 from gen-2, no restart; raw paths still work") {
    import graft.operators.Generations
    val docsA = Seq(
      (1L, "spark scan spark merge"), (2L, "scan filter join"),
      (3L, "merge merge merge scan")).toDF("doc_id", "text")
    val docsAll = Seq(
      (1L, "spark scan spark merge"), (2L, "scan filter join"),
      (3L, "merge merge merge scan"), (4L, "spark spark spark"),
      (5L, "zebra spark row")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lex_genflip").toString
    try {
      val root = s"$dir/lexgen"
      val g1 = Generations.advance(spark, root) { dst =>
        TextAnalysis.saveLexicalIndex(docsA, dst, nBuckets = 8)
      }
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[LexQuery]
      val epochs = scala.collection.mutable.ArrayBuffer.empty[Set[Seq[Any]]]
      val q = StreamingLexicalServing.serveBm25FromRoot(stream.toDF(), root, k = 3) {
        (ans, _) => epochs += ans.collect().map(_.toSeq).toSet
      }
      try {
        val qs = Seq(LexQuery(1L, Seq("spark")))
        def batchOn(path: String) = TextAnalysis.bm25QueryIndexBatch(spark,
          path, qs.toDF("query_id", "terms"), k = 3).collect().map(_.toSeq).toSet
        val expected0 = batchOn(g1)
        stream.addData(qs: _*)
        q.processAllAvailable()
        assert(epochs.size == 1 && epochs(0) == expected0 && expected0.nonEmpty)
        // out-of-band maintenance publishes a new generation (more docs,
        // different idf/avgdl — every score moves); the running stream
        // must serve it on the NEXT epoch through the flipped pointer
        val g2 = Generations.advance(spark, root) { dst =>
          TextAnalysis.saveLexicalIndex(docsAll, dst, nBuckets = 8)
        }
        val expected1 = batchOn(g2)
        stream.addData(qs: _*)
        q.processAllAvailable()
        assert(epochs.size == 2 && epochs(1) == expected1)
        assert(epochs(1) != expected0,
          "gen-2 indexes two more spark docs — identical answers mean the " +
            "flip was not served")
        // doc 4 (gen-2 only) must now be a hit
        assert(epochs(1).exists(_(1) == 4L))
      } finally q.stop()
      // a RAW index path through the root entry point serves as-is
      val rawDir = s"$dir/raw"
      TextAnalysis.saveLexicalIndex(docsA, rawDir, nBuckets = 8)
      val stream2 = MemoryStream[LexQuery]
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[Seq[Any]]]
      val q2 = StreamingLexicalServing.serveBm25FromRoot(stream2.toDF(), rawDir, k = 3) {
        (ans, _) => got += ans.collect().map(_.toSeq).toSet
      }
      try {
        val qs = Seq(LexQuery(9L, Seq("merge")))
        val exp = TextAnalysis.bm25QueryIndexBatch(spark, rawDir,
          qs.toDF("query_id", "terms"), k = 3).collect().map(_.toSeq).toSet
        stream2.addData(qs: _*)
        q2.processAllAvailable()
        assert(got.size == 1 && got(0) == exp && exp.nonEmpty)
      } finally q2.stop()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("torn segment (data landed, commit record missing) is flagged and refuses to serve") {
    val docs = Seq(
      (1L, "spark scan spark merge"), (2L, "scan filter join"),
      (3L, "merge merge merge scan"), (4L, "filter value row")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lex_torn").toString
    try {
      TextAnalysis.saveLexicalIndex(docs.filter($"doc_id" <= 2), dir, nBuckets = 8)
      TextAnalysis.appendLexicalIndex(docs.filter($"doc_id" > 2), dir)
      // healthy two-segment artifact: audit green
      val ok = TextAnalysis.validateLexicalIndex(spark, dir).collect()(0)
      assert(ok.getAs[Long]("n_segments") == 2L)
      assert(ok.getAs[Boolean]("postings_consistent") && ok.getAs[Boolean]("terms_consistent"))

      // simulate the crash window: an append's postings landed but its
      // stats commit record did not — drop one stat part file from the
      // unified table's commit-record partition
      val statsDir = new java.io.File(s"$dir/index/component=stat/bucket=0")
      val part = statsDir.listFiles().filter(_.getName.endsWith(".parquet")).head
      assert(part.delete())
      val torn = TextAnalysis.validateLexicalIndex(spark, dir).collect()(0)
      assert(!(torn.getAs[Boolean]("postings_consistent") &&
        torn.getAs[Boolean]("terms_consistent")))

      // stream construction must refuse the torn artifact loudly
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[LexQuery]
      val e = intercept[IllegalArgumentException] {
        StreamingLexicalServing.serveBm25FromPath(stream.toDF(), dir, k = 3)((_, _) => ())
      }
      assert(e.getMessage.contains("torn"))

      // and compaction must refuse too — deriving the compacted commit
      // record from the rewritten tables would otherwise launder the tear
      // into a green-auditing artifact with silently skewed idf/avgdl
      val dstTorn = java.nio.file.Files.createTempDirectory("graft_lex_torncpt").toString + "/c"
      try {
        val ec = intercept[IllegalArgumentException] {
          TextAnalysis.compactLexicalIndex(spark, dir, dstTorn)
        }
        assert(ec.getMessage.contains("torn"))
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(new java.io.File(dstTorn).getParent)).deleteRecursively()
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("pre-audit-schema artifact: validate/append refuse with the migration " +
      "instruction, serving skips the audit, compaction migrates") {
    val docs = Seq(
      (1L, "spark scan spark merge"), (2L, "scan filter join"),
      (3L, "merge merge merge scan"), (4L, "filter value row")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lex_legacy").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_lex_migrated").toString + "/c"
    try {
      TextAnalysis.saveLexicalIndex(docs, dir, nBuckets = 8)
      // convert the artifact to the FULL round-8 shape a pre-revision
      // deployment carries: the legacy three-dir layout with a pre-audit
      // stats table (no audit columns) — this also exercises the
      // layout-agnostic legacy read path end to end
      val uni = spark.read.parquet(s"$dir/index")
      uni.filter($"component" === "post")
        .select($"token", $"doc_id", $"tf", $"dl", $"bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
      uni.filter($"component" === "term")
        .select($"token", $"dfq", $"bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/termstats")
      val legacyRows = uni.filter($"component" === "stat")
        .select($"n_docs", $"sum_dl", $"n_buckets").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      legacyRows.toDF("n_docs", "sum_dl", "n_buckets")
        .write.mode("overwrite").parquet(s"$dir/stats")
      import scala.reflect.io.Directory
      assert(new Directory(new java.io.File(s"$dir/index")).deleteRecursively())

      // audit and append both refuse LOUDLY, naming the migration path
      val e1 = intercept[IllegalStateException] {
        TextAnalysis.validateLexicalIndex(spark, dir)
      }
      assert(e1.getMessage.contains("compact"))
      val e2 = intercept[IllegalStateException] {
        TextAnalysis.appendLexicalIndex(docs.filter($"doc_id" > 4), dir)
      }
      assert(e2.getMessage.contains("compact"))

      // serving still works (serve paths read only the stats sums):
      // batch serve answers, and stream construction skips the audit
      // instead of throwing
      val served = TextAnalysis.bm25QueryIndex(spark, dir, Seq("spark", "merge"), k = 3)
      assert(served.count() > 0)
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[LexQuery]
      var epochs = List.empty[Array[org.apache.spark.sql.Row]]
      val q = StreamingLexicalServing.serveBm25FromPath(stream.toDF(), dir, k = 3) {
        (df, _) => epochs = epochs :+ df.collect()
      }
      try {
        stream.addData(LexQuery(1L, Seq("spark")))
        q.processAllAvailable()
        assert(epochs.size == 1 && epochs.head.nonEmpty)
      } finally q.stop()

      // compaction migrates: the compacted copy is auditable and green
      TextAnalysis.compactLexicalIndex(spark, dir, dst)
      assert(TextAnalysis.lexicalAuditability(spark, dst).isEmpty)
      val ok = TextAnalysis.validateLexicalIndex(spark, dst).collect()(0)
      assert(ok.getAs[Boolean]("postings_consistent") &&
        ok.getAs[Boolean]("terms_consistent"))
      // and serves row-identically to the legacy original
      val before = TextAnalysis.bm25QueryIndex(spark, dir, Seq("spark", "merge"), k = 10)
        .collect().toSeq
      val after = TextAnalysis.bm25QueryIndex(spark, dst, Seq("spark", "merge"), k = 10)
        .collect().toSeq
      assert(after == before && before.nonEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      new Directory(new java.io.File(new java.io.File(dst).getParent)).deleteRecursively()
    }
  }

  test("micro-batch over maxBatchQueries fails with the knob's name, not an OOM") {
    val docs = Seq(
      (1L, "spark scan spark merge"), (2L, "scan filter join")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lex_cap").toString
    try {
      TextAnalysis.saveLexicalIndex(docs, dir, nBuckets = 8)
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[LexQuery]
      val q = StreamingLexicalServing.serveBm25FromPath(stream.toDF(), dir, k = 3,
        maxBatchQueries = 1)((_, _) => ())
      try {
        stream.addData(LexQuery(1L, Seq("spark")), LexQuery(2L, Seq("scan")))
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(e.getMessage.contains("maxBatchQueries") ||
          Option(e.getCause).exists(_.getMessage.contains("maxBatchQueries")))
      } finally q.stop()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("compacted index serves row-identical results to the segmented original") {
    val docs = Seq(
      (1L, "spark scan spark merge"), (2L, "scan filter join"),
      (3L, "merge merge merge scan"), (4L, "filter value row")).toDF("doc_id", "text")
    val src = java.nio.file.Files.createTempDirectory("graft_lex_src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_lex_dst").toString + "/c"
    try {
      TextAnalysis.saveLexicalIndex(docs.filter($"doc_id" <= 2), src, nBuckets = 8)
      TextAnalysis.appendLexicalIndex(docs.filter($"doc_id" > 2), src)
      TextAnalysis.compactLexicalIndex(spark, src, dst)
      val terms = Seq("spark", "merge", "filter")
      val before = TextAnalysis.bm25QueryIndex(spark, src, terms, k = 10).collect().toSeq
      val after = TextAnalysis.bm25QueryIndex(spark, dst, terms, k = 10).collect().toSeq
      assert(after == before && before.nonEmpty)
      // compaction really merged the termstats deltas: one row per term
      val all = spark.read.parquet(s"$dst/index")
      val ts = all.filter($"component" === "term")
      assert(ts.count() == ts.select("token").distinct().count())
      // and the commit record is a single stat row
      assert(all.filter($"component" === "stat").count() == 1)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(src)).deleteRecursively()
      new Directory(new java.io.File(new java.io.File(dst).getParent)).deleteRecursively()
    }
  }

  test("legacy three-dir layout serves row-identically; a unified append " +
      "onto it (mixed pile) ≡ full rebuild; compaction migrates the pile") {
    val base = Seq(
      (1L, "spark scan spark merge"), (2L, "scan filter join"),
      (3L, "merge merge merge scan")).toDF("doc_id", "text")
    val extra = Seq((4L, "filter value row"), (5L, "zebra spark")).toDF("doc_id", "text")
    val all = base.union(extra)
    val legacy = java.nio.file.Files.createTempDirectory("graft_lex_leg").toString
    val fresh = java.nio.file.Files.createTempDirectory("graft_lex_frs").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_lex_mig").toString + "/c"
    try {
      // build the legacy artifact by converting a unified build — WITH the
      // audit columns (an auditable post-round-8, pre-unified-layout build)
      TextAnalysis.saveLexicalIndex(base, legacy, nBuckets = 8)
      val uni = spark.read.parquet(s"$legacy/index")
      uni.filter($"component" === "post")
        .select($"token", $"doc_id", $"tf", $"dl", $"bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$legacy/postings")
      uni.filter($"component" === "term")
        .select($"token", $"dfq", $"bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$legacy/termstats")
      uni.filter($"component" === "stat")
        .select($"n_docs", $"sum_dl", $"n_postings", $"n_terms", $"n_buckets")
        .write.mode("overwrite").parquet(s"$legacy/stats")
      import scala.reflect.io.Directory
      assert(new Directory(new java.io.File(s"$legacy/index")).deleteRecursively())
      val terms = Seq("spark", "merge", "filter", "zebra")
      // legacy artifact: audit green, serves identically to a fresh build
      val okL = TextAnalysis.validateLexicalIndex(spark, legacy).collect()(0)
      assert(okL.getAs[Boolean]("postings_consistent") &&
        okL.getAs[Boolean]("terms_consistent"))
      TextAnalysis.saveLexicalIndex(base, fresh, nBuckets = 8)
      assert(TextAnalysis.bm25QueryIndex(spark, legacy, terms, k = 10).collect().toSeq ==
        TextAnalysis.bm25QueryIndex(spark, fresh, terms, k = 10).collect().toSeq)
      // unified append ONTO the legacy artifact → mixed pile must serve
      // exactly like a full rebuild over the union
      TextAnalysis.appendLexicalIndex(extra, legacy)
      TextAnalysis.saveLexicalIndex(all, fresh, nBuckets = 8)
      val mixed = TextAnalysis.bm25QueryIndex(spark, legacy, terms, k = 10).collect().toSeq
      val rebuilt = TextAnalysis.bm25QueryIndex(spark, fresh, terms, k = 10).collect().toSeq
      assert(mixed == rebuilt && rebuilt.nonEmpty)
      val okM = TextAnalysis.validateLexicalIndex(spark, legacy).collect()(0)
      assert(okM.getAs[Long]("n_segments") == 2L &&
        okM.getAs[Boolean]("postings_consistent") &&
        okM.getAs[Boolean]("terms_consistent"))
      // compaction folds the mixed pile into one unified generation
      TextAnalysis.compactLexicalIndex(spark, legacy, dst)
      assert(TextAnalysis.bm25QueryIndex(spark, dst, terms, k = 10)
        .collect().toSeq == rebuilt)
      assert(!new java.io.File(s"$dst/postings").exists() &&
        new java.io.File(s"$dst/index").exists())
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(legacy)).deleteRecursively()
      new Directory(new java.io.File(fresh)).deleteRecursively()
      new Directory(new java.io.File(new java.io.File(dst).getParent)).deleteRecursively()
    }
  }

  test("pruned-dfq memo stays fresh: the same ask re-served after an append " +
      "reflects the appended segment (fingerprint invalidation)") {
    val docs = Seq(
      (1L, "spark scan spark merge"), (2L, "scan filter join"),
      (3L, "merge merge merge scan")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lex_memo").toString
    try {
      TextAnalysis.saveLexicalIndex(docs, dir, nBuckets = 8)
      val terms = Seq("spark", "merge")
      val a0 = TextAnalysis.bm25QueryIndex(spark, dir, terms, k = 10).collect().toSeq
      // repeat ask: memo hit must serve the identical answer
      assert(TextAnalysis.bm25QueryIndex(spark, dir, terms, k = 10)
        .collect().toSeq == a0)
      // append docs that move idf/dfq for the SAME terms; the very next
      // ask must reflect them — a stale memo would keep serving a0
      TextAnalysis.appendLexicalIndex(
        Seq((7L, "spark spark"), (8L, "merge row")).toDF("doc_id", "text"), dir)
      val a1 = TextAnalysis.bm25QueryIndex(spark, dir, terms, k = 10).collect().toSeq
      assert(a1 != a0, "append did not invalidate the pruned-dfq memo")
      assert(a1.exists(_.getLong(0) == 7L))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
