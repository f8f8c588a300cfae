package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.StreamingDecon

class StreamingDeconSpec extends SparkSpec {
  import spark.implicits._

  test("flagHits equals batch contamination exactly across micro-batches, " +
    "emits each (doc, gram) once, and keeps no state store") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "xx alpha beta gamma delta epsilon yy one two three four five"),
      (2L, "pp two three four five six qq"),
      (3L, "clean of any benchmark overlap entirely here today"))
      .toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("sdecon").toString
    try {
      TextAnalysis.saveBenchmarkIndex(bench, 5, dir)
      val (grams, n) = TextAnalysis.loadBenchmarkIndex(spark, dir)
      assert(n == 5)
      val pinned = grams.localCheckpoint()

      val mem = MemoryStream[(Long, String)]
      val out = StreamingDecon.flagHits(
        mem.toDF().toDF("doc_id", "text"), pinned, n)
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("sdecon_t").start()
      mem.addData(Seq((1L, train.filter($"doc_id" === 1L).head().getString(1))))
      q.processAllAvailable()
      mem.addData(Seq(
        (2L, train.filter($"doc_id" === 2L).head().getString(1)),
        (3L, train.filter($"doc_id" === 3L).head().getString(1))))
      q.processAllAvailable()
      // stateless: the plan registers no stateful operators
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not create a state store")
      q.stop()

      val hits = spark.table("sdecon_t").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // exactly-once per (doc, gram): no duplicates in the evidence log
      assert(hits.length == hits.distinct.length)

      val streamed = hits.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val batch = TextAnalysis.contamination(train, bench, shingleN = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
      assert(!streamed.contains(3L)) // the clean doc emits nothing
      spark.catalog.dropTempView("sdecon_t")
    } finally Gates.deleteTree(dir)
  }
}
