package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.streaming.StreamingWinsor

/** Streaming winsorize/quantile-floor flagging: two-micro-batch flow
  * against stored per-group thresholds must equal the batch operators'
  * verdict on the same data, with zero state-store rows. */
class StreamingWinsorSpec extends SparkSpec {
  import spark.implicits._

  test("two epochs: streamed clip + floor verdicts equal the batch operators") {
    implicit val sqlCtx = spark.sqlContext
    // group a: token counts 1,2,3,4,6 -> p25 = 2, p75 = 4; group b: all 3
    val docs = Seq(
      (1L, "a", "t1"), (2L, "a", "t1 t2"), (3L, "a", "t1 t2 t3"),
      (4L, "a", "t1 t2 t3 t4"), (5L, "a", "t1 t2 t3 t4 t5 t6"),
      (6L, "b", "x y z"), (7L, "b", "x y z")).toDF("doc_id", "source", "text")
    val thr = Curation.groupQuantiles(docs, "source",
        graft.functions.TextFunctions.tokenCount(col("text")), Seq(0.25, 0.75))
      .select(col("source"), col("thr_0").as("lo"), col("thr_1").as("hi"))
      .localCheckpoint()
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = StreamingWinsor.flagStream(
        mem.toDF().toDF("doc_id", "source", "text"), thr)
      .writeStream.outputMode("append").format("memory")
      .queryName("winsor_out").start()
    val rows = docs.as[(Long, String, String)].collect()
    val (b1, b2) = rows.splitAt(3)
    mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0))
    q.stop()
    val got = spark.table("winsor_out")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6)))
    spark.catalog.dropTempView("winsor_out")
    // the batch verdict on the same data
    val batch = Curation.winsorize(
        docs.select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("double").as("v")),
        "source", col("v"), 0.25, 0.75)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("v"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"),
        r.getAs[Double]("clipped"), r.getAs[Double]("v") >= r.getAs[Double]("lo")))
    assert(got.toSeq === batch.toSeq)
    // hand values: a's band is [2, 4]; doc 1 clips up, doc 5 clips down
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1L)._5 === 2.0 && !byId(1L)._6)
    assert(byId(5L)._5 === 4.0 && byId(5L)._6)
    assert(byId(6L)._5 === 3.0 && byId(6L)._6)
  }
}
