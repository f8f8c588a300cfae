package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.streaming.StreamingHistogram

/** Streaming windowed histograms: additive bucket state across
  * micro-batches, quantiles derived from the drained artifact equal the
  * batch groupQuantiles over the union. */
class StreamingHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("two micro-batches == one batch; drained quantiles == groupQuantiles") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    // 2 days × values 0.00..9.99 (repeating), some repeated buckets
    val rows = (0 until 400).map { i =>
      (Timestamp.valueOf(f"2024-02-${i % 2 + 1}%02d 08:00:00"),
        (i % 100) / 10.0)
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Double)]
    val q = StreamingHistogram.windowedHistogram(
        mem.toDF().toDF("ts", "value"), col("value"), "1 day", scale = 2)
      .writeStream.outputMode("complete").format("memory")
      .queryName("shist_out").start()
    val (b1, b2) = rows.splitAt(200)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    // state = occupied buckets per window (2 days × 100 distinct values),
    // never the 400 input rows
    assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal <= 200))
    q.stop()
    val hist = spark.table("shist_out")
    val got = Curation.histogramQuantiles(hist, "window_start", Seq(0.5, 0.95))
      .orderBy("window_start").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2)))
    // batch twin: groupQuantiles over the union, day as the group
    val batch = Curation.groupQuantiles(
        rows.toDF("ts", "value")
          .select(date_trunc("day", col("ts")).as("window_start"),
            round(col("value"), 2).as("v")),
        "window_start", col("v"), Seq(0.5, 0.95))
      .orderBy("window_start").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq === batch.toSeq)
    // hand check: values 0.0..9.9 uniform → p50 interpolates mid-range
    assert(got.forall(t => t._2 > 4.0 && t._2 < 6.0))
    assert(got.forall(t => t._3 > 9.0))
    spark.catalog.dropTempView("shist_out")
  }
}
