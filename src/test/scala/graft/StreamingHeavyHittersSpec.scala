package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingHeavyHitters

case class KeyEvent(ts: Timestamp, k: String)

/** The streaming sketch must merge across micro-batches: after N batches the
  * emitted window sketch equals one batch-mode sketch over the union. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00 UTC, window-aligned
  private def e(offSec: Long, k: String) = KeyEvent(new Timestamp(T0 + offSec * 1000), k)

  private def topkRows(r: Row): Map[String, (Long, Long)] =
    r.getSeq[Row](r.fieldIndex("topk"))
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap

  test("per-window sketch merges across micro-batches; exact for <=capacity keys") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyEvent]
    val out = StreamingHeavyHitters.windowedTopK(
      mem.toDF(), col("k"), "1 hour", capacity = 8, watermarkDelay = "30 minutes")
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("hh_out").start()

    // batch 1: a×3, b×1 in window [00:00, 01:00)
    mem.addData(e(0, "a"), e(10, "a"), e(20, "a"), e(30, "b"))
    q.processAllAvailable()
    // batch 2: a×2, c×4 in the SAME window — state must merge, not replace
    mem.addData(e(60, "a"), e(70, "a"), e(100, "c"), e(110, "c"), e(120, "c"), e(130, "c"))
    q.processAllAvailable()

    // last emitted row for the window is the merged refinement
    val rows = spark.table("hh_out")
      .filter(col("window_start") === new Timestamp(T0)).collect()
    assert(rows.nonEmpty)
    val merged = topkRows(rows.last)
    // 3 distinct keys < capacity 8 → sketch is exact: min == max == true count
    assert(merged("a") == ((5L, 5L)), s"merged=$merged")
    assert(merged("c") == ((4L, 4L)))
    assert(merged("b") == ((1L, 1L)))

    // equals one batch-mode sketch over the union of both micro-batches
    val batch = Seq(
      e(0, "a"), e(10, "a"), e(20, "a"), e(30, "b"),
      e(60, "a"), e(70, "a"), e(100, "c"), e(110, "c"), e(120, "c"), e(130, "c"))
      .toDF()
      .agg(call_function("space_saving_topk", col("k"), lit(8)).as("topk"))
      .collect()(0)
    assert(topkRows(batch) == merged)
    q.stop()
  }

  test("events land in their own tumbling windows; watermark evicts old state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyEvent]
    val out = StreamingHeavyHitters.windowedTopK(
      mem.toDF(), col("k"), "1 hour", capacity = 4, watermarkDelay = "10 minutes")
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("hh_windows").start()

    mem.addData(e(0, "x"), e(10, "x"))           // window 00
    q.processAllAvailable()
    mem.addData(e(3600, "y"))                    // window 01
    q.processAllAvailable()
    mem.addData(e(3 * 3600, "z"))                // window 03 → watermark passes 00/01
    q.processAllAvailable()

    val byWindow = spark.table("hh_windows").collect()
      .groupBy(_.getTimestamp(0).getTime).view.mapValues(rs => topkRows(rs.last)).toMap
    assert(byWindow(T0)("x") == ((2L, 2L)))
    assert(byWindow(T0 + 3600 * 1000)("y") == ((1L, 1L)))

    val removed = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    assert(removed > 0, "expected watermark-driven window-state eviction")
    q.stop()
  }
}
