package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamJoins

case class JoinReading(ts: Timestamp, key: String, value: Double)

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L
  private def r(offMin: Long, key: String, v: Double) =
    JoinReading(new Timestamp(T0 + offMin * 60000), key, v)

  test("stream-stream join pairs readings within tolerance, drops the rest") {
    implicit val sqlCtx = spark.sqlContext
    val temp = MemoryStream[JoinReading]
    val humid = MemoryStream[JoinReading]
    val joined = StreamJoins.enrichWithin(temp.toDF(), humid.toDF(), toleranceMinutes = 10)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("joined_out").start()

    temp.addData(r(0, "u155mz", 21.5), r(60, "u155mz", 23.0), r(0, "u14fzp", 18.0))
    humid.addData(r(5, "u155mz", 0.61), r(90, "u155mz", 0.55), r(200, "zzzzzz", 0.99))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("joined_out")
      .select($"key", $"value", $"value2").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2))).toSet
    // only the (21.5, 0.61) pair is within 10 minutes on the same key
    assert(out == Set(("u155mz", 21.5, 0.61)))
  }

  test("stream-static broadcast enrichment is stateless and tracks dim updates") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[JoinReading]
    val dimPath = java.nio.file.Files.createTempDirectory("dim").toString
    Seq(("u155mz", "antwerp")).toDF("key", "city")
      .write.mode("overwrite").parquet(dimPath)
    val joined = StreamJoins.enrichStatic(
      stream.toDF(), spark.read.parquet(dimPath), "key")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("static_out").start()

    stream.addData(r(0, "u155mz", 21.5), r(1, "u14fzp", 18.0))
    q.processAllAvailable()
    val out1 = spark.table("static_out").select($"key", $"city").collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(out1 == Map("u155mz" -> Some("antwerp"), "u14fzp" -> None))

    // stateless: no state-store operator reports rows
    assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0))
    q.stop()
  }

  test("same join shape runs in batch mode for backfills") {
    val t = Seq(r(0, "a", 1.0), r(30, "a", 2.0)).toDF()
    val h = Seq(r(4, "a", 9.0), r(29, "a", 8.0)).toDF()
    val out = StreamJoins.enrichWithin(t, h, toleranceMinutes = 5)
      .select($"value", $"value2").collect()
      .map(x => (x.getDouble(0), x.getDouble(1))).toSet
    assert(out == Set((1.0, 9.0), (2.0, 8.0)))
  }
}
