package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, when}

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

  test("stream-static as-of enrichment: stateless, equals batch asofJoin") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // per-key price history: a's price changes at 10:00 and 12:00; b once
    val dim = Seq(
      (1L, ts("2024-03-01 10:00:00"), 100.0),
      (2L, ts("2024-03-01 12:00:00"), 150.0),
      (3L, ts("2024-03-01 11:00:00"), 70.0))
      .toDF("oid", "ots", "price")
      .withColumn("key", when(col("oid") === 3L, "b").otherwise("a"))
    val events = Seq(
      (10L, "a", ts("2024-03-01 09:00:00")),  // before first → null
      (11L, "a", ts("2024-03-01 10:30:00")),  // first interval → 100
      (12L, "a", ts("2024-03-01 12:00:00")),  // boundary inclusive → 150
      (13L, "b", ts("2024-03-01 23:00:00")),  // open interval → 70
      (14L, "c", ts("2024-03-01 11:00:00"))) // unknown key → null
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = StreamJoins.enrichAsOfStatic(
        mem.toDF().toDF("event_id", "key", "ts"), dim,
        key = "key", dimTs = "ots", tieBreak = "oid",
        payload = Seq("oid", "price"))
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_out").start()
    val (b1, b2) = events.splitAt(2)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0))
    q.stop()
    val got = spark.table("asof_out")
      .select($"event_id", $"oid", $"price").orderBy($"event_id").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)),
        if (x.isNullAt(2)) None else Some(x.getDouble(2))))
    spark.catalog.dropTempView("asof_out")
    assert(got.toSeq === Seq(
      (10L, None, None), (11L, Some(1L), Some(100.0)),
      (12L, Some(2L), Some(150.0)), (13L, Some(3L), Some(70.0)),
      (14L, None, None)))
    // batch twin: Temporal.asofJoin over the same inputs agrees on price
    val batch = graft.operators.Temporal.asofJoin(
        events.toDF("event_id", "key", "ts"), dim,
        key = "key", leftTs = "ts", rightTs = "ots",
        rightPayload = Seq("price"))
      .select($"event_id", $"price").orderBy($"event_id").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getDouble(1))))
    assert(batch.toSeq === got.map(t => (t._1, t._3)).toSeq)
  }

  test("as-of enrichment: colliding enrichment names fail loudly; the " +
    "dimension side is dataset-qualified against stream-name capture") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val dim = Seq((1L, ts("2024-03-01 10:00:00"), 100.0))
      .toDF("oid", "ots", "price").withColumn("key", col("oid").cast("string"))
    // stream already carries a payload name → require, not silent capture
    val clash = Seq((10L, "1", ts("2024-03-01 11:00:00"), 7.0))
      .toDF("event_id", "key", "ts", "price")
    val e = intercept[IllegalArgumentException] {
      StreamJoins.enrichAsOfStatic(clash, dim,
        key = "key", dimTs = "ots", tieBreak = "oid", payload = Seq("oid", "price"))
    }
    assert(e.getMessage.contains("price"))
    // a stream column that shadows an internal interval name must not
    // capture the join-condition resolution (batch frames: same plan)
    val shadow = Seq((10L, "1", ts("2024-03-01 11:00:00"), "keepme"))
      .toDF("event_id", "key", "ts", "__to")
    val out = StreamJoins.enrichAsOfStatic(shadow, dim,
        key = "key", dimTs = "ots", tieBreak = "oid", payload = Seq("oid", "price"))
      .collect()
    assert(out.length === 1)
    val row = out.head
    assert(row.getString(row.fieldIndex("__to")) === "keepme")
    assert(row.getDouble(row.fieldIndex("price")) === 100.0)
    assert(row.getLong(row.fieldIndex("oid")) === 1L)
  }
}
