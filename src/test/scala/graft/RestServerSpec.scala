package graft

import scala.io.Source

import org.apache.spark.sql.functions._

import graft.operators.AggCore
import graft.serving.RestServer

class RestServerSpec extends SparkSpec {
  import spark.implicits._

  // cells around the reference README bbox area (u155* ≈ Antwerp)
  lazy val view = AggCore.hourlyView(Seq(
    ("2024-01-01 00:10:00", "u155mz82dv33", 10.0),
    ("2024-01-01 00:20:00", "u155mz82aaaa", 30.0),
    ("2024-01-01 01:10:00", "u155krxynu5s", 40.0))
    .toDF("t", "gh", "value")
    .select(to_timestamp($"t").as("ts"), substring($"gh", 1, 6).as("key"), $"value"))

  private def get(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(is).mkString
    (code, body)
  }

  test("history endpoint returns the reference Message envelope") {
    val srv = new RestServer(view, port = 0)
    val port = srv.start()
    try {
      val (code, body) = get(s"http://localhost:$port/api/temperature/aggregate/avg/history" +
        "?geohashes=u155&from=1704067200000&to=1704153600000")
      assert(code == 200)
      // hour 0 avg = 20.0 across u155mz cells; hour 1 avg = 40.0 (u155kr)
      assert(body ==
        """{"columns":["timestamp","avg"],"data":[[1704067200000,20.0],[1704070800000,40.0]],"metadata":{"metric":"temperature"}}""")
    } finally srv.stop()
  }

  test("snapshot endpoint covers a bbox and returns per-geohash cells") {
    val srv = new RestServer(view, port = 0)
    val port = srv.start()
    try {
      // README.md:115 example bbox (covers u155*); ts inside hour 0
      val (code, body) = get(s"http://localhost:$port/api/temperature/aggregate/count/snapshot" +
        "?ts=1704068100000&bbox=51.5,4.0,51.1,4.8")
      assert(code == 200)
      assert(body.contains(""""columns":["geohash","count"]"""))
      assert(body.contains("""["u155mz",2]"""))
    } finally srv.stop()
  }

  test("validation errors surface as ErrorMessage with HTTP 400") {
    val srv = new RestServer(view, port = 0)
    val port = srv.start()
    try {
      val (code, body) = get(s"http://localhost:$port/api/temperature/aggregate/median/history" +
        "?geohashes=u155&from=1&to=2")
      assert(code == 400)
      assert(body.contains("errorMessage") && body.contains("median"))
      val (code2, _) = get(s"http://localhost:$port/api/temperature/aggregate/avg/snapshot" +
        "?ts=1704068100000&bbox=bad")
      assert(code2 == 400)
    } finally srv.stop()
  }

  test("interval-form history works end to end") {
    val srv = new RestServer(view, port = 0)
    val port = srv.start()
    try {
      val (code, body) = get(s"http://localhost:$port/api/temperature/aggregate/sum/history" +
        "?geohashes=u155&interval=all&to=1704153600000")
      assert(code == 200)
      assert(body.contains("[1704067200000,40.0]") && body.contains("[1704070800000,40.0]"))
    } finally srv.stop()
  }
}
