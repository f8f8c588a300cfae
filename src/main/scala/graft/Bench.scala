package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (BASELINE.md protocol): warm SparkSession, run every
 * SparkEntry query `SPARK_GRAFT_BENCH_RUNS` times (default 5, per the N≥5
 * protocol) on `SPARK_GRAFT_SF_DIR`, report per-query MEDIAN wall-clock
 * seconds and the median total as ONE JSON line on stdout. The SQL cache is
 * cleared between queries so each is measured in isolation.
 *
 * Timing includes plan + execution (count() forces the full pipeline;
 * results are already small aggregates so count ≈ materialize).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // full engine extension stack (functions + TopK strategy + rewrite rule),
      // loaded the way a cluster deployment would
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen/IO warmup outside the timed region
    SparkEntry.queries.get("q1_agg").foreach(fn => fn(spark, sfDir).count())

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }

    // optional subset for focused iteration: comma-separated query names
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None        => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // isolate queries from each other's cache residue: clear the SQL cache
      // and nudge the ContextCleaner (localCheckpoint blocks are freed on GC)
      // so each query is measured on its own plan, not a prior query's leak
      spark.catalog.clearCache()
      System.gc()
      val ts = (1 to runs).map { _ =>
        try time(fn(spark, sfDir).count())
        catch { case _: Throwable => -1.0 }
      }
      name -> (if (ts.contains(-1.0)) -1.0 else median(ts))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // the commit SHA makes the artifact self-identifying: a stale
    // bench_latest.json from a previous (e.g. failed) round is detectable
    val line = s"""{"metric":"total_median_sec","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"cpus":"$cpus","sf":"$sfDir","commit":"${BuildId.gitSha()}"}"""
    println(line)
    // stdout gets truncated by some harnesses — also persist the full
    // per-query map as a file artifact (SPARK_GRAFT_BENCH_OUT overrides)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_latest.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case e: Exception => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
