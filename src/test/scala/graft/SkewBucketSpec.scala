package graft


import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join result") {
    val fact = Tables.orders(spark, Sf)
    val dim = Tables.customer(spark, Sf)
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .select($"o_orderkey", $"c_custkey").orderBy($"o_orderkey").collect()
    val salted = Skew.saltedJoin(
      fact.withColumnRenamed("o_custkey", "k"),
      dim.withColumnRenamed("c_custkey", "k"),
      key = "k", salt = 8, factUniqueCols = Seq("o_orderkey"))
      .select($"o_orderkey", $"k").orderBy($"o_orderkey").collect()
    assert(salted.length == plain.length)
    assert(salted.map(_.getLong(0)).toSeq == plain.map(_.getLong(0)).toSeq)
  }

  test("salting is deterministic across recomputation (no rand())") {
    val f = Tables.orders(spark, Sf)
    val a = Skew.saltFact(f, 8, Seq("o_orderkey")).select($"o_orderkey", $"_salt").collect()
    val b = Skew.saltFact(f, 8, Seq("o_orderkey")).select($"o_orderkey", $"_salt").collect()
    assert(a.map(r => (r.getLong(0), r.getInt(1))).toMap ==
      b.map(r => (r.getLong(0), r.getInt(1))).toMap)
  }

  test("bucketed tables join without a shuffle exchange on either side") {
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables.orders(spark, Sf).write
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable(s"$db.orders_b")
      Tables.customer(spark, Sf).write
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable(s"$db.customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val j = spark.table(s"$db.orders_b")
          .join(spark.table(s"$db.customer_b"), col("o_custkey") === col("c_custkey"))
        val plan = j.queryExecution.executedPlan.toString
        // co-located bucketed join: SortMergeJoin with NO Exchange on either side
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"), plan)
        assert(j.count() > 0)
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("key skew profile: planted hot key ranks first with exact shares, " +
    "top slice via TakeOrdered (no global sort)") {
    // key 7 gets 60 of 100 rows; 40 keys get 1 each
    val rows = Seq.fill(60)(7L) ++ (100L until 140L)
    val df = rows.toDF("k")
    val out = Skew.keySkewProfile(df, "k", topK = 3)
    val got = out.collect()
    assert(got.length === 3)
    assert(got(0).getInt(0) === 1 && got(0).getLong(1) === 7L &&
      got(0).getLong(2) === 60L && got(0).getDouble(3) === 0.6)
    // ties among the 1-count keys break on the key ascending
    assert(got(1).getLong(1) === 100L && got(2).getLong(1) === 101L)
    assert(got(0).getLong(4) === 100L && got(0).getLong(5) === 41L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"),
      s"top slice must be TakeOrdered, not a global sort:\n$plan")
  }
}
