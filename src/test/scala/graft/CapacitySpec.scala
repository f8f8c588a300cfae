package graft

import org.apache.spark.sql.functions._

import graft.operators.Capacity
import graft.operators.Capacity.SizingTargets

class CapacitySpec extends SparkSpec {
  import spark.implicits._

  test("rowBytes accounts every supported type exactly, nulls included") {
    val df = Seq(
      (1L, "abcd", Some(2), Array(1.0f, 2.0f, 3.0f), true),
      (2L, null.asInstanceOf[String], None, null.asInstanceOf[Array[Float]], false))
      .toDF("id", "s", "i", "v", "b")
    val out = df.select(Capacity.rowBytes(df).as("rb")).orderBy($"rb").collect()
      .map(_.getLong(0)).toSeq
    // row 2: 8 (id) + 0+4 (null s) + 4 (i slot) + 0+4 (null v) + 1 (b) = 21
    // row 1: 8 + 4+4 + 4 + 3*4+4 + 1 = 37
    assert(out == Seq(21L, 37L))
  }

  test("rowBytes: wide decimals account 16 bytes, compact ones 8") {
    val df = Seq(1).toDF("x").select(
      lit(BigDecimal(1)).cast("decimal(18,2)").as("c"),
      lit(BigDecimal(1)).cast("decimal(38,10)").as("w"))
    val rb = df.select(Capacity.rowBytes(df).as("rb")).head().getLong(0)
    assert(rb == 8L + 16L)
  }

  test("rowBytes rejects unsupported column types loudly") {
    val df = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    val ex = intercept[IllegalArgumentException] { Capacity.rowBytes(df) }
    assert(ex.getMessage.contains("unsupported type"))
    val dfa = Seq((1L, Array("x"))).toDF("id", "a")
    val ex2 = intercept[IllegalArgumentException] { Capacity.rowBytes(dfa) }
    assert(ex2.getMessage.contains("unsupported array element type"))
  }

  test("sizeAdvice: ceildiv boundaries, clamps, and the empty frame") {
    // 10 rows x (8 + 2+4) = 140 bytes; targets 64/128 -> ceil(140/64)=3
    // partitions, ceil(140/128)=2 files
    val df = Seq.fill(10)((1L, "xy")).toDF("id", "s")
    val t = SizingTargets(targetPartitionBytes = 64L, targetFileBytes = 128L,
      minPartitions = 1, maxPartitions = 1000)
    val r = Capacity.sizeAdvice(df, "t", t).collect()(0)
    assert(r.getAs[Long]("rows") == 10L)
    assert(r.getAs[Long]("total_bytes") == 140L)
    assert(r.getAs[Long]("advised_shuffle_partitions") == 3L)
    assert(r.getAs[Long]("advised_files") == 2L)

    // exact multiple: 140 -> target 70 gives exactly 2 (no +1 drift)
    val t2 = SizingTargets(targetPartitionBytes = 70L, targetFileBytes = 70L)
    val r2 = Capacity.sizeAdvice(df, "t", t2).collect()(0)
    assert(r2.getAs[Long]("advised_shuffle_partitions") == 2L)

    // clamp ceiling and floor
    val t3 = SizingTargets(targetPartitionBytes = 1L, targetFileBytes = 1L,
      minPartitions = 2, maxPartitions = 5)
    val r3 = Capacity.sizeAdvice(df, "t", t3).collect()(0)
    assert(r3.getAs[Long]("advised_shuffle_partitions") == 5L)

    // empty frame: zero bytes, floor partitions, 1 file
    val r4 = Capacity.sizeAdvice(df.filter(lit(false)), "e", t3).collect()(0)
    assert(r4.getAs[Long]("rows") == 0L && r4.getAs[Long]("total_bytes") == 0L)
    assert(r4.getAs[Long]("advised_shuffle_partitions") == 2L)
    assert(r4.getAs[Long]("advised_files") == 1L)
  }

  test("the advice is actionable: writing with advised_files yields exactly " +
    "that many parquet files") {
    val df = (1L to 400L).map(k => (k, "x" * 100)).toDF("id", "s")
    val t = SizingTargets(targetPartitionBytes = 8L << 10, targetFileBytes = 16L << 10)
    val advised = Capacity.sizeAdvice(df, "t", t)
      .collect()(0).getAs[Long]("advised_files").toInt
    assert(advised > 1) // the fixture is sized to be off the floor
    val dir = java.nio.file.Files.createTempDirectory("cap_files").toString
    try {
      df.repartition(advised).write.mode("overwrite").parquet(dir)
      val files = new java.io.File(dir).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == advised)
    } finally Gates.deleteTree(dir)
  }

  test("sizeAdvice never shuffles: one partial/final aggregate, no exchange " +
    "wider than a single-row gather") {
    val df = Seq.fill(8)((1L, "xy")).toDF("id", "s")
    val plan = Capacity.sizeAdvice(df, "t").queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
    // the only exchange is the 1-row final-aggregate gather
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected at most the final gather, got:\n$plan")
  }
}
