package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Tables

/** Native vector expressions: bit-identical to the UDF baselines, and no
  * ScalaUDF node in the plan (stay inside whole-stage codegen). */
class VectorExprSpec extends SparkSpec {

  private def pairs = {
    val e = Tables.embeddings(spark, Sf)
    e.select(col("vec_id").as("a"), col("embedding").as("va"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("vb")),
        col("a") === (col("b") + 1))
  }

  test("vec_dot / vec_cosine / vec_norm2sq match the UDF baselines bit-for-bit") {
    val out = pairs.select(
      VectorFunctions.dot(col("va"), col("vb")).as("d_native"),
      VectorFunctions.dot_udf(col("va"), col("vb")).as("d_udf"),
      VectorFunctions.cosine(col("va"), col("vb")).as("c_native"),
      VectorFunctions.cosine_udf(col("va"), col("vb")).as("c_udf"),
      VectorFunctions.norm2Sq(col("va")).as("n_native")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // exactly equal, not approx
      assert(r.getDouble(2) == r.getDouble(3))
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("native path has no ScalaUDF in the plan; SQL names registered") {
    val plan = pairs.select(
      VectorFunctions.cosine(col("va"), col("vb")).as("c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)

    graft.plans.GraftFunctions.register(spark)
    val viaSql = pairs.limit(5)
      .selectExpr("vec_cosine(va, vb) as c", "vec_dot(va, vb) as d",
        "vec_norm2sq(va) as n")
      .collect()
    assert(viaSql.length == 5 && viaSql.forall(r => !r.isNullAt(0)))
  }
}
