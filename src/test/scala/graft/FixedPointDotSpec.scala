package graft

import graft.functions.Vec
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class FixedPointDotSpec extends GraftSpec {

  test("native vec_dot_fixed is bit-identical to the HOF formulation on real embeddings") {
    GraftExtensions.ensureRegistered(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pairs = e.as("x").crossJoin(e.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id")).limit(2000)
      .select(
        Vec.dot("x.embedding", "y.embedding").as("hof"),
        Vec.dotN("x.embedding", "y.embedding").as("native"))
    assert(pairs.filter(col("hof") =!= col("native")).count() == 0)
  }

  test("native expression participates in codegen (no interpreted lambdas in plan)") {
    GraftExtensions.ensureRegistered(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = e.select(expr("vec_dot_fixed(embedding, embedding)").as("n2"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" stage prefix is the WholeStageCodegen marker in plan text
    assert(plan.contains("*(1) Project [vec_dot_fixed"), s"expected codegen'd project in:\n$plan")
    assert(df.count() > 0)
  }

  test("norm is positive and scales as expected") {
    GraftExtensions.ensureRegistered(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val bad = e.select(Vec.norm2N("embedding").as("n2")).filter(col("n2") <= 0)
    assert(bad.count() == 0)
  }
}
