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

  test("native vec_dot_long is bit-identical to the interpreted long fold and to the sparse sum") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 200L).map(i =>
      i -> Array.fill(16)(rnd.nextInt(2001) - 1000L)).toDF("id", "vec")
    val pairs = vecs.as("x").crossJoin(vecs.as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(
        expr("vec_dot_long(x.vec, y.vec)").as("native"),
        expr("aggregate(zip_with(x.vec, y.vec, (a, b) -> a * b), CAST(0 AS BIGINT), " +
          "(acc, v) -> acc + v)").as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
    // and it codegens — over a non-foldable source (a literal local
    // table constant-folds to LocalTableScan and hides the expression)
    val plan = spark.range(100)
      .select(expr("transform(sequence(CAST(0 AS BIGINT), CAST(15 AS BIGINT)), j -> j + id)").as("vec"))
      .select(expr("vec_dot_long(vec, vec)").as("n2"))
      .queryExecution.executedPlan.toString
    // the "*(n)" stage prefix on the Project is the WholeStageCodegen marker
    assert("""\*\(\d+\) Project \[vec_dot_long""".r.findFirstIn(plan).isDefined, plan)
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

  test("q164: floor-mean centroid + exact integer distances; the far vector ranks first") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q164").toString
    Seq((1L, Array(0f, 0f), 0), (2L, Array(0f, 0f), 0), (3L, Array(3f, 4f), 0),
        (4L, Array(1f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Similarity.q164LabelOutliers(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    def sc(x: Double) = math.floor(x * 1e6).toLong
    val m0 = (sc(0) + sc(0) + sc(3)) / 3
    val m1 = (sc(0) + sc(0) + sc(4)) / 3
    def d2(x: Double, y: Double) = {
      val a = sc(x) - m0; val b = sc(y) - m1; a * a + b * b
    }
    val lab0 = got.filter(_._1 == 0).sortBy(_._4)
    assert(lab0.head == ((0, 3L, d2(3, 4), 1)), "far vector must rank first with exact dist2")
    assert(lab0.map(v => v._2 -> v._3).toMap ==
      Map(1L -> d2(0, 0), 2L -> d2(0, 0), 3L -> d2(3, 4)))
    // singleton label: the centroid is the vector itself → dist2 = 0
    assert(got.find(_._1 == 1).get._3 == 0L)
  }

  test("q183: balance summary conserves vectors and bounds the ratio") {
    val r = graft.operators.Similarity.q183IvfBalance(spark, sf).collect().head
    val (cells, total, mx, mn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(total == spark.read.parquet(s"$sf/embeddings.parquet").count())
    assert(cells <= GraftConfig.default.ivfCentroids && cells > 0)
    assert(mx >= mn && mx * cells >= total, "max·cells ≥ total by pigeonhole")
    assert(r.getDouble(4) >= 1.0)
  }

  test("q179: reconstruction errors match a double-arithmetic mirror and respect the qscale/2 bound") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q179").toString
    Seq((1L, Array(1f, -1f, 0.5f), 0), (2L, Array(0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Similarity.q179QuantError(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // mirror the operator's double chain exactly
    val qscale = 1.0 / 127.0
    val errs = Seq(1f, -1f, 0.5f).map { x =>
      val c = math.round(x.toDouble / qscale)
      math.abs(x.toDouble - c.toDouble * qscale)
    }
    val expMax = math.floor(errs.max * 1e9).toLong
    val expSse = errs.map(e => math.floor(e * e * 1e12).toLong).sum
    assert(got(1L) == ((expMax, expSse)))
    assert(got(2L) == ((0L, 0L)), "the zero vector reconstructs exactly")
    // structural bound on real data: max error ≤ qscale/2 (+1 ulp slack)
    val joined = graft.operators.Similarity.q179QuantError(spark, sf)
      .join(graft.operators.Similarity.q89Quantize(spark, sf), "vec_id")
      .collect()
    joined.foreach { r =>
      val bound = math.floor(r.getAs[Double]("qscale") / 2.0 * 1e9).toLong + 1
      assert(r.getAs[Long]("max_err_e9") <= bound,
        s"vec ${r.getLong(0)}: err exceeds the rounding half-step")
    }
  }

  test("q172: two-phase quantiles handle negatives and match hand nearest-ranks") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q172").toString
    // dim 0 values {-3,-1,0,2,10}: n=5 → ranks p25→2nd, p50→3rd, p75→4th
    Seq((1L, Array(-3f), 0), (2L, Array(-1f), 0), (3L, Array(0f), 0),
        (4L, Array(2f), 0), (5L, Array(10f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = graft.operators.Similarity.q172RobustScale(spark, dir).collect().head
    assert(r.getInt(0) == 0 && r.getLong(1) == 5L)
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((-1000000L, 0L, 2000000L, 3000000L)))
  }

  test("norm is positive and scales as expected") {
    GraftExtensions.ensureRegistered(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val bad = e.select(Vec.norm2N("embedding").as("n2")).filter(col("n2") <= 0)
    assert(bad.count() == 0)
  }
}
