package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftConfig
import graft.sources.Tables

/** Term-weighting retrieval scores over the corpus: per-doc top-k TF-IDF
  * terms and BM25 scores for a fixed query-term list.
  *
  * Cross-engine determinism: no logarithms (libm `log` and JVM
  * `Math.log` differ in the last ulp, which a hash gate would catch), so
  * both scores use the division-form variants — every floating op is a
  * single IEEE multiply/divide over exact integers, bit-identical on any
  * conforming engine. The average document length feeding BM25 is
  * Σdl/N with the sum carried in exact integer arithmetic.
  */
class RankingOps(val cfg: GraftConfig) {
  val TfidfTopK: Int = cfg.tfidfTopK
  val K1: Double = cfg.bm25K1
  val B: Double = cfg.bm25B
  val Terms: Seq[String] = cfg.bm25Terms
  private val termList = Terms.map(t => s"'$t'").mkString("(", ", ", ")")

  private def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")

  /** q87: top-$TfidfTopK TF-IDF terms per doc, division-form idf
    * weight (N+1)/(df+1), ties broken by term. Scale: tf and df are
    * both map-side-combinable aggregates off one token scan; the
    * tf⋈df join shuffles on token (df is per-token unique — no
    * fanout); the per-doc rank filter plans as a window group limit,
    * so no doc's terms ever leave its partition unranked. */
  def q87Tfidf(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(spark, dir)
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = toks.select("doc_id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    tf.join(df, "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf").cast("double") * (col("n") + lit(1.0)) / (col("df") + lit(1.0)))
          .as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TfidfTopK)
      .select("doc_id", "token", "tf", "df", "score", "rk")
  }

  def q87Sql: String =
    s"""WITH toks AS (SELECT doc_id, t AS token FROM
       |    (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE t <> ''),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
       |    CAST(tf.tf AS DOUBLE) * (n.n + 1.0) / (df.df + 1.0) AS score
       |  FROM tf JOIN df USING (token) CROSS JOIN n)
       |SELECT doc_id, token, tf, df, score, rk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, token) AS rk FROM s)
       |WHERE rk <= $TfidfTopK""".stripMargin

  /** q90: BM25 term scores for the query terms $Terms — the classic
    * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) saturation, idf-free so the
    * score stays transcendental-free. One row per (doc, present query
    * term). Scale: the query-term tf aggregate filters BEFORE
    * aggregating (the predicate reaches the token scan); dl is a
    * second map-side aggregate off the same scan; avgdl is a broadcast
    * scalar; the tf⋈dl join shuffles on doc_id only for docs holding a
    * query term. */
  def q90Bm25(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(spark, dir)
    // ONE per-doc aggregate carries dl and every query term's tf as
    // conditional sums — no tf⋈dl shuffle join; the stack() unpivot is
    // a free row-local generate afterwards
    val tfCols = Terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val byDoc = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val stats = byDoc.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val stackArgs = Terms.zipWithIndex
      .map { case (t, i) => s"'$t', tf$i" }.mkString(", ")
    val k1 = lit(K1)
    val b = lit(B)
    byDoc.crossJoin(broadcast(stats))
      .selectExpr("doc_id", "dl", "avgdl",
        s"stack(${Terms.length}, $stackArgs) AS (token, tf)")
      .filter(col("tf") > 0)
      .select(col("doc_id"), col("token"), col("tf"), col("dl"),
        (col("tf").cast("double") * (k1 + lit(1.0)) /
          (col("tf") + k1 * (lit(1.0) - b + b * col("dl") / col("avgdl"))))
          .as("score"))
  }

  def q90Sql: String =
    s"""WITH toks AS (SELECT doc_id, t AS token FROM
       |    (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE t <> ''),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       |stats AS (SELECT CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
       |  WHERE token IN $termList GROUP BY 1, 2)
       |SELECT tf.doc_id, tf.token, tf.tf, dl.dl,
       |  CAST(tf.tf AS DOUBLE) * (CAST($K1 AS DOUBLE) + 1.0) /
       |    (tf.tf + CAST($K1 AS DOUBLE) *
       |      (1.0 - CAST($B AS DOUBLE) + CAST($B AS DOUBLE) * dl.dl / stats.avgdl)) AS score
       |FROM tf JOIN dl USING (doc_id) CROSS JOIN stats""".stripMargin
}

/** Default-configured instance (see [[graft.GraftConfig]]). */
object Ranking extends RankingOps(GraftConfig.default)
