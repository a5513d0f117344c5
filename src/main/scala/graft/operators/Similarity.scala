package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Vec

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * q40 is the exact baseline: broadcast the (small) query set against the
  * corpus — at 100 TB the corpus side streams through executors while the
  * queries ride the broadcast, so there is no shuffle at all until the
  * per-query top-k, which is a tiny partial-top-k aggregation.
  *
  * q41 is the scale path: IVF partitioning. A deterministic centroid set
  * (a real system would k-means sample; the seeding is the deterministic
  * part here) is broadcast, every vector is assigned to its nearest cell
  * in one pass, and queries probe only their own cell — turning top-k
  * from corpus-wide into cell-wide work.
  */
object Similarity {
  val NumQueries = 10
  val TopK = 5
  val NumCentroids = 16
  val IvfTopK = 3

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

  /** q40: exact brute-force cosine top-k for query vectors (vec_id <
    * $NumQueries), deterministic tie-break on vec_id. */
  def q40AnnBrute(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val e = emb(spark, dir).withColumn("n2", Vec.norm2N("embedding"))
    val q = broadcast(e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("n2").as("qn2")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    q.crossJoin(e)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Vec.cosineFromParts(Vec.dotN("qe", "embedding"), col("qn2"), col("n2")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select("query_id", "vec_id", "rk", "cosine")
  }

  def q40Sql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < $NumQueries),
       |pairs AS (SELECT query_id, vec_id, qe, embedding AS ve FROM q, embeddings
       |  WHERE vec_id <> query_id),
       |ex AS (SELECT query_id, vec_id, unnest(qe) AS a, unnest(ve) AS b FROM pairs),
       |dots AS (SELECT query_id, vec_id,
       |    ${Vec.dotDecSqlDuck("a", "b")} AS dot,
       |    ${Vec.dotDecSqlDuck("a", "a")} AS na,
       |    ${Vec.dotDecSqlDuck("b", "b")} AS nb
       |  FROM ex GROUP BY query_id, vec_id),
       |scored AS (SELECT query_id, vec_id,
       |    CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cosine
       |  FROM dots),
       |ranked AS (SELECT query_id, vec_id, cosine,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT query_id, vec_id, rk, cosine FROM ranked WHERE rk <= $TopK""".stripMargin

  /** q41: IVF ANN — deterministic centroids (vec_id < $NumCentroids),
    * one-pass nearest-centroid assignment, then per-cell top-k for the
    * queries. */
  def q41AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val e = emb(spark, dir).withColumn("n2", Vec.norm2N("embedding"))
    val cents = broadcast(e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"), col("n2").as("cn2")))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id"))
    val assigned = e.crossJoin(cents)
      .select(col("vec_id"), col("embedding"), col("n2"), col("cent_id"),
        Vec.cosineFromParts(Vec.dotN("embedding", "ce"), col("n2"), col("cn2")).as("csim"))
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("n2"), col("cent_id").as("cell"))
    val queries = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("n2").as("qn2"), col("cell"))
    val wTop = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    queries.join(assigned, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Vec.cosineFromParts(Vec.dotN("qe", "embedding"), col("qn2"), col("n2")).as("cosine"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= IvfTopK)
      .select("query_id", "vec_id", "rk", "cosine")
  }

  def q41Sql: String = {
    def cosBlock(tag: String, aTbl: String, aId: String, aVec: String,
                 bTbl: String, bId: String, bVec: String, cond: String): String =
      s"""${tag}_ex AS (SELECT $aTbl.$aId AS ia, $bTbl.$bId AS ib,
         |    unnest($aTbl.$aVec) AS a, unnest($bTbl.$bVec) AS b
         |  FROM $aTbl, $bTbl ${if (cond.nonEmpty) "WHERE " + cond else ""}),
         |${tag}_dots AS (SELECT ia, ib,
         |    ${Vec.dotDecSqlDuck("a", "b")} AS dot,
         |    ${Vec.dotDecSqlDuck("a", "a")} AS na,
         |    ${Vec.dotDecSqlDuck("b", "b")} AS nb
         |  FROM ${tag}_ex GROUP BY ia, ib),
         |${tag}_cos AS (SELECT ia, ib,
         |    CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cosine
         |  FROM ${tag}_dots)""".stripMargin
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < $NumCentroids),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |${cosBlock("asg", "e", "vec_id", "embedding", "cents", "cent_id", "ce", "")},
       |assigned AS (
       |  SELECT ia AS vec_id, ib AS cell FROM (
       |    SELECT ia, ib, row_number() OVER (PARTITION BY ia ORDER BY cosine DESC, ib) AS rk
       |    FROM asg_cos) WHERE rk = 1),
       |av AS (SELECT a.vec_id, e.embedding, a.cell FROM assigned a JOIN e ON a.vec_id = e.vec_id),
       |qv AS (SELECT vec_id AS query_id, embedding AS qe, cell FROM av WHERE vec_id < $NumQueries),
       |cellpairs AS (SELECT qv.query_id, av.vec_id, qv.qe, av.embedding AS ve
       |  FROM qv JOIN av USING (cell) WHERE av.vec_id <> qv.query_id),
       |top_ex AS (SELECT query_id AS ia, vec_id AS ib, unnest(qe) AS a, unnest(ve) AS b FROM cellpairs),
       |top_dots AS (SELECT ia, ib,
       |    ${Vec.dotDecSqlDuck("a", "b")} AS dot,
       |    ${Vec.dotDecSqlDuck("a", "a")} AS na,
       |    ${Vec.dotDecSqlDuck("b", "b")} AS nb
       |  FROM top_ex GROUP BY ia, ib),
       |top_cos AS (SELECT ia, ib,
       |    CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cosine
       |  FROM top_dots)
       |SELECT ia AS query_id, ib AS vec_id, rk, cosine FROM (
       |  SELECT ia, ib, cosine, row_number() OVER (PARTITION BY ia ORDER BY cosine DESC, ib) AS rk
       |  FROM top_cos) WHERE rk <= $IvfTopK""".stripMargin
  }
}
