package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftConfig
import graft.sources.Tables

/** Count-Min sketch (Cormode & Muthukrishnan '05) — the sublinear-space
  * frequency summary: $CmRows salted hash rows × 16^$CmHexChars buckets
  * of integer counters. Every token occurrence increments one bucket
  * per row; a token's estimate is the MIN over its row buckets, an
  * upper bound on the true count (collisions only inflate).
  *
  * The scale story is the whole point: the sketch is a fixed-size
  * (rows × buckets) aggregate no matter the corpus — at 100 TB the
  * token stream folds map-side into per-partition sketch fragments and
  * one tiny shuffle merges them, while the exact per-token aggregate
  * it replaces shuffles the full vocabulary. q88 builds BOTH (the
  * sketch and the exact counts for the top-$CmHeavyK heavy hitters) so
  * the oracle hash-verifies estimate ≥ truth bucket-for-bucket.
  *
  * Buckets are md5-hex prefixes (salt r ":" token) — the same
  * cross-engine hash idiom as the q68/q75 md5 splits, integer counters
  * only, so both engines agree bit-for-bit. */
class SketchOps(val cfg: GraftConfig) {
  val CmRows: Int = cfg.cmRows
  val CmHexChars: Int = cfg.cmHexChars
  val CmHeavyK: Int = cfg.cmHeavyK

  /** The (row, bucket) struct array for one token column. */
  private def bucketStructs(token: Column): Column =
    array((0 until CmRows).map(r => struct(lit(r).as("r"),
      substring(md5(concat(lit(s"$r:"), token)), 1, CmHexChars).as("b"))): _*)

  /** q88: Count-Min heavy-hitter verification — the top-$CmHeavyK
    * tokens by true count (ties → token asc) with their sketch
    * estimates alongside. cm_est ≥ true_cnt always; equality means no
    * collision in some row. */
  def q88Countmin(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val truth = toks.groupBy("token").agg(count(lit(1)).as("true_cnt"))
    val top = truth.orderBy(col("true_cnt").desc, col("token")).limit(CmHeavyK)
    val sketch = toks
      .select(explode(bucketStructs(col("token"))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val qb = top
      .select(col("token"), col("true_cnt"), explode(bucketStructs(col("token"))).as("rb"))
      .select(col("token"), col("true_cnt"), col("rb.r").as("r"), col("rb.b").as("b"))
    qb.join(broadcast(sketch), Seq("r", "b"))
      .groupBy("token", "true_cnt")
      .agg(min(col("c")).as("cm_est"))
  }

  /** q95: the STREAMING Count-Min — the same sketch maintained
    * incrementally over a documents stream (file source here; Kafka in
    * production). This is the sketch's real habitat: the streaming
    * aggregation state is the sketch itself — $CmRows × 16^$CmHexChars
    * counters, BOUNDED BY CONSTRUCTION no matter how much stream
    * passes — where an exact streaming vocabulary count's state grows
    * with every distinct token. Complete-mode drain of the bounded
    * replay equals the batch sketch bit-for-bit (spec-pinned). */
  def q95StreamCountmin(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val sketch = raw
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .select(explode(bucketStructs(col("token"))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val q = sketch.writeStream.format("memory").queryName("graft_q95")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    spark.table("graft_q95")
  }

  def q95Sql: String = {
    val rowList = (0 until CmRows).mkString("[", ", ", "]")
    s"""WITH toks AS (SELECT t AS token FROM
       |    (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE t <> ''),
       |rows AS (SELECT unnest($rowList) AS r),
       |bucketed AS (SELECT r.r,
       |    substr(md5(CAST(r.r AS VARCHAR) || ':' || toks.token), 1, $CmHexChars) AS b
       |  FROM toks CROSS JOIN rows r)
       |SELECT r, b, count(*) AS c FROM bucketed GROUP BY 1, 2""".stripMargin
  }

  def q88Sql: String = {
    val rowList = (0 until CmRows).mkString("[", ", ", "]")
    s"""WITH toks AS (SELECT t AS token FROM
       |    (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE t <> ''),
       |truth AS (SELECT token, count(*) AS true_cnt FROM toks GROUP BY 1),
       |top AS (SELECT token, true_cnt FROM truth
       |  ORDER BY true_cnt DESC, token LIMIT $CmHeavyK),
       |rows AS (SELECT unnest($rowList) AS r),
       |bucketed AS (SELECT r.r,
       |    substr(md5(CAST(r.r AS VARCHAR) || ':' || toks.token), 1, $CmHexChars) AS b
       |  FROM toks CROSS JOIN rows r),
       |sketch AS (SELECT r, b, count(*) AS c FROM bucketed GROUP BY 1, 2),
       |qb AS (SELECT t.token, t.true_cnt, r.r,
       |    substr(md5(CAST(r.r AS VARCHAR) || ':' || t.token), 1, $CmHexChars) AS b
       |  FROM top t CROSS JOIN rows r)
       |SELECT qb.token, qb.true_cnt, CAST(min(s.c) AS BIGINT) AS cm_est
       |FROM qb JOIN sketch s ON s.r = qb.r AND s.b = qb.b
       |GROUP BY 1, 2""".stripMargin
  }
}

/** Default-configured instance (see [[graft.GraftConfig]]). */
object Sketch extends SketchOps(GraftConfig.default)
