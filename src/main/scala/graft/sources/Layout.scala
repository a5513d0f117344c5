package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned corpus layout — the directory-level
  * complement to `Tables.writeBucketed` (bucketing co-locates JOIN
  * keys; partitioning prunes SCANS): `lang=en/part-*.parquet`
  * directories mean a per-language query reads ONLY its language's
  * files — at 100 TB, a lang filter over a flat layout still lists and
  * footer-reads every file, while the partitioned layout turns the
  * filter into directory pruning before a single byte of data is read.
  * The partition column lives in the directory name, not the files, so
  * the layout also stores one column fewer. */
object Layout {

  /** Write `df` partitioned by `byCol` (Hive-style directories). Pick
    * a LOW-cardinality column: every distinct value is a directory,
    * and small-file explosion from a high-cardinality partition key is
    * the classic data-lake pathology (that's what bucketing is for). */
  def writePartitioned(df: DataFrame, path: String, byCol: String): Unit =
    df.write.mode("overwrite").partitionBy(byCol).parquet(path)

  /** q146: partitioned-layout round trip + pruned read — write the
    * documents table partitioned by lang, read it back filtered to one
    * language, and return that slice. The DuckDB oracle is the same
    * filter over the flat table, so the hash gate verifies the
    * write→partition→prune→read cycle loses nothing and leaks nothing
    * across partition boundaries; PlanSpec pins that the filtered scan
    * reads ONLY the selected partition (partition-pruned FileScan). */
  def q146PartitionedScan(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val path = Scratch.dir("partlang", dir)
    writePartitioned(docs, path, "lang")
    spark.read.parquet(path)
      .filter(col("lang") === graft.GraftConfig.default.layoutScanLang)
      .select("doc_id", "lang", "source", "n_chars")
  }

  def q146Sql: String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE lang = '${graft.GraftConfig.default.layoutScanLang}'""".stripMargin

  /** q198: DYNAMIC partition pruning — q146's prune comes from a
    * literal the planner sees; here the pruning set exists only at
    * RUNTIME: events lay out day-partitioned, the "incident day" dim
    * (days with ≥ dppErrorMinCount error events) is computed from
    * data, and Spark injects the broadcast dim's day set into the
    * partitioned scan as a runtime partition filter (DPP) — only
    * incident-day directories are ever read. At 100 TB this is the
    * fact-to-dim star-join pattern: the date dim's predicate can't be
    * inlined into the fact scan at plan time, and without DPP the
    * fact side reads every partition to throw most of them away.
    * PlanSpec pins `dynamicpruning` inside the partitioned scan's
    * PartitionFilters. Day keys are `d<epoch-day>` STRINGS so
    * partition-column type inference cannot insert a cast between the
    * scan column and the join key (a cast there defeats DPP). Output:
    * per incident day, total events / distinct users / error count —
    * the oracle recomputes from the flat table, hash-verifying that
    * pruning lost nothing. */
  def q198DppScan(spark: SparkSession, dir: String): DataFrame = {
    val cfg = graft.GraftConfig.default
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        concat(lit("d"), expr("unix_millis(ts) div 86400000")).as("day"))
    val path = Scratch.dir("partday", dir)
    writePartitioned(ev, path, "day")
    val part = spark.read.parquet(path)
    val incidents = ev.filter(col("event_type") === "error")
      .groupBy("day").agg(count(lit(1)).as("n_err"))
      .filter(col("n_err") >= cfg.dppErrorMinCount)
    part.join(broadcast(incidents), "day")
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
  }

  def q198Sql: String =
    s"""WITH ev AS (SELECT user_id, event_type,
       |    'd' || CAST(epoch_ms(ts) // 86400000 AS VARCHAR) AS day FROM events),
       |inc AS (SELECT day FROM ev WHERE event_type = 'error'
       |  GROUP BY day HAVING count(*) >= ${graft.GraftConfig.default.dppErrorMinCount})
       |SELECT day, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
       |FROM ev JOIN inc USING (day)
       |GROUP BY day""".stripMargin
}
