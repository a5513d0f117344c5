package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC source/sink — the other columnar format a switchable engine
  * meets in the wild (Hive-era warehouses are ORC lakes; migrations
  * read ORC and write parquet for years). Spark's ORC support is
  * built in and split-safe like parquet; the format differences that
  * BITE are type-mapping ones, which is why the round trip here
  * carries every column class the corpus uses (BIGINT, VARCHAR,
  * TIMESTAMP via the events table's value DOUBLE and ts) and is
  * hash-gated against the flat table — a lossy type round-trip
  * (timestamp precision, string encoding) fails the gate, not a code
  * review.
  */
object Orc {

  /** q259: ORC round trip — events written to ORC with snappy
    * compression, read back, reduced to the q238-shaped per-type
    * aggregate the oracle recomputes from the flat table. Timestamps
    * compare in epoch ms (the q85 idiom): Spark truncates parquet's
    * nanos to micros on READ, and ORC stores what Spark hands it, so
    * the ms-level roll-up is identical through either format — the
    * max_ms column would catch an ORC timestamp-precision loss.
    *
    * Scale: ORC is a splittable columnar format — the write is one
    * pass, the read plans like any FileScan (pushdown and pruning
    * included); nothing here is single-task. */
  def q259OrcRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Scratch.withRunDir(spark, dir, "orc_events") { path =>
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .write.option("compression", "snappy").orc(path)
    spark.read.orc(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("total_value"),
        max(unix_millis(col("ts"))).as("max_ms"))
  }

  def q259Sql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
      |  CAST(max(epoch_ms(ts)) AS BIGINT) AS max_ms
      |FROM events GROUP BY 1""".stripMargin
}
