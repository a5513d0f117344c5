package graft

import org.apache.spark.sql.functions._

/** ORC source/sink (q259): row-level losslessness on hostile values and
  * the aggregate gate against a direct recompute. */
class OrcSpec extends GraftSpec {
  import spark.implicits._

  test("ORC round-trips microsecond timestamps, negatives, and unicode strings") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val rows = Seq(
      (1L, ts, -12L, "naïve — ünïcode", -1.5),
      (2L, new java.sql.Timestamp(0L), 0L, "", 0.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.orc(s"$dir/e.orc")
    val back = spark.read.orc(s"$dir/e.orc").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSet
    assert(back == rows.toSet, s"lossy ORC round trip: $back")
  }

  test("q259: the ORC-served aggregate equals the parquet-served one row for row") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSet
    val viaOrc = key(graft.sources.Orc.q259OrcRoundtrip(spark, sf))
    val direct = key(graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("total_value"),
        max(unix_millis(col("ts"))).as("max_ms")))
    assert(viaOrc == direct && viaOrc.nonEmpty)
  }
}
