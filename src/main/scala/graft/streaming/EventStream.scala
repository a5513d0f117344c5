package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines over the events stream — the streaming
  * twins of Relational.q7EventsWindow / q8Sessionize.
  *
  * Source-agnostic: callers pass any streaming DataFrame with the events
  * schema (`readStream` from files/Kafka in production, MemoryStream in
  * specs). Watermarking bounds state; the windowed aggregate emits
  * append-mode finalized windows.
  */
object EventStream {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Tumbling 1-hour event-time windows with a 2-hour watermark. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /** Stateful per-user running aggregate via mapGroupsWithState —
    * CloudBrush has no streaming surface; this is the Spark-native shape
    * for incremental graph/corpus maintenance. */
  def userRunningTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val evs = batch.toSeq
          val next = UserRunning(uid, prev.n_events + evs.size, prev.total_value + evs.map(_.value).sum)
          state.update(next)
          next
      }
  }

  /** Convenience: file-source stream over a directory of event parquet. */
  def fromParquetDir(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.readStream.schema(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)

  /** Wire a windowed-agg query to a memory sink (specs / demos). */
  def startToMemory(df: DataFrame, queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedAgg(df).writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Append()).start()

  /** q47: the streaming pipeline driven end-to-end through the Verify
    * gate — file-source stream over the events parquet, hourly
    * event-time aggregation, complete-mode memory sink, result returned
    * once the stream drains. Complete mode (not append+watermark) so a
    * bounded replay emits every window and the result equals the batch
    * oracle bit-for-bit; the production shape with watermarked append is
    * [[windowedAgg]]. No countDistinct: streaming aggregation forbids
    * it, so this is q7 minus the distinct-users column. */
  def q47StreamWindow(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // the file source wants a directory: stream the sf dir, glob-filtered
    // down to the events file
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val events =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    val agg = events
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("total_value"))
    val q = agg.writeStream.format("memory").queryName("graft_q47")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    spark.table("graft_q47")
  }

  def q47Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q56: streaming stateful deduplication — dropDuplicates over the
    * stream (the state-store-backed primitive behind streaming exact
    * dedup in a training-data pipeline) feeding a running aggregate;
    * equals batch count-distinct once the bounded stream drains. A
    * production unbounded stream would use
    * dropDuplicatesWithinWatermark to bound the dedup state. */
  def q56StreamDedup(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val agg = raw.select(col("event_type"), col("user_id"))
      .dropDuplicates("event_type", "user_id")
      .groupBy("event_type").agg(count(lit(1)).as("n_users"))
    val q = agg.writeStream.format("memory").queryName("graft_q56")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    spark.table("graft_q56")
  }

  def q56Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type""".stripMargin

  case class UEvent(user_id: Long, value: java.math.BigDecimal)
  case class UserTotal(user_id: Long, n_events: Long, total_value: java.math.BigDecimal)

  /** q64: the custom-state primitive (mapGroupsWithState, the typed
    * KeyValueGroupedDataset API) driven end-to-end through the Verify
    * gate — per-user running event counts and value totals, maintained
    * as explicit GroupState exactly like [[userRunningTotals]].
    *
    * Determinism: values are cast to DECIMAL(25,6) BEFORE entering the
    * typed stream and accumulated with exact BigDecimal adds inside the
    * state function, so the per-group fold order (shuffle-dependent)
    * cannot perturb bits; the final cast to double happens once, equal
    * to the oracle's decimal-sum-then-cast. State is keyed by user_id —
    * shuffle-partitioned, no driver-side accumulation; an unbounded
    * production stream would add a GroupStateTimeout to expire idle
    * users. */
  def q64UserTotals(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    import spark.implicits._
    val evs = raw.select(col("user_id"), col("value").cast("decimal(25,6)").as("value"))
      .as[UEvent]
    val totals = evs.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, java.math.BigDecimal.ZERO))
          var n = prev.n_events
          var tot = prev.total_value
          batch.foreach { e => n += 1; tot = tot.add(e.value) }
          val next = UserTotal(uid, n, tot)
          state.update(next)
          next
      }
    // update-mode memory sink; the bounded single-file source drains in
    // one batch, so the sink holds exactly the final state row per user
    val q = totals.toDF().writeStream.format("memory").queryName("graft_q64")
      .outputMode(OutputMode.Update()).start()
    try q.processAllAvailable() finally q.stop()
    spark.table("graft_q64")
      .select(col("user_id"), col("n_events"), col("total_value").cast("double").as("total_value"))
  }

  def q64Sql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id""".stripMargin
}
