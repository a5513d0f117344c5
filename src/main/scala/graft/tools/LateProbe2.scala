package graft.tools

/** Minimal MemoryStream reproduction: does Spark 4.1 drop late input
  * rows for append-mode windowed aggregation? */
object LateProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val Day = 86400000L
    val landing = "/tmp/late_probe2_landing"
    val fs = new org.apache.hadoop.fs.Path(landing)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(landing), true)
    def land(rows: Seq[Long], name: String, mtime: Long): Unit = {
      val tmp = s"$landing/_stage_$name"
      rows.toDF("ms")
        .select(col("ms").cast("long").as("event_id"),
          timestamp_millis(col("ms")).as("ts"),
          when(col("ms") === 40L * Day, "zzz_flush").otherwise("x").as("event_type"))
        .coalesce(1).write.parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).filter(_.getName.startsWith("part-")).head
      val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
      fs.rename(part, dst)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      fs.setTimes(dst, mtime, -1)
    }
    land(Seq(30 * Day, 30 * Day + 1000), "b1", 1000L)
    land(Seq(1 * Day), "b2", 2000L)
    land(Seq(40 * Day), "b3", 3000L)
    val raw = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(landing)
    val agg = raw
      .withWatermark("ts", "2 hours")
      .filter(col("event_type") =!= "zzz_flush")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("w"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late2")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      val so = p.stateOperators.headOption
      println(s"BATCH ${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")} " +
        s"dropped=${so.map(_.numRowsDroppedByWatermark)}")
    }
    q.stop()
    spark.table("late2").orderBy("w").collect()
      .foreach(r => println(s"ROW day=${r.getLong(0) / Day} n=${r.getLong(1)}"))
    spark.stop()
  }
}
