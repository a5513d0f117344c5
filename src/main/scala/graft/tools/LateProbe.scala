package graft.tools

/** One-off diagnostics for q243's replay: per-batch input rows and
  * watermark progression. Usage: runMain graft.tools.LateProbe <sfDir> */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = graft.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    val landing = graft.sources.Scratch.dir("late_landing", dir)
    println(s"LANDING $landing")
    val fs = new org.apache.hadoop.fs.Path(landing)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(landing)).foreach { st =>
      println(s"FILE ${st.getPath.getName} mtime=${st.getModificationTime} len=${st.getLen}")
    }
    val raw = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(landing)
    val agg = raw.withWatermark("ts", "2 hours")
      .filter(col("event_type") =!= "zzz_flush")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late_probe")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      val so = p.stateOperators.headOption
      println(s"BATCH ${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} " +
        s"dropped=${so.map(_.numRowsDroppedByWatermark)} updated=${so.map(_.numRowsUpdated)} removed=${so.map(_.numRowsRemoved)}")
    }
    q.stop()
    println(s"TOTAL ${spark.table("late_probe").count()}")
    spark.stop()
  }
}
