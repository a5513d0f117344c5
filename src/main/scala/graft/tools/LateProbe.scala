package graft.tools

/** One-off diagnostics for q243's replay: per-batch input rows and
  * watermark progression over an existing landing directory.
  * Usage: runMain graft.tools.LateProbe <sfDir> <landingDir>
  * (q243's landing is run-unique and dropped after the drain — land a
  * copy with its `land` protocol, or point this at any 4-file dir). */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = graft.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    require(args.length >= 2,
      "pass the landing dir: runMain graft.tools.LateProbe <sfDir> <landingDir>")
    val landing = args(1)
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
