package graft.tools

/** Timing probe for the pointer-jumping loop (q27/q38). */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    // session configured exactly like Bench's (NOT GraftSession): probe
    // timings must reproduce bench behavior, and GraftSession's larger
    // broadcast threshold can flip join strategies
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    graft.sources.Tables.documents(spark, dir).count()
    time("q27_cold")(graft.operators.GraphOps.q27ChainCompress(spark, dir).write.format("noop").mode("overwrite").save())
    time("q27_warm")(graft.operators.GraphOps.q27ChainCompress(spark, dir).write.format("noop").mode("overwrite").save())
    (1 to 5).foreach { i =>
      time(s"q38_run$i")(graft.operators.GraphOps.q38Consensus(spark, dir).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
