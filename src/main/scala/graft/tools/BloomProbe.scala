package graft.tools

/** Scratch: compare warm query times with runtime bloom-filter join
  * pruning on vs off. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val off = args(1) == "off"
    val names = args.drop(2)
    val b = graft.GraftSession.builder()
    val spark = (if (off)
      b.config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    else b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/documents.parquet").count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      println(f"BLOOM(${if (off) "off" else "on"}) $name warm=${once()}%.2f")
    }
    spark.stop()
  }
}
