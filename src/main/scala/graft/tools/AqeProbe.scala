package graft.tools

/** Scratch: measure a query warm with AQE on vs off (runtime conf flip).
  * Usage: runMain graft.tools.AqeProbe <sfDir> <query> */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val name = args(1)
    val spark = graft.GraftSession.get()
    spark.read.parquet(s"$dir/documents.parquet").count()
    val fn = graft.SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup under session defaults (parallelismFirst=true, no advisory set)
    // Each phase sets BOTH knobs explicitly so the label always matches
    // the config that actually ran (round-9 advice: the session default
    // leaves parallelismFirst=true, so an unset phase is not "pfOff").
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", (64 * 1024 * 1024).toString)
    val a1 = once(); val a2 = once()
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", (4 * 1024 * 1024).toString)
    val b1 = once(); val b2 = once()
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", (64 * 1024 * 1024).toString)
    val c1 = once(); val c2 = once()
    println(f"AQEPROBE $name pfOff64M=$a1%.2f/$a2%.2f pfOff4M=$b1%.2f/$b2%.2f pfOn=$c1%.2f/$c2%.2f")
    spark.stop()
  }
}
