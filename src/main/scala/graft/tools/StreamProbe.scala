package graft.tools

/** Scratch: q77 stream-stream join cost vs streaming shuffle-partition
  * count — isolates state-store-commit overhead from join work. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.read.parquet(s"$dir/events.parquet").count()
    Seq("32", "8", "4").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.streaming.EventStream.q77StreamJoin(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val (a, b) = (once(), once())
      println(f"STREAMPROBE parts=$p run1=$a%.2f run2=$b%.2f")
    }
    spark.stop()
  }
}
