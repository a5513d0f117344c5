package graft.tools

/** Isolated per-query probe: times each named query at the given sf with
  * the same noop-sink, warm-run methodology Bench uses, away from bench
  * JIT-order effects. Usage:
  *   sbt "runMain graft.tools.QProbe /root/testdata/sf0.1 q25_bubbles ..."
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail
    val spark = graft.GraftSession.get()
    spark.read.parquet(s"$dir/documents.parquet").count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = once()
      println(f"QPROBE $name cold=$cold%.2f warm=$warm%.2f")
    }
    spark.stop()
  }
}
