package graft.tools

/** Scratch: min/median over N warm runs of named queries — the
  * noise-floor companion of QProbe for adjudicating sub-second deltas.
  * Usage: runMain graft.tools.MinProbe <sfDir> <nWarm> <query>... */
object MinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val n = args(1).toInt
    val names = args.drop(2)
    val spark = graft.GraftSession.get()
    spark.read.parquet(s"$dir/documents.parquet").count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // cold
      val runs = (1 to n).map(_ => once()).sorted
      println(f"MINPROBE $name min=${runs.head}%.2f med=${runs(n / 2)}%.2f all=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
