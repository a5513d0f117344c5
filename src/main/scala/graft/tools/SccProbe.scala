package graft.tools

/** Scratch: one-shot q187 run with INFO-level driver logging — for
  * adjudicating the sf0.01 per-round stall (round-11 investigation). */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("INFO")
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q187_scc")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    println(f"SCCPROBE total=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
