package graft.tools

/** Manual smoke runner: prints the flagship entry() result the driver
  * checks for rows>0. Usage: sbt "runMain graft.tools.Smoke" */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val df = graft.SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, truncate = false)
    spark.stop()
  }
}
