package graft.tools

/** Scratch: print the formatted executed plan of a named query. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.tail
    val spark = graft.GraftSession.get()
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // execute df's own queryExecution so AQE finalizes and the explain
      // carries codegen ids
      df.queryExecution.executedPlan.execute().foreach(_ => ())
      println(s"==== $n ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
