package graft.tools

/** Scratch: explain the executed plan of Dedup.nearDupEdges. */
object PairsExplain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.read.parquet(s"$dir/documents.parquet").count()
    val df = graft.operators.Dedup.nearDupEdges(spark, dir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
