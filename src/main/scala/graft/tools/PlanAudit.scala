package graft.tools

/** Prints executed plans for key queries so pushdown/broadcast/codegen
  * can be audited. Usage: sbt "runMain graft.tools.PlanAudit [sfDir]" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.get()
    val interesting = Seq("q2_join_filter", "q6_semijoin", "q40_ann_brute", "q10_kmer_count")
    interesting.foreach { name =>
      println(s"\n========== $name ==========")
      println(graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
