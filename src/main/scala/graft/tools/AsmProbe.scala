package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, Pipeline}

/** Scratch: per-stage edge counts through the q62 composition. */
object AsmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    graft.GraftSession.ensureCheckpointDir(spark)
    val docs = graft.sources.Tables.documents(spark, dir)
    var oe = GraphOps.q17BestOverlap(spark, dir).localCheckpoint(true)
    println("q17 edges=" + oe.count())
    for (i <- 1 to 2) {
      oe = GraphOps.reciprocalBestFrom(oe).localCheckpoint(true)
      println(s"chimeric$i edges=" + oe.count())
    }
    var e = GraphOps.transReduceFrom(oe.select("src", "dst")).localCheckpoint(true)
    println("reduced edges=" + e.count())
    for (i <- 1 to 6) {
      e = GraphOps.removeTips(e).localCheckpoint(true)
      println(s"tips$i edges=" + e.count())
    }
    for (i <- 1 to 3) {
      e = GraphOps.popRoundFrom(e, docs).localCheckpoint(true)
      println(s"pop$i edges=" + e.count())
    }
    val low = GraphOps.q26LowCoverage(spark, dir).select(col("doc_id").as("nid"))
    e = e.join(low.select(col("nid").as("src")), Seq("src"), "left_anti")
      .join(low.select(col("nid").as("dst")), Seq("dst"), "left_anti").localCheckpoint(true)
    println("lowcov edges=" + e.count())
    for (i <- 1 to 4) {
      e = GraphOps.removeTips(e).localCheckpoint(true)
      println(s"tipsB$i edges=" + e.count())
    }
    for (i <- 1 to 3) {
      e = GraphOps.repeatCutRoundFrom(e).localCheckpoint(true)
      println(s"repeat$i edges=" + e.count())
    }
    spark.stop()
  }
}
