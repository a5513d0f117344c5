package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: time the tip-detection primitives at a given sf dir. */
object TipProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIPPROBE $tag n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    import graft.operators.GraphOps
    val e0 = GraphOps.edges2(spark, dir).select("src", "dst")
    time("edges2.count")(e0.count())
    val e = e0.localCheckpoint(true)
    time("edges.ck.count")(e.count())
    val inc = e.select(col("src").as("node"), col("dst").as("nbr"))
      .unionAll(e.select(col("dst").as("node"), col("src").as("nbr")))
    time("deg.agg")(inc.groupBy("node").agg(count(lit(1)).as("total")).count())
    time("deg.agg2")(inc.groupBy("node")
      .agg(count(lit(1)).as("total"), min(col("nbr")).as("onbr")).count())
    time("tips.detect")(GraphOps.q24Tips(spark, dir).count())
    time("removeTips.1")(GraphOps.removeTips(e).count())
    time("removeTips.2x")(GraphOps.removeTips(GraphOps.removeTips(e)).count())
    spark.stop()
  }
}
