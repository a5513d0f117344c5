package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch: isolate where a graph-cleaning round's time goes at a given
  * sf dir — checkpoint-block reuse, detect cost, rewrite cost. */
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    import graft.operators.GraphOps
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"ROUNDPROBE $tag t=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    val e0 = GraphOps.edges2(spark, dir).select("src", "dst")
    // warm the scan+join subtree once
    e0.count()

    val eCk = time("ck.eager")(e0.localCheckpoint(true))
    time("ck.count1")(eCk.count())
    time("ck.count2")(eCk.count())
    time("ck.scan.filter")(eCk.filter(col("src") =!= col("dst")).count())
    time("ck.union.count")(
      eCk.select(col("src").as("n")).unionAll(eCk.select(col("dst").as("n"))).count())
    time("ck.deg.agg")(
      eCk.select(col("src").as("node"), col("dst").as("nbr"))
        .unionAll(eCk.select(col("dst").as("node"), col("src").as("nbr")))
        .groupBy("node").agg(count(lit(1)).as("total")).count())
    time("ck.tips.detect")(GraphOps.tipNodesFrom(eCk).count())
    time("ck.removeTips")(GraphOps.removeTips(eCk).count())

    val eP = time("persist")(e0.persist(StorageLevel.MEMORY_AND_DISK))
    time("persist.count1")(eP.count())
    time("persist.deg.agg")(
      eP.select(col("src").as("node"), col("dst").as("nbr"))
        .unionAll(eP.select(col("dst").as("node"), col("src").as("nbr")))
        .groupBy("node").agg(count(lit(1)).as("total")).count())
    time("persist.tips.detect")(GraphOps.tipNodesFrom(eP).count())
    time("persist.removeTips")(GraphOps.removeTips(eP).count())

    // repartitioned narrow copy: fewer, fatter partitions for the tiny graph
    val eR = time("coalesce8.ck")(e0.coalesce(8).localCheckpoint(true))
    time("co8.deg.agg")(
      eR.select(col("src").as("node"), col("dst").as("nbr"))
        .unionAll(eR.select(col("dst").as("node"), col("src").as("nbr")))
        .groupBy("node").agg(count(lit(1)).as("total")).count())
    time("co8.tips.detect")(GraphOps.tipNodesFrom(eR).count())
    time("co8.removeTips")(GraphOps.removeTips(eR).count())
    time("co8.removeTips2")(GraphOps.removeTips(eR).count())
    spark.stop()
  }
}
