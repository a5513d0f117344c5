package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.LogicalRDD

/** Scratch: what outputPartitioning does a localCheckpoint's LogicalRDD carry? */
object BarrierProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    import spark.implicits._
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def show(tag: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.analyzed match {
        case l: LogicalRDD => println(s"PART $tag -> ${l.outputPartitioning}")
        case other => println(s"PART $tag -> not LogicalRDD: ${other.getClass}")
      }
    show("colOnly", (1L to 100L).toDF("k").repartition(col("k")).localCheckpoint(true))
    show("explicitN", (1L to 100L).toDF("k").repartition(n, col("k")).localCheckpoint(true))
    show("cut", graft.Ck.stage((1L to 100L).toDF("k").repartition(n, col("k")), graft.GraftConfig.default))
    spark.stop()
  }
}
