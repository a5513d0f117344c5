package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: does a localCheckpoint (raw vs stats-barrier'd) advertise
  * its hash partitioning to a subsequent same-key join? */
object BarrierProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    import spark.implicits._
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan.toString
      "Exchange hashpartitioning".r.findAllIn(p).length
    }
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keyed = (1L to 100L).toDF("k").repartition(col("k"))
    val raw = keyed.localCheckpoint(true)
    val cut = graft.Ck.stage(keyed, graft.GraftConfig.default)
    val other = (1L to 50L).toDF("k").repartition(col("k")).localCheckpoint(true)
    val otherCut = graft.Ck.stage((1L to 50L).toDF("k").repartition(col("k")), graft.GraftConfig.default)
    println("RAW  self-join exchanges: " + exchanges(raw.as("a").join(raw.as("b").hint("merge"), "k")))
    println("CUT  self-join exchanges: " + exchanges(cut.as("a").join(cut.as("b").hint("merge"), "k")))
    println("RAW  two-table exchanges: " + exchanges(raw.join(other.hint("merge"), "k")))
    println("CUT  two-table exchanges: " + exchanges(cut.join(otherCut.hint("merge"), "k")))
    val keyedN = (1L to 100L).toDF("k").repartition(n, col("k"))
    val rawN = keyedN.localCheckpoint(true)
    val cutN = graft.Ck.stage((1L to 100L).toDF("k").repartition(n, col("k")), graft.GraftConfig.default)
    val otherN = (1L to 50L).toDF("k").repartition(n, col("k")).localCheckpoint(true)
    val otherCutN = graft.Ck.stage((1L to 50L).toDF("k").repartition(n, col("k")), graft.GraftConfig.default)
    println("RAWN self-join exchanges: " + exchanges(rawN.as("a").join(rawN.as("b").hint("merge"), "k")))
    println("CUTN self-join exchanges: " + exchanges(cutN.as("a").join(cutN.as("b").hint("merge"), "k")))
    println("RAWN two-table exchanges: " + exchanges(rawN.join(otherN.hint("merge"), "k")))
    println("CUTN two-table exchanges: " + exchanges(cutN.join(otherCutN.hint("merge"), "k")))
    println("RAWN delta-shape exchanges: " + exchanges(
      rawN.join(otherN.select(col("k"), lit(1).as("x")).hint("shuffle_hash"), "k")))
    println("CUTN delta-shape exchanges: " + exchanges(
      cutN.join(otherCutN.select(col("k"), lit(1).as("x")).hint("shuffle_hash"), "k")))
    spark.stop()
  }
}
