package graft.tools
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.1")
    li.count()
    def time(tag: String)(f: => Unit): Unit = { val t0 = System.nanoTime(); f; println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s") }
    time("decimal")(graft.operators.Relational.q1Agg(spark, "/root/testdata/sf0.1").count())
    time("double")(li.groupBy("l_returnflag", "l_linestatus").agg(sum("l_quantity"), sum("l_extendedprice"), sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), sum("l_discount")).count())
    time("fixed")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(expr("CAST(floor(l_quantity*100) AS BIGINT)")),
      sum(expr("CAST(floor(l_extendedprice*100) AS BIGINT)")),
      sum(expr("CAST(floor(l_extendedprice*(1.0-l_discount)*1e6) AS BIGINT)")),
      sum(expr("CAST(floor(l_discount*1e4) AS BIGINT)"))).count())
    time("decimal2")(graft.operators.Relational.q1Agg(spark, "/root/testdata/sf0.1").count())
    spark.stop()
  }
}
