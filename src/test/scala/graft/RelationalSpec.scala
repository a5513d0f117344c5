package graft

import graft.operators.Relational

class RelationalSpec extends GraftSpec {

  test("q1_agg groups are complete and counts add up") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("q2_join_filter broadcasts dims and keeps F orders only") {
    val df = Relational.q2JoinFilter(spark, sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dim joins should be broadcast")
  }

  test("q3_topk is exactly 10 deterministic rows, descending") {
    val rows = Relational.q3TopK(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q4_window running sum is monotone per customer") {
    val rows = Relational.q4Window(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    rows.values.foreach { rs =>
      val maxSpend = rs.map(_.getAs[Double]("running_spend")).max
      assert(maxSpend >= 0 || rs.forall(_.getAs[Double]("running_spend") <= maxSpend))
    }
  }

  test("q5_rollup contains grand total row") {
    val rows = Relational.q5Rollup(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[String]("region") == "ALL" && r.getAs[String]("nation") == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_customers") == spark.read.parquet(s"$sf/customer.parquet").count())
  }

  test("q6_semijoin returns a subset of customers") {
    val n = Relational.q6SemiJoin(spark, sf).count()
    assert(n > 0 && n <= spark.read.parquet(s"$sf/customer.parquet").count())
  }

  test("q7_events_window covers all events") {
    val rows = Relational.q7EventsWindow(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("q8_sessionize assigns every event a session, ids start at 1") {
    val df = Relational.q8Sessionize(spark, sf)
    assert(df.count() == spark.read.parquet(s"$sf/events.parquet").count())
    assert(df.agg(org.apache.spark.sql.functions.min("session_id")).head().getLong(0) == 1L)
  }
}
