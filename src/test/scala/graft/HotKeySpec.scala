package graft

import graft.operators.GraphOpsLib
import org.apache.spark.sql.functions._

/** The MatchPrefix hot-key guard [MatchPrefix.java:155-156]: candidate
  * keys above the frequency cap are skipped so one viral boundary phrase
  * cannot create a quadratic join bucket. */
class HotKeySpec extends GraftSpec {
  import spark.implicits._

  // 6 docs ending in the viral suffix "went viral" + 6 starting with it
  // (12 occurrences of the key), plus one normal chain a→b
  private lazy val docs = {
    val viralSrc = (1L to 6L).map(i => (i, s"unique$i text that went viral"))
    val viralDst = (11L to 16L).map(i => (i, s"went viral differently $i here"))
    val normal = Seq((21L, "alpha beta gamma delta"), (22L, "gamma delta epsilon zeta"))
    (viralSrc ++ viralDst ++ normal).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
  }

  test("edges on a hot boundary key are skipped; normal keys survive") {
    val ops = new GraphOpsLib(GraftConfig(maxOverlapKeyDf = 3))
    val e = ops.edges2From(ops.docsKeyedFrom(docs))
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(e.contains((21L, 22L)), "normal-key edge must survive")
    assert(!e.exists { case (s, d) => s <= 6L && d >= 11L },
      "viral-key bucket (6×6 candidates) must be skipped entirely")
  }

  test("uncapped config keeps the viral bucket (guard is the only filter)") {
    val ops = new GraphOpsLib(GraftConfig(maxOverlapKeyDf = 1000))
    val e = ops.edges2From(ops.docsKeyedFrom(docs))
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(e.count { case (s, d) => s <= 6L && d >= 11L } == 36)
  }

  test("plan shape: the guard is a broadcast left-anti join on the key") {
    val plan = operators.GraphOps.edges2(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), "hot-key anti-join missing from edges2 plan")
  }
}
