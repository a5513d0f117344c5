package graft

import org.apache.spark.sql.functions._

/** Evidence for SURVEY §4's "co-locate joins via bucketing": two tables
  * bucketed+sorted on the join key join with NO exchange on either side
  * — the 100 TB pattern for repeated joins on a stable key (doc_id),
  * where pre-bucketing replaces a per-query corpus shuffle with a
  * one-time layout cost at write. */
class BucketingSpec extends GraftSpec {

  test("bucketed doc tables join without a shuffle on either side") {
    // default warehouse dir (static conf); DROP TABLE cleans the managed data
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text", "n_chars")
    graft.sources.Tables.writeBucketed(docs, "graft_docs_a", "doc_id", buckets = 8)
    graft.sources.Tables.writeBucketed(docs.select("doc_id", "n_chars"),
      "graft_docs_b", "doc_id", buckets = 8)
    try {
      // merge hint: at test scale the planner would broadcast the small
      // side (bypassing bucketed scans entirely); at 100 TB neither side
      // broadcasts and this SortMergeJoin shape is what actually runs
      val joined = spark.table("graft_docs_a").hint("merge")
        .join(spark.table("graft_docs_b").hint("merge"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == docs.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_docs_a")
      spark.sql("DROP TABLE IF EXISTS graft_docs_b")
    }
  }
}
