package graft

/** Plan-shape regression tests: the scale properties Graft is designed
  * around, asserted against the executed physical plans so a future
  * rewrite can't silently reintroduce a known scale-killer. */
class PlanSpec extends GraftSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def windows(p: String): Int = "\\bWindow\\b".r.findAllIn(p).length

  test("per-doc kmer statistics never window over the kmer key (hot-key skew)") {
    Seq("q9_tag_trusted", "q9_precorrect", "q15_kmer_read_freq", "q16_trusted", "q26_low_coverage")
      .foreach(n => assert(windows(plan(n)) == 0, s"$n plan contains a Window"))
  }

  test("q28 N50 uses the histogram, not an unpartitioned running-sum window") {
    assert(windows(plan("q28_graph_stats")) == 0)
  }

  test("q18 reciprocal-best never windows over src/dst (hub-node skew)") {
    assert(windows(plan("q18_chimeric_cut")) == 0)
  }

  test("q41 IVF: windows only on the tiny query side (probe rank + final top-k)") {
    assert(windows(plan("q41_ann_ivf")) == 2)
  }

  test("dimension joins broadcast (q2 star joins)") {
    assert(plan("q2_join_filter").contains("BroadcastHashJoin"))
  }

  test("column pruning reaches the scan (q50 reads only doc_id,text)") {
    assert(plan("q50_token_count").contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("filter pushdown reaches the orders scan (q6 semi-join)") {
    val scanLines = plan("q6_semijoin").linesIterator.filter(_.contains("FileScan")).mkString("\n")
    assert(scanLines.contains("o_totalprice") && scanLines.contains("> 200000.0"),
      "high-value filter must reach the orders scan")
  }
}
