package graft

import graft.operators.Pipeline
import org.apache.spark.sql.DataFrame

class PhaseHooksSpec extends GraftSpec {

  test("assembleFull emits one q28-shaped stats row after every phase") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, DataFrame)]
    val contigs = Pipeline.assembleFull(spark, sf, (tag, st) => seen += ((tag, st)))
    assert(seen.map(_._1).toSeq ==
      Seq("chimeric", "transred", "tips", "pop", "lowcov", "tips2", "repeat"))
    seen.foreach { case (tag, st) =>
      assert(st.columns.toSeq == Seq("n_contigs", "total_len", "max_len", "n50"), tag)
      assert(st.count() == 1, s"$tag stats must be one row")
    }
    // cleaning only removes: contig count is monotone non-decreasing
    // (every removed edge can only split chains), and the hooked run's
    // output matches the default run exactly
    val counts = seen.map(_._2.collect()(0).getLong(0))
    assert(counts.zip(counts.tail).forall { case (a, b) => b >= a }, counts)
    assert(contigs.count() == Pipeline.assembleFull(spark, sf).count())
  }

  test("fused multi-phase stats match per-phase statsFromEdges exactly") {
    import spark.implicits._
    import graft.operators.GraphOps
    val docs = (1L to 10L).map(i => (i, 100L + i)).toDF("doc_id", "n_chars")
    // phase a: two chains; phase b: a chain sharing nodes with a 2-cycle
    // (cycle nodes must be excluded identically on both paths)
    val phaseA = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val phaseB = Seq((7L, 8L), (8L, 9L), (9L, 10L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val phases = Seq("a" -> phaseA, "b" -> phaseB)
    val fused = GraphOps.multiPhaseStatsFromEdges(spark, docs, phases)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val separate = phases.map { case (tag, e) =>
      val r = GraphOps.statsFromEdges(spark, docs, e).collect()(0)
      tag -> (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }.toMap
    assert(fused == separate)
  }

  test("bounded loops warn when the round budget is exhausted mid-cleaning") {
    import spark.implicits._
    val warns = scala.collection.mutable.ArrayBuffer.empty[String]
    val old = Convergence.onWarn
    Convergence.onWarn = msg => warns += msg
    try {
      // a 7-node path needs 3 tip rounds; with maxRounds=1 the single
      // round still removes edges, so the guard must fire
      val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
        .toDF("src", "dst")
      Pipeline.cleanToConvergence(spark, path, maxRounds = 1).count()
      assert(warns.exists(_.startsWith("clean.tips")), warns)
      // and a converging run stays silent
      warns.clear()
      Pipeline.cleanToConvergence(spark, path, maxRounds = 10).count()
      assert(warns.isEmpty, warns)
    } finally Convergence.onWarn = old
  }
}
