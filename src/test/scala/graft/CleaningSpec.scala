package graft

import graft.operators.{GraphOps, Pipeline}
import org.apache.spark.sql.functions._

/** Specs for the removal-application / popping / pipeline family
  * (q39, q42–q46). */
class CleaningSpec extends GraftSpec {

  test("q39 cleaned graph is a subset with no tip or low-coverage endpoints") {
    val cleaned = GraphOps.q39CleanedGraph(spark, sf)
    val all = GraphOps.q20OverlapEdges(spark, sf)
    assert(cleaned.count() <= all.count())
    val tips = GraphOps.q24Tips(spark, sf).select(col("tip_id").as("x")).distinct()
    assert(cleaned.join(tips, cleaned("src") === col("x") || cleaned("dst") === col("x")).count() == 0)
  }

  test("q42 popped bubbles keep a mid distinct from both endpoints") {
    val b = GraphOps.q42PopBubbles(spark, sf)
    assert(b.filter(col("kept_mid") === col("src") || col("kept_mid") === col("dst")).count() == 0)
    // edit-gated popping: counts are bounded by the ungated mid count and
    // never negative (this corpus's mids are genuinely distinct → 0)
    assert(b.filter(col("n_popped") < 0).count() == 0)
  }

  test("q42 edit gate pops near-identical mids and spares distinct ones") {
    import spark.implicits._
    // bubble src→{mid}→dst with class (a,b): mid 1/2 differ by ONE char
    // (within 5% of 40), mid 3 is shorter and wholly different text
    val docs = Seq(
      (1L, "s a"),
      (2L, "a quick brown fox jumps over the lazy dog b"),   // kept (longest, min id)
      (3L, "a quick brown fox jumps over the hazy dog b"),   // 1 edit → popped
      (4L, "a completely different middle words x b"),        // distinct → spared
      (5L, "b t"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = GraphOps.popBubblesFrom(docs)
      .filter(col("src") === 1L && col("dst") === 5L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("kept_mid") == 2L)
    assert(out(0).getAs[Long]("n_popped") == 1L)
  }

  test("q42 agrees with q25 bubble pairs") {
    val popped = GraphOps.q42PopBubbles(spark, sf).select("src", "dst")
    val bubbles = GraphOps.q25Bubbles(spark, sf).select("src", "dst")
    assert(popped.exceptAll(bubbles).count() == 0)
    assert(bubbles.exceptAll(popped).count() == 0)
  }

  test("q43 three tip rounds remove at least as much as one") {
    val one = GraphOps.removeTips(
      GraphOps.q20OverlapEdges(spark, sf).select("src", "dst")).count()
    val three = GraphOps.q43TipsIterative(spark, sf).count()
    assert(three <= one)
  }

  test("q44 oriented edges contain the forward graph as its ff slice") {
    val ff = GraphOps.q44OrientedEdges(spark, sf)
      .filter(col("orient") === "ff").select("src", "dst")
    val fwd = GraphOps.q20OverlapEdges(spark, sf).select("src", "dst")
    assert(ff.exceptAll(fwd).count() == 0)
    assert(fwd.exceptAll(ff).count() == 0)
  }

  test("q44 rr edges are the reversed ff edges") {
    val e = GraphOps.q44OrientedEdges(spark, sf)
    val rr = e.filter(col("orient") === "rr")
      .select(col("dst").as("src"), col("src").as("dst"))
    val ff = e.filter(col("orient") === "ff").select("src", "dst")
    assert(rr.exceptAll(ff).count() == 0)
    assert(ff.exceptAll(rr).count() == 0)
  }

  test("q45 fuzzy overlap is a superset of exact 3-word overlaps") {
    val fuzzy = GraphOps.q45FuzzyOverlap(spark, sf)
    assert(fuzzy.filter(col("n_mismatch") > 1).count() == 0)
    val exact = GraphOps.q17BestOverlap(spark, sf)
      .filter(col("overlap_len") >= 3).select("src", "dst")
    assert(exact.exceptAll(fuzzy.select("src", "dst")).count() == 0)
  }

  test("pipeline clean-to-convergence reaches a tipless fixpoint") {
    val cleaned = Pipeline.cleanToConvergence(
      spark, GraphOps.q20OverlapEdges(spark, sf).select("src", "dst"))
    assert(GraphOps.removeTips(cleaned).count() == cleaned.count())
  }

  test("q46 assembly produces contigs covering every document once") {
    val contigs = Pipeline.q46Assembly(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(contigs.agg(sum("n_members")).head().getLong(0) <= docs)
    assert(contigs.count() > 0)
  }
}
