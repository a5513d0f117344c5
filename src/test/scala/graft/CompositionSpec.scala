package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Unit semantics of the edge-set-parameterized assembly stages that
  * compose into q62/q63 (chimeric cut, transitive reduction, bubble
  * pop, repeat-boundary cut) on constructed graphs. */
class CompositionSpec extends GraftSpec {
  import spark.implicits._

  test("Graft.assembleToFasta: corpus -> full assembly -> FASTA files on disk") {
    val out = java.nio.file.Files.createTempDirectory("graft-asm").toString + "/contigs.fa"
    val n = Graft.assembleToFasta(spark, sf, out)
    val expected = graft.operators.Pipeline.q62FullAssembly(spark, sf).count()
    assert(n == expected && n > 0)
    // the written records parse back losslessly through the real source
    val back = graft.sources.Fasta.read(spark, out)
    assert(back.count() == expected)
    assert(back.filter(length(col("text")) === 0).count() == 0)
  }

  test("reciprocalBestFrom keeps only mutually-best overlap edges") {
    // 1→2 is best for both; 1→3 loses on 1's out side (len 2 < 4);
    // 4→2 loses on 2's in side (len 3 < 4)
    val e = Seq((1L, 2L, 4), (1L, 3L, 2), (4L, 2L, 3))
      .toDF("src", "dst", "overlap_len")
    val kept = GraphOps.reciprocalBestFrom(e)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L)))
  }

  test("transReduceFrom drops edges shadowed by a surviving 2-path") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val kept = GraphOps.transReduceFrom(e)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L), (2L, 3L)))
  }

  test("popRoundFrom removes gate-ok non-kept mids, keeps distinct content") {
    // bubble 1→{2,3,4}→5: mid 2 is longest (kept); mid 3 is within the
    // 5% edit gate of 2 (popped); mid 4 is entirely different (kept)
    val docs = Seq(
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaab"), // 40 chars
      (3L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  // 39 chars, lev=2 ≤ 0.05*40
      (4L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
      (1L, "s"), (5L, "t"))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L), (3L, 5L), (4L, 5L))
      .toDF("src", "dst")
    val kept = GraphOps.popRoundFrom(e, docs)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(!kept.exists(p => p._1 == 3L || p._2 == 3L), "gate-ok mid 3 must pop")
    assert(kept.contains((1L, 2L)) && kept.contains((2L, 5L)), "kept mid survives")
    assert(kept.contains((1L, 4L)) && kept.contains((4L, 5L)), "distinct mid survives")
  }

  test("repeatCutRoundFrom keeps only the best in/out edge at a repeat node") {
    // node 10 has in {1,2} and out {20,21} → repeat; keeps 1→10 and 10→20
    val e = Seq((1L, 10L), (2L, 10L), (10L, 20L), (10L, 21L), (7L, 8L))
      .toDF("src", "dst")
    val kept = GraphOps.repeatCutRoundFrom(e)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 10L), (10L, 20L), (7L, 8L)))
  }

  test("repeatCutRoundFrom is idempotent once no repeat boundary remains") {
    val e = Seq((1L, 10L), (2L, 10L), (10L, 20L), (10L, 21L))
      .toDF("src", "dst")
    val once = GraphOps.repeatCutRoundFrom(e)
    val twice = GraphOps.repeatCutRoundFrom(once)
    assert(once.select("src", "dst").as[(Long, Long)].collect().toSet ==
      twice.select("src", "dst").as[(Long, Long)].collect().toSet)
  }
}
