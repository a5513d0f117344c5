package graft

import graft.operators.{DedupOps, GraphOpsLib, SequenceOps, SimilarityOps}
import org.apache.spark.sql.functions._

class ConfigSpec extends GraftSpec {

  test("SequenceOps honors a custom k (all k-mers have length k)") {
    val ops = new SequenceOps(GraftConfig(k = 12))
    val lens = ops.kmers(spark, sf, ops.K).select(length(col("kmer")).as("l")).distinct().collect()
    assert(lens.map(_.getInt(0)).toSet == Set(12))
  }

  test("custom config flows into the oracle SQL too") {
    val ops = new SequenceOps(GraftConfig(highFreq = 7))
    assert(ops.q11Sql.contains(">= 7"))
    val d = new DedupOps(GraftConfig(nearDupCos = 0.9))
    assert(d.q34Sql.contains(">= 0.9"))
  }

  test("iterative oracles unroll from the configured round counts") {
    val g = new GraphOpsLib(GraftConfig(tipRounds = 2))
    assert(g.q43Sql.contains("r2_out") && !g.q43Sql.contains("r3_out"))
    val s = new SimilarityOps(GraftConfig(kmeansIters = 1))
    assert(s.q41Sql.contains("c1") && !s.q41Sql.contains("c2"))
  }

  test("default objects equal default-config instances") {
    assert(graft.operators.Sequence.K == GraftConfig().k)
    assert(graft.operators.Dedup.NearDupCos == GraftConfig().nearDupCos)
    assert(graft.operators.GraphOps.TipRounds == GraftConfig().tipRounds)
  }
}
