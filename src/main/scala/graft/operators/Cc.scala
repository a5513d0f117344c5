package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftConfig

/** Shared weakly-connected-components kernel: min-label propagation
  * with a pointer-jump (path-halving) hop per round — the distributed
  * CC algorithm q57's dedup families pioneered in this codebase.
  * Since round 10 q57 DELEGATES here too (the historical reason for
  * its inlined copy — fusing the loop with the pair-table checkpoint
  * lifecycle — disappeared once this kernel checkpoints and
  * key-partitions the symmetrized edge table itself), so every CC
  * caller (q144, q57, q197, q204) shares one implementation.
  *
  * Scale contract (the q57 lessons, round 2-5): every round cuts
  * lineage with an eager checkpoint (reliable when
  * cfg.reliableStageCheckpoints — executor loss mid-loop cannot drop a
  * round on a cluster); the hop makes convergence ≈ log(component
  * diameter) rounds; the round cap is the pure-propagation bound
  * (diameter < |nodes|) so capping can never leave labels unresolved;
  * superseded round checkpoints unpersist as soon as the next round is
  * materialized.
  */
private[graft] object Cc {

  /** Labels for an undirected graph given as an edge list (u, v) —
    * symmetrized internally. Returns (node, lbl) for every node WITH
    * an edge; isolated nodes are the caller's join (they label as
    * themselves). lbl = the minimum node id reachable from the node. */
  def labels(edges: DataFrame, cfg: GraftConfig): DataFrame = {
    val spark = edges.sparkSession
    graft.GraftSession.ensureCheckpointDir(spark)
    def stageCk(df: DataFrame): DataFrame = graft.Ck.stage(df, cfg)
    // eager cut BEFORE the loop: und is referenced once per round (plus
    // lbl0), and a lazy und would re-run the caller's whole edge
    // pipeline — q20's boundary-key + verify join for q144 — every
    // round (q57 learned this with its pair table in round 3; measured
    // here: 8.9 s → ~3 s at sf0.1)
    // Round-10 rework, shared with [[Scc]]'s propagation (see the long
    // note there): FRONTIER-delta messaging (a label update can only
    // originate from a neighbor whose label changed last round, so the
    // message join streams the edge table against a SHRINKING delta,
    // never the full N-row label table), the symmetrized edge table
    // hash-partitioned on its join key once (checkpoint preserves
    // outputPartitioning — no per-round E-row exchange), a broadcast
    // delta once the frontier drops under Scc.deltaBroadcastRows, and
    // convergence = the frontier count (the delta doubles as the
    // probe — the old every-2-rounds join-and-count is gone).
    val e = edges.select(col("u"), col("v"))
    val (und, _) = graft.Ck.keyedStage(
      e.unionAll(e.select(col("v").as("u"), col("u").as("v"))), "v", cfg)
    val lbl0 = und.groupBy(col("u").as("node")).agg(min(col("v")).as("l"))
      .select(col("node"), col("node").as("prev"),
        least(col("node"), col("l")).as("lbl"))
    // lbl carries (node, prev, lbl): prev = label at round start, so
    // the frontier is a filter over just-checkpointed blocks
    var lbl = graft.Ck.lazyStage(lbl0, cfg)
    val nNodes = lbl.count()
    val maxRounds = math.max(1L, nNodes).toInt
    var converged = nNodes == 0
    var frontierN = -1L
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val delta = lbl.filter(col("lbl") =!= col("prev"))
        .select(col("node").as("v"), col("lbl").as("vl"))
      val deltaJ =
        if (frontierN >= 0 && frontierN <= Scc.deltaBroadcastRows) broadcast(delta)
        else delta.hint("shuffle_hash")
      val nbrMin = und.join(deltaJ, "v")
        .groupBy(col("u").as("node")).agg(min(col("vl")).as("nl"))
      val prop = lbl.select(col("node"), col("lbl"))
        .join(nbrMin.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), col("lbl").as("prev"),
          least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
      // single pointer-jump hop per round (path halving) — a deeper
      // two-chase variant was measured NOT faster here (6.7 vs 5.9 s at
      // sf0.1): the loop's cost is per-round AQE/job latency on
      // trivially small data, which extra plan depth doesn't reduce;
      // that latency amortizes at real scale where rounds carry real
      // bytes (the q62 stage-chain lesson). Identity rows can't improve
      // any pointer — only lbl < node rows matter on the lookup side.
      val hop = prop.filter(col("lbl") < col("node"))
        .select(col("node").as("hn"), col("lbl").as("hl"))
      // LAZY cut + frontier count share ONE job (r18, the Pipeline
      // cutAndCount discipline): the lazy localCheckpoint stores its
      // blocks during the count's pass, so a round costs one driver
      // barrier instead of materialize-then-count's two. Reliable mode
      // stays eager inside lazyStage (a lazy reliable checkpoint would
      // recompute the round for the write).
      val next = graft.Ck.lazyStage(
        prop.join(hop, prop("lbl") === hop("hn"), "left")
          .select(col("node"), col("prev"),
            least(col("lbl"), coalesce(col("hl"), col("lbl"))).as("lbl")), cfg)
      rounds += 1
      frontierN = next.filter(col("lbl") =!= col("prev")).count()
      converged = frontierN == 0
      lbl.unpersist(false)
      lbl = next
    }
    // final lbl is itself checkpointed — no lineage back to und, so the
    // edge checkpoint blocks can go now (same reasoning as
    // Scc.dirMinLabels's eP.unpersist)
    und.unpersist(false)
    if (Scc.graphTrace) println(s"GRAPHTRACE cc n=$nNodes rounds=$rounds")
    lbl.select(col("node"), col("lbl"))
  }
}
