package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** End-to-end composition — CloudBrush's BrushAssembler phase driver
  * [BrushAssembler.java:256-760] re-expressed as a library of composable
  * DataFrame→DataFrame stages instead of HDFS-path handoffs between
  * MapReduce jobs.
  *
  * The reference iterates graph cleaning to convergence (tips→compress
  * loop at BrushAssembler.java:588-614, find→pop bubbles at :622-660);
  * here each fixpoint is a driver loop whose rounds take eager reliable
  * checkpoints (see cleanToConvergence for why lineage must be cut every
  * round) and converge on an edge-count fixpoint. At 100 TB each round
  * is two broadcast anti-joins (the removal set is small) over the
  * partitioned edge list — no driver-side data, no all-pairs work.
  */
object Pipeline {

  /** Iterate tip detect+remove until no tip remains (or maxRounds).
    *
    * Every round takes an EAGER RELIABLE checkpoint: removeTips
    * references its input ~13 times (incidence union, degree joins, two
    * anti-joins), so without truncation the LOGICAL plan grows 13× per
    * round and analysis alone OOMs the driver by round 4 — caching the
    * data is not enough, the lineage itself must be cut. The
    * checkpointed edge set shrinks monotonically, so the per-round write
    * is small and recoverable on executor loss. */
  def cleanToConvergence(spark: SparkSession, edges0: DataFrame, maxRounds: Int = 25): DataFrame = {
    graft.GraftSession.ensureCheckpointDir(spark)
    var e = edges0.select("src", "dst").checkpoint(true)
    var n = e.count()
    var rounds = 0
    var converged = n == 0
    while (!converged && rounds < maxRounds) {
      val next = GraphOps.removeTips(e).checkpoint(true)
      rounds += 1
      val m = next.count()
      converged = m == n // no edge removed → no tip existed
      n = m
      e = next
    }
    e
  }

  /** Full assembly: overlap edges → tip cleaning to convergence → chain
    * compression on the cleaned graph → ordered consensus per chain.
    * One call from the raw document table to "contigs", mirroring the
    * reference driver's preprocess→graph→clean→merge→output chain. */
  def assemble(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cleaned = cleanToConvergence(spark, GraphOps.edges2(spark, dir).select("src", "dst"))
    val chains = GraphOps.resolveChainsFrom(spark,
      docs.select(col("doc_id").as("node")), cleaned, withDepth = true)
    GraphOps.consensusFrom(chains, docs)
  }

  /** q46: the assembled contig table. */
  def q46Assembly(spark: SparkSession, dir: String): DataFrame =
    assemble(spark, dir)

  /** Oracle: 12 unrolled tip rounds (idempotent past convergence; every
    * tested sf converges in ≤6) + recursive chain CTEs + consensus. */
  def q46Sql: String = GraphOps.assembleSql(12)
}
