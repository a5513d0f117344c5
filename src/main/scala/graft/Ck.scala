package graft

import org.apache.spark.sql.DataFrame

/** The one checkpoint helper every fixpoint kernel and stage chain
  * goes through: eager localCheckpoint on a single JVM, reliable
  * checkpoint when `cfg.reliableStageCheckpoints` (executor loss
  * mid-loop cannot drop a round on a cluster) — ALWAYS followed by
  * [[org.apache.spark.sql.graft.StatsBarrier]], which strips the
  * origin statistics the checkpoint would otherwise carry into its
  * leaf. Without the barrier, iterated checkpoint→join→checkpoint
  * generations SQUARE the carried `sizeInBytes` estimate every round
  * and Catalyst's size-only estimator ends up multiplying BigIntegers
  * with millions of digits — q187 at sf0.01 spent ~125 of its 134
  * seconds inside `BigInteger.multiply` on 7-row plans (see the
  * barrier's scaladoc for the full mechanism). */
object Ck {

  /** Eager stage cut (the shared stageCk discipline). */
  def stage(df: DataFrame, cfg: GraftConfig): DataFrame =
    org.apache.spark.sql.graft.StatsBarrier.resetCheckpointStats(
      if (cfg.reliableStageCheckpoints) df.checkpoint(true)
      else df.localCheckpoint(true),
      df)

  /** Lazy local stage cut (compute-once within one composition; the
    * reliable flavor has no lazy form worth the extra job, so it
    * stays eager there). */
  def lazyStage(df: DataFrame, cfg: GraftConfig): DataFrame =
    org.apache.spark.sql.graft.StatsBarrier.resetCheckpointStats(
      if (cfg.reliableStageCheckpoints) df.checkpoint(true)
      else df.localCheckpoint(false),
      df)

  /** Stage cut + row count in ONE job: lazy localCheckpoint stores its
    * blocks as a side effect of the count's single pass (the fused
    * materialize+probe the fixpoint loops use). */
  def sizedStage(df: DataFrame, cfg: GraftConfig): (DataFrame, Long) = {
    val c = lazyStage(df, cfg)
    (c, c.count())
  }

  /** Materialize an iterative loop's re-joined side KEY-PARTITIONED and
    * row-count-SIZED: one lazy cut+count evaluates the (possibly heavy)
    * build plan once, then the counted rows re-cut through an EXPLICIT
    * hash repartition sized by cfg.stageRowsPerPartition. Explicit,
    * because the stats barrier can only lift partitioning from a FINAL
    * adaptive plan (a lazy cut never has one) and a column-only
    * repartition gets AQE-coalesced out of co-location; sized, because
    * a fixed 32-way layout makes every round pay 32 task launches for a
    * table that may hold a few thousand rows (measured on q170:
    * 1.6 → 2.8 s with a fixed count; sizing restores the small-scale
    * task economy while keeping the at-scale exchange-free contract).
    * Returns (keyed table, row count). */
  def keyedStage(df: DataFrame, key: String, cfg: GraftConfig): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.col
    val (raw, n) = sizedStage(df, cfg)
    val maxParts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = math.max(1L, math.min(maxParts.toLong,
      (n + cfg.stageRowsPerPartition - 1) / cfg.stageRowsPerPartition)).toInt
    val keyed = stage(raw.repartition(parts, col(key)), cfg)
    raw.unpersist(false)
    (keyed, n)
  }
}
