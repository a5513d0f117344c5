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
}
