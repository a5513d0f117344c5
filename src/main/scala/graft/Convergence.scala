package graft

/** Guard for config-bounded fixpoints (Pipeline/GraphOps round loops).
  *
  * The bounded-round loops are EXACT versus the reference's
  * run-to-convergence loops only while the configured bound covers
  * convergence (GraftConfig.asm*Rounds) — converged rounds are
  * idempotent no-ops, so any sufficient bound gives identical output.
  * A corpus that outgrows its bound would silently under-clean; this
  * guard makes that visible: every bounded loop reports when it
  * exhausted its budget while the final round was still removing
  * edges. The sink is swappable so specs can assert the warning fires
  * (and a cluster deployment can route it to metrics). */
object Convergence {
  @volatile var onWarn: String => Unit =
    msg => System.err.println(s"[graft] WARN $msg")

  /** Call after a bounded loop exits: `converged` = the last round
    * removed nothing / detected nothing new. */
  def check(tag: String, maxRounds: Int, converged: Boolean): Unit =
    if (!converged)
      onWarn(s"$tag: round bound $maxRounds exhausted while the last round was " +
        "still removing edges — output may be under-cleaned versus " +
        "run-to-convergence; raise the corresponding rounds config")
}
