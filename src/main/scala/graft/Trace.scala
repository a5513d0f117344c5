package graft

/** Opt-in stage timing for the iterative operators: set GRAFT_TRACE=true
  * (env; sbt forks `run`) or -Dgraft.trace=true. Default off — zero cost
  * on the hot path beyond one boolean check. */
object Trace {
  val enabled: Boolean = sys.props.get("graft.trace").orElse(sys.env.get("GRAFT_TRACE"))
    .exists(_.equalsIgnoreCase("true"))

  def apply[T](tag: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime(); val r = f
      println(f"TRACE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

  def log(msg: => String): Unit = if (enabled) println(s"TRACE $msg")
}
