package graft.tools

/** The scaling-curve tripwire: run the suite's most expensive queries
  * at every test scale factor and record each query's growth exponent
  * across the top decade (sf0.01 → sf0.1, a 10× data step):
  *
  *   alpha = log10( t(sf0.1) / t(sf0.01) )
  *
  * Linear-in-data work measures alpha ≈ 1 (less once fixed session/
  * plan overhead dilutes small runs); an accidental all-pairs or a
  * corpus-squared state table measures toward 2 — YEARS before a
  * production 100× scale-up would surface it. The committed artifact
  * (SCALE_CURVE.json) is gated by ScaleCurveSpec: no exponent may
  * exceed 1.3. The lower decade (sf0.001 → sf0.01) is recorded for
  * context but not gated — at those sizes fixed overhead dominates
  * and the exponent is mostly noise.
  *
  * Measurement discipline is Bench's: one fresh SparkSession per
  * (query, sf) so nothing leaks between runs, noop sink so every
  * projected column evaluates, two evaluations per point and the min
  * reported (absorbs environmental spikes; run2 < run1 is the steady
  * state, run1 < run2 is external contention).
  *
  * Usage: runMain graft.tools.ScaleCurve [query ...]
  * (defaults to the 10 most expensive queries of the r16 bench) */
object ScaleCurve {
  /** The 10 most expensive queries by BENCH_DETAIL_r16 min-of-runs. */
  val DefaultTop: Seq[String] = Seq(
    "q317_entry_ladder", "q62_full_assembly", "q82_phase_stats",
    "q286_stale_recall", "q335_stream_containment", "q331_mmr_serving",
    "q309_retrain_swap", "q187_scc", "q294_beam_entry_eval",
    "q291_recompact_recall")

  val Sfs: Seq[String] = Seq("sf0.001", "sf0.01", "sf0.1")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("GRAFT_TESTDATA", "/root/testdata")
    val names = if (args.nonEmpty) args.toSeq else DefaultTop
    def once(name: String, sfDir: String): Double = {
      val spark = graft.GraftSession.builder().getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-scale-ckpt")
      spark.sparkContext.setCheckpointDir(ckpt.toString)
      try {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally {
        spark.stop()
        org.apache.spark.sql.SparkSession.clearActiveSession()
        org.apache.spark.sql.SparkSession.clearDefaultSession()
        try {
          import java.nio.file.{Files, Path}
          Files.walk(ckpt).sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(p => { Files.deleteIfExists(p); () })
        } catch { case _: Throwable => () }
      }
    }
    def load1: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val rows = names.map { n =>
      val times = Sfs.map { sf =>
        val dir = s"$base/$sf"
        val t = math.min(once(n, dir), once(n, dir))
        println(f"SCALE $n $sf $t%.3f s")
        sf -> t
      }.toMap
      val aLo = math.log10(times("sf0.01") / times("sf0.001"))
      val aHi = math.log10(times("sf0.1") / times("sf0.01"))
      n -> (times, aLo, aHi)
    }
    val json = rows.map { case (n, (t, aLo, aHi)) =>
      f"""    "$n": {"sf0_001": ${t("sf0.001")}%.3f, "sf0_01": ${t("sf0.01")}%.3f, "sf0_1": ${t("sf0.1")}%.3f, "alpha_lo": $aLo%.3f, "alpha_hi": $aHi%.3f}"""
    }.mkString(",\n")
    val out =
      s"""{
         |  "note": "growth exponents across test decades; alpha_hi (sf0.01->sf0.1) is the gated tripwire, <= 1.3; see graft.tools.ScaleCurve",
         |  "load1": $load1,
         |  "queries": {
         |$json
         |  }
         |}
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALE_CURVE.json"), out)
    println(out)
  }
}
