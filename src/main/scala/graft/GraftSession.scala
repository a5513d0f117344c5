package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for Graft.
  *
  * Local defaults mirror what we'd set on a real cluster: AQE on (runtime
  * re-planning, skew-join splitting, dynamic coalescing), shuffle
  * partitions sized to the parallelism actually available instead of the
  * 200 default, and a generous broadcast threshold because Graft leans on
  * broadcast joins for dimension tables / centroid sets / high-kmer lists.
  */
object GraftSession {
  def builder(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // parallelismFirst stays at the Spark default (true). The round-9
      // advice caught that the original A/B's phase labels didn't match
      // the configs that actually ran; AqeProbe now sets BOTH knobs
      // explicitly per phase, and the re-run confirms the conclusion:
      // q62 warm min — pfOn 7.32 s vs pfOff/64M 7.46 vs pfOff/4M 7.98;
      // q82 — pfOn 9.11 vs pfOff/64M 10.04 vs pfOff/4M 9.70.
      // Size-based coalescing (false) collapses the genuinely CPU-dense
      // byte-small stages (k-mer profiles, levenshtein gates) to few
      // tasks, costing more than the tiny-stage scheduling it saves.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // preferSortMergeJoin stays at the Spark default (true): the r17
      // A/B (10 shuffle-join queries, isolated warm runs at sf0.1)
      // measured a wash suite-wise (24.3 s vs 23.9) with one clear
      // regression (q131 2.65 → 3.45 s — the planner hash-built a
      // candidate side that sort-merge streams); the operators that
      // WANT a hash or merge join pin it per-join with hints instead
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // constraintPropagation stays ON (the Spark default): the r17
      // A/B over 10 large-plan queries was noise-level except q335
      // (7.4 → 5.5 s warm — its per-batch union+join plans pay the
      // propagation in driver time), but the inferred IsNotNull/
      // transitive filters it derives are exactly what prunes scans on
      // a real cluster — dropping it is a local-only win, rejected
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Reliable-checkpoint dir for iterative operators; on a cluster this
    * should be configured to HDFS/object storage instead. The temp dir
    * is removed on JVM exit so repeated Bench/Verify/test runs don't
    * accumulate per-round checkpoint files in /tmp. */
  def ensureCheckpointDir(spark: SparkSession): Unit =
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
      spark.sparkContext.setCheckpointDir(dir.toString)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { Files.deleteIfExists(p); () })
        catch { case _: Throwable => () }
      }))
    }
}
