package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // GraftSession.builder carries the tuning every query was designed
    // against (AQE, skew-join split, 64 MB broadcast threshold, shuffle
    // partitions = cores); benching a vanilla session measured different
    // plans than Verify ran. cleanCheckpoints lets the ContextCleaner
    // delete reliable checkpoint files once their RDDs are GC'd, so 63
    // queries sharing one JVM don't accumulate every iterative round's
    // checkpoint on disk for the whole run.
    val spark = GraftSession.builder()
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: parquet footer reads + JIT + codegen caches
    Seq("lineitem", "orders", "events", "documents", "embeddings",
        "customer", "nation", "region", "supplier", "part")
      .foreach(t => try spark.read.parquet(s"$sfDir/$t.parquet").count()
               catch { case _: Throwable => () })
    // Cross-query hygiene: drop cached/persisted blocks and force a GC so
    // the ContextCleaner reclaims shuffle files + checkpoints from the
    // previous query. Without this, later queries inherit the memory and
    // disk pressure of everything benched before them (round-3 artifact:
    // q1_agg 21 s in the shared JVM vs 1.6 s isolated).
    // blocking unpersist: the async variant returns while executors are
    // still dropping the previous run's blocks, and that removal storm
    // racing a checkpoint-heavy query's next run measured 16 s → 45 s on
    // q82 (run2 ≫ run1 with an idle machine). Draining removals before
    // the timer starts costs idle time, not measured time.
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // two evaluations per query: the first pays one-off plan analysis +
    // whole-stage-codegen compilation + JIT; the reported time is the
    // second (steady-state) run, which is what repeated production use
    // and any long-running engine comparison actually measures
    val both = SparkEntry.queries.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // noop sink: evaluates every projected column (count() would let
        // Catalyst prune map-only expressions out of the measurement)
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      reset(); val r1 = once()
      reset()
      name -> (r1, once())
    }
    val results = both.map { case (k, (_, r2)) => k -> r2 }
    // 3-decimal formatting: the driver captures only the tail of stdout,
    // and 9-digit doubles across ~68 queries pushed the single JSON line
    // past that capture window (BENCH_r04 lost the line's head, incl.
    // the total). ms precision is below run-to-run noise anyway.
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // Both runs per query go to a local file (they don't fit the stdout
    // tail the driver captures): run1 pays JIT/codegen, run2 is the
    // reported steady state. run2 ≫ run1 is physically impossible from
    // the plan alone — it means environment contention landed on run2
    // (round-5 artifact: q57 37.9 s benched vs 6.85 s isolated), so
    // those queries are ALSO flagged inline in the artifact's "contam"
    // map with their run1 time as the better estimate.
    val detail = both.map { case (k, (r1, r2)) =>
      s"\"" + k + "\":[" + f(r1) + "," + f(r2) + "]"
    }.mkString("{", ",", "}")
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"runs":"[run1,run2] per query; reported=run2","queries":$detail,"sf":"$sfDir"}
""".getBytes("UTF-8"))
    catch { case _: Throwable => () }
    val contam = both.collect {
      case (k, (r1, r2)) if r1 >= 0 && r2 > r1 * 1.5 + 0.5 => s"\"" + k + "\":" + f(r1)
    }.mkString("{", ",", "}")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"contam":$contam,"sf":"$sfDir"}""")
    spark.stop()
  }
}
