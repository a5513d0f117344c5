package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: parquet footer reads + JIT + codegen caches
    Seq("lineitem", "orders", "events", "documents", "embeddings",
        "customer", "nation", "region", "supplier", "part")
      .foreach(t => try spark.read.parquet(s"$sfDir/$t.parquet").count()
               catch { case _: Throwable => () })
    // two evaluations per query: the first pays one-off plan analysis +
    // whole-stage-codegen compilation + JIT; the reported time is the
    // second (steady-state) run, which is what repeated production use
    // and any long-running engine comparison actually measures
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // noop sink: evaluates every projected column (count() would let
        // Catalyst prune map-only expressions out of the measurement)
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      once()
      name -> once()
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
