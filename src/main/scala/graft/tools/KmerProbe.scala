package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: time alternative shapes of the docKmerFreq subtree that
  * q9_tag/q15/q16/q9_precorrect share, chasing the round-6 verdict's
  * q9_tag regression. */
object KmerProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    import graft.sources.Tables
    val k = 16

    def kmers(): DataFrame = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= k)
      .withColumn("g", explode(sequence(lit(1), length(col("text")) - (k - 1))))
      .select(col("doc_id"), expr(s"substring(text, g, $k)").as("kmer"))

    // A: current — perDoc ⋈ freq, AQE free choice
    def vA(): DataFrame = {
      val perDoc = kmers().groupBy("doc_id", "kmer").agg(count(lit(1)).as("c"))
      val freq = perDoc.groupBy("kmer").agg(sum(col("c")).as("f"))
      perDoc.join(freq, "kmer")
        .groupBy("doc_id").agg(min(col("f")).as("min_freq"))
        .filter(col("min_freq") >= 3)
    }
    // B: shuffle_hash hint, freq as build side
    def vB(): DataFrame = {
      val perDoc = kmers().groupBy("doc_id", "kmer").agg(count(lit(1)).as("c"))
      val freq = perDoc.groupBy("kmer").agg(sum(col("c")).as("f"))
      perDoc.join(freq.hint("shuffle_hash"), "kmer")
        .groupBy("doc_id").agg(min(col("f")).as("min_freq"))
        .filter(col("min_freq") >= 3)
    }
    // C: window count over kmer partitions (the r5 shape, skew-prone)
    def vC(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      kmers().withColumn("f", count(lit(1)).over(Window.partitionBy("kmer")))
        .groupBy("doc_id").agg(min(col("f")).as("min_freq"))
        .filter(col("min_freq") >= 3)
    }
    val variants: Seq[(String, () => DataFrame)] =
      Seq("A_current" -> (() => vA()), "B_shuffle_hash" -> (() => vB()),
        "C_window" -> (() => vC()))

    spark.read.parquet(s"$dir/documents.parquet").count()
    for ((name, fn) <- variants) {
      def once(): Double = {
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = Seq(once(), once(), once())
      println(f"KMERPROBE $name runs=${t.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
