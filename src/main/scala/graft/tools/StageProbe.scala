package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch stage-timing probe for perf work (round 4). Warm = second run. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    graft.GraftSession.ensureCheckpointDir(spark)
    spark.read.parquet(s"$dir/documents.parquet").count()

    def time2(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val c = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f
      val w = (System.nanoTime() - t1) / 1e9
      println(f"STAGE $name cold=$c%.2f warm=$w%.2f")
    }

    val docs = Tables.documents(spark, dir).select("doc_id", "n_chars", "text")
    val d = docs
      .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("n_chars"),
        element_at(col("ws"), 1).as("fw"),
        element_at(col("ws"), -1).as("lw"))
    val classTop = d.groupBy("fw", "lw").agg(
      count(lit(1)).as("cnt"),
      expr("slice(array_sort(collect_list(named_struct('negl', -n_chars, 'doc_id', doc_id))), 1, 3)").as("top3"))
      .localCheckpoint(true)
    val cands = classTop.select(col("fw"), col("lw"), explode(col("top3")).as("c"))
      .select(col("fw"), col("lw"), col("c.doc_id").as("cand_id"), (-col("c.negl")).as("cand_len"))
      .join(docs.select(col("doc_id").as("cand_id"), col("text").as("cand_text")), "cand_id")
    val mem = docs
      .select(col("doc_id"), col("n_chars"), col("text"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("n_chars"), col("text"),
        element_at(col("ws"), 1).as("fw"), element_at(col("ws"), -1).as("lw"))
    val levOk = mem.join(cands, Seq("fw", "lw"))
      .filter(col("doc_id") =!= col("cand_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .filter(levenshtein(col("text"), col("cand_text")) <=
        lit(0.05) * greatest(col("n_chars"), col("cand_len")))
      .select(col("fw").as("mid_fw"), col("lw").as("mid_lw"),
        col("cand_id"), col("doc_id").as("member_id"))
      .localCheckpoint(true)
    println("  nLevOk=" + levOk.count() + " nClassTop=" + classTop.count())

    val nOk = broadcast(levOk.groupBy("mid_fw", "mid_lw", "cand_id")
      .agg(count(lit(1)).as("n_ok")))
    val okPairs = broadcast(levOk)
    val hot = broadcast(classTop.filter(col("cnt") >= 2)
      .select(col("fw").as("mid_fw"), col("lw").as("mid_lw"), col("cnt"),
        expr("try_element_at(top3, 1).doc_id").as("t1"),
        expr("try_element_at(top3, 2).doc_id").as("t2"),
        expr("try_element_at(top3, 3).doc_id").as("t3")))
    val as_ = d.select(col("doc_id").as("src"), col("fw").as("src_fw"), col("lw").as("mid_fw"))
    val bs = d.select(col("doc_id").as("dst"), col("lw").as("dst_lw"), col("fw").as("mid_lw"))
    val core = as_.join(hot, "mid_fw")
      .join(bs, "mid_lw")
      .filter(col("src") =!= col("dst"))
      .withColumn("n_mids",
        col("cnt")
          - when(col("src_fw") === col("mid_fw") && col("mid_fw") === col("mid_lw"), 1L).otherwise(0L)
          - when(col("dst_lw") === col("mid_lw") && col("mid_fw") === col("mid_lw"), 1L).otherwise(0L))
      .filter(col("n_mids") >= 2)
      .withColumn("kept_mid",
        when(col("t1") =!= col("src") && col("t1") =!= col("dst"), col("t1"))
          .when(col("t2") =!= col("src") && col("t2") =!= col("dst"), col("t2"))
          .when(col("t3") =!= col("src") && col("t3") =!= col("dst"), col("t3")))
    time2("tail.core") {
      core.select("src", "dst", "kept_mid", "n_mids")
        .write.format("noop").mode("overwrite").save()
    }
    val j1 = core.join(nOk.withColumnRenamed("cand_id", "kept_mid"),
      Seq("mid_fw", "mid_lw", "kept_mid"), "left")
    time2("tail.j1") {
      j1.select("src", "dst", "kept_mid", "n_ok")
        .write.format("noop").mode("overwrite").save()
    }
    val j2 = j1.join(okPairs.select(col("mid_fw"), col("mid_lw"),
        col("cand_id").as("kept_mid"), col("member_id").as("src"), lit(true).as("src_ok")),
      Seq("mid_fw", "mid_lw", "kept_mid", "src"), "left")
    time2("tail.j2") {
      j2.select("src", "dst", "kept_mid", "n_ok", "src_ok")
        .write.format("noop").mode("overwrite").save()
    }
    val j3 = j2.join(okPairs.select(col("mid_fw"), col("mid_lw"),
        col("cand_id").as("kept_mid"), col("member_id").as("dst"), lit(true).as("dst_ok")),
      Seq("mid_fw", "mid_lw", "kept_mid", "dst"), "left")
    time2("tail.j3") {
      j3.select(col("src"), col("dst"), col("kept_mid"),
        (coalesce(col("n_ok"), lit(0L))
          - when(coalesce(col("src_ok"), lit(false)), 1L).otherwise(0L)
          - when(coalesce(col("dst_ok"), lit(false)), 1L).otherwise(0L)).as("n_popped"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
