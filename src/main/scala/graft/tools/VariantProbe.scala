package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch bisect probe for q42's tail: variant = core | j1 | j2 | full. */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variant = args(1)
    val spark = graft.GraftSession.get()
    spark.read.parquet(s"$dir/documents.parquet").count()

    def build(): DataFrame = {
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
      val nOk = broadcast(levOk.groupBy("cand_id").agg(count(lit(1)).as("n_ok")))
      val okPairs = broadcast(levOk.select("cand_id", "member_id"))
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
        .select("src", "dst", "kept_mid")
      variant match {
        case "core" => core
        case "j1" => core.join(nOk.withColumnRenamed("cand_id", "kept_mid"), Seq("kept_mid"), "left")
        case "j2" => core
          .join(nOk.withColumnRenamed("cand_id", "kept_mid"), Seq("kept_mid"), "left")
          .join(okPairs.select(col("cand_id").as("kept_mid"),
              col("member_id").as("src"), lit(true).as("src_ok")),
            Seq("kept_mid", "src"), "left")
        case "full" => core
          .join(nOk.withColumnRenamed("cand_id", "kept_mid"), Seq("kept_mid"), "left")
          .join(okPairs.select(col("cand_id").as("kept_mid"),
              col("member_id").as("src"), lit(true).as("src_ok")),
            Seq("kept_mid", "src"), "left")
          .join(okPairs.select(col("cand_id").as("kept_mid"),
              col("member_id").as("dst"), lit(true).as("dst_ok")),
            Seq("kept_mid", "dst"), "left")
          .select(col("src"), col("dst"), col("kept_mid"),
            (coalesce(col("n_ok"), lit(0L))
              - when(coalesce(col("src_ok"), lit(false)), 1L).otherwise(0L)
              - when(coalesce(col("dst_ok"), lit(false)), 1L).otherwise(0L)).as("n_popped"))
      }
    }
    def once(): Double = {
      val t0 = System.nanoTime()
      build().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    println(f"VARIANT $variant warm=${once()}%.2f rows=${build().count()}")
    spark.stop()
  }
}
