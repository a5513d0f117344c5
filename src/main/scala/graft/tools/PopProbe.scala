package graft.tools

import org.apache.spark.sql.functions._

/** Stage-isolated timing for the q42 edit-gated popping plan. */
object PopProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val docs = graft.sources.Tables.documents(spark, dir)
    docs.count()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"POPPROBE $tag n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val d = docs
      .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("n_chars"),
        element_at(col("ws"), 1).as("fw"), element_at(col("ws"), -1).as("lw"))
    val classTop = d.groupBy("fw", "lw").agg(
      count(lit(1)).as("cnt"),
      expr("slice(array_sort(collect_list(named_struct('negl', -n_chars, 'doc_id', doc_id))), 1, 3)").as("top3"))
    val cands = classTop.select(col("fw"), col("lw"), explode(col("top3")).as("c"))
      .select(col("fw"), col("lw"), col("c.doc_id").as("cand_id"), (-col("c.negl")).as("cand_len"))
      .join(docs.select(col("doc_id").as("cand_id"), col("text").as("cand_text")), "cand_id")
    val mem = docs
      .select(col("doc_id"), col("n_chars"), col("text"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("n_chars"), col("text"),
        element_at(col("ws"), 1).as("fw"), element_at(col("ws"), -1).as("lw"))
    val levJoin = mem.join(cands, Seq("fw", "lw")).filter(col("doc_id") =!= col("cand_id"))
    time("lev_join_rows")(levJoin.count())
    val levOk = levJoin
      .filter(levenshtein(col("text"), col("cand_text")) <= lit(0.05) * greatest(col("n_chars"), col("cand_len")))
      .select(col("fw").as("mid_fw"), col("lw").as("mid_lw"), col("cand_id"), col("doc_id").as("member_id"))
    time("levOk")(levOk.count())
    val hot = broadcast(classTop.filter(col("cnt") >= 2)
      .select(col("fw").as("mid_fw"), col("lw").as("mid_lw"), col("cnt"),
        expr("transform(top3, s -> s.doc_id)").as("top3ids")))
    val as_ = d.select(col("doc_id").as("src"), col("fw").as("src_fw"), col("lw").as("mid_fw"))
    val bs = d.select(col("doc_id").as("dst"), col("lw").as("dst_lw"), col("fw").as("mid_lw"))
    val pairs = as_.join(hot, "mid_fw").join(bs, "mid_lw")
      .filter(col("src") =!= col("dst"))
      .withColumn("n_mids", col("cnt")
        - when(col("src_fw") === col("mid_fw") && col("mid_fw") === col("mid_lw"), 1L).otherwise(0L)
        - when(col("dst_lw") === col("mid_lw") && col("mid_fw") === col("mid_lw"), 1L).otherwise(0L))
      .filter(col("n_mids") >= 2)
    time("pairs_only")(pairs.count())
    val withKept = pairs.withColumn("kept_mid",
      expr("try_element_at(filter(top3ids, i -> i != src AND i != dst), 1)"))
    time("with_kept")(withKept.count())
    val nOk = broadcast(levOk.groupBy("mid_fw", "mid_lw", "cand_id").agg(count(lit(1)).as("n_ok")))
    val joined = withKept.join(nOk.withColumnRenamed("cand_id", "kept_mid"),
      Seq("mid_fw", "mid_lw", "kept_mid"), "left")
    time("plus_nok")(joined.count())
    val okPairs = broadcast(levOk)
    val j2 = joined
      .join(okPairs.select(col("mid_fw"), col("mid_lw"),
        col("cand_id").as("kept_mid"), col("member_id").as("src"), lit(true).as("src_ok")),
        Seq("mid_fw", "mid_lw", "kept_mid", "src"), "left")
      .join(okPairs.select(col("mid_fw"), col("mid_lw"),
        col("cand_id").as("kept_mid"), col("member_id").as("dst"), lit(true).as("dst_ok")),
        Seq("mid_fw", "mid_lw", "kept_mid", "dst"), "left")
    time("full")(j2.count())
    time("full2")(j2.count())
    spark.stop()
  }
}
