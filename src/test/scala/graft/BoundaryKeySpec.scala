package graft

import org.apache.spark.sql.functions._

/** The boundary-key extraction (first/last m words) must be computable
  * WITHOUT materializing the full word array — substring_index stops at
  * the m-th delimiter, split allocates every word of the doc. This spec
  * pins the two formulations to identical results on the edge cases
  * (single word, no spaces, repeated/leading/trailing spaces, empty),
  * so the scan-side rewrite cannot drift from the DuckDB oracle's
  * string_split semantics. */
class BoundaryKeySpec extends GraftSpec {

  test("substring_index boundary keys ≡ split+slice boundary keys") {
    import spark.implicits._
    import graft.operators.GraphOps
    val texts = Seq(
      "alpha beta gamma delta epsilon",
      "one two", "single", "", "a b", "a  b", " lead", "trail ",
      "x  y  z", "a b c", "  ", "word  ", "aa bb cc dd")
    val df = texts.toDF("text").withColumn("ws", split(col("text"), " "))
    val cmp = df.select(
      col("text"),
      element_at(col("ws"), 1).as("fw_old"),
      GraphOps.preWords(col("text"), 1).as("fw_new"),
      element_at(col("ws"), -1).as("lw_old"),
      GraphOps.sufWords(col("text"), 1).as("lw_new"),
      array_join(slice(col("ws"), 1, 2), " ").as("pre2_old"),
      GraphOps.preWords(col("text"), 2).as("pre2_new"),
      array_join(expr("slice(ws, -2, 2)"), " ").as("suf2_old"),
      GraphOps.sufWords(col("text"), 2).as("suf2_new"),
      array_join(slice(col("ws"), 1, 3), " ").as("pre3_old"),
      GraphOps.preWords(col("text"), 3).as("pre3_new"),
      array_join(expr("slice(ws, -4, 4)"), " ").as("suf4_old"),
      GraphOps.sufWords(col("text"), 4).as("suf4_new"))
    cmp.collect().foreach { r =>
      for (k <- Seq("fw", "lw", "pre2", "suf2", "pre3", "suf4")) {
        assert(r.getAs[String](s"${k}_old") == r.getAs[String](s"${k}_new"),
          s"$k mismatch on '${r.getString(0)}'")
      }
    }
  }
}
