package graft

import org.apache.spark.sql.functions._

/** shingle_set (graft.plans.ShingleSet): the native codegen'd per-doc
  * distinct shingle set must equal the declarative
  * transform+array_distinct formulation on every input shape. */
class ShingleSetSpec extends GraftSpec {
  import spark.implicits._

  private def viaHof(k: Int) = expr(
    s"array_sort(array_distinct(transform(sequence(1, length(t) - ${k - 1}), g -> substring(t, g, $k))))")

  test("matches the higher-order-function formulation, incl. repeats and multibyte chars") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val texts = Seq("abcabcabc", "aaaaa", "abcde", "héllo wörld héllo",
      "ab", "日本語のテキストです日本語", "x y x y x y")
    val df = texts.toDF("t")
      .filter(length(col("t")) >= 3)
      .select(array_sort(expr("shingle_set(t, 3)")).as("got"), viaHof(3).as("want"))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
    assert(df.count() == 6) // every text except "ab" passes the length filter
  }

  test("short text yields an empty set; k=1 yields the distinct chars") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val r = Seq(("ab", 0), ("abcba", 1)).toDF("t", "tag")
      .select(col("tag"), size(expr("shingle_set(t, 3)")).as("n3"),
        array_sort(expr("shingle_set(t, 1)")).as("s1")).collect()
    val short = r.find(_.getInt(0) == 0).get
    assert(short.getInt(1) == 0)
    val full = r.find(_.getInt(0) == 1).get
    assert(full.getSeq[String](2) == Seq("a", "b", "c"))
  }
}
