package graft

import graft.sources.{Sfa, Tables}
import org.apache.spark.sql.functions._

class SfaSpec extends GraftSpec {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("documents round-trip through SFA losslessly") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val path = tmpDir("sfa-rt") + "/docs.sfa"
    Sfa.write(docs, path)
    val back = Sfa.read(spark, path)
      .select(col("header").cast("long").as("doc_id"), col("text"))
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("only the FIRST tab separates; later tabs stay in the sequence") {
    val dir = tmpDir("sfa-parse")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "x.sfa"),
      "a\tAC\tGT\nb\t\nc\n".getBytes("UTF-8"))
    val got = Sfa.read(spark, dir).orderBy("header")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("a", "AC\tGT"), ("b", ""), ("c", "")))
  }

  test("parallel multi-part writes read back whole") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .repartition(8)
    val path = tmpDir("sfa-parts") + "/p.sfa"
    Sfa.write(docs, path)
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("part-")) > 1)
    val back = Sfa.read(spark, path)
      .select(col("header").cast("long").as("doc_id"), col("text"))
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
