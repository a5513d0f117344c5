package graft

import graft.sources.{Fasta, Tables}
import org.apache.spark.sql.functions._

class FastaSpec extends GraftSpec {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("documents round-trip through FASTA losslessly (wrapped at 70)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val path = tmpDir("fasta-rt") + "/docs.fa"
    Fasta.write(docs, path)
    val back = Fasta.read(spark, path)
      .select(col("header").cast("long").as("doc_id"), col("text"))
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("read handles multi-line records, CRLF, and header-only entries") {
    val raw = ">a desc\r\nACGT\r\nTTAA\r\n>b\n>c\nGG\nGG\nGG\n"
    val dir = tmpDir("fasta-parse")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "x.fa"),
      raw.getBytes("UTF-8"))
    val got = Fasta.read(spark, dir).orderBy("header")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("a desc", "ACGTTTAA"), ("b", ""), ("c", "GGGGGG")))
  }

  test("wrap=exact-multiple lengths write no trailing blank line") {
    val one = spark.createDataFrame(Seq((1L, "x" * 140))).toDF("doc_id", "text")
    val path = tmpDir("fasta-wrap") + "/w.fa"
    Fasta.write(one, path)
    val lines = spark.read.text(path).collect().map(_.getString(0))
    assert(lines.toSeq == Seq(">1", "x" * 70, "x" * 70))
    val back = Fasta.read(spark, path).collect()
    assert(back.length == 1 && back(0).getString(1) == "x" * 140)
  }

  test("parallel multi-part writes read back whole (every part starts at a record)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .repartition(8)
    val path = tmpDir("fasta-parts") + "/docs.fa"
    Fasta.write(docs, path)
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("part-")) > 1)
    assert(Fasta.read(spark, path).count() == docs.count())
  }
}
