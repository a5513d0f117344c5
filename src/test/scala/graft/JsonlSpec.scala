package graft

import graft.sources.{Jsonl, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlSpec extends GraftSpec {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("documents round-trip through JSONL losslessly") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val path = tmpDir("jsonl-rt") + "/docs.jsonl"
    Jsonl.write(docs, path)
    val back = Jsonl.read(spark, path)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("hostile strings survive the escape cycle") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "line\nbreak and\ttab", "en", "s\"quote\"", 18L),
      (2L, "backslash \\ and unicode é中文 😀", "zh", "s", 5L),
      (3L, "", "en", "{\"looks\":\"like json\"}", 0L),
      (4L, "carriage\rreturn and null-ish \\u0000 literal", "de", "s,comma", 43L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val path = tmpDir("jsonl-nasty") + "/n.jsonl"
    Jsonl.write(nasty, path)
    val back = Jsonl.read(spark, path)
    assert(back.exceptAll(nasty).isEmpty && nasty.exceptAll(back).isEmpty)
    // escaping keeps one record per physical line — the split-safety invariant
    val lines = spark.read.text(path).count()
    assert(lines == 4L)
  }

  test("q182: streaming ingest drain equals the batch per-language rollup") {
    val got = Jsonl.q182StreamJsonlIngest(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expect = Tables.documents(spark, sf)
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(col("n_chars")).as("t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
  }

  test("strict mode: a corrupt line throws instead of yielding nulls") {
    val dir = tmpDir("jsonl-corrupt")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "x.jsonl"),
      "{\"doc_id\":1,\"text\":\"ok\",\"lang\":\"en\",\"source\":\"s\",\"n_chars\":2}\nnot json at all\n"
        .getBytes("UTF-8"))
    val ex = intercept[Exception] { Jsonl.read(spark, dir).collect() }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(c => c.getMessage != null &&
      (c.getMessage.contains("Malformed") || c.getMessage.contains("FAILFAST"))))
  }

  test("parallel multi-part writes read back whole") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .repartition(8)
    val path = tmpDir("jsonl-parts") + "/p.jsonl"
    Jsonl.write(docs, path)
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("part-")) > 1)
    val back = Jsonl.read(spark, path)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("explicit-schema read projects only requested fields") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val path = tmpDir("jsonl-proj") + "/docs.jsonl"
    Jsonl.write(docs, path)
    val narrow = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType)))
    val back = Jsonl.read(spark, path, narrow)
    assert(back.columns.toSeq == Seq("doc_id", "lang"))
    assert(back.count() == docs.count())
  }
}
