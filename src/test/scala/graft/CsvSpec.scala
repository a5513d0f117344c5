package graft

import graft.sources.{Csv, Tables}
import org.apache.spark.sql.functions._

class CsvSpec extends GraftSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("documents round-trip through CSV losslessly") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val path = tmpDir("csv-rt") + "/docs.csv"
    Csv.write(docs, path)
    val back = Csv.read(spark, path)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("commas, quotes, unicode, empty strings, and nulls stay distinguishable") {
    val nasty = Seq(
      (1L, "comma, inside", "en", "s\"quote\"", 13L),
      (2L, "backslash \\ and unicode é中文 😀", "zh", "s", 5L),
      (3L, "", "en", "{\"looks\":\"like,csv\"}", 0L),
      (4L, "plain", "de", null.asInstanceOf[String], 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val path = tmpDir("csv-nasty") + "/n.csv"
    Csv.write(nasty, path)
    val back = Csv.read(spark, path)
    assert(back.exceptAll(nasty).isEmpty && nasty.exceptAll(back).isEmpty)
    // in particular: row 3's empty text came back EMPTY, row 4's null NULL
    val r3 = back.filter(col("doc_id") === 3L).head()
    assert(r3.getAs[String]("text") == "")
    val r4 = back.filter(col("doc_id") === 4L).head()
    assert(r4.getAs[String]("source") == null)
  }

  test("record-internal newlines are rejected at write time (split safety)") {
    val bad = Seq((1L, "multi\nline", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val path = tmpDir("csv-nl") + "/bad.csv"
    val e = intercept[Exception] { Csv.write(bad, path) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("csv sink")), s"got: ${msgs(e)}")
  }

  test("strict mode: a short line throws instead of yielding nulls") {
    val path = tmpDir("csv-corrupt")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "part-0.csv"), "1,only,three\n")
    val e = intercept[Exception] {
      Csv.read(spark, path).collect()
    }
    assert(e.getMessage != null)
  }
}
