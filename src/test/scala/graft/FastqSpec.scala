package graft

import graft.sources.{Fastq, Tables}
import org.apache.spark.sql.functions._

class FastqSpec extends GraftSpec {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def writeRaw(dir: String, name: String, content: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
      content.getBytes("UTF-8"))

  test("documents round-trip through FASTQ losslessly") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val path = tmpDir("fastq-rt") + "/docs.fq"
    Fastq.write(docs, path)
    val back = Fastq.read(spark, path)
      .select(col("header").cast("long").as("doc_id"), col("text"))
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("quality column round-trips and placeholder matches sequence length") {
    val df = spark.createDataFrame(Seq(
      (1L, "ACGT", "!!~~"), (2L, "GG", "+@"))).toDF("doc_id", "text", "q")
    val path = tmpDir("fastq-q") + "/q.fq"
    Fastq.write(df, path, qualCol = Some("q"))
    val back = Fastq.read(spark, path).orderBy("header")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(back.toSeq == Seq(("1", "ACGT", "!!~~"), ("2", "GG", "+@")))
    val path2 = tmpDir("fastq-ph") + "/ph.fq"
    Fastq.write(df, path2)
    val ph = Fastq.read(spark, path2).collect()
    assert(ph.forall(r => r.getString(2) == "I" * r.getString(1).length))
  }

  test("small forced splits resync to record boundaries (split-safety)") {
    // one file, many records, split every ~120 bytes: most splits start
    // mid-record and must resync without losing or duplicating records
    val n = 200
    val recs = (1 to n).map(i => s"@r$i\n${"ACGTAC" * (1 + i % 7)}\n+\n${"I" * (6 * (1 + i % 7))}")
    val dir = tmpDir("fastq-split")
    writeRaw(dir, "s.fq", recs.mkString("\n") + "\n")
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldMax = hconf.get("mapreduce.input.fileinputformat.split.maxsize")
    hconf.setLong("mapreduce.input.fileinputformat.split.maxsize", 120L)
    try {
      val got = Fastq.read(spark, dir)
      assert(got.rdd.getNumPartitions > 1)
      assert(got.count() == n)
      val ids = got.select(regexp_replace(col("header"), "^r", "").cast("int"))
        .collect().map(_.getInt(0)).sorted
      assert(ids.toSeq == (1 to n))
    } finally {
      if (oldMax == null) hconf.unset("mapreduce.input.fileinputformat.split.maxsize")
      else hconf.set("mapreduce.input.fileinputformat.split.maxsize", oldMax)
    }
  }

  test("malformed inputs throw: truncation, bad separator, length mismatch, junk start") {
    def readAll(content: String): Unit = {
      val dir = tmpDir("fastq-bad")
      writeRaw(dir, "b.fq", content)
      Fastq.read(spark, dir).count()
    }
    intercept[org.apache.spark.SparkException] { readAll("@a\nACGT\n+\n") } // truncated
    intercept[org.apache.spark.SparkException] { readAll("@a\nACGT\nIIII\nXXXX\n") } // no '+'
    intercept[org.apache.spark.SparkException] { readAll("@a\nACGT\n+\nIII\n") } // qual len
    intercept[org.apache.spark.SparkException] { readAll("garbage\n@a\nACGT\n+\nIIII\n") }
  }

  test("write rejects sequences containing line breaks instead of corrupting") {
    val df = spark.createDataFrame(Seq((1L, "AC\nGT"))).toDF("doc_id", "text")
    val path = tmpDir("fastq-nl") + "/nl.fq"
    val e = intercept[Exception] { Fastq.write(df, path) }
    assert(e.getMessage != null || e.getCause != null) // raise_error surfaces via SparkException
  }
}
