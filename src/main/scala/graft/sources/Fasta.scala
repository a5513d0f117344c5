package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed FASTA source/sink [the reference's native exchange format:
  * Graph2Fasta.java writes it, BrushAssembler.convertFasta:178-188 drives
  * the conversion; reads enter the reference pre-converted to its graph
  * text form].
  *
  * Read strategy: the text datasource with a custom record delimiter
  * `\n>` — Hadoop's LineRecordReader handles delimiters spanning a
  * file-split boundary, so a multi-gigabyte FASTA splits into parallel
  * tasks WITHOUT any whole-file reads (wholeTextFiles would pin each
  * file to one task and OOM on a 100 GB file). Each record row is then
  * `header\nseq...\nseq...`; header/body split and newline removal are
  * codegen'd string expressions, no UDFs.
  *
  * FASTQ is deliberately not handled this way: its `@` record marker can
  * also start a quality line, so delimiter splitting is ambiguous — a
  * FASTQ reader needs a stateful 4-line parser over mapPartitions
  * instead.
  */
object Fasta {

  /** Read a FASTA file/directory into (header, text) rows: header is the
    * line after `>` (whitespace-trimmed, CR-safe), text is the sequence
    * with all line breaks removed. Records with an empty body are kept
    * (header-only entries are legal FASTA); zero-length junk between
    * delimiters is dropped. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "\n>").text(path)
      // the first record of each part file keeps its leading ">"
      .select(regexp_replace(col("value"), "^>", "").as("rec"))
      .filter(length(trim(col("rec"), " \t\r\n")) > 0)
      .select(
        trim(substring_index(col("rec"), "\n", 1), " \t\r").as("header"),
        when(instr(col("rec"), "\n") === 0, lit(""))
          .otherwise(translate(expr("substring(rec, instr(rec, '\n') + 1)"), "\n\r", ""))
          .as("text"))

  /** q65: FASTA round-trip through the real source/sink path — write the
    * corpus as wrapped FASTA part files, read it back with the
    * split-safe record reader, and return (doc_id, text). The DuckDB
    * oracle is the identity projection of `documents`, so the hash gate
    * verifies losslessness of the full write→split→parse cycle. */
  def q65FastaRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Scratch.withRunDir(spark, dir, "fasta") { path =>
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      write(docs, path)
      read(spark, path).select(col("header").cast("long").as("doc_id"), col("text"))
    }

  def q65Sql: String = "SELECT doc_id, text FROM documents"

  /** Write (id, sequence) rows as FASTA text: `>` + id, sequence wrapped
    * at `wrap` columns (0 = no wrapping). One text row per record —
    * parallel part files each start at a record boundary, so `read`
    * re-splits them exactly. */
  def write(df: DataFrame, path: String, idCol: String = "doc_id",
            seqCol: String = "text", wrap: Int = 70): Unit = {
    val body =
      if (wrap <= 0) col(seqCol).cast("string")
      else regexp_replace(col(seqCol).cast("string"), s"(.{$wrap})", "$1\n")
    df.select(concat(lit(">"), col(idCol).cast("string"), lit("\n"),
        // a sequence whose length is an exact multiple of `wrap` gets a
        // trailing wrap-newline — drop it so records stay tight
        rtrim(body, "\n")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
