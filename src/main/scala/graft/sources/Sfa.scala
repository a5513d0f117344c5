package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed SFA source/sink [the reference's second exchange format:
  * Graph2Sfa.java writes `id<TAB>sequence`, one record per line].
  *
  * One-line records make SFA trivially split-safe: the plain text
  * datasource assigns file splits at line boundaries, so a 100 GB SFA
  * file reads as parallel tasks with no custom delimiter handling (the
  * FASTA reader needs the `\n>` trick; SFA is the cheap path and the
  * reason the reference converts INTO it for downstream tools). Like
  * the reference's writer, sequences must not contain line breaks —
  * they never do post-parse, both engines strip them at ingest. The
  * first TAB is the separator; later TABs stay in the sequence. */
object Sfa {

  /** Write (id, sequence) rows as SFA lines. A sequence containing a
    * line break cannot round-trip through a line-structured format —
    * such rows fail fast (raise_error) instead of silently corrupting
    * the file. */
  def write(df: DataFrame, path: String, idCol: String = "doc_id",
            seqCol: String = "text"): Unit =
    df.select(concat(col(idCol).cast("string"), lit("\t"),
        when(instr(col(seqCol).cast("string"), "\n") > 0 ||
             instr(col(seqCol).cast("string"), "\r") > 0,
          raise_error(concat(lit("Sfa.write: sequence contains a line break at id="),
            col(idCol).cast("string"))))
          .otherwise(col(seqCol).cast("string"))).as("value"))
      .write.mode("overwrite").text(path)

  /** Read SFA lines into (header, text) rows, splitting at the FIRST
    * tab only (instr-based, not split-based) so tabs inside the
    * sequence survive the round trip. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(col("value")) > 0)
      .select(
        substring_index(col("value"), "\t", 1).as("header"),
        when(instr(col("value"), "\t") === 0, lit(""))
          .otherwise(expr("substring(value, instr(value, '\t') + 1)")).as("text"))

  /** q72: SFA round-trip through the real source/sink path — write the
    * corpus as SFA part files, read back, return (doc_id, text). The
    * DuckDB oracle is the identity projection of `documents`, so the
    * hash gate verifies the write→split→parse cycle is lossless. */
  def q72SfaRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Scratch.withRunDir(spark, dir, "sfa") { path =>
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      write(docs, path)
      read(spark, path).select(col("header").cast("long").as("doc_id"), col("text"))
    }

  def q72Sql: String = "SELECT doc_id, text FROM documents"
}
