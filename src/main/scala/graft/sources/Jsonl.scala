package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed JSONL (JSON Lines) source/sink — the de-facto exchange
  * format of LLM corpus pipelines (one JSON object per line), the role
  * FASTA/SFA play for the reference's reads [Graph2Fasta.java,
  * Graph2Sfa.java: line-structured exchange formats downstream tools
  * consume].
  *
  * Split safety comes for free: JSON string escaping (`\n` → `\\n`)
  * guarantees one record per physical line, so the text datasource
  * splits a 100 GB file at line boundaries into parallel tasks — no
  * custom InputFormat needed (contrast Fastq.scala, where unescaped
  * multi-line records force a resyncing reader).
  *
  * Scale contract on the read side: the schema is EXPLICIT, never
  * inferred — `spark.read.json` without a schema runs a full extra
  * pass over the corpus just to guess types, and a 100 TB corpus pays
  * that scan twice. Reads are FAILFAST: a corrupt line throws instead
  * of becoming a row of nulls that silently poisons downstream counts
  * (the same strictness contract as the FASTQ parser).
  */
object Jsonl {

  /** The corpus exchange schema (documents-shaped). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Write rows as JSONL part files: one `to_json(struct(...))` line
    * per row, field order fixed by the select list so output bytes are
    * deterministic per row. */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite").text(path)

  /** Read JSONL with an explicit schema, strict mode. */
  def read(spark: SparkSession, path: String, schema: StructType = docSchema): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** q126: JSONL round-trip through the real source/sink path — write
    * the full documents table as JSONL part files, read back with the
    * explicit schema, return every column. The DuckDB oracle is the
    * identity projection of `documents`, so the hash gate verifies the
    * escape→write→split→parse cycle is lossless for every text/lang/
    * source string and both integer columns. */
  def q126JsonlRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Scratch.withRunDir(spark, dir, "jsonl") { path =>
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      write(docs, path)
      read(spark, path).select("doc_id", "text", "lang", "source", "n_chars")
    }

  def q126Sql: String = "SELECT doc_id, text, lang, source, n_chars FROM documents"

  /** q182: STREAMING JSONL ingest — the corpus exchange format arriving
    * as a stream (the production intake shape: a crawler drops JSONL
    * part files into a landing directory and the pipeline tails it):
    * `readStream` with the SAME explicit schema + FAILFAST contract as
    * the batch reader, rolled up per language (map-combinable counts +
    * exact integer char totals). Split safety carries over — new files
    * are discovered per micro-batch and each splits at line
    * boundaries. The bounded-replay drain equals the batch rollup over
    * the same files, which is what the oracle checks. */
  def q182StreamJsonlIngest(spark: SparkSession, dir: String): DataFrame =
    Scratch.withRunDir(spark, dir, "jsonl_stream") { path =>
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    write(docs, path)
    val agg = spark.readStream
      .schema(docSchema)
      .option("mode", "FAILFAST")
      .json(path)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    graft.streaming.EventStream.withStreamParts(spark) {
      val q = agg.writeStream.format("memory").queryName("graft_q182")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
      try q.processAllAvailable() finally q.stop()
      spark.table("graft_q182")
    }
    }

  def q182Sql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1""".stripMargin
}
