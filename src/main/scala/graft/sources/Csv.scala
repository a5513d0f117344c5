package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed CSV source/sink — the interchange format everything
  * tabular still speaks, completing the exchange family (FASTA/SFA/
  * FASTQ for reads, JSONL for corpora, parquet for the lakehouse)
  * [the reference's exchange-format role: Graph2Fasta.java /
  * Graph2Sfa.java].
  *
  * Same scale contract as Jsonl: EXPLICIT schema (an inferred read
  * pays a full extra corpus pass), FAILFAST (a malformed line throws
  * instead of becoming silent nulls), headerless deterministic column
  * order (the schema IS the header — a header line per part file
  * would corrupt concatenation and costs a skip per task).
  *
  * Split safety is the CSV-specific design point: a quoted field may
  * legally contain a newline, but reading such files needs
  * `multiLine=true`, which makes every file ONE task — unsplittable,
  * the 100 TB killer. This sink therefore REJECTS record-internal
  * newlines at write time (a codegen'd raise_error guard inside the
  * projection — no extra pass) instead of quietly producing a corpus
  * only a single-threaded reader can parse; data with embedded
  * newlines belongs to the JSONL sink, whose escaping keeps lines
  * physical. Commas, quotes, and unicode round-trip via standard
  * quoting; nulls write as `\N` and empty strings as quoted `""` so
  * the two stay DISTINGUISHABLE (the default CSV mapping collapses
  * both to an empty field and the read side resurrects them all as
  * null — a silent corruption of every empty-text doc). */
object Csv {

  /** The corpus exchange schema (documents-shaped). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val NullToken = "\\N"

  /** Write rows as headerless CSV part files; record-internal newlines
    * are a write-time error (see class doc). */
  def write(df: DataFrame, path: String): Unit = {
    val guarded = df.select(df.schema.fields.map { f =>
      if (f.dataType == StringType)
        when(col(f.name).contains("\n") || col(f.name).contains("\r"),
          raise_error(concat(lit(s"csv sink: record-internal newline in column " +
            s"'${f.name}' — use the JSONL sink for multi-line text; offending row key="),
            col(df.columns.head).cast("string"))))
          .otherwise(col(f.name)).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
    guarded.write.mode("overwrite")
      .option("header", "false")
      .option("nullValue", NullToken)
      .option("emptyValue", "\"\"")
      .csv(path)
  }

  /** Read headerless CSV with an explicit schema, strict mode. The
    * read side must NOT set emptyValue: on read that option is the
    * replacement TOKEN for empty fields (setting it to `""` would
    * resurrect every empty string as the two-char literal); the
    * default maps both quoted-empty and bare-empty to "", and the
    * `\N` nullValue keeps nulls distinct. */
  def read(spark: SparkSession, path: String, schema: StructType = docSchema): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "false")
      .option("mode", "FAILFAST")
      .option("nullValue", NullToken)
      .csv(path)

  /** q161: CSV round-trip through the real source/sink path — write the
    * full documents table as CSV part files, read back with the
    * explicit schema, return every column. The oracle is the identity
    * projection of `documents`, so the hash gate verifies the
    * quote→write→split→parse cycle is lossless for every text/lang/
    * source string (commas and quotes included) and both integers. */
  def q161CsvRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Scratch.withRunDir(spark, dir, "csv") { path =>
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      write(docs, path)
      read(spark, path).select("doc_id", "text", "lang", "source", "n_chars")
    }

  def q161Sql: String = "SELECT doc_id, text, lang, source, n_chars FROM documents"
}
