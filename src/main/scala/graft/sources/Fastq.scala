package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, Path => HPath}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}
import org.apache.hadoop.util.LineReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed FASTQ source/sink — the raw-read format upstream of the
  * reference's pipeline (its inputs arrive pre-converted to FASTA/SFA;
  * BrushAssembler.convertFasta:178-188 drives that conversion, and this
  * source closes the one ingest gap left of it).
  *
  * FASTQ cannot use the FASTA `\n>` delimiter trick (Fasta.scala): the
  * `@` record marker is also a legal first character of a quality line,
  * so a record delimiter is ambiguous. Instead this is the standard
  * splittable-FASTQ shape: a custom Hadoop InputFormat whose reader
  * seeks to its split offset, aligns to the next line like the stock
  * line reader, then RESYNCS to the next true record start — a `@` line
  * whose +2 line is the `+` separator and whose sequence/quality
  * lengths agree — and reads 4-line records, continuing past the split
  * end to finish its last record. Records starting at byte b belong to
  * the split with start < b ≤ end (the stock line convention lifted to
  * records), so every record is parsed exactly once, in parallel, with
  * no whole-file reads — a 100 GB FASTQ splits like any text file.
  *
  * The parser is STRICT (same contract as the q76 PPM decoder): a
  * truncated record, a missing `+` separator, a seq/qual length
  * mismatch, or junk at file start all throw rather than silently
  * dropping reads. Compressed inputs are rejected (block-compressed
  * FASTQ needs a codec-aware reader; plain text is the exchange case).
  */
object Fastq {

  /** Read FASTQ into (header, text, qual) rows: header is the line
    * after `@`, text the sequence line, qual the quality line. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path, classOf[FastqInputFormat], classOf[LongWritable], classOf[Text],
        spark.sparkContext.hadoopConfiguration)
      .map { case (_, v) => v.toString } // copy out of the reused Text buffer
    import spark.implicits._
    rdd.toDF("rec")
      .select(
        regexp_replace(substring_index(col("rec"), "\n", 1), "^@", "").as("header"),
        element_at(split(col("rec"), "\n"), 2).as("text"),
        element_at(split(col("rec"), "\n"), 4).as("qual"))
  }

  /** Write (id, sequence[, quality]) rows as 4-line FASTQ records, one
    * text row per record so parallel part files start at record
    * boundaries. Without a quality column a constant placeholder of the
    * right length is emitted (`I` = Phred 40). FASTQ is line-structured,
    * so a sequence or quality containing a line break cannot round-trip
    * — such rows fail fast (raise_error) instead of corrupting the
    * file, the same contract as Sfa.write. */
  def write(df: DataFrame, path: String, idCol: String = "doc_id",
            seqCol: String = "text", qualCol: Option[String] = None): Unit = {
    def lineSafe(c: org.apache.spark.sql.Column, what: String) =
      when(instr(c, "\n") > 0 || instr(c, "\r") > 0,
        raise_error(concat(lit(s"Fastq.write: $what contains a line break at id="),
          col(idCol).cast("string")))).otherwise(c)
    val seq = lineSafe(col(seqCol).cast("string"), "sequence")
    val qual = qualCol.map(q => lineSafe(col(q).cast("string"), "quality"))
      .getOrElse(repeat(lit("I"), length(col(seqCol)).cast("int")))
    df.select(concat(lit("@"), col(idCol).cast("string"), lit("\n"),
        seq, lit("\n+\n"), qual).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** q79: FASTQ round-trip through the real source/sink path — write the
    * corpus as FASTQ part files, read back with the split-resyncing
    * record reader, and return (doc_id, text). The DuckDB oracle is the
    * identity projection of `documents`, so the hash gate verifies the
    * full write→split→resync→parse cycle is lossless. */
  def q79FastqRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Scratch.withRunDir(spark, dir, "fastq") { path =>
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      write(docs, path)
      read(spark, path).select(col("header").cast("long").as("doc_id"), col("text"))
    }

  def q79Sql: String = "SELECT doc_id, text FROM documents"
}

/** Split-safe FASTQ input format: see [[Fastq]] for the record-boundary
  * convention. Values are the 4 record lines joined with `\n`. */
class FastqInputFormat extends FileInputFormat[LongWritable, Text] {
  override def isSplitable(ctx: JobContext, file: HPath): Boolean =
    new CompressionCodecFactory(ctx.getConfiguration).getCodec(file) == null

  override def createRecordReader(split: InputSplit,
      ctx: TaskAttemptContext): RecordReader[LongWritable, Text] =
    new FastqRecordReader
}

class FastqRecordReader extends RecordReader[LongWritable, Text] {
  // a resync never legitimately needs more than the ≤3 tail lines of
  // the record straddling the split start (+1 discarded partial line);
  // scanning further means the content is not 4-line FASTQ
  private val MaxResyncLines = 16

  private var in: FSDataInputStream = _
  private var lr: LineReader = _
  private var start = 0L
  private var end = 0L
  private var pos = 0L
  private var eof = false
  private var finished = false
  private var fileName = ""
  private val key = new LongWritable
  private val value = new Text
  private val buf = scala.collection.mutable.Queue.empty[(Long, String)]

  private def fill(n: Int): Unit = {
    val t = new Text
    while (!eof && buf.size < n) {
      val p0 = pos
      val consumed = lr.readLine(t)
      if (consumed == 0) eof = true
      else { pos += consumed; buf.enqueue((p0, t.toString)) }
    }
  }

  private def recStartOk(): Boolean =
    buf(0)._2.startsWith("@") && buf(2)._2.startsWith("+") &&
      buf(1)._2.length == buf(3)._2.length

  override def initialize(genericSplit: InputSplit, ctx: TaskAttemptContext): Unit = {
    val split = genericSplit.asInstanceOf[FileSplit]
    val conf = ctx.getConfiguration
    val file = split.getPath
    fileName = file.toString
    if (new CompressionCodecFactory(conf).getCodec(file) != null)
      throw new UnsupportedOperationException(
        s"Fastq source does not support compressed input: $fileName")
    start = split.getStart
    end = start + split.getLength
    in = file.getFileSystem(conf).open(file)
    in.seek(start)
    pos = start
    lr = new LineReader(in, conf)
    if (start != 0) {
      // align to the next line start; the previous split reads one
      // record past its end, covering whatever this discards
      val t = new Text
      pos += lr.readLine(t)
    }
    // resync to the next record start
    var scanned = 0
    var synced = false
    while (!synced) {
      fill(4)
      if (buf.size < 4) {
        if (start == 0 && buf.nonEmpty)
          throw new IllegalArgumentException(
            s"malformed FASTQ (truncated record) in $fileName")
        // tail lines of a record owned by the previous split
        finished = true
        synced = true
      } else if (recStartOk()) {
        synced = true
      } else {
        if (start == 0)
          throw new IllegalArgumentException(
            s"malformed FASTQ (no record at file start) in $fileName")
        buf.dequeue()
        scanned += 1
        if (scanned > MaxResyncLines)
          throw new IllegalArgumentException(
            s"malformed FASTQ (no record boundary within $MaxResyncLines lines) in $fileName")
      }
    }
  }

  override def nextKeyValue(): Boolean = {
    if (finished) return false
    fill(4)
    if (buf.isEmpty) { finished = true; return false }
    val recStart = buf.head._1
    if (recStart > end) { finished = true; return false } // next split's record
    if (buf.size < 4)
      throw new IllegalArgumentException(
        s"malformed FASTQ (truncated record at byte $recStart) in $fileName")
    val l0 = buf.dequeue()._2
    val l1 = buf.dequeue()._2
    val l2 = buf.dequeue()._2
    val l3 = buf.dequeue()._2
    if (!l0.startsWith("@") || !l2.startsWith("+"))
      throw new IllegalArgumentException(
        s"malformed FASTQ (bad record structure at byte $recStart) in $fileName")
    if (l1.length != l3.length)
      throw new IllegalArgumentException(
        s"malformed FASTQ (seq/qual length mismatch at byte $recStart) in $fileName")
    key.set(recStart)
    value.set(l0 + "\n" + l1 + "\n" + l2 + "\n" + l3)
    true
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (end == start) 1.0f
    else math.min(1.0f, (pos - start).toFloat / (end - start))
  override def close(): Unit = if (in != null) in.close()
}
