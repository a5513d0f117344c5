package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The one-call user surface — what a CloudBrush user runs instead of
  * `hadoop jar CloudBrush.jar -reads ... -asm ...`
  * [BrushAssembler.java main driver]. Everything else in the library is
  * reachable as composable operators; this is the end-to-end path from
  * a document corpus to contig FASTA files on disk. */
object Graft {

  /** Assemble a corpus and write the contigs as FASTA part files:
    * the COMPLETE BrushAssembler phase chain (chimeric cut → transitive
    * reduction → tip rounds → bubble pop → low-coverage → repeat
    * adjustment → chain consensus, [[operators.Pipeline.assembleFull]])
    * ending at the split-safe distributed FASTA sink
    * ([[sources.Fasta]]). Returns the contig count. */
  def assembleToFasta(spark: SparkSession, corpusDir: String, outPath: String): Long = {
    val contigs = operators.Pipeline.assembleFull(spark, corpusDir)
      .select(col("head").as("doc_id"), col("consensus").as("text"))
    sources.Fasta.write(contigs, outPath)
    spark.read.option("lineSep", "\n>").text(outPath).count()
  }
}
