package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned corpus layout — the directory-level
  * complement to `Tables.writeBucketed` (bucketing co-locates JOIN
  * keys; partitioning prunes SCANS): `lang=en/part-*.parquet`
  * directories mean a per-language query reads ONLY its language's
  * files — at 100 TB, a lang filter over a flat layout still lists and
  * footer-reads every file, while the partitioned layout turns the
  * filter into directory pruning before a single byte of data is read.
  * The partition column lives in the directory name, not the files, so
  * the layout also stores one column fewer. */
object Layout {

  /** Write `df` partitioned by `byCol` (Hive-style directories). Pick
    * a LOW-cardinality column: every distinct value is a directory,
    * and small-file explosion from a high-cardinality partition key is
    * the classic data-lake pathology (that's what bucketing is for). */
  def writePartitioned(df: DataFrame, path: String, byCol: String): Unit =
    df.write.mode("overwrite").partitionBy(byCol).parquet(path)

  /** q146: partitioned-layout round trip + pruned read — write the
    * documents table partitioned by lang, read it back filtered to one
    * language, and return that slice. The DuckDB oracle is the same
    * filter over the flat table, so the hash gate verifies the
    * write→partition→prune→read cycle loses nothing and leaks nothing
    * across partition boundaries; PlanSpec pins that the filtered scan
    * reads ONLY the selected partition (partition-pruned FileScan). */
  def q146PartitionedScan(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val path = Scratch.dir("partlang", dir)
    writePartitioned(docs, path, "lang")
    spark.read.parquet(path)
      .filter(col("lang") === graft.GraftConfig.default.layoutScanLang)
      .select("doc_id", "lang", "source", "n_chars")
  }

  def q146Sql: String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE lang = '${graft.GraftConfig.default.layoutScanLang}'""".stripMargin
}
