package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftConfig
import graft.sources.Tables

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language ID, fingerprinting. All single-pass,
  * codegen-friendly column expressions (no UDFs) so they stay inside
  * WholeStageCodegen on the scan — the shape that streams 100 TB through
  * executors with zero shuffle (except langid's tiny profile broadcast).
  */
class TextAnalysisOps(val cfg: GraftConfig) {
  val Stopwords: Seq[String] = cfg.stopwords
  val LangIdTrainMod: Int = cfg.langIdTrainMod
  val LangIdProfileSize: Int = cfg.langIdProfileSize
  val WinnowK: Int = cfg.winnowK
  val WinnowWindow: Int = cfg.winnowWindow
  private val stopList = Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** q50: whitespace tokens + regex token count (BPE-ish pre-tokenizer:
    * letter runs, digit runs, single punctuation). */
  def q50TokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).cast("long").as("re_tokens"))

  def q50Sql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
      |FROM documents""".stripMargin

  /** q51: quality features + a weighted score. Integer counts feed double
    * arithmetic with identical expression shape on both engines, so the
    * doubles are bit-identical. */
  def q51Quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(expr(s"filter(split(text, ' '), w -> w IN $stopList)")).cast("long").as("n_stop"))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stopword_ratio"),
        ((col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens")).as("avg_token_len"))
      .withColumn("quality_score",
        col("stopword_ratio") * 2.0 + col("avg_token_len") * 0.1
          + least(col("n_tokens").cast("double") / 100.0, lit(1.0)))

  def q51Sql: String =
    s"""SELECT doc_id, n_chars, n_tokens, stopword_ratio, avg_token_len,
       |  stopword_ratio * 2.0 + avg_token_len * 0.1
       |    + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS quality_score
       |FROM (
       |  SELECT doc_id, n_chars, n_tokens,
       |    CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       |    CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens AS avg_token_len
       |  FROM (
       |    SELECT doc_id, n_chars,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |      CAST(len(list_filter(string_split(text, ' '), w -> w IN $stopList)) AS BIGINT) AS n_stop
       |    FROM documents))""".stripMargin

  /** q52: n-gram language ID (Cavnar–Trenkle flavor). Profiles are the
    * top-$LangIdProfileSize char bigrams of each language learned from
    * the deterministic training slice (doc_id % $LangIdTrainMod = 0,
    * labels taken from `lang`); the tiny profile table is broadcast and
    * every doc scores by matched-bigram count (ties → lexicographically
    * smaller lang). */
  def q52LangId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bigrams = docs
      .filter(length(col("text")) >= 2) // sequence() guard for 1-char docs
      .withColumn("g", explode(sequence(lit(1), length(col("text")) - 1)))
      .select(col("doc_id"), col("lang"), expr("substring(text, g, 2)").as("bg"))
    val train = bigrams.filter(col("doc_id") % LangIdTrainMod === 0)
    val wRank = Window.partitionBy("lang").orderBy(col("cnt").desc, col("bg"))
    val profiles = broadcast(
      train.groupBy("lang", "bg").agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(wRank)).filter(col("rk") <= LangIdProfileSize)
        .select(col("lang").as("plang"), col("bg")))
    val wBest = Window.partitionBy("doc_id").orderBy(col("hits").desc, col("plang"))
    bigrams.select("doc_id", "bg").distinct()
      .join(profiles, "bg")
      .groupBy("doc_id", "plang").agg(count(lit(1)).as("hits"))
      .withColumn("rk", row_number().over(wBest)).filter(col("rk") === 1)
      .select(col("doc_id"), col("plang").as("pred_lang"))
  }

  def q52Sql: String =
    s"""WITH bigrams AS (
       |  SELECT doc_id, lang, substr(text, g, 2) AS bg
       |  FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text)-1)) AS g) t
       |  WHERE len(text) >= 2),
       |train AS (SELECT lang, bg FROM bigrams WHERE doc_id % $LangIdTrainMod = 0),
       |counts AS (SELECT lang, bg, count(*) AS cnt FROM train GROUP BY lang, bg),
       |profiles AS (SELECT lang AS plang, bg FROM (
       |  SELECT lang, bg, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bg) AS rk
       |  FROM counts) WHERE rk <= $LangIdProfileSize),
       |db AS (SELECT DISTINCT doc_id, bg FROM bigrams),
       |hits AS (SELECT doc_id, plang, count(*) AS h FROM db JOIN profiles USING (bg)
       |  GROUP BY doc_id, plang)
       |SELECT doc_id, plang AS pred_lang FROM (
       |  SELECT doc_id, plang, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, plang) AS rk
       |  FROM hits) WHERE rk = 1""".stripMargin

  /** q53: document fingerprint — md5 over whitespace-normalized text. */
  def q53Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      md5(trim(regexp_replace(col("text"), " +", " "))).as("fp"))

  def q53Sql: String =
    """SELECT doc_id, md5(trim(regexp_replace(text, ' +', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin

  /** q55: winnowing fingerprints (Schleimer et al., SIGMOD'03 — the
    * rolling-hash document fingerprinting used by MOSS): hash every char
    * k-gram, slide a w-position window, keep the minimum hash per
    * window, emit the distinct selected hashes. Guarantees any shared
    * run of ≥ w+k−1 chars shares a fingerprint — the local-similarity
    * complement to q53's whole-doc hash. The window partitions by
    * doc_id (bounded by doc length, no hot-key risk). */
  def q55Winnow(spark: SparkSession, dir: String): DataFrame = {
    val k = WinnowK
    val w = WinnowWindow
    val kg = Tables.documents(spark, dir)
      .filter(length(col("text")) >= k)
      .withColumn("pos", explode(sequence(lit(1), length(col("text")) - (k - 1))))
      .select(col("doc_id"), col("pos"),
        substring(md5(expr(s"substring(text, pos, $k)")), 1, 8).as("h"))
    val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    kg.withColumn("mh", min(col("h")).over(win))
      .filter(col("pos") >= w) // only full windows select fingerprints
      .select(col("doc_id"), col("mh").as("fingerprint"))
      .distinct()
  }

  def q55Sql: String =
    s"""WITH kg AS (
       |  SELECT doc_id, g AS pos, substr(md5(substr(text, g, $WinnowK)), 1, 8) AS h
       |  FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text)-${WinnowK - 1})) AS g) t
       |  WHERE len(text) >= $WinnowK),
       |w AS (SELECT doc_id, pos,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN ${WinnowWindow - 1} PRECEDING AND CURRENT ROW) AS mh
       |  FROM kg)
       |SELECT DISTINCT doc_id, mh AS fingerprint FROM w WHERE pos >= $WinnowWindow""".stripMargin

  /** q54: char-bigram Simpson diversity (1 − Σp²) per doc — a
    * repetitiveness/quality signal like n-gram entropy but free of
    * transcendentals, so both engines compute bit-identical doubles
    * (Σc² and Σc are exact integers, the division shape is fixed).
    * Single map-side-combinable aggregation keyed by doc. */
  def q54Diversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= 2)
      .withColumn("g", explode(sequence(lit(1), length(col("text")) - 1)))
      .select(col("doc_id"), expr("substring(text, g, 2)").as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c") * col("c")).as("s2"), sum(col("c")).as("n"))
      .select(col("doc_id"), col("n").as("n_bigrams"),
        (lit(1.0) - col("s2").cast("double") / (col("n").cast("double") * col("n").cast("double")))
          .as("bigram_simpson"))

  def q54Sql: String =
    """WITH bg AS (
      |  SELECT doc_id, substr(text, g, 2) AS bg
      |  FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text)-1)) AS g) t
      |  WHERE len(text) >= 2),
      |cnt AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |  1.0 - CAST(SUM(c*c) AS DOUBLE) / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS bigram_simpson
      |FROM cnt GROUP BY doc_id""".stripMargin
}

/** Default-configured instance (see [[graft.GraftConfig]]). */
object TextAnalysis extends TextAnalysisOps(GraftConfig.default)
