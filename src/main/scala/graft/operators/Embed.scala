package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftConfig
import graft.sources.Tables

/** Text→embedding featurizer — the bridge that closes the one seam
  * where the ANN/dedup stack still depended on EXTERNAL vectors (the
  * synthetic `embeddings` table): a deterministic feature-hashing
  * embedder deriving integer vectors from `documents` text, plus the
  * consuming near-dup row that runs the similarity machinery on the
  * DERIVED vectors end-to-end.
  *
  * Method: classic signed feature hashing (hashing trick). Every
  * whitespace token hashes once (md5, the suite-wide deterministic
  * hash); hex chars 1-8 pick the dimension (mod featHashDim), hex char
  * 9 picks the sign (≥ '8' → −1); a doc's vector is the signed
  * occurrence count per dimension — INTEGER-EXACT accumulation, no
  * floats anywhere in the representation, so both engines agree
  * bitwise and the vectors are reproducible across runs, engines, and
  * partitionings. Output is the SPARSE long form (doc_id, dim, val≠0):
  * cancelled dimensions carry no information (they add 0 to every dot
  * product and norm) and the sparse form is what the sparse-dot
  * consumer joins on.
  *
  * No reference counterpart (CloudBrush has no embedder); the design
  * is the published hashing-trick shape (Weinberger et al., feature
  * hashing) re-expressed as one Spark scan + one grouped aggregate.
  */
class EmbedOps(val cfg: GraftConfig) {
  private val D = cfg.featHashDim

  /** The dense derived vector as ONE native scan column (plus its
    * exact norm) — the shared producer of q282/q283/q288/q289. */
  private def denseVecs(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), expr(s"feat_hash_vec(text, $D)").as("vec"))
  }

  /** q282: FEATURE-HASHED TEXT EMBEDDING — each document's text
    * projected into $D integer dimensions by signed token hashing.
    *
    * Scale: the whole embedder is the native `feat_hash_vec`
    * expression — tokenize, hash, and accumulate inside the scan, one
    * call per row (never md5 inside a higher-order-function lambda,
    * the q269 lesson) — so deriving vectors from a 100 TB corpus is a
    * PURE MAP with ZERO shuffle: the in-row posexplode to the sparse
    * long form is generate-on-scan, and there is no (doc, dim)
    * re-aggregation at all (the explode+groupBy formulation this
    * replaces shuffled docs×$D partial rows; PlanSpec pins the
    * exchange-free plan). Statelessness is also what makes the q288
    * STREAMING twin run in plain append mode with no watermark. */
  def q282TextEmbed(spark: SparkSession, dir: String): DataFrame =
    denseVecs(spark, dir)
      .select(col("doc_id"), posexplode(col("vec")).as(Seq("dim", "val")))
      .filter(col("val") =!= 0)
      .select(col("doc_id"), col("dim").cast("long").as("dim"), col("val"))

  /** The shared CTE chain: tokens → signed hashed features → the
    * sparse vector table `v(doc_id, dim, val)`. */
  private def vecCtes: String =
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |hx AS (SELECT doc_id, md5(tok || ':f') AS h FROM toks),
       |sv AS (SELECT doc_id,
       |    CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % $D AS dim,
       |    CASE WHEN substr(h, 9, 1) >= '8' THEN -1 ELSE 1 END AS s
       |  FROM hx),
       |v AS (SELECT doc_id, dim, CAST(sum(s) AS BIGINT) AS val
       |  FROM sv GROUP BY doc_id, dim HAVING sum(s) <> 0)""".stripMargin

  def q282Sql: String =
    s"""WITH $vecCtes
       |SELECT doc_id, dim, val FROM v""".stripMargin

  /** q283: DERIVED-VECTOR NEAR-DUP — the q34 consumer re-run on
    * vectors DERIVED from text by q282 instead of the external
    * embeddings table: candidate pairs block on the DOMINANT FEATURE
    * (each doc's max-|val| dimension plus its sign — near-duplicate
    * texts share their heaviest hashed feature with high probability;
    * ties break to the smallest dim), and only candidates pay the
    * exact sparse dot product. dot and the norms are exact BIGINT
    * sums; cosine is ONE double division of exact integers (the suite
    * discipline), thresholded at ${cfg.derivedNeardupMin}.
    *
    * Scale: blocking is an equi-join on (dominant dim, sign) — 2·$D
    * buckets, candidates Σ|bucket|², never corpus² (the q58 pigeonhole
    * shape; recall loss of single-feature blocking is the documented
    * trade — a doc pair disagreeing on its heaviest feature is far
    * from duplicate in this representation). The dot pass joins the
    * candidate list against the sparse vector table on (doc, dim) —
    * candidate×overlap rows, grouped with map-side partials. The
    * sparse vector table is lineage-cut once (Ck) and feeds all four
    * consumers (norms, dominants, both dot sides) without re-running
    * the corpus scan. */
  def q283DerivedNearDup(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val v = graft.Ck.lazyStage(q282TextEmbed(spark, dir), cfg)
    // DENSE per-doc vectors for the verify pass: each candidate pair
    // costs ONE row per side plus the native codegen'd $D-long dot
    // (vec_dot_long), instead of ~nnz sparse rows through a
    // (pair × dim) shuffle join — the corpus's one stop-word-dominated
    // block makes candidates bucket-quadratic (5.3M pairs at sf0.1;
    // the skew is corpus-intrinsic, measured: top-2 and sign-band
    // blockings both read WORSE recall-for-cost), so the verify loop
    // is the cost and it must be a primitive loop: sparse join 22.0 s
    // → dense interpreted fold 13.4 s → dense native dot 1.45 s
    // (all sf0.1); the dot stays exact BIGINT (absent dims are 0).
    // The dense table now comes straight off the feat_hash_vec scan.
    val dense = denseVecs(spark, dir)
      .select(col("doc_id"), col("vec"),
        expr("vec_dot_long(vec, vec)").as("n2"))
    val wD = Window.partitionBy("doc_id").orderBy(abs(col("val")).desc, col("dim"))
    val dom = v.withColumn("rk", row_number().over(wD)).filter(col("rk") === 1)
      .select(col("doc_id"), col("dim").as("ddim"),
        when(col("val") < 0, lit(-1L)).otherwise(lit(1L)).as("dsign"))
    val cand = dom.as("x").join(dom.as("y"),
        col("x.ddim") === col("y.ddim") && col("x.dsign") === col("y.dsign") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    cand
      .join(dense.select(col("doc_id").as("doc_a"), col("vec").as("va"), col("n2").as("na2")), "doc_a")
      .join(dense.select(col("doc_id").as("doc_b"), col("vec").as("vb"), col("n2").as("nb2")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("vec_dot_long(va, vb)").as("dot"),
        col("na2"), col("nb2"))
      .select(col("doc_a"), col("doc_b"), col("dot"),
        (col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double")))).as("cosine"))
      .filter(col("cosine") >= cfg.derivedNeardupMin)
  }

  def q283Sql: String =
    s"""WITH $vecCtes,
       |n2 AS (SELECT doc_id, sum(val * val) AS n2 FROM v GROUP BY doc_id),
       |dom AS (SELECT doc_id, dim AS ddim,
       |    CASE WHEN val < 0 THEN -1 ELSE 1 END AS dsign
       |  FROM (SELECT doc_id, dim, val, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY abs(val) DESC, dim) AS rk FROM v)
       |  WHERE rk = 1),
       |cand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM dom x JOIN dom y ON x.ddim = y.ddim AND x.dsign = y.dsign
       |    AND x.doc_id < y.doc_id),
       |dots AS (SELECT c.doc_a, c.doc_b, sum(a.val * b.val) AS dot
       |  FROM cand c
       |  JOIN v a ON a.doc_id = c.doc_a
       |  JOIN v b ON b.doc_id = c.doc_b AND b.dim = a.dim
       |  GROUP BY c.doc_a, c.doc_b),
       |cs AS (SELECT d.doc_a, d.doc_b, CAST(d.dot AS BIGINT) AS dot,
       |    CAST(d.dot AS DOUBLE) /
       |      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
       |  FROM dots d
       |  JOIN n2 na ON na.doc_id = d.doc_a
       |  JOIN n2 nb ON nb.doc_id = d.doc_b)
       |SELECT doc_a, doc_b, dot, cosine FROM cs
       |WHERE cosine >= ${cfg.derivedNeardupMin}""".stripMargin

  /** q287: BLOCKING EVAL for the derived-vector near-dup — q283's
    * single-feature blocking ships with its measured loss (the q132
    * LSH-eval discipline; an un-evaluated candidate filter is the
    * unshipped-eval sin): on a DETERMINISTIC ${cfg.derivedEvalSample}-doc
    * sample (md5-ordered take — fixed COUNT, so the eval's pair space
    * is capped at any corpus size), compute ALL exact-threshold pairs
    * by full sparse dot, the blocked candidate pairs (shared dominant
    * signed feature), and their intersection; one row ships
    * exact/candidate/hit counts plus recall (hits/exact — the pairs
    * single-feature blocking finds) and precision (hits/candidates —
    * how selective the block is). Empty denominators read 1.0
    * (vacuously perfect, same CASE on both engines).
    *
    * Scale: the sample is a TakeOrdered of fixed size — never a
    * corpus-fraction — so the all-pairs side is O(sample²) forever;
    * the corpus-wide operator stays q283, this row only prices its
    * filter. */
  def q287DerivedDedupEval(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.Ck.lazyStage(q282TextEmbed(spark, dir), cfg)
    val sampleIds = Tables.documents(spark, dir).select(col("doc_id"))
      .withColumn("h", md5(concat(lit("dr:"), col("doc_id").cast("string"))))
      .orderBy(col("h"), col("doc_id")).limit(cfg.derivedEvalSample)
      .select("doc_id")
    val sv = v.join(broadcast(sampleIds), "doc_id")
    val n2 = sv.groupBy("doc_id").agg(sum(col("val") * col("val")).as("n2"))
    val dots = sv.select(col("doc_id").as("doc_a"), col("dim"), col("val").as("va"))
      .join(sv.select(col("doc_id").as("doc_b"), col("dim"), col("val").as("vb")), "dim")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("va") * col("vb")).as("dot"))
    val exact = dots
      .join(n2.select(col("doc_id").as("doc_a"), col("n2").as("na2")), "doc_a")
      .join(n2.select(col("doc_id").as("doc_b"), col("n2").as("nb2")), "doc_b")
      .filter(col("dot").cast("double")
        / (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double")))
        >= cfg.derivedNeardupMin)
      .select("doc_a", "doc_b")
    val wD = Window.partitionBy("doc_id").orderBy(abs(col("val")).desc, col("dim"))
    val dom = sv.withColumn("rk", row_number().over(wD)).filter(col("rk") === 1)
      .select(col("doc_id"), col("dim").as("ddim"),
        when(col("val") < 0, lit(-1L)).otherwise(lit(1L)).as("dsign"))
    val cand = dom.as("x").join(dom.as("y"),
        col("x.ddim") === col("y.ddim") && col("x.dsign") === col("y.dsign") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val hits = exact.join(cand, Seq("doc_a", "doc_b"))
    sampleIds.agg(count(lit(1)).as("n_sample"))
      .crossJoin(exact.agg(count(lit(1)).as("exact_pairs")))
      .crossJoin(cand.agg(count(lit(1)).as("cand_pairs")))
      .crossJoin(hits.agg(count(lit(1)).as("hit_pairs")))
      .select(col("n_sample"), col("exact_pairs"), col("cand_pairs"), col("hit_pairs"),
        when(col("exact_pairs") === 0, lit(1.0))
          .otherwise(col("hit_pairs").cast("double") / col("exact_pairs").cast("double"))
          .as("recall"),
        when(col("cand_pairs") === 0, lit(1.0))
          .otherwise(col("hit_pairs").cast("double") / col("cand_pairs").cast("double"))
          .as("precision"))
  }

  def q287Sql: String =
    s"""WITH $vecCtes,
       |smp AS (SELECT doc_id FROM documents
       |  ORDER BY md5('dr:' || CAST(doc_id AS VARCHAR)), doc_id
       |  LIMIT ${cfg.derivedEvalSample}),
       |svv AS (SELECT v.doc_id, v.dim, v.val FROM v JOIN smp USING (doc_id)),
       |n2 AS (SELECT doc_id, sum(val * val) AS n2 FROM svv GROUP BY doc_id),
       |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.val * b.val) AS dot
       |  FROM svv a JOIN svv b ON b.dim = a.dim AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |exact AS (SELECT d.doc_a, d.doc_b FROM dots d
       |  JOIN n2 na ON na.doc_id = d.doc_a
       |  JOIN n2 nb ON nb.doc_id = d.doc_b
       |  WHERE CAST(d.dot AS DOUBLE) /
       |    (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
       |    >= ${cfg.derivedNeardupMin}),
       |dom AS (SELECT doc_id, dim AS ddim,
       |    CASE WHEN val < 0 THEN -1 ELSE 1 END AS dsign
       |  FROM (SELECT doc_id, dim, val, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY abs(val) DESC, dim) AS rk FROM svv)
       |  WHERE rk = 1),
       |cand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM dom x JOIN dom y ON x.ddim = y.ddim AND x.dsign = y.dsign
       |    AND x.doc_id < y.doc_id),
       |hits AS (SELECT e.doc_a, e.doc_b FROM exact e JOIN cand c
       |  ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b),
       |agg AS (SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM smp) AS n_sample,
       |  (SELECT CAST(count(*) AS BIGINT) FROM exact) AS exact_pairs,
       |  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS cand_pairs,
       |  (SELECT CAST(count(*) AS BIGINT) FROM hits) AS hit_pairs)
       |SELECT n_sample, exact_pairs, cand_pairs, hit_pairs,
       |  CASE WHEN exact_pairs = 0 THEN 1.0
       |    ELSE CAST(hit_pairs AS DOUBLE) / CAST(exact_pairs AS DOUBLE) END AS recall,
       |  CASE WHEN cand_pairs = 0 THEN 1.0
       |    ELSE CAST(hit_pairs AS DOUBLE) / CAST(cand_pairs AS DOUBLE) END AS precision
       |FROM agg""".stripMargin

  /** q288: STREAMING text embedder — the live-intake twin of q282 (the
    * q147/q278 streaming-twin discipline, applied to the featurizer):
    * documents land as parquet files, `readStream` tails the directory,
    * and every micro-batch embeds its rows with the SAME native
    * `feat_hash_vec` scan expression as batch. Because the embedder is
    * a per-row expression, the stream is completely STATELESS — plain
    * append mode, no watermark, no aggregation state at any corpus
    * size — so the drain equals the batch q282 bit for bit (which is
    * exactly what the oracle re-checks). This is the shape that embeds
    * a crawler's intake incrementally instead of re-scanning the
    * corpus nightly. */
  def q288StreamEmbed(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val path = graft.sources.Scratch.dir("embed_stream", dir)
    Tables.documents(spark, dir).select("doc_id", "text")
      .write.mode("overwrite").parquet(path)
    val out = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .parquet(path)
      .select(col("doc_id"), posexplode(expr(s"feat_hash_vec(text, $D)")).as(Seq("dim", "val")))
      .filter(col("val") =!= 0)
      .select(col("doc_id"), col("dim").cast("long").as("dim"), col("val"))
    graft.streaming.EventStream.withStreamParts(spark) {
      val q = out.writeStream.format("memory").queryName("graft_q288")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
      spark.table("graft_q288")
    }
  }

  /** Drained stream ≡ batch embedder by statelessness — the oracle IS
    * q282's. */
  def q288Sql: String = q282Sql

  /** q289: DERIVED-VECTOR ANN — q40's exhaustive-cosine search shape
    * re-run END-TO-END on vectors derived from `documents` text: the
    * first ${cfg.annQueries} doc ids are the query panel, every doc
    * with a non-degenerate vector is a candidate, exact integer dots
    * via the native `vec_dot_long`, ties to doc_id. With q283 (dedup
    * side) and this row (search side), the whole similarity stack runs
    * from raw text with no external embedding table anywhere.
    *
    * Scale: the q40 shape exactly — the tiny query panel broadcasts
    * onto ONE corpus scan (vectors derived in-scan by feat_hash_vec,
    * never materialized), per-query top-k under WindowGroupLimit.
    * Zero-vector docs (all dimensions cancelled) are unsearchable by
    * definition and excluded on BOTH engines. */
  def q289DerivedAnn(spark: SparkSession, dir: String): DataFrame = {
    val dense = denseVecs(spark, dir)
      .select(col("doc_id"), col("vec"), expr("vec_dot_long(vec, vec)").as("n2"))
      .filter(col("n2") > 0)
    val qv = broadcast(dense.filter(col("doc_id") < cfg.annQueries)
      .select(col("doc_id").as("query_id"), col("vec").as("qv"), col("n2").as("qn2")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("doc_id"))
    dense.crossJoin(qv)
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"),
        (expr("CAST(vec_dot_long(qv, vec) AS DOUBLE)")
          / (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double")))).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cfg.annTopK)
      .select("query_id", "doc_id", "rk", "cosine")
  }

  def q289Sql: String =
    s"""WITH $vecCtes,
       |n2 AS (SELECT doc_id, sum(val * val) AS n2 FROM v GROUP BY doc_id),
       |qn AS (SELECT doc_id AS query_id, n2 FROM n2 WHERE doc_id < ${cfg.annQueries}),
       |sd AS (SELECT a.doc_id AS query_id, b.doc_id, sum(a.val * b.val) AS dot
       |  FROM v a JOIN v b ON b.dim = a.dim
       |  WHERE a.doc_id < ${cfg.annQueries} GROUP BY 1, 2),
       |scored AS (SELECT qn.query_id, c.doc_id,
       |    CAST(coalesce(sd.dot, 0) AS DOUBLE) /
       |      (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cosine
       |  FROM qn JOIN n2 c ON c.doc_id <> qn.query_id
       |  LEFT JOIN sd ON sd.query_id = qn.query_id AND sd.doc_id = c.doc_id)
       |SELECT query_id, doc_id, rk, cosine FROM (
       |  SELECT query_id, doc_id, cosine, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, doc_id) AS rk
       |  FROM scored) WHERE rk <= ${cfg.annTopK}""".stripMargin
}

/** Default-configured instance (see [[graft.GraftConfig]]). */
object Embed extends EmbedOps(GraftConfig.default)
