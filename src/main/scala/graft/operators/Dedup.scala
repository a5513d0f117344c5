package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftConfig
import graft.sources.Tables
import graft.functions.Vec

/** Near-duplicate detection family for training-data pipelines.
  *
  * All hash material is md5 (identical hex output in Spark and DuckDB), so
  * every stage — signatures, band keys, candidate sets, verified scores —
  * is bitwise reproducible across engines. LSH/blocking recall is a
  * *parameter* of the operator, not a correctness concern: both engines
  * run the same deterministic pipeline.
  *
  * Scale design: nothing here is all-pairs. MinHash banding and the
  * rare-shingle inverted index reduce candidate generation to equi-joins
  * on band keys / rare shingles; exact verification touches only
  * candidates. At 100 TB the shuffles are keyed by band/shingle and the
  * per-doc shingle explode aggregates map-side before shuffling.
  */
class DedupOps(val cfg: GraftConfig) {

  /** Round lineage cut for the q57 CC loop: eager localCheckpoint
    * locally, reliable checkpoint when cfg.reliableStageCheckpoints —
    * the same one durability knob as GraphOps/Pipeline's iterative
    * loops. Straight-line materializations (shingles, the pair list)
    * stay localCheckpoint unconditionally: they exist for compute-once
    * semantics, and losing one recomputes a non-iterative subtree. */
  private def stageCk(df: DataFrame): DataFrame = graft.Ck.stage(df, cfg)

  val ShingleK: Int = cfg.shingleK
  val MinhashJ: Double = cfg.minhashJaccard
  val JaccardJ: Double = cfg.jaccardThreshold
  val RareDf: Int = cfg.rareDf
  val NearDupCos: Double = cfg.nearDupCos
  val SignBands: Int = cfg.signBands
  val SignBandBits: Int = cfg.signBandBits

  /** Per-doc DISTINCT shingle array, computed entirely inside the row
    * by the native codegen'd shingle_set expression
    * (graft.plans.ShingleSet): a doc's shingles all live in its own
    * text, so per-doc dedup needs NO shuffle — the old explode + global
    * distinct() paid a full corpus-shingle-table exchange for a set the
    * scan computes for free. (A transform/array_distinct formulation
    * was tried first: higher-order functions run interpreted and
    * measured 2.7× slower than the old shuffle.) One compact row per
    * doc, consumed directly by the Jaccard verifier and exploded lazily
    * by the row-shaped consumers. Docs shorter than k are filtered for
    * oracle parity (no windows exist; the expression returns an empty
    * array for them anyway). */
  def shingleArrays(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= ShingleK)
      .select(col("doc_id"), expr(s"shingle_set(text, $ShingleK)").as("ss"))
  }

  /** Distinct char k-shingles per doc, one row per (doc, shingle) —
    * the exploded view of [[shingleArrays]] (already distinct per doc,
    * so no post-explode dedup shuffle). */
  def shingles(spark: SparkSession, dir: String): DataFrame =
    shingleArrays(spark, dir)
      .select(col("doc_id"), explode(col("ss")).as("s"))

  private val shinglesSql: String =
    s"""SELECT DISTINCT doc_id, substr(text, g, $ShingleK) AS s
       |FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text)-${ShingleK - 1})) AS g) t""".stripMargin

  /** q30: 8-permutation MinHash signature per doc. Two md5 evaluations
    * per shingle, sliced into 8 independent 32-bit (8-hex-char) hashes —
    * 4× less hashing than 8 salted md5s for the same signature quality.
    *
    * The signature is computed per ROW by the native minhash_sig
    * expression (graft.plans.MinHashSig) over the doc's distinct
    * shingle array: signatures are per-doc state over per-doc input, so
    * the old corpus-wide explode → md5 → slice → groupBy-min pipeline
    * shuffled one row per shingle for values each row computes in one
    * pass. Bit parity: digest word i equals conv(substr(md5hex,1+8i,8),
    * 16,10), so mins match the declarative formulation exactly; q30
    * formats back to the md5-hex slice (zero-padded lowercase hex of
    * equal width preserves ordering, so min-then-format equals
    * format-then-min and the DuckDB oracle matches bitwise). */
  def q30MinhashSig(spark: SparkSession, dir: String): DataFrame = {
    val hexed = (0 to 7).map(i =>
      lpad(lower(hex(col(s"s$i"))), 8, "0").as(s"s$i"))
    minhashSig(shingleArrays(spark, dir)).select(col("doc_id") +: hexed: _*)
  }

  /** Internal signature table from the per-doc shingle ARRAY table:
    * s0..s7 are the 32-bit slice mins as longs (native one-pass). */
  private def minhashSig(arr: DataFrame): DataFrame = {
    arr.select(col("doc_id"), expr("minhash_sig(ss)").as("sig"))
      .select(col("doc_id") +:
        (0 to 7).map(i => element_at(col("sig"), i + 1).as(s"s$i")): _*)
  }

  private val sigSqlExprs: String =
    (0 until 8).map { i =>
      val (h, off) = if (i < 4) ("md5(s)", 1 + 8 * i) else ("md5('1:' || s)", 1 + 8 * (i - 4))
      s"min(substr($h, $off, 8)) AS s$i"
    }.mkString(", ")

  def q30Sql: String =
    s"""SELECT doc_id, $sigSqlExprs FROM ($shinglesSql) GROUP BY doc_id"""

  /** q31: MinHash-LSH near-dup pairs — 2 bands × 4 rows, then exact
    * Jaccard ≥ $MinhashJ on the candidates only. The distinct-shingle
    * table feeds four consumers (signatures, sizes, two verify joins), so
    * it is checkpointed once instead of re-exploding the corpus per use. */
  def q31MinhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // no checkpoint here: the shingle arrays are a shuffle-free scan
    // expression, so each consumer re-running it costs one pruned
    // parquet scan, cheaper than pinning the corpus-shingle table
    val arr = shingleArrays(spark, dir)
    val bands = minhashBands(minhashSig(arr))
    // per-occurrence verify + post-filter distinct (r18): deduping the
    // candidate table BEFORE the verify exchanged millions of rows to
    // save re-verifying the few % of pairs that collide in both bands;
    // verifying each band hit and deduping the (tiny) surviving pair
    // set is strictly less data moved. Duplicate rows carry identical
    // jaccard, so the post-filter distinct returns the same rows.
    val cand = bands.as("x").join(bands.as("y"), col("x.bk") === col("y.bk"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    verifiedJaccard(arr, cand).filter(col("jaccard") >= MinhashJ).distinct()
  }

  /** LSH band keys over the long signature: one 64-bit hash per 4-slice
    * band instead of a 32-hex-char concat — long equi-join keys, and a
    * (verification-safe) hash collision can only ADD a candidate pair.
    * No per-arm salt: the oracle's concat-string bands match across arms
    * when the slice tuples coincide, and fixed-width slices make concat
    * equality ⇔ tuple equality, so unsalted tuple hashing preserves the
    * candidate set exactly (modulo verification-safe collisions).
    *
    * Accepted divergence risk vs the DuckDB oracle: the oracle bands on
    * the exact concat string, so an xxhash64 collision between two
    * DIFFERENT slice tuples adds a candidate the oracle never sees — if
    * that extra pair then passes the Jaccard gate, outputs diverge.
    * Probability ≈ n²/2⁶⁴ over n banded docs (~10⁻¹⁰ at 10⁸ docs), and
    * "colliding docs that also share ≥60% shingles yet no true band" is
    * rarer still; recall is unaffected either way. Accepted rather than
    * mirrored into the SQL because DuckDB's hash() is not xxhash64-
    * compatible and the string-band oracle is the semantically honest
    * spec of the candidate set. */
  private def minhashBands(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
        xxhash64(col("s0"), col("s1"), col("s2"), col("s3")).as("bk"))
      .unionAll(sig.select(col("doc_id"),
        xxhash64(col("s4"), col("s5"), col("s6"), col("s7")).as("bk")))

  /** Exact Jaccard for a candidate pair set.
    *
    * Shape: fold each doc's (distinct) shingles into one sorted array row,
    * join the candidate PAIRS to two array rows, and intersect per pair.
    * The per-pair work is |A|+|B| hashing, and — unlike the previous
    * join-on-(doc,shingle) formulation — no intermediate row per SHARED
    * SHINGLE ever materializes (candidates × avg-shingles rows whose
    * groupBy re-shuffled most of the corpus bytes). Scale: the array rows
    * are the same bytes the shingle join would have shuffled, one row per
    * doc instead of one per shingle; candidate fan-out is bounded by the
    * band/rare-shingle generators, never all-pairs. */
  private def verifiedJaccard(arr: DataFrame, cand: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(arr.sparkSession)
    // the per-doc sorted arrays come straight off the scan
    // (shingleArrays) — the old groupBy + collect_list re-shuffled the
    // full exploded shingle table to rebuild rows the scan already had
    val docArr = arr.select(col("doc_id"), col("ss"),
      size(col("ss")).cast("long").as("n"))
    // every cand column is passed through to the output so callers never
    // join the (expensive) candidate pipeline a second time to recover
    // generator flags
    val passthrough = cand.columns.toSeq.map(col)
    cand
      // repartition BEFORE the (broadcast) array joins: candidate rows are
      // small in BYTES but each costs an O(|A|+|B|) hash-set intersection —
      // AQE coalesces the candidate aggregation by bytes and would funnel
      // every intersection into 1-2 tasks. Broadcast joins preserve the
      // round-robin partitioning, so the intersect fuses into this
      // full-parallelism stage.
      .repartition(cand.sparkSession.sparkContext.defaultParallelism)
      .join(docArr.select(col("doc_id").as("id_a"), col("ss").as("sa"), col("n").as("na")), "id_a")
      .join(docArr.select(col("doc_id").as("id_b"), col("ss").as("sb"), col("n").as("nb")), "id_b")
      // native count-only set intersection (r18): identical to
      // size(array_intersect(sa, sb)) but never materializes the
      // intersection array — the per-candidate constant this verify
      // pays millions of times when LSH buckets degenerate (hero lane)
      .withColumn("i", expr("inter_count(sa, sb)"))
      .select(passthrough :+
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"): _*)
  }

  def q31Sql: String = {
    s"""WITH sh AS ($shinglesSql),
       |sig AS (SELECT doc_id, $sigSqlExprs FROM sh GROUP BY doc_id),
       |bands AS (SELECT doc_id, s0||s1||s2||s3 AS bk FROM sig
       |  UNION ALL SELECT doc_id, s4||s5||s6||s7 FROM sig),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x JOIN bands y ON x.bk = y.bk AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT id_a, id_b, count(*) AS i FROM cand
       |  JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b AND a.s = b.s
       |  GROUP BY id_a, id_b)
       |SELECT id_a, id_b, CAST(i AS DOUBLE)/(na.n + nb.n - i) AS jaccard
       |FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
       |WHERE CAST(i AS DOUBLE)/(na.n + nb.n - i) >= $MinhashJ""".stripMargin
  }

  /** q32: 16-bit SimHash over word frequencies. Bit j comes from the
    * high bit of hex digit j of md5(word), weighted ±count.
    *
    * Single-aggregation plan: weighting a distinct word by ±cnt equals
    * weighting every occurrence by ±1, so the 16 bit-sums are 16
    * conditional ±1 sums in ONE groupBy(doc_id) straight off the word
    * explode — no 16× row explosion, no (doc_id,word) pre-agg, one
    * map-side-combinable shuffle keyed by doc_id (was 3 aggregations
    * across 2 extra shuffles and 22% of the round-1 bench). */
  def q32Simhash(spark: SparkSession, dir: String): DataFrame = {
    val hiNibble = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .withColumn("h", md5(col("word")))
    val bitSums = (0 until 16).map { j =>
      sum(when(substring(col("h"), j + 1, 1).isin(hiNibble: _*), 1L).otherwise(-1L)).as(s"sv$j")
    }
    val simhash = (0 until 16)
      .map(j => when(col(s"sv$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    words.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhash.cast("long").as("simhash"))
  }

  def q32Sql: String =
    """WITH words AS (
      |  SELECT doc_id, word, count(*) AS cnt FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY doc_id, word),
      |bits AS (
      |  SELECT doc_id, j,
      |    SUM(CASE WHEN substr(md5(word), j+1, 1) IN ('8','9','a','b','c','d','e','f')
      |        THEN cnt ELSE -cnt END) AS sv
      |  FROM words, LATERAL (SELECT unnest(generate_series(0, 15)) AS j) t
      |  GROUP BY doc_id, j)
      |SELECT doc_id, CAST(SUM(CASE WHEN sv >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS simhash
      |FROM bits GROUP BY doc_id""".stripMargin

  /** q33: exact n-gram Jaccard pairs via a rare-shingle inverted index
    * (prefix-filtering flavor: only shingles with global df ≤ $RareDf act
    * as candidate keys, bounding the index join to Σ df² over rare
    * shingles). */
  def q33JaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    // no materialization: the shingle arrays are a shuffle-free scan
    // expression (shingleArrays), so re-deriving them per consumer costs
    // one pruned parquet scan; eager localCheckpoints here measured
    // SLOWER at sf0.1 and would pin the corpus-shingle table at 100 TB
    val sh = shingles(spark, dir)
    val rare = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= RareDf && col("df") >= 2).select("s")
    val idx = sh.join(rare, "s")
    // per-occurrence verify + post-filter distinct (r18) — see
    // q31MinhashPairs: same trade, same pair set
    val cand = idx.as("x").join(idx.as("y"), col("x.s") === col("y.s"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    verifiedJaccard(shingleArrays(spark, dir), cand)
      .filter(col("jaccard") >= JaccardJ).distinct()
  }

  def q33Sql: String =
    s"""WITH sh AS ($shinglesSql),
       |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND $RareDf),
       |idx AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM idx x JOIN idx y ON x.s = y.s AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT id_a, id_b, count(*) AS i FROM cand
       |  JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b AND a.s = b.s
       |  GROUP BY id_a, id_b)
       |SELECT id_a, id_b, CAST(i AS DOUBLE)/(na.n + nb.n - i) AS jaccard
       |FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
       |WHERE CAST(i AS DOUBLE)/(na.n + nb.n - i) >= $JaccardJ""".stripMargin

  /** q34: embedding-cosine near-dup pairs. Blocking: BANDED sign LSH —
    * $SignBands bands of $SignBandBits axis-hyperplane sign bits each; a
    * pair is a candidate when it agrees on ANY full band (the MinHash
    * banding construction transplanted to random-hyperplane bits).
    * Candidates get the exact fixed-point cosine.
    *
    * Scale: each band join is an equi-join on (band, bits) — shuffle
    * keyed by band value, never all-pairs. Recall/bucket-size trade off
    * via the (bands × bits) shape: more bits per band → smaller buckets
    * (sub-quadratic verify), more bands → recall back. The former single
    * 8-bit bucket was both low-recall (0 rows on this corpus) AND
    * quadratic-per-bucket at scale; banding fixes both axes
    * independently. */
  def q34EmbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), Vec.norm2N("embedding").as("n2"))
    val bands = e
      .withColumn("bks", array((0 until SignBands).map(b =>
        Vec.signBand("embedding", b * SignBandBits, SignBandBits)): _*))
      .select(col("vec_id"), posexplode(col("bks")).as(Seq("b", "bk")))
    // per-occurrence verify + post-filter distinct (r18) — see
    // q31MinhashPairs: duplicate multi-band candidates carry identical
    // cosine, so deduping the surviving pairs returns the same rows
    // without exchanging the full candidate table first
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
    cand
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("n2").as("na2")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("eb"), col("n2").as("nb2")), "id_b")
      .select(col("id_a"), col("id_b"),
        Vec.cosineFromParts(Vec.dotN("ea", "eb"), col("na2"), col("nb2")).as("cosine"))
      .filter(col("cosine") >= NearDupCos)
      .distinct()
  }

  /** q58: SimHash hamming-distance near-dup pairs — the pairing half the
    * fingerprint (q32) exists for. The 16-bit fingerprint is banded into
    * $SimhashBands × $SimhashBandBits bit slices; a pair collides when ANY
    * band matches (pigeonhole: hamming ≤ bands−1 ⇒ some band is
    * untouched, so recall is exact for hamming ≤ $SimhashMaxHamming with
    * the default 4×4 split). Verification is `bit_count(xor)` — exact
    * integer arithmetic in both engines.
    *
    * Scale: band join is an equi-join keyed by (band, slice) — never
    * all-pairs; the verify join touches candidates only. */
  def q58SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = q32Simhash(spark, dir)
    // fingerprints ride along in the band table (+8 bytes/row), so the
    // hamming verify happens INSIDE the band join and failed candidates
    // die before the dedup shuffle — no per-doc signature re-join
    val bands = sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until cfg.simhashBands).map(b =>
        shiftright(col("simhash"), b * cfg.simhashBandBits)
          .bitwiseAND(lit((1 << cfg.simhashBandBits) - 1))): _*)).as(Seq("b", "bk")))
    // pin the join parallelism: the band table is tiny in BYTES, so AQE
    // coalesces the self-join to one partition — but with 4-bit band keys
    // the join OUTPUT is bucket-quadratic CPU (measured 5.6 s single-task
    // at sf0.1). An explicit key repartition keeps the bucket work spread;
    // the aligned y side inherits the partition count.
    bands.repartition(spark.sparkContext.defaultParallelism, col("b"), col("bk"))
      .as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= cfg.simhashMaxHamming)
      .distinct()
  }

  def q58Sql: String =
    s"""WITH sig AS (${q32Sql}),
       |bands AS (SELECT doc_id, b,
       |    (simhash >> (b * ${cfg.simhashBandBits})) & ${(1 << cfg.simhashBandBits) - 1} AS bk
       |  FROM sig, LATERAL (SELECT unnest(generate_series(0, ${cfg.simhashBands - 1})) AS b) t),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM cand JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= ${cfg.simhashMaxHamming}""".stripMargin

  /** Near-dup pair edges from BOTH text-space generators in one pass:
    * MinHash-LSH band candidates (verified at ≥ $MinhashJ) ∪ rare-shingle
    * candidates (verified at ≥ $JaccardJ). Each candidate pair is tagged
    * with its generator(s) and exact Jaccard is computed ONCE — half the
    * verify work of running q31 + q33 separately. */
  private[graft] def nearDupEdges(spark: SparkSession, dir: String): DataFrame =
    nearDupEdgesScratch(spark, dir)._1

  /** As [[nearDupEdges]], but also returns the eager corpus-sized
    * shingle-array checkpoint so a caller that materializes the edge
    * list (q57) can release those blocks instead of pinning them for
    * the whole query — under a memory-pressured shared JVM the pinned
    * corpus-sized blocks turn into spill/GC churn. */
  private[graft] def nearDupEdgesScratch(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // one eager materialization of the COMPACT per-doc array table (one
    // row per doc) feeds all six consumers; the exploded row view is a
    // cheap narrow explode over its in-memory blocks, so no consumer
    // re-runs the scan and nothing shuffles to build the shingle set.
    // localCheckpoint, not reliable checkpoint: no fanout-growth here —
    // this is a straight-line DAG, we only want compute-once semantics.
    val arr = graft.Trace("nde.sh")(shingleArrays(spark, dir).localCheckpoint(true))
    val sh = arr.select(col("doc_id"), explode(col("ss")).as("s"))
    val bands = minhashBands(minhashSig(arr))
    val candMh = bands.as("x").join(bands.as("y"), col("x.bk") === col("y.bk"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        lit(true).as("mh"), lit(false).as("rare"))
    val rareSh = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= RareDf && col("df") >= 2).select("s")
    // rareSh is the df-capped shingle list (small by construction); the
    // planner once flipped this join to broadcast the full corpus-sized
    // shingle table instead — pin the build side
    val idx = sh.join(broadcast(rareSh), "s")
    val candRare = idx.as("x").join(idx.as("y"), col("x.s") === col("y.s"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        lit(false).as("mh"), lit(true).as("rare"))
    // per-OCCURRENCE verify (r18, guide §2.4): the old pre-verify
    // groupBy(id_a,id_b) dedup exchanged the FULL candidate table (14.2M
    // rows at the sf1 hero lane, ~6 s) to save re-verifying the ~6% of
    // pairs both generators emit — a bad trade once inter_count made the
    // verify itself cheap. Each union row now verifies independently
    // (the threshold filter was already per-row-correct: an mh row
    // reduces to jaccard ≥ MinhashJ, a rare row to ≥ JaccardJ, and a
    // pair survives iff ANY of its rows does — the same pair set), and
    // the dedup moves AFTER the filter where only true near-dup pairs
    // remain (thousands, not millions).
    val cand = candMh.unionAll(candRare)
    val edges = verifiedJaccard(arr, cand)
      .filter((col("mh") && col("jaccard") >= MinhashJ) ||
              (col("rare") && col("jaccard") >= JaccardJ))
      .select("id_a", "id_b")
      .distinct()
    (edges, arr)
  }

  private def nearDupEdgesSql: String =
    s"""sh AS MATERIALIZED ($shinglesSql),
       |sig AS (SELECT doc_id, $sigSqlExprs FROM sh GROUP BY doc_id),
       |mbands AS (SELECT doc_id, s0||s1||s2||s3 AS bk FROM sig
       |  UNION ALL SELECT doc_id, s4||s5||s6||s7 FROM sig),
       |cand_mh AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM mbands x JOIN mbands y ON x.bk = y.bk AND x.doc_id < y.doc_id),
       |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND $RareDf),
       |idx AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
       |cand_rare AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM idx x JOIN idx y ON x.s = y.s AND x.doc_id < y.doc_id),
       |cand AS (SELECT id_a, id_b,
       |    max(mh) AS mh, max(rare) AS rare FROM (
       |    SELECT id_a, id_b, true AS mh, false AS rare FROM cand_mh
       |    UNION ALL SELECT id_a, id_b, false, true FROM cand_rare)
       |  GROUP BY id_a, id_b),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT id_a, id_b, count(*) AS i FROM cand
       |  JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b AND a.s = b.s
       |  GROUP BY id_a, id_b),
       |jac AS (SELECT id_a, id_b, CAST(i AS DOUBLE)/(na.n + nb.n - i) AS jaccard
       |  FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id),
       |pairs AS MATERIALIZED (SELECT j.id_a, j.id_b
       |  FROM jac j JOIN cand USING (id_a, id_b)
       |  WHERE (cand.mh AND j.jaccard >= $MinhashJ)
       |     OR (cand.rare AND j.jaccard >= $JaccardJ))""".stripMargin

  /** q57: dedup FAMILIES — the step that turns near-dup PAIRS into an
    * actionable dedup verdict [the pipeline analogue of CloudBrush's
    * chain merging, QuickMerge.java:60-400: group related nodes, keep one
    * representative]. Connected components over the union pair graph
    * (min-label propagation with a pointer-jump hop, so label paths halve
    * per round), then a deterministic keeper per family: longest text,
    * ties to the smallest doc_id. Every doc gets a row — singletons are
    * their own keeper — so a pipeline can anti-join `is_dup` in one pass.
    *
    * Scale: near-dup families are small (bounded by how many true
    * near-copies a doc has), so rounds ≈ log(family diameter); each round
    * is two shuffle joins keyed by node id, checkpointed to cut lineage.
    * The keeper choice is two aggregates, never a window over a family. */
  def q57DedupFamilies(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.ensureCheckpointDir(spark)
    // eager checkpoint: the union below references pairs twice, and a lazy
    // pairs would run the whole minhash+rare-shingle verify pipeline once
    // per union arm (it dominated q57's round-3 runtime)
    val (edges, arr) = nearDupEdgesScratch(spark, dir)
    val pairs = graft.Trace("q57.pairs")(edges.localCheckpoint(true))
    // pairs is materialized; the corpus-sized shingle-array checkpoint
    // existed only to build it — release its blocks before the CC loop
    // so they can't become spill/GC pressure across the rounds
    arr.unpersist(false)
    // CC labels now come from the SHARED [[Cc]] kernel (round 10): the
    // historical reason for an inlined copy — fusing the loop with the
    // pair-table checkpoint lifecycle — disappeared once Cc checkpoints
    // (and key-partitions) the symmetrized edge table itself; the
    // delegation also hands q57 (and its dependents q197/q204) the
    // frontier-delta messaging rework for free.
    val lbl = graft.Trace("q57.cc")(
      Cc.labels(pairs.select(col("id_a").as("u"), col("id_b").as("v")), cfg))
    // post-loop, the output needs only the final label table + a docs
    // scan: the pair-list checkpoint fed the rounds and is now dead too
    pairs.unpersist(false)
    val docs = Tables.documents(spark, dir).select("doc_id", "n_chars")
    // fam stays lazy: its two consumers (the keeper aggregate and the
    // final join) each re-run only a docs scan + a broadcast probe of the
    // checkpointed label table — cheaper than an extra eager
    // materialization job per invocation
    val fam = docs.join(lbl.select(col("node").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"), coalesce(col("lbl"), col("doc_id")).as("family_id"))
    // one aggregation for size AND keeper: min over (-n_chars, doc_id)
    // structs is lexicographic, i.e. longest text with ties to the
    // smallest doc_id — replaces the old sz + keeper-filter + two-join
    // cascade (three more derivations of fam, four more shuffles)
    val agg = fam.groupBy("family_id").agg(
      count(lit(1)).as("family_size"),
      min(struct((-col("n_chars")).as("negl"), col("doc_id").as("id"))).as("k"))
    fam.join(agg, "family_id")
      .select(col("doc_id"), col("family_id"), col("k.id").as("keeper_id"),
        col("family_size"), (col("doc_id") =!= col("k.id")).as("is_dup"))
  }

  /** Oracle: exact min-reachable-id via a recursive transitive closure —
    * fine at verification scale, where the pair graph is tiny. */
  def q57Sql: String =
    s"""WITH RECURSIVE
       |$nearDupEdgesSql,
       |und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(u, v) AS (SELECT u, v FROM und
       |  UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u AND e.v <> r.u),
       |lbl AS (SELECT u AS doc_id, least(u, min(v)) AS family_id FROM reach GROUP BY u),
       |fam AS (SELECT d.doc_id, d.n_chars, coalesce(l.family_id, d.doc_id) AS family_id
       |  FROM documents d LEFT JOIN lbl l USING (doc_id)),
       |fsz AS (SELECT family_id, count(*) AS family_size, max(n_chars) AS mx
       |  FROM fam GROUP BY family_id),
       |keeper AS (SELECT f.family_id, min(f.doc_id) AS keeper_id
       |  FROM fam f JOIN fsz USING (family_id) WHERE f.n_chars = fsz.mx
       |  GROUP BY f.family_id)
       |SELECT f.doc_id, f.family_id, k.keeper_id, s.family_size,
       |  f.doc_id <> k.keeper_id AS is_dup
       |FROM fam f JOIN fsz s USING (family_id) JOIN keeper k USING (family_id)""".stripMargin

  /** q296: DECREMENTAL DEDUP FAMILIES — q281's touched-component
    * kernel applied to q57's near-dup family table under a DOC
    * retraction batch (right-to-be-forgotten hitting the DERIVED
    * state — the q249 motivation applied to the dedup artifact): the
    * near-dup pair table and the family labels persist as content-keyed
    * nightly artifacts; retracting the deterministic md5 band ≥
    * ${cfg.docRetractLower} removes those docs and their incident
    * pairs from the ARTIFACT (a retracted doc's influence on other
    * pairs' corpus statistics — rare-shingle df — dissipates at the
    * next full rebuild, the same deliberate measured debt q285 ships).
    * Node deletion only SPLITS families, and every pair lives inside
    * one family — so untouched families (no retracted member) keep
    * their labels verbatim from the artifact, and the shared [[Cc]]
    * kernel re-runs on exactly the touched families' induced surviving
    * pair subgraph (survivors losing every pair re-label as
    * themselves). Keepers/sizes re-derive over surviving docs in q57's
    * one struct-min aggregate; output is q57's contract restricted to
    * survivors.
    *
    * At 100 TB: two lookup joins on the retraction batch, one
    * broadcast restriction of the surviving pairs to the touched
    * families (blast-radius-sized steering state — the q281 shape),
    * and a CC whose input is Σ|touched family| pairs — cost ∝ the
    * retraction wave, never the corpus. Oracle = the full q57
    * recompute on the surviving docs over the artifact's pair set;
    * spec pins untouched-family rows byte-identical and relabeled
    * docs ⊆ touched families. */
  /** The persisted full near-dup pair table + family labels —
    * content-keyed build-if-absent (the knn_cents/truth lifecycle):
    * q296 reads both, q322 reads the labels; a corpus regeneration or
    * a knob change reroutes the key instead of serving stale
    * families. Returns (pairs, labels(doc_id, lbl)). */
  private[graft] def persistedFamilyArtifacts(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    graft.GraftSession.ensureCheckpointDir(spark)
    val ckey = s"k=${cfg.shingleK},rdf=$RareDf,mh=$MinhashJ,j=$JaccardJ"
    val pPath = graft.sources.Scratch.keyedDir("ndpairs_full", dir, spark,
      Seq("documents.parquet"), ckey)
    val lPath = graft.sources.Scratch.keyedDir("famlbl_full", dir, spark,
      Seq("documents.parquet"), ckey)
    val hconf = spark.sparkContext.hadoopConfiguration
    def missing(p: String): Boolean = {
      val s = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
      !s.getFileSystem(hconf).exists(s)
    }
    if (missing(pPath) || missing(lPath)) {
      val (edges, arr) = nearDupEdgesScratch(spark, dir)
      val pairs = graft.Trace("q296.pairs")(edges.localCheckpoint(true))
      arr.unpersist(false)
      pairs.write.mode("overwrite").parquet(pPath)
      Cc.labels(pairs.select(col("id_a").as("u"), col("id_b").as("v")), cfg)
        .write.mode("overwrite").parquet(lPath)
      pairs.unpersist(false)
    }
    (spark.read.parquet(pPath),
      spark.read.parquet(lPath).select(col("node").as("doc_id"), col("lbl")))
  }

  def q296DecrementalFamilies(spark: SparkSession, dir: String): DataFrame = {
    val (pairs, storedLbl) = persistedFamilyArtifacts(spark, dir)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
      .withColumn("b", substring(md5(col("doc_id").cast("string")), 1, 2))
    val surviving = docs.filter(col("b") < cfg.docRetractLower).drop("b")
    val retracted = docs.filter(col("b") >= cfg.docRetractLower).select("doc_id")
    // touched families: the stored label of every retracted doc
    // (absent from the label table = a singleton — its removal leaves
    // no surviving member to relabel)
    val touched = retracted.join(storedLbl, Seq("doc_id"), "left")
      .select(coalesce(col("lbl"), col("doc_id")).as("tfam")).distinct()
    val survFam = surviving.join(storedLbl, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("lbl"), col("doc_id")).as("fam"))
    // induced surviving pair subgraph of the touched families: pairs
    // live within one family, so the id_a side's membership decides;
    // the touched-family list is blast-radius-sized — broadcast
    val touchedDocs = survFam.join(broadcast(touched), col("fam") === col("tfam"))
      .select("doc_id")
    val spairs = pairs
      .join(surviving.select(col("doc_id").as("id_a")), Seq("id_a"))
      .join(surviving.select(col("doc_id").as("id_b")), Seq("id_b"))
    val tpairs = spairs.join(broadcast(touchedDocs.withColumnRenamed("doc_id", "id_a")),
      Seq("id_a"))
    val subLbl = Cc.labels(tpairs.select(col("id_a").as("u"), col("id_b").as("v")), cfg)
    val finalFam = survFam
      .join(broadcast(touched), col("fam") === col("tfam"), "left")
      .join(subLbl.select(col("node").as("doc_id"), col("lbl").as("nl")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        when(col("tfam").isNotNull, coalesce(col("nl"), col("doc_id")))
          .otherwise(col("fam")).as("family_id"))
    val agg = finalFam.groupBy("family_id").agg(
      count(lit(1)).as("family_size"),
      min(struct((-col("n_chars")).as("negl"), col("doc_id").as("id"))).as("k"))
    finalFam.join(agg, "family_id")
      .select(col("doc_id"), col("family_id"), col("k.id").as("keeper_id"),
        col("family_size"), (col("doc_id") =!= col("k.id")).as("is_dup"))
  }

  /** q57's recursive-reachability SQL over the artifact's pair set
    * restricted to SURVIVING docs — the full recompute the decremental
    * merge must equal. */
  def q296Sql: String =
    s"""WITH RECURSIVE
       |$nearDupEdgesSql,
       |surv AS MATERIALIZED (SELECT doc_id, n_chars FROM documents
       |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${cfg.docRetractLower}'),
       |spairs AS MATERIALIZED (SELECT p.id_a, p.id_b FROM pairs p
       |  JOIN surv sa ON sa.doc_id = p.id_a
       |  JOIN surv sb ON sb.doc_id = p.id_b),
       |und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM spairs
       |  UNION SELECT id_b, id_a FROM spairs),
       |reach(u, v) AS (SELECT u, v FROM und
       |  UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u AND e.v <> r.u),
       |lbl AS (SELECT u AS doc_id, least(u, min(v)) AS family_id FROM reach GROUP BY u),
       |fam AS (SELECT d.doc_id, d.n_chars, coalesce(l.family_id, d.doc_id) AS family_id
       |  FROM surv d LEFT JOIN lbl l USING (doc_id)),
       |fsz AS (SELECT family_id, count(*) AS family_size, max(n_chars) AS mx
       |  FROM fam GROUP BY family_id),
       |keeper AS (SELECT f.family_id, min(f.doc_id) AS keeper_id
       |  FROM fam f JOIN fsz USING (family_id) WHERE f.n_chars = fsz.mx
       |  GROUP BY f.family_id)
       |SELECT f.doc_id, f.family_id, k.keeper_id, s.family_size,
       |  f.doc_id <> k.keeper_id AS is_dup
       |FROM fam f JOIN fsz s USING (family_id) JOIN keeper k USING (family_id)""".stripMargin

  /** q322: SOFT DEDUP — duplicate-aware DOWN-WEIGHTING instead of
    * dropping: q57 keeps one doc per near-dup family and discards the
    * rest, but several production recipes keep every copy and divide
    * its training weight by the family size (repetition-aware
    * sampling — the family contributes ONE doc's worth of expected
    * gradient mass however many near-copies exist, without q57's
    * hard choice of which copy). Per doc: the q57 family label (from
    * the persisted [[persistedFamilyArtifacts]] label table —
    * build-if-absent, shared with q296), the family size, the weight
    * 1/family_size in ${cfg.dsirScale}-scale integer fixed point
    * (div-truncated — exact cross-engine, the q320 discipline), and
    * the doc's EFFECTIVE chars n_chars·w — what a token-budget
    * planner (q267) should count this doc as. A singleton keeps
    * weight 1.0; a 4-copy family's members carry 0.25 each.
    *
    * Scale: one artifact read + the q57 size aggregate + a label
    * join — no pair or shingle work at serve time; the heavy lifting
    * lives in the nightly artifact exactly like q296/q204. */
  def q322SoftDedup(spark: SparkSession, dir: String): DataFrame = {
    val S = cfg.dsirScale
    val (_, storedLbl) = persistedFamilyArtifacts(spark, dir)
    val docs = Tables.documents(spark, dir).select("doc_id", "n_chars")
    val fam = docs.join(storedLbl, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("lbl"), col("doc_id")).as("family_id"))
    val sz = fam.groupBy("family_id").agg(count(lit(1)).as("family_size"))
    fam.join(sz, "family_id")
      .withColumn("w_micro", expr(s"$S div family_size"))
      .select(col("doc_id"), col("family_id"), col("family_size"),
        col("w_micro"), (col("n_chars") * col("w_micro")).as("eff_chars_micro"))
  }

  /** q57's reachability chain, ending at the weight projection. */
  def q322Sql: String =
    s"""WITH RECURSIVE
       |$nearDupEdgesSql,
       |und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(u, v) AS (SELECT u, v FROM und
       |  UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u AND e.v <> r.u),
       |lbl AS (SELECT u AS doc_id, least(u, min(v)) AS family_id FROM reach GROUP BY u),
       |fam AS (SELECT d.doc_id, d.n_chars, coalesce(l.family_id, d.doc_id) AS family_id
       |  FROM documents d LEFT JOIN lbl l USING (doc_id)),
       |fsz AS (SELECT family_id, CAST(count(*) AS BIGINT) AS family_size
       |  FROM fam GROUP BY family_id)
       |SELECT f.doc_id, f.family_id, s.family_size,
       |  ${cfg.dsirScale} // s.family_size AS w_micro,
       |  f.n_chars * (${cfg.dsirScale} // s.family_size) AS eff_chars_micro
       |FROM fam f JOIN fsz s USING (family_id)""".stripMargin

  /** q197: FAMILY-CONSISTENT train/val/test split — the leakage-proof
    * splitter: q68's content-stable md5 split hashes the DOC id, so two
    * near-duplicates can land on opposite sides of the train/eval
    * fence — exactly the leakage q74 detects after the fact. Here the
    * split hashes the q57 FAMILY id (the connected-component label of
    * the near-dup union graph) with the same hex-bound rule, so an
    * entire family moves as one unit and cross-split near-dup leakage
    * is IMPOSSIBLE by construction, not audited after. Each doc also
    * reports the naive per-doc split and a `moved` flag — the measured
    * count of docs this protection actually relocated (the honesty
    * eval: a splitter that never moves anything wasn't needed).
    * Deterministic and re-run-stable like q68/q75: membership depends
    * only on content-derived family labels. Scale: q57's label table
    * plus two codegen'd hash projections — nothing new shuffles. */
  def q197FamilySplit(spark: SparkSession, dir: String): DataFrame = {
    def splitOf(c: Column): Column = {
      val b = substring(md5(c.cast("string")), 1, 2)
      when(b < cfg.splitTrainUpper, "train")
        .when(b < cfg.splitValUpper, "val").otherwise("test")
    }
    q57DedupFamilies(spark, dir)
      .select(col("doc_id"), col("family_id"))
      .withColumn("split", splitOf(col("family_id")))
      .withColumn("naive_split", splitOf(col("doc_id")))
      .withColumn("moved", col("split") =!= col("naive_split"))
  }

  def q197Sql: String = {
    def splitOf(c: String): String =
      s"""CASE WHEN substr(md5($c::VARCHAR), 1, 2) < '${cfg.splitTrainUpper}' THEN 'train'
         |  WHEN substr(md5($c::VARCHAR), 1, 2) < '${cfg.splitValUpper}' THEN 'val'
         |  ELSE 'test' END""".stripMargin
    s"""WITH RECURSIVE
       |$nearDupEdgesSql,
       |und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(u, v) AS (SELECT u, v FROM und
       |  UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u AND e.v <> r.u),
       |lbl AS (SELECT u AS doc_id, least(u, min(v)) AS family_id FROM reach GROUP BY u),
       |fam AS (SELECT d.doc_id, coalesce(l.family_id, d.doc_id) AS family_id
       |  FROM documents d LEFT JOIN lbl l USING (doc_id))
       |SELECT doc_id, family_id,
       |  ${splitOf("family_id")} AS split,
       |  ${splitOf("doc_id")} AS naive_split,
       |  ${splitOf("family_id")} <> ${splitOf("doc_id")} AS moved
       |FROM fam""".stripMargin
  }

  /** q204: q197's family-consistent split against a PERSISTED family
    * table — the incremental-discipline variant (q133/q186/q188's
    * pattern applied to the splitter): the q57 family labels are
    * computed ONCE, laid out via [[graft.sources.Tables.writeBucketed]]
    * on the doc key, and the ARRIVING delta batch (a deterministic
    * doc_id slice standing in for today's crawl) joins that bucketed
    * table EXCHANGE-FREE on the family side — at 100 TB the expensive
    * near-dup clustering is a nightly build, and routing each new batch
    * to the right split is a bucket-local lookup, not a corpus
    * re-cluster. Docs absent from the table (genuinely new content)
    * are their own singleton family — same split either way, moved =
    * false by construction there. Output is exactly q197's schema
    * restricted to the delta (persistence through the layout is
    * semantics-free — q186's point). The merge hint pins the at-scale
    * join shape; at test sf the planner would broadcast the delta and
    * bypass the bucketed scan. */
  def q204FamilySplitPersisted(spark: SparkSession, dir: String): DataFrame = {
    def splitOf(c: Column): Column = {
      val b = substring(md5(c.cast("string")), 1, 2)
      when(b < cfg.splitTrainUpper, "train")
        .when(b < cfg.splitValUpper, "val").otherwise("test")
    }
    val fams = q57DedupFamilies(spark, dir).select("doc_id", "family_id")
    // the warehouse LOCATION outlives the session-local metastore (the
    // q186 scrub discipline)
    spark.sql("DROP TABLE IF EXISTS graft_q204_families")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_q204_families")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    graft.sources.Tables.writeBucketed(fams, "graft_q204_families", "doc_id", buckets = 8)
    val famT = spark.table("graft_q204_families")
      .select(col("doc_id").as("f_doc"), col("family_id"))
    val delta = Tables.documents(spark, dir)
      .filter(col("doc_id") % cfg.deltaBatchMod === cfg.deltaBatchRem)
      .select("doc_id")
    famT.hint("merge")
      .join(delta, col("f_doc") === col("doc_id"), "right_outer")
      .select(col("doc_id"),
        coalesce(col("family_id"), col("doc_id")).as("family_id"))
      .withColumn("split", splitOf(col("family_id")))
      .withColumn("naive_split", splitOf(col("doc_id")))
      .withColumn("moved", col("split") =!= col("naive_split"))
  }

  def q204Sql: String = {
    def splitOf(c: String): String =
      s"""CASE WHEN substr(md5($c::VARCHAR), 1, 2) < '${cfg.splitTrainUpper}' THEN 'train'
         |  WHEN substr(md5($c::VARCHAR), 1, 2) < '${cfg.splitValUpper}' THEN 'val'
         |  ELSE 'test' END""".stripMargin
    s"""WITH RECURSIVE
       |$nearDupEdgesSql,
       |und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(u, v) AS (SELECT u, v FROM und
       |  UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u AND e.v <> r.u),
       |lbl AS (SELECT u AS doc_id, least(u, min(v)) AS family_id FROM reach GROUP BY u),
       |delta AS (SELECT doc_id FROM documents
       |  WHERE doc_id % ${cfg.deltaBatchMod} = ${cfg.deltaBatchRem}),
       |fam AS (SELECT d.doc_id, coalesce(l.family_id, d.doc_id) AS family_id
       |  FROM delta d LEFT JOIN lbl l USING (doc_id))
       |SELECT doc_id, family_id,
       |  ${splitOf("family_id")} AS split,
       |  ${splitOf("doc_id")} AS naive_split,
       |  ${splitOf("family_id")} <> ${splitOf("doc_id")} AS moved
       |FROM fam""".stripMargin
  }

  def q34Sql: String = {
    val bandArms = (0 until SignBands).map(b =>
      s"SELECT vec_id, $b AS b, ${Vec.signBandSqlDuck("embedding", b * SignBandBits, SignBandBits)} AS bk FROM e")
      .mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |bands AS (
       |  $bandArms),
       |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk AND x.vec_id < y.vec_id),
       |pairs AS (SELECT id_a, id_b, a.embedding AS ea, b.embedding AS eb
       |  FROM cand JOIN e a ON a.vec_id = id_a JOIN e b ON b.vec_id = id_b),
       |ex AS (SELECT id_a, id_b, unnest(ea) AS xa, unnest(eb) AS xb FROM pairs),
       |dots AS (SELECT id_a, id_b,
       |    ${Vec.dotDecSqlDuck("xa", "xb")} AS dot,
       |    ${Vec.dotDecSqlDuck("xa", "xa")} AS na,
       |    ${Vec.dotDecSqlDuck("xb", "xb")} AS nb
       |  FROM ex GROUP BY id_a, id_b)
       |SELECT id_a, id_b, CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cosine
       |FROM dots
       |WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos""".stripMargin
  }

  private val TNum: Int = cfg.simJoinTNum
  private val TDen: Int = cfg.simJoinTDen
  private val SimW: Int = cfg.simJoinWords

  /** Distinct word $SimW-grams per doc, one row per (doc, gram) — the
    * TOKEN-level similarity unit of the PPJoin literature, and the
    * measured reason q131 uses words, not the char shingles of
    * q30-q33: char-$ShingleK-grams over a small vocabulary are shared
    * by everything (median df ≈ 291 at sf0.1 → 6.5M prefix candidates
    * for 256 true pairs, and the positional filter recovers only 30%),
    * while word $SimW-grams are near-unique (median df = 1 → candidates
    * EQUAL the true pairs). Discriminative units are what makes prefix
    * filtering effective; hashing can't fix an undiscriminative
    * tokenization. */
  private[graft] def wordGrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= SimW)
      .withColumn("g", explode(sequence(lit(1), size(col("ws")) - (SimW - 1))))
      .select(col("doc_id"), concat_ws(" ", slice(col("ws"), col("g"), lit(SimW))).as("s"))
      .distinct()

  /** In-row per-doc distinct word-gram ARRAY (the verification view of
    * [[wordGrams]]): built with transform/array_distinct HOFs — they
    * run interpreted, but a doc's gram count is its token count, so
    * the row-local cost is trivial next to the join it feeds. */
  /** Per-doc distinct gram arrays. `only` prunes the doc side to a
    * given id set BEFORE the gram-array transform runs (broadcast
    * semi-join on the raw (doc_id, text) projection), so a
    * candidate-sized verify pays candidate-sized array building — not
    * a corpus-wide transform (the round-16 advice on q335's per-batch
    * cost). */
  private def wordGramArrays(spark: SparkSession, dir: String,
      only: Option[DataFrame] = None): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val pruned = only.fold(base)(ids =>
      base.join(broadcast(ids.select("doc_id").distinct()), Seq("doc_id"), "left_semi"))
    pruned
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= SimW)
      .select(col("doc_id"), expr(
        s"""array_distinct(transform(
           |  sequence(1, size(ws) - ${SimW - 1}),
           |  g -> concat_ws(' ', slice(ws, g, $SimW))))""".stripMargin).as("ss"))
  }

  private def wordGramsSql: String =
    s"""SELECT DISTINCT doc_id, array_to_string(ws[g:g+${SimW - 1}], ' ') AS s
       |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |  LATERAL (SELECT unnest(generate_series(1, len(ws)-${SimW - 1})) AS g) t
       |WHERE len(ws) >= $SimW""".stripMargin

  /** q131: COMPLETE exact Jaccard similarity self-join at threshold
    * t = $TNum/$TDen over word-$SimW-gram sets, via df-ordered prefix
    * filtering (the PPJoin family, Xiao et al.) — unlike q31 (LSH,
    * probabilistic recall) and q33 (rare-shingle index, drops pairs
    * with no rare shingle), this finds EVERY pair with J ≥ t: a pair
    * at J ≥ t must share one of each doc's first n − ⌈t·n⌉ + 1 grams
    * under ANY global gram order, so only those prefixes are indexed.
    * The global order is ascending document frequency (ties by gram
    * text): prefixes hold each doc's RAREST grams, which is what keeps
    * the index join's per-key fanout small at scale — the frequent
    * grams that would create quadratic buckets are exactly the ones
    * the order pushes out of every prefix. A size filter
    * ($TNum·max ≤ $TDen·min) prunes incompatible-length pairs inside
    * the candidate join, and the threshold test is the integer
    * cross-multiply $TDen·|A∩B| ≥ $TNum·|A∪B| — no float at the
    * decision boundary.
    *
    * Scale: df is a map-combinable aggregate joined back 1:1 (unique
    * per gram); the prefix rank is a per-DOC window (bounded by doc
    * length, never a hot corpus key); candidates are an equi-join on
    * prefix grams. The completeness proof is pinned by DedupSpec
    * against the naive all-shared-gram join. */
  def q131SimJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val sh = wordGrams(spark, dir)
    val df = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val ranked = sh.join(df, "s")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    // prefix length: n − ⌈t·n⌉ + 1, integer form ⌈t·n⌉ = (TNum·n + TDen − 1) div TDen
    val prefix = ranked
      .filter(col("rk") <= col("n") - expr(s"(${TNum} * n + ${TDen - 1}) div $TDen") + 1)
      .select(col("s"), col("doc_id"), col("n"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id") &&
        lit(TNum) * greatest(col("x.n"), col("y.n")) <= lit(TDen) * least(col("x.n"), col("y.n")))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val docArr = wordGramArrays(spark, dir)
      .select(col("doc_id"), col("ss"), size(col("ss")).cast("long").as("n"))
    cand
      .repartition(cand.sparkSession.sparkContext.defaultParallelism)
      .join(docArr.select(col("doc_id").as("id_a"), col("ss").as("sa"), col("n").as("na")), "id_a")
      .join(docArr.select(col("doc_id").as("id_b"), col("ss").as("sb"), col("n").as("nb")), "id_b")
      // native count-only set intersection (r18): identical to
      // size(array_intersect(sa, sb)) but never materializes the
      // intersection array — the per-candidate constant this verify
      // pays millions of times when LSH buckets degenerate (hero lane)
      .withColumn("i", expr("inter_count(sa, sb)"))
      .filter(lit(TDen.toLong) * col("i") >= lit(TNum.toLong) * (col("na") + col("nb") - col("i")))
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
  }

  /** q324: CONTAINMENT JOIN — the DIRECTIONAL sibling of q131's
    * symmetric Jaccard join: find every ordered pair where doc A is
    * (near-)CONTAINED in doc B, c(A→B) = |A∩B|/|A| ≥
    * ${cfg.contTNum}/${cfg.contTDen} over word-$SimW-gram sets. This
    * is the quote/excerpt detector near-dup dedup cannot see: a short
    * doc quoted whole inside a long one has LOW Jaccard (the union is
    * dominated by the container) but containment ≈ 1 — exactly the
    * "training doc embedded in another training doc" and "eval set
    * quoted inside a crawl page" cases a contamination pipeline must
    * catch (q67/q74 find shared n-grams; this one decides
    * near-complete inclusion).
    *
    * Prefix-filter theory, asymmetric form: |A∩B| ≥ ⌈t·n_A⌉ forces
    * A's prefix of size n_A − ⌈t·n_A⌉ + 1 (under ANY global gram
    * order) to intersect B — note B contributes ALL its grams, not
    * just a prefix, which is what makes the join directional. The
    * global order is q131's df-ascending one, so the indexed prefixes
    * hold each doc's RAREST grams and the per-key fanout of the
    * candidate join stays small; a size filter (${cfg.contTDen}·n_B ≥
    * ${cfg.contTNum}·n_A — a container can't be shorter than the
    * quoted mass) prunes inside the join. Verify is the exact integer
    * cross-multiply ${cfg.contTDen}·|A∩B| ≥ ${cfg.contTNum}·n_A — no
    * float at the boundary. Completeness is the same theorem as q131
    * (spec-pinned against the naive all-shared-gram join).
    *
    * Scale: identical bones to q131 — df map-combinable, per-DOC
    * prefix window, candidates an equi-join of rare prefix grams
    * against the gram table; at 100 TB the gram side is the persisted
    * inverted index (q102) and the probe is prefix-sized. */
  def q324ContainmentJoin(spark: SparkSession, dir: String): DataFrame =
    persistedContainmentPairs(spark, dir)

  /** The containment pair table as a content-keyed build-if-absent
    * artifact (the knn_cents/famlbl lifecycle): q324 serves it, q329
    * consumes it — without this, q329 re-paid the whole prefix-filter
    * join inline (measured 5.2 s at sf0.1 vs q324's 3.9 — the q291
    * disease, cured the same way). The oracle rebuilds the pairs from
    * scratch every Verify round, re-proving artifact ≡ recompute. */
  private[graft] def persistedContainmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Scratch.keyedDir("contain_pairs", dir, spark,
      Seq("documents.parquet"), s"w=$SimW,t=${cfg.contTNum}/${cfg.contTDen}")
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      containmentJoinFresh(spark, dir).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  private[graft] def containmentJoinFresh(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val CNum = cfg.contTNum
    val CDen = cfg.contTDen
    val sh = wordGrams(spark, dir)
    val df = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val ranked = sh.join(df, "s")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val prefix = ranked
      .filter(col("rk") <= col("n") - expr(s"($CNum * n + ${CDen - 1}) div $CDen") + 1)
      .select(col("s"), col("doc_id").as("src_id"), col("n").as("nsrc"))
    val grams = ranked.select(col("s"), col("doc_id").as("dst_id"), col("n").as("ndst"))
    val cand = prefix.join(grams,
        prefix("s") === grams("s") && col("src_id") =!= col("dst_id") &&
        lit(CDen) * col("ndst") >= lit(CNum) * col("nsrc"))
      .select("src_id", "dst_id")
      .distinct()
    containmentVerify(spark, dir, cand)
  }

  /** The exact-verification tail shared by the full rebuild and the
    * delta absorption (q332): candidates → in-row gram-set intersect →
    * integer cross-multiply threshold → containment fraction. */
  private def containmentVerify(spark: SparkSession, dir: String,
      cand0: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val CNum = cfg.contTNum
    val CDen = cfg.contTDen
    // stage the candidates once: the endpoint id set below re-reads
    // them, and candidate generation must not run twice
    val cand = graft.Ck.lazyStage(cand0, cfg)
    val ends = cand.select(col("src_id").as("doc_id"))
      .unionByName(cand.select(col("dst_id").as("doc_id")))
    val docArr = wordGramArrays(spark, dir, Some(ends))
      .select(col("doc_id"), col("ss"), size(col("ss")).cast("long").as("n"))
    cand
      .repartition(cand.sparkSession.sparkContext.defaultParallelism)
      .join(docArr.select(col("doc_id").as("src_id"), col("ss").as("sa"), col("n").as("na")), "src_id")
      .join(docArr.select(col("doc_id").as("dst_id"), col("ss").as("sb")), "dst_id")
      // native count-only set intersection (r18): identical to
      // size(array_intersect(sa, sb)) but never materializes the
      // intersection array — the per-candidate constant this verify
      // pays millions of times when LSH buckets degenerate (hero lane)
      .withColumn("i", expr("inter_count(sa, sb)"))
      .filter(lit(CDen.toLong) * col("i") >= lit(CNum.toLong) * col("na"))
      .select(col("src_id"), col("dst_id"),
        (col("i").cast("double") / col("na")).as("containment"))
  }

  /** Oracle: the naive complete directional join — every ordered pair
    * sharing ≥1 gram, exact containment, integer threshold. */
  def q324Sql: String =
    s"""WITH sh AS ($wordGramsSql),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS src_id, b.doc_id AS dst_id, count(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT src_id, dst_id, CAST(i AS DOUBLE)/na.n AS containment
       |FROM inter JOIN sz na ON src_id = na.doc_id
       |WHERE ${cfg.contTDen}*i >= ${cfg.contTNum}*na.n""".stripMargin

  /** q329: QUOTE SCRUB — the doc-level consumer of q324's pair table
    * (the q57→q13 relationship on the containment axis): a doc is a
    * QUOTE when it is near-contained in a STRICTLY LARGER doc (more
    * word-grams), or in an equal-sized doc with a lower id — the
    * deterministic keeper rule for mutual containment, which at
    * gram-set equality is exact duplication. Every doc ships with its
    * verdict and the count of qualifying containers, so the scrub is
    * reviewable (which docs die, and how redundantly) before anything
    * is dropped — keeping the container and dropping the quote is the
    * asymmetric keeper policy Jaccard-family dedup cannot express,
    * because it never knows which side subsumes which.
    *
    * Scale: q324's pair table + one gram-count aggregate + a
    * broadcast-sized pair join; the per-doc verdict is one grouped
    * count and a left join back onto the corpus. */
  def q329QuoteScrub(spark: SparkSession, dir: String): DataFrame = {
    val sz = wordGrams(spark, dir).groupBy("doc_id").agg(count(lit(1)).as("n"))
    val quotes = q324ContainmentJoin(spark, dir)
      .join(sz.select(col("doc_id").as("src_id"), col("n").as("ns")), "src_id")
      .join(sz.select(col("doc_id").as("dst_id"), col("n").as("nd")), "dst_id")
      .filter(col("nd") > col("ns") ||
        (col("nd") === col("ns") && col("dst_id") < col("src_id")))
      .groupBy(col("src_id").as("doc_id"))
      .agg(count(lit(1)).as("n_containers"))
    Tables.documents(spark, dir).select("doc_id")
      .join(quotes, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_containers"), lit(0L)).as("n_containers"),
        col("n_containers").isNotNull.as("is_quote"))
  }

  def q329Sql: String =
    s"""WITH sh AS ($wordGramsSql),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS src_id, b.doc_id AS dst_id, count(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2),
       |cont AS (SELECT src_id, dst_id FROM inter
       |  JOIN sz na ON src_id = na.doc_id
       |  WHERE ${cfg.contTDen}*i >= ${cfg.contTNum}*na.n),
       |q AS (SELECT c.src_id AS doc_id, CAST(count(*) AS BIGINT) AS n_containers
       |  FROM cont c
       |  JOIN sz ns ON ns.doc_id = c.src_id
       |  JOIN sz nd ON nd.doc_id = c.dst_id
       |  WHERE nd.n > ns.n OR (nd.n = ns.n AND c.dst_id < c.src_id)
       |  GROUP BY c.src_id)
       |SELECT d.doc_id, coalesce(q.n_containers, 0) AS n_containers,
       |  q.n_containers IS NOT NULL AS is_quote
       |FROM documents d LEFT JOIN q USING (doc_id)""".stripMargin

  /** The nightly BASE-SPLIT containment state (three content-keyed
    * build-if-absent artifacts, the knnd_cents lifecycle on the text
    * axis): the base gram DF table (the global prefix order), the base
    * gram index with per-gram prefix membership under that order, and
    * the verified base→base pair table. [[q332ContainmentDelta]]
    * absorbs an arriving delta against these without touching the
    * base-side work. */
  private[graft] def containmentBaseArtifacts(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val CNum = cfg.contTNum
    val CDen = cfg.contTDen
    val key = s"w=$SimW,t=$CNum/$CDen,u=${cfg.splitTrainUpper}"
    def pathOf(tag: String) = graft.sources.Scratch.keyedDir(tag, dir, spark,
      Seq("documents.parquet"), key)
    val (dfP, idxP, prP) = (pathOf("cont_base_df"), pathOf("cont_base_idx"),
      pathOf("cont_base_pairs"))
    val hconf = spark.sparkContext.hadoopConfiguration
    def missing(p: String): Boolean = {
      val s = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
      !s.getFileSystem(hconf).exists(s)
    }
    if (missing(dfP) || missing(idxP) || missing(prP)) {
      val bsh = wordGrams(spark, dir)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < cfg.splitTrainUpper)
      bsh.groupBy("s").agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(dfP)
      val bdf = spark.read.parquet(dfP)
      val ranked = bsh.join(bdf, "s")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      ranked.select(col("s"), col("doc_id"), col("n"),
          (col("rk") <= col("n") - expr(s"($CNum * n + ${CDen - 1}) div $CDen") + 1).as("pfx"))
        .write.mode("overwrite").parquet(idxP)
      val idx = spark.read.parquet(idxP)
      val prefix = idx.filter(col("pfx"))
        .select(col("s"), col("doc_id").as("src_id"), col("n").as("nsrc"))
      val grams = idx.select(col("s"), col("doc_id").as("dst_id"), col("n").as("ndst"))
      val cand = prefix.join(grams,
          prefix("s") === grams("s") && col("src_id") =!= col("dst_id") &&
          lit(CDen) * col("ndst") >= lit(CNum) * col("nsrc"))
        .select("src_id", "dst_id")
        .distinct()
      containmentVerify(spark, dir, cand).write.mode("overwrite").parquet(prP)
    }
    (spark.read.parquet(dfP), spark.read.parquet(idxP), spark.read.parquet(prP))
  }

  /** q332: INCREMENTAL CONTAINMENT MAINTENANCE — the q285/q133 delta
    * discipline applied to q324's axis (and the reference's own
    * incremental-preprocess story: GenNonContainedReads runs per
    * ingest [GenNonContainedReads.java]): the corpus splits into the
    * md5-band BASE (its DF order, prefix index, and verified pair
    * table persist as nightly artifacts) and an arriving DELTA, and
    * the delta is absorbed with DELTA-SIZED work: (a) each new doc
    * ranks its grams under the PERSISTED base DF order (unseen grams
    * df 0 — rarest-first, still a total order, which is all the
    * prefix-filter theorem needs) and its prefix probes the base
    * index ∪ the delta grams; (b) the PERSISTED base prefixes probe
    * the new docs' grams for the reverse direction (old doc quoted
    * inside a new one). Both candidate sets end at the same exact
    * integer verify, so the absorbed table EQUALS the full rebuild
    * row for row — the oracle rebuilds naively from scratch and the
    * hash gate proves artifact+delta ≡ rebuild every round. The df
    * staleness (new docs shift gram frequencies) affects only
    * candidate COUNT, never the verified pairs: order changes move
    * grams between prefixes, the verify is order-free.
    *
    * Scale: the nightly cost is probes(delta prefixes) +
    * probes(base prefixes ∩ delta grams) + |delta candidates| exact
    * verifies — work ∝ the night's batch, never the base corpus; the
    * base pair table is read, not rebuilt. At 100 TB the base index
    * is the persisted inverted index a crawl pipeline already
    * maintains. */
  def q332ContainmentDelta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val CNum = cfg.contTNum
    val CDen = cfg.contTDen
    val (bdf, bidx, bpairs) = containmentBaseArtifacts(spark, dir)
    val dsh = wordGrams(spark, dir)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) >= cfg.splitTrainUpper)
    val dn = dsh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // ONE delta-sized lazy cut carrying the pfx flag (r18): dGrams was
    // referenced three times (prefix ranking, both probe directions),
    // each re-running the delta gram explode; and the two probe
    // directions were two separate scans of the corpus-sized base
    // index. The fused probe below scans bidx ONCE with the broadcast
    // delta carrying both roles (the q335 shape): role A = delta
    // prefix × base gram, role B = base prefix × delta gram; ordered
    // pairs cannot collide across roles, delta-internal pairs come
    // from the batch-local join. The delta side is the bounded
    // nightly batch — the same broadcast-sized contract as the probe
    // tables everywhere else in this file.
    val dAll = graft.Ck.lazyStage(
      dsh.join(dn, "doc_id").join(bdf, Seq("s"), "left")
        .withColumn("df", coalesce(col("df"), lit(0L)))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
        .select(col("s"), col("doc_id"), col("n"),
          (col("rk") <= col("n") - expr(s"($CNum * n + ${CDen - 1}) div $CDen") + 1)
            .as("pfx")), cfg)
    val db = dAll.select(col("s"), col("doc_id").as("d_id"),
      col("n").as("dn"), col("pfx").as("d_pfx"))
    val bs = bidx.select(col("s"), col("doc_id"), col("n"), col("pfx"))
    val j = bs.join(broadcast(db), bs("s") === db("s") && (col("d_pfx") || col("pfx")))
    val roleA = when(col("d_pfx") && lit(CDen) * col("n") >= lit(CNum) * col("dn"),
      struct(col("d_id").as("src_id"), col("doc_id").as("dst_id")))
    val roleB = when(col("pfx") && lit(CDen) * col("dn") >= lit(CNum) * col("n"),
      struct(col("doc_id").as("src_id"), col("d_id").as("dst_id")))
    val candStore = j
      .select(explode(filter(array(roleA, roleB), x => x.isNotNull)).as("p"))
      .select(col("p.src_id").as("src_id"), col("p.dst_id").as("dst_id"))
    val dSrc = dAll.filter(col("pfx"))
      .select(col("s"), col("doc_id").as("src_id"), col("n").as("nsrc"))
    val dDst = dAll.select(col("s"), col("doc_id").as("dst_id"), col("n").as("ndst"))
    val candDelta = dSrc.join(dDst,
        dSrc("s") === dDst("s") && col("src_id") =!= col("dst_id") &&
        lit(CDen) * col("ndst") >= lit(CNum) * col("nsrc"))
      .select("src_id", "dst_id")
    bpairs.unionByName(
      containmentVerify(spark, dir, candStore.unionByName(candDelta).distinct()))
  }

  /** Oracle: the naive full rebuild — q324's complete directional
    * join over the WHOLE corpus; passing the hash gate proves the
    * incremental absorption ≡ a from-scratch rebuild. */
  def q332Sql: String = q324Sql

  /** q340: CONTAINMENT RETRACTION — the q296 retraction discipline on
    * the containment axis, closing the text axis's add/delete
    * symmetry (q332 absorbs arrivals; THIS retires departures — the
    * takedown/right-to-be-forgotten wave every production corpus
    * eventually processes): containment is a PAIRWISE metric, so
    * unlike q296's families nothing relabels — the persisted pair
    * table restricts to surviving endpoints by a pure filter — but
    * the q329 VERDICTS genuinely flip: a doc that was a quote only
    * because of a now-retracted container RESURRECTS (its scrub
    * decision reverses), and the row carries that flip explicitly so
    * the re-admission wave is auditable before any doc is restored.
    * Output per surviving doc: the post-retraction container count,
    * verdict, and the resurrected flag (was a quote under the full
    * corpus, clean among survivors).
    *
    * Scale: one persisted-pair-table read + two pair-table-sized
    * filters + grouped counts — cost ∝ the pair table (near-dup
    * structure), never the corpus; the retraction band is the same
    * md5 rule as q296 so the two axes retract the same docs. */
  def q340ContainmentRetract(spark: SparkSession, dir: String): DataFrame = {
    val sz = wordGrams(spark, dir).groupBy("doc_id").agg(count(lit(1)).as("n"))
    // q329's keeper rule over the persisted full pair table
    val qualified = persistedContainmentPairs(spark, dir)
      .join(sz.select(col("doc_id").as("src_id"), col("n").as("ns")), "src_id")
      .join(sz.select(col("doc_id").as("dst_id"), col("n").as("nd")), "dst_id")
      .filter(col("nd") > col("ns") ||
        (col("nd") === col("ns") && col("dst_id") < col("src_id")))
      .select("src_id", "dst_id")
    val docs = Tables.documents(spark, dir).select("doc_id")
      .withColumn("b", substring(md5(col("doc_id").cast("string")), 1, 2))
    val surv = docs.filter(col("b") < cfg.docRetractLower).drop("b")
    val qold = qualified.groupBy(col("src_id").as("doc_id"))
      .agg(count(lit(1)).as("n_old"))
    val qnew = qualified
      .join(surv.select(col("doc_id").as("src_id")), "src_id")
      .join(surv.select(col("doc_id").as("dst_id")), "dst_id")
      .groupBy(col("src_id").as("doc_id"))
      .agg(count(lit(1)).as("n_containers"))
    surv.join(qnew, Seq("doc_id"), "left").join(qold, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_containers"), lit(0L)).as("n_containers"),
        col("n_containers").isNotNull.as("is_quote"),
        (col("n_old").isNotNull && col("n_containers").isNull).as("resurrected"))
  }

  /** Oracle: the naive complete chain computed TWICE — once over the
    * full corpus (the pre-retraction verdicts), once restricted to
    * survivors — joined on the surviving docs. */
  def q340Sql: String =
    s"""WITH $quoteFlagCtes,
       |qual AS (SELECT c.src_id, c.dst_id FROM gcont c
       |  JOIN gsz ns ON ns.doc_id = c.src_id
       |  JOIN gsz nd ON nd.doc_id = c.dst_id
       |  WHERE nd.n > ns.n OR (nd.n = ns.n AND c.dst_id < c.src_id)),
       |surv AS (SELECT doc_id FROM documents
       |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${cfg.docRetractLower}'),
       |qold AS (SELECT src_id AS doc_id, CAST(count(*) AS BIGINT) AS n FROM qual GROUP BY 1),
       |qnew AS (SELECT q.src_id AS doc_id, CAST(count(*) AS BIGINT) AS n FROM qual q
       |  JOIN surv sa ON sa.doc_id = q.src_id
       |  JOIN surv sb ON sb.doc_id = q.dst_id
       |  GROUP BY 1)
       |SELECT s.doc_id, coalesce(qn.n, 0) AS n_containers,
       |  qn.n IS NOT NULL AS is_quote,
       |  (qo.n IS NOT NULL AND qn.n IS NULL) AS resurrected
       |FROM surv s
       |LEFT JOIN qnew qn ON qn.doc_id = s.doc_id
       |LEFT JOIN qold qo ON qo.doc_id = s.doc_id""".stripMargin

  /** q350: STREAMING RETRACTION for the text axis — q340's verdict
    * flips as a LIVE FEED (the q343 twin discipline applied to
    * containment, closing the delete-axis asymmetry the round-16
    * verdict named: deletes streamed for vectors but text retraction
    * was batch-only): takedown ids land as files in two waves;
    * `foreachBatch` appends the batch to the RETRACTION LEDGER and
    * RESTRICTS the versioned qualified-pair state — one anti-join per
    * endpoint against the (broadcast-tiny) batch ids, written as the
    * next immutable pair-state version (the q300 CoW discipline on
    * the pair table) — and emits the batch's FLIP ROWS to an audit
    * sink: docs whose last container died THIS batch (their q329
    * scrub verdict just reversed, the re-admission wave an operator
    * reviews). The drain then computes q340's exact row shape from
    * the final state + the accumulated ledger, so the drain equals
    * batch q340 row for row and the SAME two-pass oracle gates both;
    * DedupSpec additionally pins union(per-batch flips) ∖ ledger ≡
    * the final resurrected set — the audit trail reconciles with the
    * end state.
    *
    * Scale: per batch the work is two anti-joins + two grouped counts
    * over the CURRENT pair state (∝ near-dup structure, never the
    * corpus — exactly q340's bound paid incrementally) + a batch-
    * sized ledger append; state versions are immutable parquet.
    * Run-unique scratch (the q325 rule), dropped after the drain. */
  def q350StreamRetract(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val run = java.util.UUID.randomUUID.toString.take(8)
    val landing = graft.sources.Scratch.dir(s"sretr_${run}_landing", dir)
    val ckpt = graft.sources.Scratch.dir(s"sretr_${run}_ckpt", dir)
    val stateRoot = graft.sources.Scratch.dir(s"sretr_${run}_state", dir)
    val ledger = graft.sources.Scratch.dir(s"sretr_${run}_ledger", dir)
    val flips = graft.sources.Scratch.dir(s"sretr_${run}_flips", dir)
    try {
      val r = q350DrainAt(spark, dir, landing, ckpt, stateRoot, ledger, flips)
      r.localCheckpoint(true)
    } finally Seq(landing, ckpt, stateRoot, ledger, flips).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val dfs = p.getFileSystem(conf)
      if (dfs.exists(p)) dfs.delete(p, true)
    }
  }

  /** The drive behind [[q350StreamRetract]], scratch-parameterized so
    * the spec can inspect the flip audit + ledger post-drain. */
  private[graft] def q350DrainAt(spark: SparkSession, dir: String,
      landing: String, ckpt: String, stateRoot: String, ledger: String,
      flips: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val sz = wordGrams(spark, dir).groupBy("doc_id").agg(count(lit(1)).as("n"))
    // q340's keeper-qualified pair table off the persisted artifact —
    // the pre-retraction truth, staged once (v0 state AND qold read it)
    val qualified = graft.Ck.lazyStage(
      persistedContainmentPairs(spark, dir)
        .join(sz.select(col("doc_id").as("src_id"), col("n").as("ns")), "src_id")
        .join(sz.select(col("doc_id").as("dst_id"), col("n").as("nd")), "dst_id")
        .filter(col("nd") > col("ns") ||
          (col("nd") === col("ns") && col("dst_id") < col("src_id")))
        .select("src_id", "dst_id"), cfg)
    qualified.write.parquet(s"$stateRoot/v0")
    val cur = new java.util.concurrent.atomic.AtomicReference[String](s"$stateRoot/v0")
    // takedown feed: the q296/q340 retract band, two arrival waves
    val docs = Tables.documents(spark, dir).select("doc_id")
    val takedowns = docs
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) >= cfg.docRetractLower)
    val fs = new org.apache.hadoop.fs.Path(landing).getFileSystem(conf)
    Seq(takedowns.filter(col("doc_id") % 2 === 0),
        takedowns.filter(col("doc_id") % 2 === 1))
      .zipWithIndex.foreach { case (w, i) =>
        val before =
          if (fs.exists(new org.apache.hadoop.fs.Path(landing)))
            fs.listStatus(new org.apache.hadoop.fs.Path(landing)).map(_.getPath).toSet
          else Set.empty[org.apache.hadoop.fs.Path]
        w.repartition(1).write.mode("append").parquet(landing)
        fs.listStatus(new org.apache.hadoop.fs.Path(landing))
          .map(_.getPath).filterNot(before)
          .filter(_.getName.startsWith("part-"))
          .foreach(f => fs.setTimes(f, 1000L * (i + 1), -1))
      }
    val raw = spark.readStream
      .schema("doc_id BIGINT")
      .option("pathGlobFilter", "part-*")
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
    val q = raw.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) {
          // ledger first: a crash between append and state write must
          // leave the ledger ahead of the state, never behind (replay
          // re-restricts idempotently; a behind ledger would re-admit)
          b.write.mode("append").parquet(ledger)
          val ids = broadcast(b.select("doc_id"))
          val st = spark.read.parquet(cur.get)
          val next = st
            .join(ids.select(col("doc_id").as("src_id")), Seq("src_id"), "left_anti")
            .join(ids.select(col("doc_id").as("dst_id")), Seq("dst_id"), "left_anti")
          val nextPath = s"$stateRoot/v${id + 1}"
          next.write.parquet(nextPath)
          // flip rows: surviving docs whose LAST container died in this
          // batch — quote verdict reversed, auditable per wave
          val before = st.groupBy(col("src_id").as("doc_id"))
            .agg(count(lit(1)).as("nc"))
          val after = spark.read.parquet(nextPath)
            .groupBy(col("src_id").as("doc_id"))
            .agg(count(lit(1)).as("nc"))
          before.join(after.select(col("doc_id"), lit(1).as("still")),
              Seq("doc_id"), "left_anti")
            .join(broadcast(spark.read.parquet(ledger).select("doc_id")
              .distinct()), Seq("doc_id"), "left_anti")
            .select(col("doc_id"), lit(id).as("batch"))
            .write.mode("append").parquet(flips)
          cur.set(nextPath)
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // drain: q340's exact row shape from final state + ledger
    val led = spark.read.parquet(ledger).select("doc_id").distinct()
    val surv = docs.join(broadcast(led), Seq("doc_id"), "left_anti")
    val qold = qualified.groupBy(col("src_id").as("doc_id"))
      .agg(count(lit(1)).as("n_old"))
    val qnew = spark.read.parquet(cur.get)
      .groupBy(col("src_id").as("doc_id"))
      .agg(count(lit(1)).as("n_containers"))
    surv.join(qnew, Seq("doc_id"), "left").join(qold, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_containers"), lit(0L)).as("n_containers"),
        col("n_containers").isNotNull.as("is_quote"),
        (col("n_old").isNotNull && col("n_containers").isNull).as("resurrected"))
  }

  /** Drain ≡ batch: the same two-pass retraction oracle as q340. */
  def q350Sql: String = q340Sql

  /** q335: STREAMING CONTAINMENT INGEST — q332's delta absorption run
    * as a LIVE STREAM (the q325 pattern on the text axis, closing the
    * vector/text streaming asymmetry the round-15 verdict named): new
    * docs land as files in two waves; `foreachBatch` grams each
    * micro-batch, ranks its prefixes under the PERSISTED base DF
    * order (fixed across batches — ingestion order cannot change the
    * prefix theory), probes (a) new prefixes against base index ∪
    * already-arrived delta grams ∪ the batch itself and (b) base ∪
    * already-arrived delta prefixes against the new grams, exact-
    * verifies, and appends the pairs; the batch's grams and prefixes
    * then join the arrived stores. Every ORDERED pair is verified in
    * exactly one batch (the direction that sees the later doc), so
    * the drain equals the static full rebuild row for row and the
    * SAME naive-rebuild oracle gates both (the q305/q288 twin
    * discipline).
    *
    * Scale: per batch the work is batch-sized probes + candidate
    * verifies (the q332 bound) — the verify's gram-array side is
    * semi-join-pruned to the batch's candidate ENDPOINTS before the
    * array transform runs ([[wordGramArrays]]'s `only`), so no batch
    * pays a corpus-wide gram build (one pruned (doc_id, text) column
    * scan is the residual corpus touch; at 100 TB that side is the
    * persisted q102 index instead). State is the growing delta
    * gram/prefix store — parquet appends, never a state store; the
    * base side is the persisted nightly index. Scratch is run-unique
    * (the q325 rule) and dropped after the drain. */
  def q335StreamContainment(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val CNum = cfg.contTNum
    val CDen = cfg.contTDen
    val (bdf, bidx, bpairs) = containmentBaseArtifacts(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val run = java.util.UUID.randomUUID.toString.take(8)
    val landing = graft.sources.Scratch.dir(s"scont_${run}_landing", dir)
    val ckpt = graft.sources.Scratch.dir(s"scont_${run}_ckpt", dir)
    // ONE pfx-flagged arrived store (r18): the old split grams/prefix
    // stores made the two probe directions two separate corpus-store
    // scans and two appends per batch; a boolean flag column carries
    // the prefix membership the P-store existed for
    val seen = graft.sources.Scratch.dir(s"scont_${run}_seen", dir)
    val out = graft.sources.Scratch.dir(s"scont_${run}_pairs", dir)
    try {
      val delta = Tables.documents(spark, dir)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) >= cfg.splitTrainUpper)
        .select("doc_id", "text")
      val fs = new org.apache.hadoop.fs.Path(landing).getFileSystem(conf)
      Seq(delta.filter(col("doc_id") % 2 === 0), delta.filter(col("doc_id") % 2 === 1))
        .zipWithIndex.foreach { case (w, i) =>
          val before =
            if (fs.exists(new org.apache.hadoop.fs.Path(landing)))
              fs.listStatus(new org.apache.hadoop.fs.Path(landing)).map(_.getPath).toSet
            else Set.empty[org.apache.hadoop.fs.Path]
          w.repartition(1).write.mode("append").parquet(landing)
          fs.listStatus(new org.apache.hadoop.fs.Path(landing))
            .map(_.getPath).filterNot(before)
            .filter(_.getName.startsWith("part-"))
            .foreach(f => fs.setTimes(f, 1000L * (i + 1), -1))
        }
      def existsDir(d: String): Boolean = {
        val s = new org.apache.hadoop.fs.Path(d, "_SUCCESS")
        s.getFileSystem(conf).exists(s)
      }
      val raw = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("pathGlobFilter", "part-*")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
      val q = raw.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) {
            val bsh = b
              .select(col("doc_id"), split(col("text"), " ").as("ws"))
              .filter(size(col("ws")) >= SimW)
              .withColumn("g", explode(sequence(lit(1), size(col("ws")) - (SimW - 1))))
              .select(col("doc_id"),
                concat_ws(" ", slice(col("ws"), col("g"), lit(SimW))).as("s"))
              .distinct()
            val bn = bsh.groupBy("doc_id").agg(count(lit(1)).as("n"))
            // ONE batch-sized lazy cut carrying the pfx flag (r18): the
            // old bGrams/bPfx pair fed four references; this table feeds
            // the fused probe, the batch-internal join and the store
            // append — the gram explode and the ranking window run once
            val bAll = graft.Ck.lazyStage(
              bsh.join(bn, "doc_id").join(bdf, Seq("s"), "left")
                .withColumn("df", coalesce(col("df"), lit(0L)))
                .withColumn("rk", row_number().over(
                  Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
                .select(col("s"), col("doc_id"), col("n"),
                  (col("rk") <= col("n") - expr(s"($CNum * n + ${CDen - 1}) div $CDen") + 1)
                    .as("pfx")), cfg)
            // empty-state fallback built from the SCHEMA, not limit(0)
            // over the lazily-cut batch (r17 advice: executing that
            // limit(0) could materialize the whole batch for zero rows)
            val arrived =
              if (existsDir(seen)) spark.read.parquet(seen)
              else spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bAll.schema)
            // FUSED probe (r18, guide §2.4 — remove the second scan):
            // the base index ∪ arrived store is scanned ONCE, with the
            // broadcast batch carrying BOTH roles — role A (batch
            // prefix × store gram: new doc quoted in an old one) and
            // role B (store prefix × batch gram: old doc quoted in a
            // new one). The old shape ran two store-wide joins per
            // batch. Ordered pairs cannot collide across roles (A emits
            // new→old, B old→new), so the explode is union-exact.
            val store = bidx.select(col("s"), col("doc_id"), col("n"), col("pfx"))
              .unionByName(arrived)
            val bb = bAll.select(col("s"), col("doc_id").as("b_id"),
              col("n").as("bn"), col("pfx").as("b_pfx"))
            val j = store.join(broadcast(bb),
              store("s") === bb("s") && (col("b_pfx") || col("pfx")))
            val roleA = when(col("b_pfx") && lit(CDen) * col("n") >= lit(CNum) * col("bn"),
              struct(col("b_id").as("src_id"), col("doc_id").as("dst_id")))
            val roleB = when(col("pfx") && lit(CDen) * col("bn") >= lit(CNum) * col("n"),
              struct(col("doc_id").as("src_id"), col("b_id").as("dst_id")))
            val candStore = j
              .select(explode(filter(array(roleA, roleB), x => x.isNotNull)).as("p"))
              .select(col("p.src_id").as("src_id"), col("p.dst_id").as("dst_id"))
            // batch-internal pairs (both endpoints arrived in THIS batch)
            val bSrc = bAll.filter(col("pfx"))
              .select(col("s"), col("doc_id").as("src_id"), col("n").as("nsrc"))
            val bDst = bAll.select(col("s"), col("doc_id").as("dst_id"), col("n").as("ndst"))
            val candBatch = bSrc.join(bDst,
                bSrc("s") === bDst("s") && col("src_id") =!= col("dst_id") &&
                lit(CDen) * col("ndst") >= lit(CNum) * col("nsrc"))
              .select("src_id", "dst_id")
            containmentVerify(spark, dir,
                candStore.unionByName(candBatch).distinct())
              .write.mode("append").parquet(out)
            // only after the pairs land does the batch join the store
            bAll.write.mode("append").parquet(seen)
          }
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val streamed =
        if (existsDir(out)) spark.read.parquet(out)
        else bpairs.limit(0)
      // eager localCheckpoint: the result materializes DISTRIBUTED
      // (executor blocks, no driver collect) before the finally drops
      // the run scratch its lineage reads
      bpairs.unionByName(streamed)
        .select(col("src_id"), col("dst_id"), col("containment"))
        .localCheckpoint(true)
    } finally Seq(landing, ckpt, seen, out).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val dfs = p.getFileSystem(conf)
      if (dfs.exists(p)) dfs.delete(p, true)
    }
  }

  /** Drain ≡ static rebuild: the same naive complete oracle as
    * q324/q332 — the stream must converge to the batch table. */
  def q335Sql: String = q324Sql

  /** g-prefixed quote-verdict CTE chain (q329's logic, names disjoint
    * from every other fragment) ending at `gquotes(doc_id)` — the docs
    * that are near-contained in a strictly larger (or equal-size,
    * lower-id) container. Composable into multi-family oracles
    * (q334's recipe chains it with the soft-dedup and DSIR chains). */
  private[operators] def quoteFlagCtes: String =
    s"""gsh AS MATERIALIZED ($wordGramsSql),
       |gsz AS (SELECT doc_id, count(*) AS n FROM gsh GROUP BY doc_id),
       |ginter AS (SELECT a.doc_id AS src_id, b.doc_id AS dst_id, count(*) AS i
       |  FROM gsh a JOIN gsh b ON a.s = b.s AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2),
       |gcont AS (SELECT src_id, dst_id FROM ginter
       |  JOIN gsz na ON src_id = na.doc_id
       |  WHERE ${cfg.contTDen}*i >= ${cfg.contTNum}*na.n),
       |gquotes AS (SELECT DISTINCT c.src_id AS doc_id FROM gcont c
       |  JOIN gsz ns ON ns.doc_id = c.src_id
       |  JOIN gsz nd ON nd.doc_id = c.dst_id
       |  WHERE nd.n > ns.n OR (nd.n = ns.n AND c.dst_id < c.src_id))""".stripMargin

  /** The soft-dedup weight chain (q322's logic) ending at
    * `sdw(doc_id, w_micro)` — REQUIRES the composing statement to open
    * with WITH RECURSIVE (the family reachability closure). */
  private[operators] def softDedupWeightCtes: String =
    s"""$nearDupEdgesSql,
       |und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(u, v) AS (SELECT u, v FROM und
       |  UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u AND e.v <> r.u),
       |flbl AS (SELECT u AS doc_id, least(u, min(v)) AS family_id FROM reach GROUP BY u),
       |ffam AS (SELECT d.doc_id, coalesce(l.family_id, d.doc_id) AS family_id
       |  FROM documents d LEFT JOIN flbl l USING (doc_id)),
       |ffsz AS (SELECT family_id, CAST(count(*) AS BIGINT) AS family_size
       |  FROM ffam GROUP BY family_id),
       |sdw AS (SELECT f.doc_id, ${cfg.dsirScale} // s.family_size AS w_micro
       |  FROM ffam f JOIN ffsz s USING (family_id))""".stripMargin

  /** Oracle: the naive COMPLETE join — every pair sharing ≥1 gram,
    * exact Jaccard, integer threshold. Any pair with J ≥ t > 0 shares a
    * gram, so this is the semantic spec q131's prefix filter must
    * reproduce exactly. */
  def q131Sql: String =
    s"""WITH sh AS ($wordGramsSql),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, CAST(i AS DOUBLE)/(na.n + nb.n - i) AS jaccard
       |FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
       |WHERE $TDen*i >= $TNum*(na.n + nb.n - i)""".stripMargin

  /** q200: dedup THRESHOLD CURVE — the tuning sweep for the dedup
    * knob itself: for every candidate Jaccard threshold (percents ≥
    * the q131 base), how many near-dup pairs survive and how many
    * docs they touch. The curve is what actually sets
    * `simJoinTNum/TDen` in production — a threshold is a data-loss
    * dial, and without the curve it gets set blind (the eval family:
    * q123 recall, q132 LSH, q183 balance, q196 cohesion — this one
    * grades the THRESHOLD). All sweep points read the ONE exact q131
    * pair table (every ≥-base pair is in it, higher thresholds are
    * subsets — no re-join per point); each pair explodes to its two
    * doc ids × surviving thresholds, so one aggregate yields both
    * counts: n_pairs = rows div 2 (each pair contributes exactly two
    * id rows), n_docs = distinct ids. The jaccard-vs-pct/100
    * comparison is engine-exact: the jaccard is one division of exact
    * integers and pct/100.0 parses to the same double on both
    * engines. */
  def q200DedupCurve(spark: SparkSession, dir: String): DataFrame = {
    val pcts = cfg.dedupCurvePcts
    require(pcts.forall(p => p * TDen >= 100 * TNum),
      "every sweep percent must be >= the q131 base threshold")
    val pairs = q131SimJoin(spark, dir).select("id_a", "id_b", "jaccard")
    pairs
      .withColumn("pct", explode(array(pcts.map(p => lit(p)): _*)))
      .filter(col("jaccard") >= col("pct").cast("double") / 100.0)
      .select(col("pct"), explode(array(col("id_a"), col("id_b"))).as("doc"))
      .groupBy("pct")
      .agg(expr("count(1) div 2").as("n_pairs"),
        countDistinct(col("doc")).as("n_docs"))
  }

  def q200Sql: String =
    s"""WITH base AS ($q131Sql),
       |sw AS (SELECT pct, unnest([id_a, id_b]) AS doc
       |  FROM base, (SELECT unnest([${cfg.dedupCurvePcts.mkString(", ")}]) AS pct) p
       |  WHERE jaccard >= CAST(pct AS DOUBLE) / 100.0)
       |SELECT pct, count(*) // 2 AS n_pairs, count(DISTINCT doc) AS n_docs
       |FROM sw GROUP BY pct""".stripMargin

  /** q132: LSH TUNING EVAL — precision/recall of q31's MinHash band
    * candidate set against q131's complete truth at the same threshold
    * (t = $TNum/$TDen ≙ cfg.minhashJaccard). The truth lives in
    * q131's word-gram space while the bands hash char shingles — the
    * deliberate eval framing: the exact token-level near-dup spec is
    * the ground truth a production (char-MinHash) config is graded
    * against; a recall shortfall here flags BOTH band misses and
    * tokenization mismatch. This is the one-row report that
    * decides band/row counts, exactly as q123 does for the IVF index.
    * An LSH dedup without a measured recall is a silent data-loss
    * knob. Precision here is the candidate-verification hit rate — the
    * fraction of band pairs that survive exact verification, i.e. the
    * wasted-verification cost.
    *
    * Scale: both inputs are pair tables already bounded by their
    * generators; the eval is two tiny aggregates and a 1:1 join.
    * Integer counts + fixed-shape divisions — engine-exact. */
  def q132LshEval(spark: SparkSession, dir: String): DataFrame = {
    val bands = minhashBands(minhashSig(shingleArrays(spark, dir)))
    val cand = bands.as("x").join(bands.as("y"), col("x.bk") === col("y.bk"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val truth = q131SimJoin(spark, dir).select(col("id_a"), col("id_b"), lit(1L).as("t"))
    // one distributed pass: full-outer pair union → three conditional sums
    cand.withColumn("c", lit(1L))
      .join(truth, Seq("id_a", "id_b"), "full_outer")
      .agg(coalesce(sum(col("t")), lit(0L)).as("n_truth"),
        coalesce(sum(col("c")), lit(0L)).as("n_cand"),
        coalesce(sum(col("t") * col("c")), lit(0L)).as("n_hit"))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_cand") === 0L, lit(null).cast("double"))
          .otherwise(col("n_hit").cast("double") / col("n_cand")).as("precision"),
        when(col("n_truth") === 0L, lit(null).cast("double"))
          .otherwise(col("n_hit").cast("double") / col("n_truth")).as("recall"))
  }

  def q132Sql: String =
    s"""WITH sh AS ($shinglesSql),
       |sig AS (SELECT doc_id, $sigSqlExprs FROM sh GROUP BY doc_id),
       |bands AS (SELECT doc_id, s0||s1||s2||s3 AS bk FROM sig
       |  UNION ALL SELECT doc_id, s4||s5||s6||s7 FROM sig),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x JOIN bands y ON x.bk = y.bk AND x.doc_id < y.doc_id),
       |wg AS ($wordGramsSql),
       |sz AS (SELECT doc_id, count(*) AS n FROM wg GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM wg a JOIN wg b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (SELECT id_a, id_b
       |  FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
       |  WHERE $TDen*i >= $TNum*(na.n + nb.n - i)),
       |m AS (SELECT
       |    (SELECT count(*) FROM truth) AS n_truth,
       |    (SELECT count(*) FROM cand) AS n_cand,
       |    (SELECT count(*) FROM cand JOIN truth USING (id_a, id_b)) AS n_hit)
       |SELECT CAST(n_truth AS BIGINT) AS n_truth, CAST(n_cand AS BIGINT) AS n_cand,
       |  CAST(n_hit AS BIGINT) AS n_hit,
       |  CASE WHEN n_cand = 0 THEN NULL
       |    ELSE CAST(n_hit AS DOUBLE) / n_cand END AS precision,
       |  CASE WHEN n_truth = 0 THEN NULL
       |    ELSE CAST(n_hit AS DOUBLE) / n_truth END AS recall
       |FROM m""".stripMargin

  /** q133: INCREMENTAL dedup — a delta shard deduped against the
    * existing base corpus without ever comparing base to base: the
    * production shape of dedup, where a daily ingest lands against a
    * 100 TB corpus and re-running q31 over base×base (already dedup'd
    * yesterday) would dwarf the delta's own cost. Base membership is
    * the q68 md5 train bucket (content-stable, so the base/delta split
    * reproduces across runs); candidates come from the MinHash band
    * join restricted to delta×base; verified matches (exact Jaccard ≥
    * cfg.minhashJaccard) blame the LOWEST matching base id. EVERY
    * delta doc appears — kept rows with is_dup=false and null blame —
    * because a dedup step must account for every input (the q100
    * contract), including docs too short to shingle.
    *
    * At 100 TB the base band table (doc_id, bk) is exactly the kind of
    * stable-keyed table `Tables.writeBucketed` exists for: bucketed on
    * bk at ingest, each delta lands as one exchange-free probe of the
    * persisted layout, cost ∝ |delta|, not |base|. */
  def q133IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val isBase = substring(md5(col("doc_id").cast("string")), 1, 2) < cfg.splitTrainUpper
    val bands = minhashBands(minhashSig(shingleArrays(spark, dir)))
    // per-occurrence verify (r18): duplicate (id_a,id_b) candidate rows
    // produce identical (id_b, jaccard) structs, which the min-struct
    // `best` aggregate below absorbs — the pre-verify distinct exchanged
    // the full delta×base candidate table for nothing
    val cand = bands.filter(!isBase).as("x")
      .join(bands.filter(isBase).as("y"), col("x.bk") === col("y.bk"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    val matches = verifiedJaccard(shingleArrays(spark, dir), cand)
      .filter(col("jaccard") >= MinhashJ)
    val best = matches.groupBy(col("id_a").as("doc_id"))
      .agg(min(struct(col("id_b"), col("jaccard"))).as("m"))
      .select(col("doc_id"), col("m.id_b").as("dup_of"), col("m.jaccard").as("jaccard"))
    Tables.documents(spark, dir).filter(!isBase).select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"), col("jaccard"))
  }

  def q133Sql: String = {
    val base = s"substr(md5(doc_id::VARCHAR), 1, 2) < '${cfg.splitTrainUpper}'"
    s"""WITH sh AS ($shinglesSql),
       |sig AS (SELECT doc_id, $sigSqlExprs FROM sh GROUP BY doc_id),
       |bands AS (SELECT doc_id, s0||s1||s2||s3 AS bk FROM sig
       |  UNION ALL SELECT doc_id, s4||s5||s6||s7 FROM sig),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x JOIN bands y ON x.bk = y.bk
       |  WHERE substr(md5(x.doc_id::VARCHAR), 1, 2) >= '${cfg.splitTrainUpper}'
       |    AND substr(md5(y.doc_id::VARCHAR), 1, 2) < '${cfg.splitTrainUpper}'),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT id_a, id_b, count(*) AS i FROM cand
       |  JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b AND a.s = b.s
       |  GROUP BY id_a, id_b),
       |ver AS (SELECT id_a, id_b, CAST(i AS DOUBLE)/(na.n + nb.n - i) AS jaccard
       |  FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
       |  WHERE CAST(i AS DOUBLE)/(na.n + nb.n - i) >= $MinhashJ),
       |best AS (SELECT id_a AS doc_id, min(id_b) AS dup_of,
       |    arg_min(jaccard, id_b) AS jaccard
       |  FROM ver GROUP BY id_a)
       |SELECT d.doc_id, best.dup_of IS NOT NULL AS is_dup, best.dup_of, best.jaccard
       |FROM (SELECT doc_id FROM documents WHERE NOT ($base)) d
       |LEFT JOIN best USING (doc_id)""".stripMargin
  }

  /** q142: near-dup pair DIFF — for every q31 pair, the character-level
    * story of HOW the two docs differ: lengths, exact Levenshtein edit
    * distance, and edit fraction (dist / max len). Shingle Jaccard
    * says "these are near-dups"; the edit profile says what kind —
    * ~0 edit frac = re-crawl artifacts (keep either), moderate =
    * template instantiations (maybe keep both), and the number drives
    * which variant survives q57's keeper choice in pipelines that
    * prefer the least-edited representative.
    *
    * Scale: pairs are bounded by q31's band generator; the two text
    * joins are 1:1; Levenshtein is O(len²) per pair CPU, so the pair
    * table is repartitioned to full parallelism before the projection
    * (the round-4 "CPU-dense, byte-small" discipline — AQE would
    * coalesce these small-byte rows onto 1-2 tasks). */
  def q142DupDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    q31MinhashPairs(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
      .select(col("id_a"), col("id_b"), col("jaccard"),
        length(col("ta")).cast("long").as("len_a"),
        length(col("tb")).cast("long").as("len_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"))
      .withColumn("edit_frac",
        col("edit_dist").cast("double") / greatest(col("len_a"), col("len_b")))
  }

  def q142Sql: String =
    s"""WITH pairs AS ($q31Sql)
       |SELECT id_a, id_b, jaccard,
       |  CAST(len(a.text) AS BIGINT) AS len_a,
       |  CAST(len(b.text) AS BIGINT) AS len_b,
       |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       |  CAST(levenshtein(a.text, b.text) AS DOUBLE)
       |    / greatest(len(a.text), len(b.text)) AS edit_frac
       |FROM pairs JOIN documents a ON a.doc_id = id_a
       |JOIN documents b ON b.doc_id = id_b""".stripMargin
}

/** Default-configured instance (see [[graft.GraftConfig]]). */
object Dedup extends DedupOps(GraftConfig.default)
