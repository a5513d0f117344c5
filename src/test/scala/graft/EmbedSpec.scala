package graft

import org.apache.spark.sql.functions._

class EmbedSpec extends GraftSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = {
    val dir = java.nio.file.Files.createTempDirectory("embed").toString
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The hashing contract replicated independently in plain JVM code. */
  private def refVector(text: String, d: Int): Map[Long, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    text.split(" ", -1).toSeq
      .map { tok =>
        val hx = md.digest(s"$tok:f".getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        val dim = java.lang.Long.parseLong(hx.substring(0, 8), 16) % d
        val s = if (hx.charAt(8) >= '8') -1L else 1L
        dim -> s
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter(_._2 != 0L)
  }

  test("q282: projections hash-verified against an independent JVM replication") {
    val texts = Seq(0L -> "the cat sat on the mat", 1L -> "a b a b a",
      2L -> "xyzzy", 3L -> "")
    val dir = docs(texts: _*)
    val ops = new graft.operators.EmbedOps(GraftConfig(featHashDim = 8))
    val got = ops.q282TextEmbed(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    val expected = texts.map { case (id, t) => id -> refVector(t, 8) }.toMap
      .filter(_._2.nonEmpty)
    assert(got == expected, "signed feature-hash vectors must match the reference bitwise")
    // the duplicate-token doc exercises real accumulation, not presence
    assert(expected(1L).values.exists(v => math.abs(v) > 1),
      "test corpus must exercise |count| > 1 accumulation")
  }

  test("q283: identical texts embed identically and pair at cosine exactly 1") {
    val dir = docs(
      0L -> "alpha beta gamma delta epsilon zeta",
      1L -> "alpha beta gamma delta epsilon zeta", // exact dup of 0
      2L -> "totally different words entirely here now",
      3L -> "alpha beta gamma delta epsilon eta") // near dup of 0
    val ops = new graft.operators.EmbedOps(
      GraftConfig(featHashDim = 16, derivedNeardupMin = 0.999))
    val v = ops.q282TextEmbed(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    assert(v(0L) == v(1L), "identical text must derive the identical sparse vector")
    val pairs = ops.q283DerivedNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cosine")).toMap
    assert(pairs.contains((0L, 1L)), "the exact-dup pair must surface")
    assert(pairs((0L, 1L)) == 1.0, "identical vectors must read cosine exactly 1")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      "unrelated docs must not pass a 0.999 threshold")
  }

  test("feat_hash_vec: the native scan expression equals the explode+groupBy SQL formulation") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val D = GraftConfig.default.featHashDim
    // the original column-chain formulation, replicated inline
    val reference = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("hx", md5(concat(col("tok"), lit(":f"))))
      .select(col("doc_id"),
        (conv(substring(col("hx"), 1, 8), 16, 10).cast("long") % D).as("dim"),
        when(substring(col("hx"), 9, 1) >= "8", lit(-1L)).otherwise(lit(1L)).as("s"))
      .groupBy("doc_id", "dim").agg(sum(col("s")).as("val"))
      .filter(col("val") =!= 0)
    val native = graft.operators.Embed.q282TextEmbed(spark, sf)
    assert(native.exceptAll(reference).isEmpty && reference.exceptAll(native).isEmpty,
      "native feat_hash_vec must reproduce the hash-chain formulation bitwise")
    assert(native.count() > 0)
  }

  test("q288: the stateless stream drains bit-equal to the batch embedder") {
    val batch = graft.operators.Embed.q282TextEmbed(spark, sf)
    val streamed = graft.operators.Embed.q288StreamEmbed(spark, sf)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() > 0)
  }

  test("q289: derived ANN is well-formed; an exact text duplicate ranks first at cosine 1") {
    val cfg = GraftConfig.default
    val rows = graft.operators.Embed.q289DerivedAnn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val rks = rs.map(_.getAs[Int]("rk")).sorted.toSeq
      assert(rks == (1 to rks.size) && rks.size <= cfg.annTopK)
      rs.foreach(r => assert(r.getLong(1) != q, "never the query itself"))
    }
    // duplicate text: doc 100 repeats doc 0's text → for query 0 the
    // dup must rank first with cosine exactly 1
    val dir = docs((0L -> "alpha beta gamma delta") +:
      (1L to 99L).map(i => i -> s"filler words number $i distinct") :+
      (100L -> "alpha beta gamma delta"): _*)
    val ops = new graft.operators.EmbedOps(GraftConfig(annQueries = 1, annTopK = 3))
    val top = ops.q289DerivedAnn(spark, dir).collect()
      .filter(_.getLong(0) == 0L).minBy(_.getAs[Int]("rk"))
    assert(top.getLong(1) == 100L && top.getAs[Double]("cosine") == 1.0,
      "the exact text duplicate must rank first at cosine exactly 1")
  }

  test("q287: eval totals reconcile; identical-corpus degeneracy reads perfect recall AND precision") {
    val r = graft.operators.Embed.q287DerivedDedupEval(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (ex, cd, ht) = (row.getAs[Long]("exact_pairs"),
      row.getAs[Long]("cand_pairs"), row.getAs[Long]("hit_pairs"))
    assert(ht <= ex && ht <= cd, "hits are the intersection")
    assert(row.getAs[Long]("n_sample") ==
      math.min(GraftConfig.default.derivedEvalSample.toLong,
        spark.read.parquet(s"$sf/documents.parquet").count()))
    val (rec, prec) = (row.getAs[Double]("recall"), row.getAs[Double]("precision"))
    assert(rec >= 0.0 && rec <= 1.0 && prec >= 0.0 && prec <= 1.0)
    // identical corpus: every pair is exact AND blocked together
    val dir = docs((0L to 5L).map(i => i -> "same words every single time"): _*)
    val one = graft.operators.Embed.q287DerivedDedupEval(spark, dir).collect().head
    assert(one.getAs[Long]("exact_pairs") == 15L && one.getAs[Long]("hit_pairs") == 15L)
    assert(one.getAs[Double]("recall") == 1.0 && one.getAs[Double]("precision") == 1.0)
  }

  test("q283 blocking invariant: every reported pair shares its dominant signed feature") {
    val ops = new graft.operators.EmbedOps(
      GraftConfig(derivedNeardupMin = 0.9)) // wider net on the real corpus
    val v = ops.q282TextEmbed(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    def dominant(m: Map[Long, Long]): (Long, Long) = {
      val (dim, value) = m.toSeq.sortBy { case (dim, value) => (-math.abs(value), dim) }.head
      (dim, if (value < 0) -1L else 1L)
    }
    val res = ops.q283DerivedNearDup(spark, sf).collect()
    assert(res.nonEmpty, "sf0.001 corpus must yield at least one 0.9-pair")
    res.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, "pairs must be ordered once, never mirrored")
      assert(dominant(v(a)) == dominant(v(b)),
        s"pair ($a,$b) escaped the dominant-feature block — candidate generation unbounded")
      val cos = r.getAs[Double]("cosine")
      assert(cos >= 0.9 && cos <= 1.0)
    }
  }
}
