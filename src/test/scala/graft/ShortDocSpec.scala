package graft

import graft.operators.{Dedup, Sequence}
import org.apache.spark.sql.functions._

/** Exercises the short-document paths: docs shorter than k must vanish
  * from k-mer/shingle explodes (not emit phantom descending positions),
  * and containment dedup must catch contained docs shorter than the
  * 16-char prefix key via the full-text key fallback. */
class ShortDocSpec extends GraftSpec {

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-shortdocs").toString
    import spark.implicits._
    val docs = Seq(
      // (doc_id, text)
      (1L, "abc"),                                       // 3 chars: below every k
      (2L, "hello world foo bar baz quux lorem ipsum dolor sit amet"),
      (3L, "o world"),                                   // 7 chars, substring of doc 2
      (4L, "independent words that nothing else contains anywhere"),
      (5L, "abc"),                                       // exact duplicate of doc 1
      (6L, "xyz hello world foo bar baz qq")             // long shared run with doc 2
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("docs shorter than k emit no k-mers and no phantom positions") {
    val km = Sequence.kmers(spark, dir).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(km == Set(2L, 4L, 6L)) // 1, 3, 5 are shorter than k=8
    // every emitted k-mer has exactly length k
    val lens = Sequence.kmers(spark, dir).select(length(col("kmer"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(lens == Set(Sequence.K))
  }

  test("shingles exclude docs shorter than the shingle length") {
    val sh = Dedup.shingles(spark, dir).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(sh == Set(2L, 3L, 4L, 6L)) // doc 3 (7 chars) >= ShingleK=5; docs 1,5 (3 chars) excluded
  }

  test("containment dedup catches short contained docs and equal-text ties") {
    val kept = Sequence.q14NonContained(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // doc 3 ("o world", 7 chars) is a substring of doc 2 → dropped via the
    // short-doc full-text key; doc 5 duplicates doc 1 and loses the id
    // tie-break; docs 1, 2, 4, 6 survive
    assert(kept == Set(1L, 2L, 4L, 6L))
  }

  test("winnowing guarantee: docs sharing a run of >= w+k-1 chars share a fingerprint") {
    // docs 2 and 6 share the 24-char run "hello world foo bar baz " (>= 4+5-1 = 8)
    val fp = graft.operators.TextAnalysis.q55Winnow(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val d2 = fp.collect { case (2L, f) => f }.toSet
    val d6 = fp.collect { case (6L, f) => f }.toSet
    assert(d6.nonEmpty && (d2 & d6).nonEmpty)
  }

  test("q122 dup spans: short docs emit zero coverage, never phantom grams") {
    // docs 1, 3, 5 are shorter than dupSpanK=16 → no grams, coverage 0
    // with a well-defined ratio; exact-duplicate pair (1,5) still scores
    // 0 because they are too short to carry a 16-gram
    val out = graft.operators.TextAnalysis.q122DupSpanCoverage(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    Seq(1L, 3L, 5L).foreach { id =>
      assert(out(id) == ((0L, 0.0)), s"short doc $id must have zero dup coverage")
    }
    // docs 2 and 6 share "hello world foo bar baz q" (> 16 chars) → both covered
    assert(out(2L)._1 > 0L && out(6L)._1 > 0L)
    // coverage never exceeds doc length
    out.foreach { case (_, (cov, ratio)) => assert(ratio >= 0.0 && ratio <= 1.0 && cov >= 0L) }
  }

  test("q120/q121 accept every doc including sub-k ones (scan ops have no length floor)") {
    val redact = graft.operators.TextAnalysis.q120Redact(spark, dir).count()
    val keep = graft.operators.Curation.q121KeepDrop(spark, dir).collect()
    assert(redact == 6L && keep.length == 6)
    // 3-char docs: 1 token, below keepMinTokens → too_short, ttr well-defined
    val short = keep.filter(_.getLong(0) == 1L).head
    assert(!short.getBoolean(3) && short.getString(4) == "too_short")
  }
}
