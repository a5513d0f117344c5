package graft

import graft.operators.SegmentOps
import org.apache.spark.sql.functions._

/** Segment family (q99-q102): semantics on hand-built corpora — tail
  * remainder segments, all-boilerplate docs, in-order reconstruction,
  * chunk geometry, postings cap — plus the scan-only plan shape of
  * chunking. */
class SegmentsSpec extends GraftSpec {
  import spark.implicits._

  private val ops = new SegmentOps(GraftConfig(
    segWords = 2, boilerplateMinDf = 2, chunkChars = 5, chunkStride = 3,
    postingsCap = 2))

  private def docs(rows: (Long, String)*) = {
    val dir = java.nio.file.Files.createTempDirectory("segments").toString
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q99: dup fraction counts segments shared with ANOTHER doc; tail remainder is a segment") {
    // W=2: doc0 = ["a b","c d"], doc1 = ["a b","x"] (short tail kept),
    // doc2 = ["q r"]. Only "a b" occurs in ≥2 docs.
    val dir = docs(0L -> "a b c d", 1L -> "a b x", 2L -> "q r")
    val got = ops.q99SegmentDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 2L, 1L), (1L, 2L, 1L), (2L, 1L, 0L)))
  }

  test("q99: a segment repeated WITHIN one doc only is not a duplicate") {
    // doc0 repeats "a b" twice but no other doc has it: seg_df counts
    // DISTINCT docs, so both copies count as unique segments.
    val dir = docs(0L -> "a b a b", 1L -> "z z")
    val row = ops.q99SegmentDedup(spark, dir).filter(col("doc_id") === 0L).collect().head
    assert((row.getLong(1), row.getLong(2)) == ((2L, 0L)))
  }

  test("q100: scrub drops df>=2 segments, reconstructs in ordinal order, keeps empty docs") {
    // "a b" is boilerplate (docs 0,1,2). doc0's kept segments "m n" and
    // "o p" straddle the dropped one — order must survive. doc2 is 100%
    // boilerplate and must still appear with empty text.
    val dir = docs(0L -> "m n a b o p", 1L -> "a b q", 2L -> "a b")
    val got = ops.q100BoilerplateScrub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == Set(
      (0L, 2L, 1L, "m n o p"),
      (1L, 1L, 1L, "q"),
      (2L, 0L, 1L, "")))
  }

  test("q101: chunk geometry — stride starts, short final chunk, empty doc yields one empty chunk") {
    // C=5, S=3: "abcdefgh" (len 8) → starts 1,4,7 → lens 5,5,2.
    val dir = docs(0L -> "abcdefgh", 1L -> "")
    val rows = ops.q101Chunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(
      (0L, 1L, 1L, 5L), (0L, 2L, 4L, 5L), (0L, 3L, 7L, 2L),
      (1L, 1L, 1L, 0L)))
  }

  test("q101: chunking is a pure scan — no exchange in the plan") {
    // the only allowed Exchange is Tables.fact's load-time RoundRobin
    // respread of the single-row-group test file (see PlanSpec)
    val plan = ops.q101Chunk(spark, sf).queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("RoundRobinPartitioning"))
    assert(shuffles == 0, plan)
  }

  test("q102: postings head is capped and ascending; cf counts every occurrence") {
    // "t" occurs in docs 0,1,2 (df=3 > cap 2) and twice in doc 0 (cf=4).
    val dir = docs(0L -> "t t", 1L -> "t u", 2L -> "v t")
    val row = ops.q102InvertedIndex(spark, dir).filter(col("token") === "t").collect().head
    assert((row.getLong(1), row.getLong(2), row.getString(3)) == ((3L, 4L, "0,1")))
  }

  test("q269: chunks tile each doc exactly and reconstruct the text") {
    val o = new SegmentOps(GraftConfig(cdcWindow = 4, cdcModulus = 4))
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val dir = docs(1L -> text, 2L -> "")
    val ch = o.q269CdcChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d1 = ch.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.head._3 == 1L, "first chunk starts at 1")
    d1.sliding(2).foreach {
      case Array((_, _, s1, l1), (_, _, s2, _)) =>
        assert(s2 == s1 + l1, "chunks tile with no gap or overlap")
      case _ =>
    }
    assert(d1.map(_._4).sum == text.length.toLong, "chunk lengths sum to the doc")
    val d2 = ch.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._4 == 0L, "empty doc yields one empty chunk")
  }

  test("q269: boundaries are content-anchored — a prefix insertion preserves the chunk set") {
    // THE property fixed-stride chunking (q101) lacks: doc 2 is doc 1
    // with 4 chars inserted at the head; every content-defined cut in
    // doc 1 recurs (shifted) in doc 2, so all of doc 1's chunk
    // fingerprints except the first (which absorbs the edit) must
    // reappear verbatim in doc 2's chunk set.
    val o = new SegmentOps(GraftConfig(cdcWindow = 4, cdcModulus = 4))
    val a = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    val dir = docs(1L -> a, 2L -> ("xyz " + a))
    val fp = o.q269CdcChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
    val fa = fp.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val fb = fp.filter(_._1 == 2L).map(_._3).toSet
    assert(fa.length >= 3, "corpus must produce several chunks or the test is vacuous")
    assert(fa.tail.forall(fb.contains),
      "every chunk of the original after the edit region must survive the shift")
  }

  test("q270: shifted duplicates score high dup_frac; a unique doc scores zero") {
    val o = new SegmentOps(GraftConfig(cdcWindow = 4, cdcModulus = 4))
    val a = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    // doc 3 uses a DISJOINT alphabet (digits/uppercase vs the lorem
    // text's lowercase+space): at modulus 4 the chunks are short enough
    // that ordinary English substrings legitimately recur across docs,
    // so "no shared content" must hold at the character level
    val dir = docs(1L -> a, 2L -> ("xyz " + a),
      3L -> "0123456789ZYXWVU0987654321QWERTY0246813579POIUYT")
    val got = o.q270CdcDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L)._2 >= got(1L)._1 - 1,
      "all but the edit-region chunk of the original are shared")
    assert(got(2L)._2 >= 1L)
    assert(got(3L)._3 == 0.0, "the unique doc shares nothing")
  }

  test("q263: artifact-plus-delta merge equals the from-scratch rebuild (q102)") {
    // On the real sf corpus both splits are non-empty; the merge must
    // reproduce q102's full index EXACTLY — df, cf, and the re-capped
    // posting head (the sorted-union-then-cap exactness argument).
    val rebuilt = graft.operators.Segments.q102InvertedIndex(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val merged = graft.operators.Segments.q263IndexDelta(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(merged == rebuilt, "incremental index must equal the rebuild")
  }

  test("q263: reads the persisted base index, not a re-scan (doctored artifact shifts df)") {
    val dir = docs(0L -> "t t", 1L -> "t u", 2L -> "v t")
    val o = new SegmentOps(GraftConfig(postingsCap = 2))
    o.q263IndexDelta(spark, dir).collect() // builds + persists the base index
    val path = graft.sources.Scratch.keyedDir("inv_idx", dir, spark,
      Seq("documents.parquet"), s"cap=2,u=${o.cfg.splitTrainUpper}")
    // doctor: one token with an absurd df — must surface verbatim in the merge
    Seq(("zzz_doctored", 999L, 999L, Seq(7L)))
      .toDF("token", "df", "cf", "heads")
      .write.mode("overwrite").parquet(path)
    val out = o.q263IndexDelta(spark, dir)
      .filter(col("token") === "zzz_doctored").collect()
    assert(out.length == 1 && out.head.getLong(1) == 999L,
      "q263 must merge from the PERSISTED artifact, not re-index the base split")
  }
}
