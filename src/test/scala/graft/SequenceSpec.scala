package graft

import graft.operators.Sequence
import org.apache.spark.sql.functions._

class SequenceSpec extends GraftSpec {

  test("kmers: every doc yields len-k+1 kmers of exact length k") {
    val km = Sequence.kmers(spark, sf)
    assert(km.filter(length(col("kmer")) =!= Sequence.K).count() == 0)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .agg(sum(length(col("text")) - (Sequence.K - 1))).head().getLong(0)
    assert(km.count() == expected && nDocs > 0)
  }

  test("q11 high kmers are a subset of q10 counts with freq >= threshold") {
    val high = Sequence.q11HighKmers(spark, sf)
    assert(high.filter(col("freq") < Sequence.HighFreq).count() == 0)
  }

  test("q13 dedup: canonical ids are minimal within group; coverage sums to doc count") {
    val d = Sequence.q13DedupExact(spark, sf)
    assert(d.filter(col("canonical_id") > col("doc_id")).count() == 0)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(d.count() == nDocs)
  }

  test("q14 containment: non-contained set plus contained set partitions docs") {
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val kept = Sequence.q14NonContained(spark, sf).count()
    assert(kept > 0 && kept <= nDocs)
  }

  test("q16 trusted docs all have min_freq >= threshold") {
    val t = Sequence.q16Trusted(spark, sf)
    assert(t.filter(col("min_freq") < Sequence.TrustMinFreq).count() == 0)
  }

  test("q310 correction apply: folds exactly q59's votes, touches only voted positions, covers every doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val votes = Sequence.q59CorrectionVotes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getString(2), r.getString(3)))
    val byDoc = votes.groupBy(_._1)
    val out = Sequence.q310CorrectionApply(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.keySet == docs.keySet, "the corrected corpus covers every document")
    assert(byDoc.nonEmpty, "the corpus must exercise the apply path")
    out.foreach { case (id, (n, corrected)) =>
      val vs = byDoc.getOrElse(id, Array.empty)
      assert(n == vs.length, s"doc $id: n_corrections must equal its q59 vote count")
      val expected = vs.foldLeft(docs(id)) { case (acc, (_, pos, from, to)) =>
        assert(acc.length >= pos && docs(id).substring(pos - 1, pos) == from,
          s"doc $id pos $pos: vote from_char must match the original text")
        acc.substring(0, pos - 1) + to + acc.substring(pos)
      }
      assert(corrected == expected, s"doc $id: corrected text must be the vote fold")
    }
  }
}
