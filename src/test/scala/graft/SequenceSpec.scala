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
}
