package graft

import graft.operators.{SegmentOps, TemporalOps}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized checks of the round-12 kernels against naive in-driver
  * references: the CDC chunker (q269 — exact tiling, byte-for-byte
  * reconstruction, and the shift-stability property on random edits)
  * and the interval-union sweep (q275 — islands vs a brute merge of
  * the same sessions). Seeded, so the trials are deterministic. */
class CdcSweepPropertySpec extends GraftSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q269 property: random corpora tile exactly, fingerprints reconstruct, edits stay local") {
    val rnd = new Random(41)
    val alphabet = "abcdef "
    val ops = new SegmentOps(GraftConfig(cdcWindow = 4, cdcModulus = 4))
    for (_ <- 1 to 3) {
      val corpus = (1L to 25L).map { i =>
        i -> Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val dir = java.nio.file.Files.createTempDirectory("cdcprop").toString
      corpus.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val byDoc = ops.q269CdcChunks(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .groupBy(_._1)
      corpus.foreach { case (id, text) =>
        val ch = byDoc(id).sortBy(_._2)
        // exact tiling: starts chain, lengths sum to the doc
        assert(ch.head._3 == 1L)
        ch.sliding(2).foreach {
          case Array((_, _, s1, l1, _), (_, _, s2, _, _)) => assert(s2 == s1 + l1)
          case _ =>
        }
        assert(ch.map(_._4).sum == text.length.toLong)
        // byte-for-byte reconstruction through the fingerprints
        ch.foreach { case (_, _, s, l, fp) =>
          assert(fp == md5hex(text.substring((s - 1).toInt, (s - 1 + l).toInt)),
            s"doc $id chunk at $s len $l fingerprint mismatch")
        }
      }
      // shift stability: prepend 3 chars to every doc — all chunk
      // fingerprints except each doc's first must survive
      val dir2 = java.nio.file.Files.createTempDirectory("cdcprop2").toString
      corpus.map { case (id, t) => (id, "xy " + t) }.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
      val shifted = ops.q269CdcChunks(spark, dir2).collect()
        .map(r => (r.getLong(0), r.getString(4))).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
      byDoc.foreach { case (id, ch) =>
        val tail = ch.sortBy(_._2).tail.map(_._5)
        assert(tail.forall(shifted(id).contains),
          s"doc $id: a chunk beyond the edit region changed under a prefix insertion")
      }
    }
  }

  test("q275 property: sweep islands equal a brute merge on random session layouts") {
    val rnd = new Random(43)
    val ops = new TemporalOps(GraftConfig(sessionGapMs = 50))
    for (_ <- 1 to 3) {
      // random events: ~40 users, 1-4 event times each in a narrow range
      // so sessions overlap, touch, and gap in all combinations
      val rows = (1L to 40L).flatMap { u =>
        (0 until 1 + rnd.nextInt(3)).map { _ =>
          (u * 100 + rnd.nextInt(90), u, rnd.nextInt(2000).toLong, "v")
        }
      }.map { case (eid, u, ms, t) => (eid.toLong, u, ms, t) }
      val dir = java.nio.file.Files.createTempDirectory("sweepprop").toString
      rows.toDF("event_id", "user_id", "ms", "event_type")
        .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
        .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = ops.q275IntervalUnion(spark, dir).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
      // brute reference from the session table itself
      val sess = ops.q236SessionConcurrency(spark, dir).collect()
        .map(r => (r.getLong(2), r.getLong(3))).sorted
      val ref = sess.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, (s, e)) => acc match {
          case (is, ie, n) :: t if s <= ie + 1 => (is, math.max(ie, e), n + 1) :: t
          case _ => (s, e, 1L) :: acc
        }
      }.reverse.map { case (s, e, n) => (s, e, n, e - s + 1) }
      assert(got.toSeq == ref, s"islands diverged from the brute merge")
    }
  }
}
