package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized check of the quotient-class contraction (q22/q25/q36):
  * the broadcast class-count arithmetic must agree with naive
  * path-join references on corpora with dense, adversarial
  * boundary-word structure (including docs whose first and last words
  * coincide, which exercise the self-exclusion corrections). */
class QuotientPropertySpec extends GraftSpec {

  private val words = Vector("aa", "bb", "cc", "dd")

  private def makeCorpus(rnd: Random, n: Int): (String, Seq[(Long, String, String)]) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-quotient").toString
    import spark.implicits._
    val docs = (1L to n.toLong).map { i =>
      val fw = words(rnd.nextInt(words.length))
      val lw = words(rnd.nextInt(words.length))
      (i, s"$fw filler$i $lw", fw, lw)
    }
    docs.map { case (id, text, _, _) => (id, text) }.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    (tmp, docs.map { case (id, _, fw, lw) => (id, fw, lw) })
  }

  private def coarseEdges(docs: Seq[(Long, String, String)]): Set[(Long, Long)] =
    (for {
      (i, _, li) <- docs
      (j, fj, _) <- docs
      if i != j && li == fj
    } yield (i, j)).toSet

  test("q22/q25/q36 quotient arithmetic matches naive path joins on random corpora") {
    val rnd = new Random(11)
    for (_ <- 1 to 3) {
      val (dir, docs) = makeCorpus(rnd, 12 + rnd.nextInt(15))
      val e = coarseEdges(docs)
      def mids(i: Long, j: Long): Set[Long] =
        e.collect { case (`i`, x) if e.contains((x, j)) && i != j => x }

      val refReduction = e.filter { case (i, j) => mids(i, j).isEmpty }
      val gotReduction = GraphOps.q22TransitiveReduction(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotReduction == refReduction, s"q22 mismatch in $dir")

      val ids = docs.map(_._1)
      val refBubbles = (for {
        i <- ids; j <- ids
        if i != j
        m = mids(i, j)
        if m.size >= 2
      } yield (i, j, m.size.toLong)).toSet
      val gotBubbles = GraphOps.q25Bubbles(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotBubbles == refBubbles, s"q25 mismatch in $dir")

      val refBraids = e.flatMap { case (i, j) =>
        val m = mids(i, j)
        if (m.nonEmpty) Some((i, j, m.size.toLong)) else None
      }
      val gotBraids = GraphOps.q36Braids(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotBraids == refBraids, s"q36 mismatch in $dir")
    }
  }
}
