package graft

import graft.operators.GraphOps
import scala.util.Random

/** Randomized property tests for the q62/q63 assembly stages: each
  * distributed stage must agree with a naive single-machine reference
  * on random graphs (seeded, so failures reproduce). */
class AssemblyPropertySpec extends GraftSpec {
  import spark.implicits._

  private def randomEdges(rnd: Random, n: Int, m: Int): Seq[(Long, Long)] =
    Iterator.continually((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (s, d) => s != d }
      .take(m).toSeq.distinct

  private def refTransReduce(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val es = edges.toSet
    es.filterNot { case (a, b) =>
      es.exists { case (x, y) => x == a && es.contains((y, b)) }
    }
  }

  private def refRepeatCut(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val out = edges.groupBy(_._1)
    val in = edges.groupBy(_._2)
    val rep = (out.keySet intersect in.keySet)
      .filter(n => out(n).size >= 2 && in(n).size >= 2)
    val keepDst = rep.map(n => n -> out(n).map(_._2).min).toMap
    val keepSrc = rep.map(n => n -> in(n).map(_._1).min).toMap
    edges.filter { case (s, d) =>
      (!rep(s) || keepDst(s) == d) && (!rep(d) || keepSrc(d) == s)
    }.toSet
  }

  private def refReciprocalBest(edges: Seq[(Long, Long, Int)]): Set[(Long, Long, Int)] = {
    val bestOut = edges.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val bestIn = edges.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    edges.filter { case (s, d, l) => l == bestOut(s) && l == bestIn(d) }.toSet
  }

  test("transReduceFrom agrees with the naive 2-path reference on random graphs") {
    val rnd = new Random(11)
    for (_ <- 1 to 12) {
      val n = 3 + rnd.nextInt(20)
      val edges = randomEdges(rnd, n, 1 + rnd.nextInt(2 * n))
      val got = GraphOps.transReduceFrom(edges.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == refTransReduce(edges), s"edges=$edges")
    }
  }

  test("repeatCutRoundFrom agrees with the naive reference on random graphs") {
    val rnd = new Random(23)
    for (_ <- 1 to 12) {
      val n = 3 + rnd.nextInt(15)
      val edges = randomEdges(rnd, n, 1 + rnd.nextInt(3 * n))
      val got = GraphOps.repeatCutRoundFrom(edges.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == refRepeatCut(edges), s"edges=$edges")
    }
  }

  test("reciprocalBestFrom agrees with the naive reference on random weighted graphs") {
    val rnd = new Random(31)
    for (_ <- 1 to 12) {
      val n = 3 + rnd.nextInt(15)
      val edges = randomEdges(rnd, n, 1 + rnd.nextInt(2 * n))
        .map { case (s, d) => (s, d, 2 + rnd.nextInt(3)) }
      val got = GraphOps.reciprocalBestFrom(edges.toDF("src", "dst", "overlap_len"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == refReciprocalBest(edges), s"edges=$edges")
    }
  }

  test("repeat cut leaves no violated repeat boundary (postcondition on random graphs)") {
    val rnd = new Random(47)
    for (_ <- 1 to 8) {
      val edges = randomEdges(rnd, 12, 30)
      var cur = edges.toSet
      // apply rounds until fixpoint (bounded), then assert the invariant
      var changed = true
      var guard = 0
      while (changed && guard < 10) {
        val next = refRepeatCut(cur.toSeq)
        changed = next != cur
        cur = next
        guard += 1
      }
      val out = cur.groupBy(_._1).view.mapValues(_.size).toMap
      val in = cur.groupBy(_._2).view.mapValues(_.size).toMap
      val bad = cur.exists { case (s, d) =>
        out.getOrElse(s, 0) >= 2 && in.getOrElse(s, 0) >= 2 ||
        out.getOrElse(d, 0) >= 2 && in.getOrElse(d, 0) >= 2
      }
      assert(!bad, s"repeat boundary survives fixpoint: $cur")
    }
  }
}
