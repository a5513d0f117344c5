package graft

import graft.streaming.CdcStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized checks of the q300 merge fold against a naive in-driver
  * reference: random keyed I/U/D feeds with random seqs, folded under
  * random batchings and random batch orders, must always converge to
  * the per-key max-seq state with tombstones dropped. Seeded, so the
  * trials are deterministic. */
class CdcMergePropertySpec extends GraftSpec {
  import spark.implicits._

  private case class Ch(k: Long, seq: Long, op: String, cust: Long, status: String, price: Double)

  private def toDf(rows: Seq[Ch]): DataFrame =
    rows.map(c => (c.k, c.seq, c.op, c.cust, c.status, c.price))
      .toDF("k", "seq", "op", "c_cust", "c_status", "c_price")

  test("q300 property: random feeds under random batchings always fold to max-seq last-wins") {
    val rnd = new Random(97)
    for (trial <- 1 to 4) {
      val nKeys = 12
      val baseRows = (1L to nKeys.toLong).map(k => (k, k * 10, "O", k * 100.0, 0L, true))
      val base = baseRows
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "seq", "alive")
      // a random change feed: distinct (k, seq) pairs, random ops/values
      val feed = rnd.shuffle(
        (for (k <- 1L to (nKeys + 3).toLong; seq <- 1L to 4L) yield (k, seq))
          .filter(_ => rnd.nextBoolean()).toList)
        .map { case (k, seq) =>
          val op = Seq("I", "U", "D")(rnd.nextInt(3))
          Ch(k, seq, op, rnd.nextInt(1000).toLong, s"s${rnd.nextInt(5)}", rnd.nextInt(500) * 1.0)
        }
      // naive reference: per key, the max-seq change wins outright
      val expect = {
        val last = feed.groupBy(_.k).map { case (k, cs) => k -> cs.maxBy(_.seq) }
        val fromBase = baseRows.flatMap { case (k, cust, st, pr, _, _) =>
          last.get(k) match {
            case None => Some(k -> ((cust, st, pr, 0L)))
            case Some(c) if c.op == "D" => None
            case Some(c) => Some(k -> ((c.cust, c.status, c.price, c.seq)))
          }
        }.toMap
        val inserted = last.collect {
          case (k, c) if k > nKeys && c.op != "D" => k -> ((c.cust, c.status, c.price, c.seq))
        }
        fromBase ++ inserted
      }
      // random batching: split the feed into 1..4 random batches, fold
      // in a random order (out-of-order delivery)
      val nb = 1 + rnd.nextInt(4)
      val batches = rnd.shuffle(feed.groupBy(_ => rnd.nextInt(nb)).values.toList)
      val folded = batches.foldLeft(base)((s, b) => CdcStream.mergeBatch(s, toDf(b)))
      val got = folded.filter(col("alive")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4))))
        .toMap
      assert(got == expect, s"trial $trial: fold diverged from the max-seq reference " +
        s"(batches=${batches.length}, feed=${feed.length})")
    }
  }
}
