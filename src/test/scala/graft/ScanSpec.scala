package graft

import graft.operators.Scan
import org.apache.spark.sql.functions._

/** The distributed global prefix-scan kernel ([[graft.operators.Scan]]):
  * exact against a driver-side reference on shuffled input, across
  * partition boundaries, including the degenerate more-partitions-than-
  * rows cut. The kernel's one-partitioning materialization guarantee is
  * exercised by construction (every call consumes the stamped table on
  * both the window and totals branches). */
class ScanSpec extends GraftSpec {
  import spark.implicits._

  test("exclusiveRunningSum matches the driver prefix sum over a shuffled total order") {
    val n = 500
    // key = permutation of 0..n-1 (distinct full sort keys), weight = key % 5
    val rows = (0 until n).map { i =>
      val k = (i * 37) % n
      (k.toLong, (k % 5).toLong)
    }
    val df = rows.toDF("k", "w").repartition(13)
    val got = Scan.exclusiveRunningSum(df, 7, Seq("k"), GraftConfig.default)
      .select("k", "run_sum").as[(Long, Long)].collect().toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (k, w) =>
      assert(got(k) == acc, s"k=$k")
      acc += w
    }
  }

  test("exclusiveRunningMin matches the driver prefix min; globally-first row is NULL") {
    val n = 300
    val rows = (0 until n).map { i =>
      val k = (i * 113) % n
      (k.toLong, ((k * 31) % 97).toLong)
    }
    val df = rows.toDF("k", "v").repartition(11)
    val got = Scan.exclusiveRunningMin(df, 5, Seq("k"), "v", GraftConfig.default)
      .select(col("k"), col("run_min")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    var acc: Option[Long] = None
    rows.sortBy(_._1).foreach { case (k, v) =>
      assert(got(k) == acc, s"k=$k")
      acc = Some(acc.fold(v)(math.min(_, v)))
    }
  }

  test("more range partitions than rows still scans exactly") {
    val df = Seq((3L, 1L), (1L, 1L), (2L, 1L)).toDF("k", "w")
    val got = Scan.exclusiveRunningSum(df, 16, Seq("k"), GraftConfig.default)
      .select("k", "run_sum").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
