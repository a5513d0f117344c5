package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Ck, GraftConfig}

/** Distributed GLOBAL running aggregates — the prefix-scan kernel.
  *
  * A running aggregate over a corpus-wide total order is the one window
  * shape Spark executes badly by default: no partition key means
  * WindowExec funnels every row into a single task. This kernel stitches
  * the same exact answer from pieces instead: range-partition by the
  * sort key (partition i holds a contiguous key range, ranges ordered by
  * partition index), compute per-partition running values with an
  * ordinary partitioned window, then lift the P-row table of
  * per-partition totals — whose own prefix aggregate is driver-scale —
  * over a broadcast join to seed each partition. Exact at any scale,
  * O(n log n), and partition-boundary-INVARIANT: the range sampler's cut
  * points never change the output, only the balance.
  *
  * Consumers: q233 skyline (dominance = exclusive running MIN over the
  * (price, size) order) and q236 interval-overlap counting (global order
  * ranks = exclusive running SUM over the event sweep). The pattern
  * extends to any associative aggregate (record-to-date marks,
  * cumulative distributions).
  *
  * Tie semantics: prefixes are EXCLUSIVE of the current row, and rows
  * sharing the full sort key see an order-dependent split among
  * themselves — consumers must either never read the running value on
  * weight-carrying rows (q236 reads probes only, which carry weight 0)
  * or de-duplicate the key space first (q233 scans distinct pairs).
  */
private[graft] object Scan {

  /** Range-partition and stamp the physical partition id ONCE, behind a
    * stage cut. The cut is load-bearing, not an optimization: the local
    * window and the per-partition-total aggregate both consume the
    * stamped table, and without materialization each branch re-executes
    * the range exchange as a SEPARATE RDD whose boundary sampler draws
    * a different seed — the two branches then disagree on pid and the
    * stitch silently corrupts (caught by the q236 oracle on first
    * verify: ±100s on interval ranks). One cut = one partitioning = one
    * truth. */
  private def stamped(df: DataFrame, parts: Int, ord: Seq[String],
      cfg: GraftConfig): DataFrame =
    Ck.lazyStage(
      df.repartitionByRange(parts, ord.map(col): _*)
        .withColumn("pid", spark_partition_id()),
      cfg)

  /** Exclusive running SUM of column `w` in `ord` order → `run_sum`
    * (0 for the globally-first rows). */
  def exclusiveRunningSum(df: DataFrame, parts: Int, ord: Seq[String],
      cfg: GraftConfig): DataFrame =
    exclusiveRunningSums(df, parts, ord, Seq("w"), cfg)
      .withColumnRenamed("run_w", "run_sum")

  /** Exclusive running SUMs of SEVERAL weight columns in one sweep —
    * `run_<w>` per column. One stamped cut, one window pass, one
    * stitch, however many aggregates ride it: the way to fold what
    * would be N separate global scans (e.g. q236's two interval ranks)
    * into one. */
  def exclusiveRunningSums(df: DataFrame, parts: Int, ord: Seq[String],
      ws: Seq[String], cfg: GraftConfig): DataFrame = {
    val rp = stamped(df, parts, ord, cfg)
    val wLoc = Window.partitionBy("pid").orderBy(ord.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ws.foldLeft(rp) { (d, w) =>
      d.withColumn(s"l_$w", coalesce(sum(col(w)).over(wLoc), lit(0L)))
    }
    val wPid = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    val pAggs = ws.map(w => sum(col(w)).as(s"p_$w"))
    val pst = rp.groupBy("pid").agg(pAggs.head, pAggs.tail: _*)
      .select(col("pid") +: ws.map(w =>
        coalesce(sum(col(s"p_$w")).over(wPid), lit(0L)).as(s"prev_$w")): _*)
    val joined = local.join(broadcast(pst), "pid")
    val out = ws.foldLeft(joined) { (d, w) =>
      d.withColumn(s"run_$w", col(s"l_$w") + col(s"prev_$w"))
    }
    out.drop("pid" +: ws.flatMap(w => Seq(s"l_$w", s"prev_$w")): _*)
  }

  /** Exclusive running MIN of column `v` in `ord` order → `run_min`
    * (NULL for the globally-first rows). */
  def exclusiveRunningMin(df: DataFrame, parts: Int, ord: Seq[String], v: String,
      cfg: GraftConfig): DataFrame = {
    val rp = stamped(df, parts, ord, cfg)
    val wLoc = Window.partitionBy("pid").orderBy(ord.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = rp.withColumn("lmin", min(col(v)).over(wLoc))
    val wPid = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    val pst = rp.groupBy("pid").agg(min(col(v)).as("pmin"))
      .withColumn("prev_min", min(col("pmin")).over(wPid))
      .select("pid", "prev_min")
    local.join(broadcast(pst), "pid")
      .withColumn("run_min", least(col("lmin"), col("prev_min")))
      .drop("pid", "lmin", "prev_min")
  }
}
