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
      cfg: GraftConfig): DataFrame = {
    val rp = stamped(df, parts, ord, cfg)
    val wLoc = Window.partitionBy("pid").orderBy(ord.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localSum = rp.withColumn("lsum", coalesce(sum(col("w")).over(wLoc), lit(0L)))
    val wPid = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    val pst = rp.groupBy("pid").agg(sum(col("w")).as("psum"))
      .withColumn("prev_sum", coalesce(sum(col("psum")).over(wPid), lit(0L)))
      .select("pid", "prev_sum")
    localSum.join(broadcast(pst), "pid")
      .withColumn("run_sum", col("lsum") + col("prev_sum"))
      .drop("pid", "lsum", "prev_sum")
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
