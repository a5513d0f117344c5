package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftConfig
import graft.sources.Tables

/** Relational query core — the general analytics surface.
  *
  * Cross-engine determinism: double addition is order-sensitive and Spark
  * sums in shuffle-arrival order, so every floating aggregate here
  * accumulates in exact DECIMAL (per-row cast is a deterministic half-up
  * rounding of identical input doubles on any engine) and casts the exact
  * result to DOUBLE once at the end. The DuckDB oracles use the same
  * construction, making results bitwise-comparable.
  */
class RelationalOps(val cfg: GraftConfig) {
  private val SessionGapMs: Long = cfg.sessionGapMs
  private val HighValueOrder: Double = cfg.highValueOrder

  /** SUM(CAST(c AS DECIMAL(p,s))) :: DOUBLE — order-insensitive exact sum. */
  def dsum(c: Column, p: Int = 18, s: Int = 2): Column =
    sum(c.cast(s"decimal($p,$s)")).cast("double")

  /** Grouped aggregation over the fact table (TPC-H Q1 shape).
    * Scale: pure map-side-combinable hash aggregate; shuffles only the
    * (flag,status) groups. Survives any fact-table size. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("count_order"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6).as("sum_disc_price"),
        dsum(col("l_discount"), 18, 4).as("sum_disc"))

  def q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  count(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Star-schema join + filter + group. Scale: nation/region are broadcast
    * explicitly; customer⋈orders shuffles on the join key only after the
    * status filter is pushed to the orders scan. */
  def q2JoinFilter(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("num_orders"),
           dsum(col("o_totalprice")).as("total_revenue"))
  }

  def q2Sql: String =
    """SELECT r_name, n_name, count(*) AS num_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY r_name, n_name""".stripMargin

  /** Deterministic top-k by aggregate (ties broken by key, so the row SET
    * is stable). Scale: partial agg then a k-row ordered limit — Spark
    * runs TakeOrderedAndProject, no full sort materialization. */
  def q3TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  def q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
      |FROM lineitem GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Window functions: running spend + dense spend rank per customer.
    * Scale: single shuffle on o_custkey serves both windows. Running sum
    * accumulates in DECIMAL so every prefix is exact. */
  def q4Window(spark: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val bySpend = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(byDate).cast("double").as("running_spend"),
        rank().over(bySpend).as("spend_rank"))
  }

  def q4Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_spend,
      |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS spend_rank
      |FROM orders""".stripMargin

  /** Hierarchical aggregation (ROLLUP region→nation). */
  def q5Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           dsum(col("c_acctbal")).as("total_acctbal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
              coalesce(col("n_name"), lit("ALL")).as("nation"),
              col("n_customers"), col("total_acctbal"))
  }

  def q5Sql: String =
    """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
      |  count(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)""".stripMargin

  /** Left-semi join: customers holding at least one high-value order.
    * Scale: semi-join shuffles only keys of the filtered orders side. */
  def q6SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > HighValueOrder)
    Tables.customer(spark, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  def q6Sql: String =
    s"""SELECT c_custkey, c_name, c_mktsegment FROM customer
       |WHERE EXISTS (SELECT 1 FROM orders
       |  WHERE o_custkey = c_custkey AND o_totalprice > $HighValueOrder)""".stripMargin

  /** Event-time tumbling-window aggregation (batch twin of the
    * Structured Streaming pipeline in graft.streaming). Hour keys are
    * emitted as strings so both engines compare identically. */
  def q7EventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
               col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"),
           dsum(col("value"), 25, 6).as("total_value"))

  def q7Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
      |  count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Gap-based sessionization (30-min inactivity starts a new session).
    * Scale: one shuffle on user_id; both lag and the running flag-sum ride
    * the same window partitioning. */
  def q8Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w) > SessionGapMs, 1)
          .otherwise(when(lag(col("ts"), 1).over(w).isNull, 1).otherwise(0)).as("new_sess"))
      .select(col("user_id"), col("event_id"), col("ts"),
        sum(col("new_sess")).over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("session_id"))
      .select("user_id", "event_id", "session_id")
  }

  def q8Sql: String =
    s"""WITH flags AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 1
       |         WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > $SessionGapMs THEN 1
       |         ELSE 0 END AS new_sess
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, event_id,
       |  CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |FROM flags""".stripMargin

  /** q115: NATIVE session windows — Spark's `session_window` operator
    * (dynamic-gap windows merged inside the aggregate) over the events
    * table, the declarative twin of q8's lag-and-running-sum
    * sessionization: one shuffle on user_id, sessions = [first event,
    * last event + gap). Timestamps truncate to ms BEFORE windowing so
    * both engines evaluate the gap predicate on identical values; the
    * oracle rebuilds the same sessions with the island method (break
    * at diff ≥ gap — session_window merges only OVERLAPPING windows,
    * so an exactly-gap-apart event starts a new session). */
  def q115SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), timestamp_millis(unix_millis(col("ts"))).as("tms"))
      .groupBy(col("user_id"),
        session_window(col("tms"), s"$SessionGapMs milliseconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("session_start_ms"),
        unix_millis(col("sw.end")).as("session_end_ms"),
        col("n_events"))

  def q115Sql: String =
    s"""WITH ev AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
       |f AS (SELECT user_id, ms,
       |    CASE WHEN lag(ms) OVER w IS NULL THEN 1
       |         WHEN ms - lag(ms) OVER w >= $SessionGapMs THEN 1
       |         ELSE 0 END AS brk
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
       |g AS (SELECT user_id, ms, SUM(brk) OVER (PARTITION BY user_id
       |    ORDER BY ms ROWS UNBOUNDED PRECEDING) AS sid FROM f)
       |SELECT user_id, min(ms) AS session_start_ms,
       |  max(ms) + $SessionGapMs AS session_end_ms, count(*) AS n_events
       |FROM g GROUP BY user_id, sid""".stripMargin

  /** q97: batch CDC apply — MERGE a keyed change set (inserts, updates,
    * deletes) into a snapshot with ONE full-outer join: change values
    * win via coalesce, 'D' rows drop, base-only rows pass through. The
    * snapshot-maintenance primitive behind incremental table formats,
    * expressed engine-natively. The change set here is derived
    * deterministically from the snapshot itself (key%10: 0→delete,
    * 1→update price+1000, 2→insert re-keyed) so the query is
    * self-contained and the oracle exact.
    *
    * Scale: one shuffle join on the key — and with the base laid out
    * via [[graft.sources.Tables.writeBucketed]] on the key, the base
    * side joins exchange-free, which is exactly how a daily 100 TB
    * snapshot absorbs a 0.1% change feed without rewriting itself
    * through a full shuffle. */
  def q97CdcApply(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val ch = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 <= 2)
      .select(
        when(col("o_orderkey") % 10 === 2, col("o_orderkey") + 10000000L)
          .otherwise(col("o_orderkey")).as("k"),
        when(col("o_orderkey") % 10 === 0, "D")
          .when(col("o_orderkey") % 10 === 1, "U")
          .otherwise("I").as("op"),
        col("o_custkey").as("c_cust"),
        col("o_orderstatus").as("c_status"),
        (col("o_totalprice") + lit(1000.0)).as("c_price"))
    base.join(ch, base("o_orderkey") === ch("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("k"), col("o_orderkey")).as("o_orderkey"),
        coalesce(col("c_cust"), col("o_custkey")).as("o_custkey"),
        coalesce(col("c_status"), col("o_orderstatus")).as("o_orderstatus"),
        coalesce(col("c_price"), col("o_totalprice")).as("o_totalprice"))
  }

  def q97Sql: String =
    """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
      |ch AS (SELECT
      |    CASE WHEN o_orderkey % 10 = 2 THEN o_orderkey + 10000000 ELSE o_orderkey END AS k,
      |    CASE WHEN o_orderkey % 10 = 0 THEN 'D'
      |         WHEN o_orderkey % 10 = 1 THEN 'U' ELSE 'I' END AS op,
      |    o_custkey AS c_cust, o_orderstatus AS c_status,
      |    o_totalprice + 1000.0 AS c_price
      |  FROM orders WHERE o_orderkey % 10 <= 2)
      |SELECT coalesce(ch.k, base.o_orderkey) AS o_orderkey,
      |  coalesce(ch.c_cust, base.o_custkey) AS o_custkey,
      |  coalesce(ch.c_status, base.o_orderstatus) AS o_orderstatus,
      |  coalesce(ch.c_price, base.o_totalprice) AS o_totalprice
      |FROM base FULL OUTER JOIN ch ON ch.k = base.o_orderkey
      |WHERE ch.op IS NULL OR ch.op <> 'D'""".stripMargin

  /** q111: CUBE aggregation — every grouping-set combination over
    * (returnflag, linestatus) in one pass [q5's rollup widened to the
    * full lattice]: Spark expands the cube map-side (each input row
    * fans to its 4 grouping sets before the exchange), so the shuffle
    * carries |groups|×4 partial aggregates, not the fact table ×4. */
  /** q186: q97's CDC MERGE with the base snapshot actually PERSISTED
    * through the bucketed layout — the end-to-end instance of SURVEY
    * §4's "bucketed layouts for repeated stable-key joins" claim that
    * BucketingSpec proves abstractly. The snapshot is written ONCE via
    * [[graft.sources.Tables.writeBucketed]] (bucketBy+sortBy the merge
    * key) and read back as a bucketed table, so the full-outer merge
    * join needs NO exchange on the snapshot side: the scan's bucket
    * partitioning already satisfies the join's distribution, and only
    * the (small) change feed shuffles — at 100 TB that is a daily
    * snapshot absorbing a 0.1% feed without re-shuffling itself
    * (PlanSpec pins SortMergeJoin + exactly one Exchange, on the feed
    * side). The merge hint pins the at-scale plan shape: at test sf the
    * planner would broadcast the feed and bypass the bucketed scan
    * entirely. Output and oracle are exactly q97's (persistence through
    * the layout is semantics-free — that is the point). */
  def q186BucketedCdc(spark: SparkSession, dir: String): DataFrame = {
    val snap = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    // the warehouse LOCATION outlives the session-local metastore: a
    // fresh session's overwrite would trip LOCATION_ALREADY_EXISTS on a
    // prior run's directory, so scrub both registrations
    spark.sql("DROP TABLE IF EXISTS graft_q186_base")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_q186_base")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    graft.sources.Tables.writeBucketed(snap, "graft_q186_base", "o_orderkey", buckets = 8)
    val base = spark.table("graft_q186_base")
    val ch = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 <= 2)
      .select(
        when(col("o_orderkey") % 10 === 2, col("o_orderkey") + 10000000L)
          .otherwise(col("o_orderkey")).as("k"),
        when(col("o_orderkey") % 10 === 0, "D")
          .when(col("o_orderkey") % 10 === 1, "U")
          .otherwise("I").as("op"),
        col("o_custkey").as("c_cust"),
        col("o_orderstatus").as("c_status"),
        (col("o_totalprice") + lit(1000.0)).as("c_price"))
    base.hint("merge").join(ch, base("o_orderkey") === ch("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("k"), col("o_orderkey")).as("o_orderkey"),
        coalesce(col("c_cust"), col("o_custkey")).as("o_custkey"),
        coalesce(col("c_status"), col("o_orderstatus")).as("o_orderstatus"),
        coalesce(col("c_price"), col("o_totalprice")).as("o_totalprice"))
  }

  def q111Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
              col("n_items"), col("sum_qty"))

  def q111Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q112: PIVOT — per-user event counts unstacked to one column per
    * event type. The value list is FIXED (not discovered), so the
    * output schema is static and the plan is a single map-side-
    * combinable aggregate of conditional counts — no distinct-values
    * pre-query, no second shuffle, exactly how a 100 TB pivot must run
    * (Spark's dynamic pivot first collects the distinct values to the
    * driver). */
  def q112Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select(col("user_id") +: EventTypes.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)

  def q112Sql: String = {
    val cols = EventTypes.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
      .mkString(",\n|  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY user_id""".stripMargin
  }

  /** q113: the full analytic-window suite in one keyed pass — lag,
    * lead, first/last in frame, ntile quartile, percent_rank and
    * cume_dist — over orders per priority class. One shuffle on the
    * partition key serves every function (one Window operator; the
    * ordering is total via the (price, key) tie-break, so ntile and
    * the rank ratios are deterministic). percent_rank/cume_dist are
    * ratios of integer ranks — engine-exact doubles. */
  def q113WindowSuite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(w).as("min_price"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  def q113Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  first_value(o_totalprice) OVER w AS min_price,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |  ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** q106: shipping priority — the TPC-H Q3 shape: revenue of undelivered
    * orders for one market segment, top ${cfg.shipPriorityTopK} by
    * revenue. The canonical selective-multiway-join plan: the segment-
    * filtered customer dim BROADCASTS into the orders scan (filter
    * pushed to the date predicate), the surviving orders shuffle-join
    * lineitem on the order key, and the top-k is a
    * TakeOrderedAndProject (per-partition top-k, one bounded merge) —
    * never a global sort. Revenue uses the decimal-accumulate dsum, so
    * the double compares in the ordering are bit-identical across
    * engines; ties break on the order key. */
  def q106ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = s"TIMESTAMP'${cfg.shipPriorityDate}'"
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === cfg.shipPrioritySegment)
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(expr(s"o_orderdate < $cut"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    Tables.lineitem(spark, dir)
      .filter(expr(s"l_shipdate > $cut"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        // orders dates are TIMESTAMP_NTZ; the session runs UTC, so the
        // cast is the identity instant and matches DuckDB's epoch_ms
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate_ms"), col("l_orderkey"))
      .limit(cfg.shipPriorityTopK)
  }

  def q106Sql: String =
    s"""SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority,
       |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = '${cfg.shipPrioritySegment}'
       |  AND o_orderdate < TIMESTAMP '${cfg.shipPriorityDate}'
       |  AND l_shipdate > TIMESTAMP '${cfg.shipPriorityDate}'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, o_orderdate_ms, l_orderkey
       |LIMIT ${cfg.shipPriorityTopK}""".stripMargin

  /** q107: local supplier volume — the TPC-H Q5 shape: revenue by
    * nation for one region and order year, counting only lineitems
    * whose supplier sits in the CUSTOMER's nation. Join discipline for
    * the 6-way join: region→nation→customer collapse into one small
    * broadcast dim; orders (year-filtered) shuffle-joins lineitem on
    * the order key — the only big-big join, on the natural key both
    * sides already produce; supplier broadcasts; the same-nation
    * predicate rides the supplier join, not a post-filter over a wider
    * join. One row per nation out. */
  def q107LocalVolume(spark: SparkSession, dir: String): DataFrame = {
    val custNat = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).filter(col("r_name") === cfg.localVolumeRegion),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ord = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === cfg.localVolumeYear)
      .join(broadcast(custNat), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_nationkey", "n_name")
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Reusable SALTED equi-join — the manual skew remedy for the case
    * AQE cannot fix: a hot key whose rows must co-locate with a dim too
    * large to broadcast (AQE's skew split only divides SORT-MERGE
    * partitions of the PROBE side; a hash-join build side, or skew
    * inside an aggregation-feeding exchange, stays hot). Each dim row
    * is replicated ${cfg.saltFactor} ways with a salt ordinal; each
    * fact row derives ONE salt from a uniformly-distributed column and
    * probes exactly its own replica — the hot key's fact rows spread
    * over saltFactor tasks, at the cost of dim·saltFactor build rows.
    * Exactness: every fact row still meets the full dim row for its
    * key (just one specific clone), so the result set is IDENTICAL to
    * the unsalted join (RelationalSpec proves it). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factSalt: Column): DataFrame =
    saltedJoin(fact, dim, key, factSalt, cfg.saltFactor)

  /** Explicit-factor form — q153 passes the configured constant, q265
    * passes the sketch-derived one. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factSalt: Column, s: Int): DataFrame = {
    val salted = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(s - 1))))
    fact.withColumn("__salt", pmod(factSalt, lit(s)).cast("int"))
      .join(salted.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** The q265 salt choice: ceil(CMS hottest-key upper bound /
    * cfg.saltTargetRows), floored at 1 and capped by cfg.saltFactor·4
    * (replication cost guard). Exposed for the spec.
    *
    * NOTE (documented per the round-12 advice): this runs the sketch
    * pass EAGERLY — building q265's DataFrame launches one
    * fixed-state aggregate job before the plan exists, because the
    * salt factor is a plan PARAMETER (the join's replication arity),
    * not a runtime value. That is the same build-time/run-time split a
    * CBO statistics pass has; callers constructing plans without
    * executing them (e.g. registry enumeration followed by .explain)
    * pay one small scan. An empty keys frame yields a NULL upper
    * bound → salt 1 (plain join), handled explicitly. */
  private[graft] def sketchSaltFactor(keys: DataFrame): Int = {
    val est = Option(Sketch.cmsMaxFreq(keys).collect().head
      .getAs[java.lang.Long]("max_freq_est")).map(_.longValue).getOrElse(0L)
    val raw = (est + cfg.saltTargetRows - 1) / cfg.saltTargetRows
    math.max(1L, math.min(raw, cfg.saltFactor.toLong * 4)).toInt
  }

  /** q265: SKETCH-TUNED salted join — the round-11 verdict's #6: q124
    * diagnoses skew and q153 salts with a fixed hand-set factor; this
    * query derives the factor FROM the sketch at plan-build time —
    * salt = ceil(est_max_freq / $saltTargetRows) where est_max_freq is
    * the CMS upper bound on the hottest key's multiplicity
    * ([[SketchOps.cmsMaxFreq]]) — turning the two diagnostics into one
    * self-tuning join. The sketch pass is one map-combinable aggregate
    * into fixed-size state and ONE one-row collect; a mild corpus
    * buys little replication, a pathological one buys spread
    * automatically. The salt remains an implementation detail the
    * result must not show: the oracle is the PLAIN join (q153's),
    * which is the exactness proof re-run every round. */
  def q265SketchSalt(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
    val s = sketchSaltFactor(ev.select(col("user_id").cast("string").as("k")))
    val dim = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value"), 25, 6).as("total_value"))
    saltedJoin(ev.select("event_id", "user_id"), dim, "user_id", col("event_id"), s)
      .select("event_id", "user_id", "n_events", "total_value")
  }

  def q265Sql: String = q153Sql

  /** q153: salted user enrichment — every event joined to its user's
    * per-user profile (event count + decimal-exact value total) through
    * [[saltedJoin]], salt drawn from the event id. The q124 skew
    * profiler's answer put to work: when its skew_ratio flags a user
    * key too hot for one task and the profile table is corpus-keyed
    * (no broadcast), this is the shape that keeps the enrichment
    * running at 100 TB. The salt is an implementation detail the
    * result must not show — the oracle is the PLAIN join. */
  def q153SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
    val dim = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value"), 25, 6).as("total_value"))
    saltedJoin(ev.select("event_id", "user_id"), dim, "user_id", col("event_id"))
      .select("event_id", "user_id", "n_events", "total_value")
  }

  def q153Sql: String =
    s"""SELECT event_id, e.user_id, n_events, total_value
       |FROM events e JOIN (
       |  SELECT user_id, count(*) AS n_events,
       |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
       |  FROM events GROUP BY 1) u ON e.user_id = u.user_id""".stripMargin

  /** q151: large-volume orders — the TPC-H Q18 shape: orders whose
    * summed lineitem quantity clears ${cfg.bigOrderMinQty}, joined back
    * to orders and customer. The canonical HAVING + join-back pattern:
    * the aggregate runs on the natural order key (bounded lines per
    * order — no skew), the threshold keeps only the distribution's
    * tail, and that survivor set drives BOTH subsequent joins as the
    * broadcast side — the orders and customer scans are never
    * shuffled. If the threshold were loosened to keep a non-tiny
    * survivor set, drop the hints and let AQE pick the join strategy.
    * Quantity sums accumulate in DECIMAL (order-insensitive), so the
    * HAVING comparison and the final double are engine-exact. */
  def q151BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val qty = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("dq"))
      .filter(col("dq") > lit(cfg.bigOrderMinQty).cast("decimal(18,2)"))
    val ord = Tables.orders(spark, dir)
      .join(broadcast(qty), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_totalprice"), col("dq").cast("double").as("sum_qty"))
    Tables.customer(spark, dir)
      .join(broadcast(ord), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate_ms"), col("o_totalprice"), col("sum_qty"))
  }

  def q151Sql: String =
    s"""WITH qty AS (
       |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS dq
       |  FROM lineitem GROUP BY 1
       |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > ${cfg.bigOrderMinQty})
       |SELECT c_custkey, c_name, o_orderkey,
       |  epoch_ms(o_orderdate) AS o_orderdate_ms, o_totalprice,
       |  CAST(dq AS DOUBLE) AS sum_qty
       |FROM qty
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey""".stripMargin

  /** q152: late-order priority count — the TPC-H Q4 shape: how many
    * orders per priority class (one year's window) had at least one
    * lineitem shipped more than ${cfg.lateShipDays} days after the
    * order date. EXISTS compiles to a LEFT SEMI join with the ship-lag
    * riding the join condition (each order emits at most once no
    * matter how many late lines it has); both sides shuffle on the
    * natural order key — bounded rows per key, no skew — and the year
    * filter pushes to the orders scan, so AQE is free to broadcast the
    * filtered orders side. Timestamps compare in epoch ms (the q8 /
    * Temporal idiom) so both engines evaluate the lag identically. */
  def q152LateOrders(spark: SparkSession, dir: String): DataFrame = {
    val lagMs = cfg.lateShipDays.toLong * 86400000L
    val ord = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === cfg.waitYear)
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("ship_ms") > col("odate_ms") + lagMs, "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  def q152Sql: String =
    s"""SELECT o_orderpriority, count(*) AS n_orders
       |FROM orders o
       |WHERE year(o_orderdate) = ${cfg.waitYear}
       |  AND EXISTS (SELECT 1 FROM lineitem l
       |    WHERE l.l_orderkey = o.o_orderkey
       |      AND epoch_ms(l_shipdate) >
       |          epoch_ms(o_orderdate) + CAST(${cfg.lateShipDays} AS BIGINT) * 86400000)
       |GROUP BY o_orderpriority""".stripMargin

  /** q177: explicit GROUPING SETS — the general grouping-lattice form
    * under q5's rollup and q111's cube: a hand-picked set list
    * ((flag, status), (flag), ()) with grouping_id() disambiguating
    * which set each output row belongs to (a NULL group value vs a
    * grouped-out column are different things — the id is the only
    * sound discriminator). One pass: Spark expands the set list
    * map-side exactly like cube/rollup, so the exchange carries
    * \|groups\|×3 partials, never the fact table ×3; decimal-exact
    * sums; both engines use the same leftmost-column-most-significant
    * grouping-bit convention (spec-pinned). */
  def q177GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select("l_returnflag", "l_linestatus", "gid", "n_items", "sum_qty")

  def q177Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       |  count(*) AS n_items,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  /** q178: month-over-month revenue — the dashboard classic: monthly
    * discounted revenue off the ship date with the previous month's
    * value and the absolute delta alongside. The corpus collapses to
    * the MONTH GRID first (map-combinable decimal aggregate), so the
    * lag window runs over a calendar-bounded table — corpus-
    * independent, the q110 bounded-window rule, NOT a corpus sort;
    * month keys are integer year·100+month (calendar fields agree
    * across engines on UTC timestamps), deltas subtract two
    * decimal-derived doubles (deterministic). First month's delta is
    * NULL — there is no prior month, not a zero change. */
  def q178MonthlyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.lineitem(spark, dir)
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("ym"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6)
        .as("revenue"))
    val w = Window.orderBy(col("ym"))
    monthly
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("delta", col("revenue") - col("prev_revenue"))
  }

  def q178Sql: String =
    s"""WITH m AS (SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
       |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
       |      AS revenue
       |  FROM lineitem GROUP BY 1)
       |SELECT ym, revenue,
       |  lag(revenue) OVER (ORDER BY ym) AS prev_revenue,
       |  revenue - lag(revenue) OVER (ORDER BY ym) AS delta
       |FROM m""".stripMargin

  /** q165: INCREMENTAL aggregate maintenance — the materialized-rollup
    * twin of q133's incremental dedup and the production shape of
    * every daily-ingest dashboard: the per-(user, day) rollup is
    * PERSISTED once over the base corpus, and each new delta merges
    * into it by re-aggregating partials — never re-reading the base
    * EVENTS. Exact because both layers are mergeable aggregates:
    * counts add, and value totals accumulate in DECIMAL (associative,
    * order-free), casting to double only at the very end — so the
    * merged table is bit-identical to a full recompute (the oracle IS
    * the full recompute; RelationalSpec asserts it frame-for-frame).
    * Base/delta membership is the content-stable md5 split (q68/q133
    * discipline). At 100 TB the persisted rollup is the
    * `writeBucketed` case: the merge becomes an exchange-free
    * co-partitioned union-aggregate with cost ∝ |delta|. */
  def q165IncrementalAgg(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Scratch.withRunDir(spark, dir, "aggbase") { basePath =>
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .withColumn("b", substring(md5(col("event_id").cast("string")), 1, 2))
    def rollup(df: DataFrame): DataFrame =
      df.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(25,6)")).as("sum_value"))
    rollup(ev.filter(col("b") < cfg.splitTrainUpper))
      .write.mode("overwrite").parquet(basePath)
    val base = spark.read.parquet(basePath)
    val delta = rollup(ev.filter(col("b") >= cfg.splitTrainUpper))
    base.unionAll(delta)
      .groupBy("user_id", "day")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).as("sum_value"))
      .select(col("user_id"), col("day"), col("n_events"),
        col("sum_value").cast("double").as("total_value"))
    }

  def q165Sql: String =
    s"""SELECT user_id, epoch_ms(ts) // 86400000 AS day,
       |  count(*) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
       |FROM events GROUP BY 1, 2""".stripMargin

  /** q166: supplier diversity per part group — the TPC-H Q16 shape:
    * how many DISTINCT suppliers ship each (brand, size) family,
    * excluding suppliers in bad standing (acctbal <
    * ${cfg.suppExcludeBelowAcctbal} — Q16's complaint filter, as a
    * broadcast ANTI join so exclusion never post-filters a wider
    * product). The (part, supplier) pairs come pre-distinct off
    * lineitem on its natural keys; the distinct count plans as
    * Spark's two-phase Expand aggregate — per-group state never holds
    * a supplier SET in one buffer (the q139 bounded-state rule).
    * Output is bounded by the brand × size domain. */
  def q166SupplierDiversity(spark: SparkSession, dir: String): DataFrame = {
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < cfg.suppExcludeBelowAcctbal)
      .select("s_suppkey")
    val ps = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
    ps.join(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  def q166Sql: String =
    s"""SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
       |JOIN part ON l_partkey = p_partkey
       |WHERE l_suppkey NOT IN (
       |  SELECT s_suppkey FROM supplier
       |  WHERE s_acctbal < ${cfg.suppExcludeBelowAcctbal})
       |GROUP BY 1, 2""".stripMargin

  /** q162: sole-blame suppliers — the TPC-H Q21 shape ("suppliers who
    * kept orders waiting") with its EXISTS + NOT-EXISTS pair COLLAPSED
    * into one aggregate: an order blames a supplier iff that supplier
    * shipped late (the EXISTS) and NO OTHER supplier did (the
    * NOT EXISTS) — i.e. the order's distinct-late-supplier count is
    * exactly 1. One distinct + one aggregate on the natural order key
    * replaces two correlated subquery joins over lineitem; min = max =
    * the blamed supplier when the count is 1. Late = shipped more than
    * ${cfg.lateShipDays} days past the order date (the q152
    * predicate), F-status orders only. Top-${cfg.soleBlameTopK} by
    * blame count plans as TakeOrderedAndProject; supplier names ride a
    * broadcast dim. */
  def q162SoleBlame(spark: SparkSession, dir: String): DataFrame = {
    val lagMs = cfg.lateShipDays.toLong * 86400000L
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"))
    val lateSup = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"))
      .join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("ship_ms") > col("odate_ms") + lagMs)
      .select("o_orderkey", "l_suppkey").distinct()
    val blame = lateSup.groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_late_sup"), min(col("l_suppkey")).as("s_suppkey"))
      .filter(col("n_late_sup") === 1)
    blame.groupBy("s_suppkey").agg(count(lit(1)).as("n_orders"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        Seq("s_suppkey"))
      .orderBy(col("n_orders").desc, col("s_name"))
      .limit(cfg.soleBlameTopK)
  }

  def q162Sql: String =
    s"""WITH late AS (
       |  SELECT DISTINCT o_orderkey, l_suppkey
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'F'
       |    AND epoch_ms(l_shipdate) >
       |        epoch_ms(o_orderdate) + CAST(${cfg.lateShipDays} AS BIGINT) * 86400000),
       |blame AS (
       |  SELECT o_orderkey, min(l_suppkey) AS s_suppkey
       |  FROM late GROUP BY 1 HAVING count(*) = 1)
       |SELECT b.s_suppkey, count(*) AS n_orders, s.s_name
       |FROM blame b JOIN supplier s USING (s_suppkey)
       |GROUP BY 1, 3
       |ORDER BY n_orders DESC, s_name
       |LIMIT ${cfg.soleBlameTopK}""".stripMargin

  def q107Sql: String =
    s"""SELECT n_name,
       |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = '${cfg.localVolumeRegion}'
       |  AND year(o_orderdate) = ${cfg.localVolumeYear}
       |GROUP BY n_name""".stripMargin

  /** q189: customer order-count DISTRIBUTION — the TPC-H Q13 shape
    * ("how many customers placed 0, 1, 2, … orders"), the canonical
    * left-outer-join + two-level aggregate, with Q13's comment filter
    * standing on the priority column this schema has. Scale shape:
    * orders PRE-AGGREGATE to (custkey, count) BEFORE the outer join —
    * the textbook formulation left-joins the raw orders table and
    * counts after, shuffling every order row through the join; the
    * pre-aggregate is map-combinable, leaves the join side UNIQUE per
    * customer (1:1 fanout, no hot-customer amplification), and is
    * exactly the same distribution. Zero-order customers arrive via
    * the left join's null → coalesce 0. */
  def q189CustDist(spark: SparkSession, dir: String): DataFrame = {
    val oc = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= cfg.custDistExcludePriority)
      .groupBy("o_custkey").agg(count(lit(1)).as("oc"))
    Tables.customer(spark, dir).select("c_custkey")
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("oc"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
  }

  def q189Sql: String =
    s"""WITH oc AS (SELECT o_custkey, count(*) AS oc FROM orders
       |  WHERE o_orderpriority <> '${cfg.custDistExcludePriority}' GROUP BY 1)
       |SELECT c_count, count(*) AS custdist FROM (
       |  SELECT coalesce(oc, 0) AS c_count
       |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey)
       |GROUP BY c_count""".stripMargin

  /** q190: small-quantity revenue — the TPC-H Q17 shape: yearly-average
    * revenue lost to orders under 20% of a part's average quantity,
    * for one audited brand. The correlated-average subquery becomes a
    * per-part aggregate joined back 1:1 (unique per part), and the
    * threshold test is EXACT: quantities fix to BIGINT at 1e2, and
    * qty < 0.2·avg cross-multiplies to 5·q100·n < s100 — no float
    * division at the decision boundary (the q131 accept-test
    * discipline), so both engines keep identical rows. The brand
    * filter broadcasts into the fact scan; the stats side inherits the
    * same filtered subset, so the join-back is broadcast-sized no
    * matter the corpus. One fixed /7.0 division at the end. */
  def q190SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val pk = Tables.part(spark, dir)
      .filter(col("p_brand") === cfg.smallQtyBrand).select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        expr("CAST(floor(l_quantity * 100) AS BIGINT)").as("q100"),
        col("l_extendedprice"))
    val stats = li.groupBy("l_partkey")
      .agg(sum(col("q100")).as("s100"), count(lit(1)).as("n"))
    li.join(broadcast(stats), Seq("l_partkey"))
      .filter(lit(5L) * col("q100") * col("n") < col("s100"))
      .agg((dsum(col("l_extendedprice"), 24, 6) / 7.0).as("avg_yearly"))
  }

  def q190Sql: String =
    s"""WITH li AS (SELECT l_partkey,
       |    CAST(floor(l_quantity * 100) AS BIGINT) AS q100, l_extendedprice
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand = '${cfg.smallQtyBrand}'),
       |st AS (SELECT l_partkey, CAST(SUM(q100) AS BIGINT) AS s100,
       |    count(*) AS n FROM li GROUP BY 1)
       |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / 7.0
       |    AS avg_yearly
       |FROM li JOIN st USING (l_partkey)
       |WHERE 5 * q100 * n < s100""".stripMargin

  /** q191: untapped customers — the TPC-H Q22 shape ("global sales
    * opportunity"): per selected nation (standing in for Q22's phone
    * country codes), DORMANT customers — none of their orders at or
    * after ${cfg.globalDormantSince} (on this corpus every customer
    * has SOME order, so Q22's literal no-orders test is structurally
    * vacuous; dormancy keeps the anti-join shape non-vacuous and is
    * the realistic churn question) — whose balance beats the selected
    * group's positive-balance average. The average threshold is
    * EXACT: balances fix to BIGINT at 1e2 and bal > s/n
    * cross-multiplies to bal100·n > s100 (one-row broadcast — no
    * float average at the boundary); dormancy is a LEFT ANTI join
    * against date-filtered orders, the date predicate pushed to the
    * orders scan. totacctbal is the exact integer sum with ONE final
    * /100.0. */
  def q191GlobalCustomers(spark: SparkSession, dir: String): DataFrame = {
    val ks = cfg.globalNationKeys.map(Int.box)
    val sel = Tables.customer(spark, dir)
      .filter(col("c_nationkey").isin(ks: _*))
      .select(col("c_custkey"), col("c_nationkey"),
        expr("CAST(floor(c_acctbal * 100) AS BIGINT)").as("bal100"))
    val thr = sel.filter(col("bal100") > 0)
      .agg(sum(col("bal100")).as("s100"), count(lit(1)).as("n"))
    val recent = Tables.orders(spark, dir)
      .filter(expr(s"o_orderdate >= TIMESTAMP'${cfg.globalDormantSince}'"))
      .select(col("o_custkey"))
    sel
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(thr))
      .filter(col("bal100") * col("n") > col("s100"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        (sum(col("bal100")).cast("double") / 100.0).as("totacctbal"))
  }

  def q191Sql: String =
    s"""WITH sel AS (SELECT c_custkey, c_nationkey,
       |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal100
       |  FROM customer
       |  WHERE c_nationkey IN (${cfg.globalNationKeys.mkString(", ")})),
       |thr AS (SELECT CAST(SUM(bal100) AS BIGINT) AS s100, count(*) AS n
       |  FROM sel WHERE bal100 > 0)
       |SELECT c_nationkey, count(*) AS numcust,
       |  CAST(CAST(SUM(bal100) AS BIGINT) AS DOUBLE) / 100.0 AS totacctbal
       |FROM sel, thr
       |WHERE bal100 * n > s100
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |    AND o_orderdate >= TIMESTAMP '${cfg.globalDormantSince}')
       |GROUP BY c_nationkey""".stripMargin

  /** q192: discounted revenue under DISJUNCTIVE bands — the TPC-H Q19
    * shape: revenue over an OR of (brand, size band, quantity band)
    * conjunctions. The scale design point of this classic is predicate
    * FACTORING: the disjunction alone pushes to neither scan, so the
    * implied unions ride along explicitly — p_brand IN (the three
    * brands) prunes the part dim before it broadcasts, and the
    * quantity envelope [1, 30] pushes into the fact scan — both
    * redundant conjuncts, semantically implied, and written
    * identically in the oracle so row sets match exactly. Quantities
    * are integral doubles; the band bounds are integer literals, so
    * the comparisons are exact on both engines. */
  def q192BandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
      .select("p_partkey", "p_brand", "p_size")
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30)))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6)
        .as("revenue"))
  }

  def q192Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand IN ('Brand#12', 'Brand#23', 'Brand#34')
      |  AND l_quantity >= 1 AND l_quantity <= 30
      |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |        AND l_quantity BETWEEN 1 AND 11)
      |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |        AND l_quantity BETWEEN 10 AND 20)
      |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  /** q199: market share — the TPC-H Q8 shape: the fraction of revenue
    * from customers of one REGION that flows through suppliers of one
    * NATION, per order year. The classic trap is computing numerator
    * and denominator as two passes over the same join tree (or worse,
    * a self-join); here both are ONE aggregate — the denominator is
    * the plain decimal revenue sum and the numerator a CONDITIONAL sum
    * gated on the supplier-nation flag that rides the broadcast
    * supplier map — so the share costs exactly one pass. The share is
    * a single division of two decimal-derived doubles (engine-exact);
    * region→nation→customer collapses to one broadcast dim (q107's
    * discipline), supplier carries its is-target flag broadcast. */
  def q199MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val regNations = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir)
        .filter(col("r_name") === cfg.marketShareRegion).select("r_regionkey"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = broadcast(Tables.customer(spark, dir)
      .join(regNations, col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey"))
    val supp = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).select("n_nationkey", "n_name"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), (col("n_name") === cfg.marketShareNation).as("is_target")))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_year")
      .agg(
        dsum(when(col("is_target"),
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)), 24, 6)
          .as("nation_revenue"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6)
          .as("total_revenue"))
      .withColumn("mkt_share", col("nation_revenue") / col("total_revenue"))
  }

  def q199Sql: String =
    s"""WITH rows_ AS (
       |  SELECT year(o_orderdate) AS o_year,
       |    l_extendedprice * (1.0 - l_discount) AS volume,
       |    ns.n_name = '${cfg.marketShareNation}' AS is_target
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation nc ON c_nationkey = nc.n_nationkey
       |  JOIN region ON nc.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ns ON s_nationkey = ns.n_nationkey
       |  WHERE r_name = '${cfg.marketShareRegion}')
       |SELECT o_year,
       |  CAST(SUM(CAST(CASE WHEN is_target THEN volume ELSE 0.0 END
       |    AS DECIMAL(24,6))) AS DOUBLE) AS nation_revenue,
       |  CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue,
       |  CAST(SUM(CAST(CASE WHEN is_target THEN volume ELSE 0.0 END
       |    AS DECIMAL(24,6))) AS DOUBLE)
       |    / CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS mkt_share
       |FROM rows_
       |GROUP BY o_year""".stripMargin

  /** q193: volume shipping between a nation pair — the TPC-H Q7 shape:
    * yearly discounted revenue of trade flowing EITHER direction
    * between two audited nations (supplier nation ≠ customer nation,
    * both named). Join discipline: the supplier and
    * customer→nation dims collapse to two BROADCAST maps carrying
    * their nation names, the only big-big join is lineitem ⋈ orders on
    * the natural order key, and the direction filter rides the
    * broadcast joins — never post-filtering a wider product. Output is
    * bounded by 2 directions × years. */
  def q193VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val (na, nb) = (cfg.volumeNationA, cfg.volumeNationB)
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
      .filter(col("n_name").isin(na, nb))
    val supp = broadcast(Tables.supplier(spark, dir)
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val cust = broadcast(Tables.customer(spark, dir)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "cust_nation")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
              (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6)
        .as("revenue"))
  }

  def q193Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS revenue
       |FROM (
       |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       |    year(l_shipdate) AS l_year,
       |    l_extendedprice * (1.0 - l_discount) AS volume
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ns ON s_nationkey = ns.n_nationkey
       |  JOIN nation nc ON c_nationkey = nc.n_nationkey
       |  WHERE (ns.n_name = '${cfg.volumeNationA}' AND nc.n_name = '${cfg.volumeNationB}')
       |     OR (ns.n_name = '${cfg.volumeNationB}' AND nc.n_name = '${cfg.volumeNationA}'))
       |GROUP BY 1, 2, 3""".stripMargin

  /** q202: min-cost supplier per part — the TPC-H Q2 shape, the last
    * distinct canon plan missing (the correlated "= (SELECT min(...))"
    * subquery DECORRELATED into aggregate + equality join-back — the
    * q190 discipline applied to a multiway dim chain). The corpus has
    * no partsupp table, so the supply catalog is DERIVED: a supplier's
    * unit cost for a part is its cheapest observed lineitem price per
    * unit, fixed to BIGINT cents (floor(price/qty·100) — one fixed
    * chain, exact on both engines; min and the equality join-back are
    * then integer-exact, so ties surface ALL achieving suppliers
    * deterministically, like Q2's result set). Plan: region suppliers
    * and the type-filtered part dim collapse to BROADCASTS that prune
    * the fact scan before any shuffle; offers aggregate once on
    * (part, supplier); the per-part min is a re-aggregation of that
    * small table; the join-back is aggregated⋈aggregated on the part
    * key (shuffled-hash — the min table scales with |part|, NOT
    * broadcast-safe at 100 TB). */
  def q202MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rs = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir)
        .join(Tables.region(spark, dir)
          .filter(col("r_name") === cfg.minCostRegion).select("r_regionkey"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
    val pf = broadcast(Tables.part(spark, dir)
      .filter(col("p_type") === cfg.minCostPartType)
      .select("p_partkey", "p_brand"))
    val offers = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      .join(rs.select("s_suppkey"), col("l_suppkey") === col("s_suppkey"))
      .join(pf.select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(expr("CAST(floor(l_extendedprice / l_quantity * 100) AS BIGINT)"))
        .as("cost100"))
    val minc = offers.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("cost100")).as("m"))
    offers
      .join(minc.hint("shuffle_hash"),
        col("l_partkey") === col("m_partkey") && col("cost100") === col("m"))
      .join(rs, col("l_suppkey") === col("s_suppkey"))
      .join(pf, col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_brand"),
        (col("cost100").cast("double") / 100.0).as("supply_cost"))
  }

  def q202Sql: String =
    s"""WITH rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name
       |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = '${cfg.minCostRegion}'),
       |pf AS (SELECT p_partkey, p_brand FROM part
       |  WHERE p_type = '${cfg.minCostPartType}'),
       |offers AS (SELECT l_partkey, l_suppkey,
       |    min(CAST(floor(l_extendedprice / l_quantity * 100) AS BIGINT)) AS cost100
       |  FROM lineitem JOIN rs ON l_suppkey = s_suppkey
       |  JOIN pf ON l_partkey = p_partkey
       |  GROUP BY 1, 2),
       |minc AS (SELECT l_partkey, min(cost100) AS m FROM offers GROUP BY 1)
       |SELECT rs.s_acctbal, rs.s_name, rs.n_name, o.l_partkey AS p_partkey,
       |  pf.p_brand, CAST(o.cost100 AS DOUBLE) / 100.0 AS supply_cost
       |FROM offers o
       |JOIN minc ON o.l_partkey = minc.l_partkey AND o.cost100 = minc.m
       |JOIN rs ON o.l_suppkey = rs.s_suppkey
       |JOIN pf ON o.l_partkey = pf.p_partkey""".stripMargin

  /** q203: part-value concentration — the TPC-H Q11 shape: per part,
    * the revenue flowing through ONE nation's suppliers, kept only
    * where it exceeds a fixed fraction of that nation's total — the
    * HAVING-against-a-global-scalar plan. The threshold is EXACT (the
    * q191 cross-multiply discipline lifted from integers to decimals):
    * per-part value and the grand total are both DECIMAL(24,6) sums of
    * the same one-chain volume cast — order-free, engine-identical —
    * and the filter is value·denom > total in decimal arithmetic, so
    * no float average ever sits at the boundary. Plan: the nation's
    * supplier keys broadcast into the fact scan; ONE aggregate builds
    * the per-part values; the one-row total re-aggregates that output
    * and rides a broadcast cross-join — the fact table is scanned
    * once. */
  def q203ValueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val supp = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir)
        .filter(col("n_name") === cfg.valueNation).select("n_nationkey"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey"))
    val perPart = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,6)")).as("vdec"))
    val total = perPart.agg(sum(col("vdec")).as("tdec"))
    perPart.crossJoin(broadcast(total))
      .filter(col("vdec") * lit(cfg.valueShareDenom) > col("tdec"))
      .select(col("l_partkey").as("p_partkey"),
        col("vdec").cast("double").as("part_value"))
  }

  def q203Sql: String =
    s"""WITH pv AS (SELECT l_partkey,
       |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS vdec
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = '${cfg.valueNation}'
       |  GROUP BY 1),
       |tot AS (SELECT SUM(vdec) AS tdec FROM pv)
       |SELECT l_partkey AS p_partkey, CAST(vdec AS DOUBLE) AS part_value
       |FROM pv, tot
       |WHERE vdec * ${cfg.valueShareDenom} > tdec""".stripMargin

  /** q254: TIME-DECAYED SCORES, integer-exact — recency-weighted
    * customer value (the leaderboard/churn-risk ranking signal) with
    * exponential decay computed WITHOUT floats: each order contributes
    * its cents shifted right by one bit per elapsed half-life
    * (value·2^(−⌊age/HL⌋) as an exact integer right-shift of the
    * cents), so a ranking re-run lands bit-identical anywhere — the
    * float alternative (pow(0.5, age/HL)) diverges in final ulps right
    * at rank boundaries. Piecewise-constant decay (steps at half-life
    * boundaries) is the price of exactness, and for RANKING the
    * monotone step function carries the same signal. The reference
    * instant is the corpus max order day (one-row broadcast,
    * deterministic — q185's rule: never wall-clock).
    *
    * Scale: one map-combinable per-customer aggregate over a scan
    * projection; the shift is codegen'd per-row arithmetic (clamped at
    * 62, beyond which the contribution is integer zero anyway). */
  def q254DecayedScore(spark: SparkSession, dir: String): DataFrame = {
    val HL = cfg.decayHalfLifeDays
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000").as("day"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("v100"))
    val anchor = o.agg(max(col("day")).as("d1"))
    o.crossJoin(broadcast(anchor))
      .withColumn("shift", least(expr(s"(d1 - day) div $HL"), lit(62L)))
      .withColumn("dec",
        expr("v100 div shiftleft(CAST(1 AS BIGINT), CAST(shift AS INT))"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum(col("v100")).as("raw100"),
        sum(col("dec")).as("decayed100"))
  }

  def q254Sql: String =
    s"""WITH o AS (SELECT o_custkey, epoch_ms(o_orderdate) // 86400000 AS day,
       |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v100 FROM orders),
       |a AS (SELECT max(day) AS d1 FROM o)
       |SELECT o_custkey, count(*) AS n_orders,
       |  CAST(SUM(v100) AS BIGINT) AS raw100,
       |  CAST(SUM(v100 // (CAST(1 AS BIGINT)
       |    << CAST(least((a.d1 - o.day) // ${cfg.decayHalfLifeDays}, 62) AS INTEGER)))
       |    AS BIGINT) AS decayed100
       |FROM o, a GROUP BY o_custkey""".stripMargin

  /** q244: OUT-OF-FOLD TARGET ENCODING — the leakage-guarded
    * categorical encoder every tabular-ML pipeline needs: replace
    * `c_mktsegment` with the mean order value of the segment, computed
    * for each customer WITHOUT the orders of the customer's own fold
    * (folds = custkey mod ${cfg.targetFolds}, deterministic — a random
    * fold re-labels training data every rebuild). In-fold means leak
    * the target into the feature (the classic self-fulfilling encode);
    * the out-of-fold form is exact hold-out hygiene, computed here
    * without per-fold recomputation: per (segment, fold) DECIMAL sums
    * and counts aggregate once, and fold f's encode reads
    * (S_seg − S_f) / (N_seg − N_f) — the complement identity, one
    * bounded table. Customers whose complement is empty encode NULL
    * (no evidence), never 0.
    *
    * Scale: one orders⋈customer join on custkey (both sides
    * key-partitioned; bucketed layouts make it exchange-free), one
    * map-combinable (segment, fold) aggregate — segments × folds rows —
    * broadcast back onto customers. The division is one fixed
    * double op over exact decimal sums (engine-identical). */
  def q244TargetEncode(spark: SparkSession, dir: String): DataFrame = {
    val K = cfg.targetFolds
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_custkey") % K).as("fold"))
    val sf = Tables.orders(spark, dir)
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "fold")
      .agg(sum(col("o_totalprice").cast("decimal(25,6)")).as("s"),
        count(lit(1)).as("n"))
    val seg = sf.groupBy("c_mktsegment")
      .agg(sum(col("s")).as("st"), sum(col("n")).as("nt"))
    // encode over the customers' full (segment, fold) grid: a fold with
    // no orders of its own still encodes from the (complete) complement
    val grid = c.select("c_mktsegment", "fold").distinct()
    val enc = grid
      .join(sf, Seq("c_mktsegment", "fold"), "left")
      .join(seg, "c_mktsegment")
      .select(col("c_mktsegment"), col("fold"),
        when(col("nt") - coalesce(col("n"), lit(0L)) > 0,
          (col("st") - coalesce(col("s"), lit(0).cast("decimal(25,6)"))).cast("double") /
            (col("nt") - coalesce(col("n"), lit(0L))).cast("double"))
          .as("encoded"))
    c.join(broadcast(enc), Seq("c_mktsegment", "fold"), "left")
      .select(col("c_custkey"), col("c_mktsegment"), col("fold"), col("encoded"))
  }

  def q244Sql: String =
    s"""WITH c AS (SELECT c_custkey, c_mktsegment,
       |    c_custkey % ${cfg.targetFolds} AS fold FROM customer),
       |sf AS (SELECT c_mktsegment, fold,
       |    SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS s, count(*) AS n
       |  FROM orders JOIN c ON o_custkey = c_custkey
       |  GROUP BY 1, 2),
       |seg AS (SELECT c_mktsegment, SUM(s) AS st, CAST(SUM(n) AS BIGINT) AS nt
       |  FROM sf GROUP BY 1),
       |grid AS (SELECT DISTINCT c_mktsegment, fold FROM c),
       |enc AS (SELECT g.c_mktsegment, g.fold,
       |    CASE WHEN seg.nt - coalesce(sf.n, 0) > 0
       |      THEN CAST(seg.st - coalesce(sf.s, 0) AS DOUBLE)
       |           / CAST(seg.nt - coalesce(sf.n, 0) AS DOUBLE)
       |    END AS encoded
       |  FROM grid g
       |  LEFT JOIN sf USING (c_mktsegment, fold)
       |  JOIN seg USING (c_mktsegment))
       |SELECT c.c_custkey, c.c_mktsegment, c.fold, enc.encoded
       |FROM c LEFT JOIN enc USING (c_mktsegment, fold)""".stripMargin

  /** q231: SNAPSHOT DIFF — recover the net change feed between two table
    * snapshots by keyed comparison: rows only in the new snapshot are
    * inserts, rows only in the old are deletes, rows in both with any
    * differing non-key column are updates; unchanged keys emit nothing.
    * The inverse of q97's CDC APPLY (and diff(A, apply(A, feed)) is
    * exactly feed's net effect — the snapshot pair here IS q97's
    * base/merged pair, so the diff must reproduce q97's feed minus its
    * no-op rows; SnapshotDiffSpec pins that round-trip). The lake-ops
    * primitive behind backfills and replication audits: given yesterday's
    * and today's 100 TB snapshots, emit the (small) delta that turns one
    * into the other instead of shipping the table.
    *
    * Null-safe comparison (`<=>` / IS DISTINCT FROM) so a NULL→value
    * transition classifies as update, never silently "equal".
    *
    * Scale: ONE co-partitioned full-outer shuffle join on the key — both
    * sides hash-partition once, the compare is per-row. With both
    * snapshots laid out via [[graft.sources.Tables.writeBucketed]] on the
    * key (the q186 layout), the join plans exchange-free on both sides:
    * a daily diff of two bucketed snapshots reads and compares, shuffling
    * nothing. Output is bounded by the true change rate, not table size. */
  def q231SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("ak"), col("o_custkey").as("old_custkey"),
        col("o_orderstatus").as("old_status"), col("o_totalprice").as("old_price"))
    val b = q97CdcApply(spark, dir)
      .select(col("o_orderkey").as("bk"), col("o_custkey").as("new_custkey"),
        col("o_orderstatus").as("new_status"), col("o_totalprice").as("new_price"))
    a.join(b, col("ak") === col("bk"), "full_outer")
      .withColumn("op",
        when(col("ak").isNull, "I")
          .when(col("bk").isNull, "D")
          .when(!(col("old_custkey") <=> col("new_custkey")) ||
                !(col("old_status") <=> col("new_status")) ||
                !(col("old_price") <=> col("new_price")), "U"))
      .filter(col("op").isNotNull)
      .select(coalesce(col("ak"), col("bk")).as("o_orderkey"), col("op"),
        col("new_custkey"), col("new_status"), col("new_price"),
        col("old_custkey"), col("old_status"), col("old_price"))
  }

  def q231Sql: String =
    """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
      |ch AS (SELECT
      |    CASE WHEN o_orderkey % 10 = 2 THEN o_orderkey + 10000000 ELSE o_orderkey END AS k,
      |    CASE WHEN o_orderkey % 10 = 0 THEN 'D'
      |         WHEN o_orderkey % 10 = 1 THEN 'U' ELSE 'I' END AS op,
      |    o_custkey AS c_cust, o_orderstatus AS c_status,
      |    o_totalprice + 1000.0 AS c_price
      |  FROM orders WHERE o_orderkey % 10 <= 2),
      |merged AS (SELECT coalesce(ch.k, base.o_orderkey) AS mk,
      |    coalesce(ch.c_cust, base.o_custkey) AS new_custkey,
      |    coalesce(ch.c_status, base.o_orderstatus) AS new_status,
      |    coalesce(ch.c_price, base.o_totalprice) AS new_price
      |  FROM base FULL OUTER JOIN ch ON ch.k = base.o_orderkey
      |  WHERE ch.op IS NULL OR ch.op <> 'D')
      |SELECT * FROM (
      |  SELECT coalesce(a.o_orderkey, m.mk) AS o_orderkey,
      |    CASE WHEN a.o_orderkey IS NULL THEN 'I'
      |         WHEN m.mk IS NULL THEN 'D'
      |         WHEN (a.o_custkey IS DISTINCT FROM m.new_custkey)
      |           OR (a.o_orderstatus IS DISTINCT FROM m.new_status)
      |           OR (a.o_totalprice IS DISTINCT FROM m.new_price) THEN 'U'
      |    END AS op,
      |    m.new_custkey, m.new_status, m.new_price,
      |    a.o_custkey AS old_custkey, a.o_orderstatus AS old_status,
      |    a.o_totalprice AS old_price
      |  FROM base a FULL OUTER JOIN merged m ON a.o_orderkey = m.mk)
      |WHERE op IS NOT NULL""".stripMargin

  /** q311: PROFIT ROLL-UP — the TPC-H Q9 shape, the multi-fact plan
    * missing from the canon tail: per (supplier nation, order year),
    * the profit on LIKE-filtered parts across lineitem ⋈ orders ⋈
    * part ⋈ supplier ⋈ nation. This schema has no partsupp, so unit
    * supply cost is proxied by the part's retail price (a dim
    * attribute — exactly where Q9's ps_supplycost sits): profit =
    * l_extendedprice·(1−l_discount) − p_retailprice·l_quantity, one
    * fixed double chain per row, summed in exact DECIMAL (the q199
    * discipline), so the roll-up is order-free and engine-identical.
    *
    * Plan: the LIKE-filtered part dim and the supplier→nation map
    * BROADCAST into the fact scan (the contains-filter prunes ~part
    * rows before any shuffle); the only big-big join is lineitem ⋈
    * orders on the natural order key; the roll-up is one
    * map-combinable hash aggregate over nations × years. */
  def q311ProfitRollup(spark: SparkSession, dir: String): DataFrame = {
    val pf = broadcast(Tables.part(spark, dir)
      .filter(col("p_name").contains(cfg.profitPartToken))
      .select("p_partkey", "p_retailprice"))
    val supp = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).select("n_nationkey", "n_name"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation")))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
      .join(pf, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("nation", "o_year")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - col("p_retailprice") * col("l_quantity"), 24, 6).as("sum_profit"))
  }

  def q311Sql: String =
    s"""SELECT nation, o_year,
       |  CAST(SUM(CAST(amount AS DECIMAL(24,6))) AS DOUBLE) AS sum_profit
       |FROM (
       |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |    l_extendedprice * (1.0 - l_discount) - p_retailprice * l_quantity AS amount
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE contains(p_name, '${cfg.profitPartToken}'))
       |GROUP BY 1, 2""".stripMargin

  /** q312: TOP SUPPLIER — the TPC-H Q15 shape (max-of-aggregate view
    * join-back): per-supplier revenue over a fixed ${cfg.topSupplierDays}-day
    * ship window, then exactly the suppliers achieving the maximum.
    * The view's revenue is an exact DECIMAL sum and the max and its
    * equality join-back compare those exact decimals — no float sits
    * at the tie boundary, so ALL maximal suppliers surface
    * deterministically on both engines (Q15's result-set semantics).
    *
    * Plan: ONE windowed-fact aggregate (shipdate filter pushed to the
    * scan) builds the |supplier|-sized view; the one-row max
    * re-aggregates it and rides a broadcast cross-join back — the
    * q203 global-scalar discipline; no window function anywhere. */
  def q312TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val from = to_timestamp(lit(cfg.topSupplierFrom))
    val until = from + expr(s"INTERVAL ${cfg.topSupplierDays} DAYS")
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= from && col("l_shipdate") < until)
      .groupBy("l_suppkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,6)")).as("rdec"))
    val top = rev.agg(max(col("rdec")).as("m"))
    rev.crossJoin(broadcast(top))
      .filter(col("rdec") === col("m"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rdec").cast("double").as("total_revenue"))
  }

  def q312Sql: String =
    s"""WITH rev AS (SELECT l_suppkey,
       |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS rdec
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '${cfg.topSupplierFrom}'
       |    AND l_shipdate < TIMESTAMP '${cfg.topSupplierFrom}'
       |      + INTERVAL ${cfg.topSupplierDays} DAY
       |  GROUP BY 1),
       |m AS (SELECT MAX(rdec) AS m FROM rev)
       |SELECT s_suppkey, s_name, CAST(rdec AS DOUBLE) AS total_revenue
       |FROM rev
       |JOIN supplier ON l_suppkey = s_suppkey
       |CROSS JOIN m
       |WHERE rdec = m.m""".stripMargin

  /** q313: CAPACITY SEMIJOIN — the TPC-H Q20 shape (nested semijoin
    * chain), the last distinct decorrelation plan in the canon tail:
    * the ${cfg.pendingNation} suppliers who moved more than
    * ${cfg.pendingQtyMin} units of any '${cfg.pendingPartPrefix}%'-named
    * part in ${cfg.pendingShipYear} — supplier ⋉ (grouped lineitem ⋉
    * LIKE-filtered part). Quantities are integral doubles, so the
    * HAVING sum and its threshold compare exactly on both engines.
    *
    * Plan: innermost the prefix-filtered part dim BROADCASTS into the
    * year-pruned fact scan; the (supplier, part) aggregate is
    * map-combinable; both semijoin hops are LEFT SEMI (existence
    * only — no row multiplication anywhere, Q20's defining property);
    * the nation filter rides the broadcast nation dim. */
  def q313CapacitySemijoin(spark: SparkSession, dir: String): DataFrame = {
    val pf = broadcast(Tables.part(spark, dir)
      .filter(col("p_name").startsWith(cfg.pendingPartPrefix))
      .select("p_partkey"))
    val movers = Tables.lineitem(spark, dir)
      .filter(year(col("l_shipdate")) === cfg.pendingShipYear)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(pf, col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > cfg.pendingQtyMin)
      .select("l_suppkey")
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter(col("n_name") === cfg.pendingNation).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
  }

  def q313Sql: String =
    s"""SELECT s_suppkey, s_name, s_acctbal
       |FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_name = '${cfg.pendingNation}'
       |  AND s_suppkey IN (
       |    SELECT l_suppkey FROM lineitem
       |    JOIN part ON l_partkey = p_partkey
       |    WHERE p_name LIKE '${cfg.pendingPartPrefix}%'
       |      AND year(l_shipdate) = ${cfg.pendingShipYear}
       |    GROUP BY l_suppkey, l_partkey
       |    HAVING SUM(l_quantity) > ${cfg.pendingQtyMin})""".stripMargin

  /** q336: PROMO REVENUE SHARE — the TPC-H Q14 shape (conditional
    * share of a windowed fact aggregate): over one full calendar
    * ship-date month ([month, month+1) — Q14's exclusive-bound form),
    * the fraction of discounted revenue coming from promo parts. Both
    * sums accumulate DECIMAL(24,6) exactly (the dsum rule) and cast
    * to DOUBLE once; the share is ONE division of two exact doubles —
    * the same ulp-free shape as q91's divisions, so both engines emit
    * identical bits. The CASE rides inside the sum, not a second
    * scan — promo vs total is one pass.
    *
    * Scale: shipdate window pushes to the scan, the part dim
    * broadcasts, the aggregate is one map-combinable row. */
  def q336PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val from = to_timestamp(lit("1997-03-01"))
    val until = from + expr("INTERVAL 1 MONTH")
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= from && col("l_shipdate") < until)
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type").startsWith("PROMO"), amount).otherwise(lit(0.0)), 24, 6)
          .as("promo_revenue"),
        dsum(amount, 24, 6).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (lit(100.0) * col("promo_revenue") / col("total_revenue")).as("promo_share"))
  }

  def q336Sql: String =
    """SELECT promo_revenue, total_revenue,
      |  100.0 * promo_revenue / total_revenue AS promo_share
      |FROM (SELECT
      |  CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
      |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(24,6))) AS DOUBLE) AS promo_revenue,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      |  AND l_shipdate < TIMESTAMP '1997-04-01')""".stripMargin

  /** q337: PART-SUPPLIER DIVERSITY — the TPC-H Q16 shape (distinct
    * suppliers per part class, with negative predicates) on this
    * schema's relationship table: the lineitem fact IS the
    * part-supplier relationship (a supplier supplies a part iff it
    * ever shipped it — no partsupp table exists here, the documented
    * divergence). Per (p_brand, p_type, p_size) over the non-excluded
    * classes: how many DISTINCT suppliers ever supplied such a part.
    * The count is an exact integer; no floats anywhere.
    *
    * Scale: the exclusions push to the part scan; the distinct rides
    * (class, suppkey) partial aggregation before the count — the
    * two-level distinct-aggregate plan Spark generates, no row
    * explosion; the part dim broadcasts onto the fact. */
  def q337PartSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 4, 9, 14, 19, 23, 36, 45)
    val pf = broadcast(Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#13" &&
        !col("p_type").startsWith("ECONOMY") &&
        col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size"))
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(pf, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  def q337Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#13'
      |  AND p_type NOT LIKE 'ECONOMY%'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |GROUP BY 1, 2, 3""".stripMargin

  /** q338: BRACKETED DISCOUNT REVENUE — the TPC-H Q19 shape (a
    * disjunction of multi-column predicate brackets spanning the fact
    * AND the dim), adapted to this schema's columns (brand/size/
    * quantity brackets — no container/shipmode here): revenue from
    * line items falling in ANY of three (brand, size range, quantity
    * range) brackets. The revenue is one exact DECIMAL(24,6) sum cast
    * DOUBLE once.
    *
    * Scale: the OR-of-brackets is the classic join-predicate-pushdown
    * test — the part side prunes to the union of bracket brands/sizes
    * BEFORE the join (Catalyst extracts the disjunction's common
    * conjuncts per side), the dim broadcasts, and the bracket test
    * runs post-join row-local; one map-combinable aggregate row. */
  def q338BracketRevenue(spark: SparkSession, dir: String): DataFrame = {
    val br = (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(br)
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6)
        .as("revenue"))
  }

  def q338Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** q345: PRICING SUMMARY — the full TPC-H Q1 canon (q1_agg is the
    * reduced shape; this is the report): shipdate-cutoff filter, per
    * (returnflag, linestatus) the quantity/price/discounted/charged
    * sums — charge = price·(1−disc)·(1+tax), the three-factor product
    * left-associated identically in both engines — all accumulated in
    * exact DECIMAL and cast DOUBLE once, plus the three averages as
    * ONE division each of an exact-decimal-derived double by the exact
    * group count (the q91 ulp-free shape; never engine avg(), whose
    * accumulation order is unspecified).
    *
    * Scale: one map-combinable hash aggregate over the pushed-filter
    * scan — |groups| ≤ 6 partials cross the exchange, never the fact;
    * PlanSpec pins join-free. */
  def q345PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6)
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")),
          30, 6).as("sum_charge"),
        dsum(col("l_discount"), 18, 4).as("sum_disc"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"), col("sum_base_price"), col("sum_disc_price"), col("sum_charge"),
        (col("sum_qty") / col("count_order")).as("avg_qty"),
        (col("sum_base_price") / col("count_order")).as("avg_price"),
        (col("sum_disc") / col("count_order")).as("avg_disc"),
        col("count_order"))

  def q345Sql: String =
    """SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price,
      |  sum_charge,
      |  sum_qty / count_order AS avg_qty,
      |  sum_base_price / count_order AS avg_price,
      |  sum_disc / count_order AS avg_disc,
      |  count_order
      |FROM (SELECT l_returnflag, l_linestatus,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
      |    count(*) AS count_order
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |  GROUP BY 1, 2)""".stripMargin

  /** q346: REVENUE FORECAST — TPC-H Q6 (the single-table what-if agg):
    * revenue lost if year-window discounts in a ±1-point band around
    * 6% on sub-24-quantity lines had been dropped — ONE conditional
    * scan, sum(price·discount) in exact DECIMAL cast DOUBLE once.
    * The discount band compares the parquet doubles directly (both
    * engines see identical stored bits; no arithmetic precedes the
    * compare, so no rounding can diverge).
    *
    * Scale: every predicate pushes to the scan (PlanSpec pins
    * join-free + pushed filters); the aggregate is one partial row
    * per task. */
  def q346ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 24, 6).as("revenue"))

  def q346Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(24,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** q347: RETURNED-ITEM TOP CUSTOMERS — TPC-H Q10, the top-k-then-
    * enrich classic, planned scale-right: returned-line revenue
    * aggregates per CUSTOMER KEY first (map-combinable over the
    * quarter-windowed orders⋈returned-lines join), the top
    * ${cfg.returnedTopK} plan as TakeOrderedAndProject on (revenue
    * desc, custkey) — k rows leave the aggregate, and only THEN do
    * the customer and nation dims join back (broadcast onto k rows;
    * the canon's group-by-all-customer-columns form drags name/
    * acctbal/nation through the fact shuffle for customers the LIMIT
    * will discard). Revenue exact DECIMAL cast DOUBLE once; ties
    * break on custkey.
    *
    * Scale: one big-big join on the natural order key (quarter filter
    * pushed to the orders scan, returnflag to the fact scan), one
    * |custkey|-bounded aggregate, a k-row ordered limit, two
    * broadcast join-backs. */
  def q347ReturnedTopk(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-10-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .select("o_orderkey", "o_custkey")
    val top = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 24, 6)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(cfg.returnedTopK)
    top
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
  }

  def q347Sql: String =
    s"""WITH top AS (
       |  SELECT o_custkey,
       |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_returnflag = 'R'
       |    AND o_orderdate >= TIMESTAMP '1996-10-01'
       |    AND o_orderdate < TIMESTAMP '1997-01-01'
       |  GROUP BY o_custkey
       |  ORDER BY revenue DESC, o_custkey LIMIT ${cfg.returnedTopK})
       |SELECT c_custkey, c_name, revenue, c_acctbal, n_name
       |FROM top JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  /** q348: SHIP-BAND PRIORITY COUNT — the TPC-H Q12 shape (per
    * "ship mode", high- vs low-priority line counts over a receipt
    * year) on this schema: no shipmode/commitdate/receiptdate columns
    * exist (documented divergence, the q337 rule), so the mode is the
    * SHIP-LAG BAND — 'FAST' when the line shipped within
    * ${cfg.shipBandFastDays} days of its order, 'SLOW' otherwise — an
    * exact integer epoch-MS comparison with NO division (q152's
    * discipline; a day-floor would hit the Spark-div-vs-DuckDB-floor
    * divergence on negative lags). Per band, BOTH priority counts
    * ride ONE conditional
    * aggregate over ONE pass of the year-windowed join — the Q12
    * point: never two scans, never a pivot.
    *
    * Scale: shipdate window pushes to the fact scan; the only join is
    * big-big on the natural order key (orders pre-projected to key +
    * priority); two counts × two bands cross the exchange. */
  def q348ShipBandPriority(spark: SparkSession, dir: String): DataFrame = {
    val fastMs = cfg.shipBandFastDays * 86400000L
    val lagMs = unix_millis(col("l_shipdate").cast("timestamp")) -
      unix_millis(col("o_orderdate").cast("timestamp"))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select(when(lagMs <= fastMs, lit("FAST")).otherwise(lit("SLOW"))
          .as("ship_band"),
        when(hi, lit(1L)).otherwise(lit(0L)).as("h"),
        when(hi, lit(0L)).otherwise(lit(1L)).as("l"))
      .groupBy("ship_band")
      .agg(sum(col("h")).as("high_line_count"), sum(col("l")).as("low_line_count"))
  }

  def q348Sql: String =
    s"""SELECT CASE WHEN epoch_ms(l_shipdate) - epoch_ms(o_orderdate)
       |         <= ${cfg.shipBandFastDays * 86400000L} THEN 'FAST' ELSE 'SLOW' END AS ship_band,
       |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
       |    AS high_line_count,
       |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
       |    AS low_line_count
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1""".stripMargin
}

/** Default-configured instance (see [[graft.GraftConfig]]). */
object Relational extends RelationalOps(GraftConfig.default)
