package graft

import graft.operators.{Temporal, TemporalOps}
import org.apache.spark.sql.functions._

/** As-of join (q85) and point-in-interval range join (q86): semantics on
  * hand-built event logs plus invariants on the real table. */
class TemporalSpec extends GraftSpec {
  import spark.implicits._

  /** Write a minimal events.parquet: (event_id, user_id, ms, type). */
  private def events(rows: (Long, Long, Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("temporal").toString
    rows.toSeq.toDF("event_id", "user_id", "ms", "event_type")
      .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q85: latest at-or-before view wins; ms ties admit the view, max event_id breaks them") {
    val dir = events(
      (1L, 1L, 10L, "view"),
      (2L, 1L, 20L, "view"),
      (3L, 1L, 20L, "view"),     // same ms as purchase AND as event 2 → id 3 wins
      (4L, 1L, 20L, "purchase"), // ties at 20 ms
      (5L, 1L, 15L, "purchase"), // latest view ≤ 15 is id 1 (ms 10)
      (6L, 2L, 30L, "purchase"), // user 2 has no views → dropped
      (7L, 3L, 40L, "view"))     // view with no purchase → no output row
    val got = Temporal.q85AsofJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      (4L, 3L, 20L, 0L),  // purchase 4 ← view 3 (ms tie, max id)
      (5L, 1L, 10L, 5L))) // purchase 5 ← view 1, lag 5 ms
  }

  test("q184: earliest at-or-after view wins; ms ties admit the view, min event_id breaks them") {
    import graft.operators.Temporal
    // user 1: purchase@100 → views @100 (ids 11,12: tie → 11), @200 ignored
    // user 2: purchase@100, only a view@50 BEFORE it → absent
    // user 3: purchase@100, view@300 → lead 200
    val dir = events(
      (1L, 1L, 100L, "purchase"), (11L, 1L, 100L, "view"), (12L, 1L, 100L, "view"),
      (13L, 1L, 200L, "view"),
      (2L, 2L, 100L, "purchase"), (21L, 2L, 50L, "view"),
      (3L, 3L, 100L, "purchase"), (31L, 3L, 300L, "view"))
    val got = Temporal.q184AsofNext(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(5))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 11L, 0L), (3L, 31L, 200L)))
  }

  test("q136: trailing 24h frame is (ts−24h, ts], value-framed so ms ties are peers") {
    import spark.implicits._
    val DayMs = 86400000L
    val dir = java.nio.file.Files.createTempDirectory("rolling").toString
    Seq(
      (1L, 1L, 0L, 1.0), (2L, 1L, 10L, 2.0),
      (3L, 1L, DayMs - 1, 4.0),   // frame [0, 86399999] — still sees ms 0
      (4L, 1L, DayMs, 8.0),       // frame [1, 86400000] — ms 0 aged out
      (5L, 2L, 50L, 16.0), (6L, 2L, 50L, 32.0)) // ms tie: mutual peers
      .toDF("event_id", "user_id", "ms", "value")
      .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
      .withColumn("event_type", lit("view")).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Temporal.q136RollingWindow(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((1L, 1.0)) && got(2L) == ((2L, 3.0)))
    assert(got(3L) == ((3L, 7.0)))  // boundary IN: 1+2+4
    assert(got(4L) == ((3L, 14.0))) // boundary OUT: 2+4+8
    assert(got(5L) == ((2L, 48.0)) && got(6L) == ((2L, 48.0))) // tied peers see each other
  }

  test("q141: horizon gates attribution; every conversion appears; equal-ms max-id touch wins") {
    val ops = new graft.operators.TemporalOps(GraftConfig(attributionHorizonMs = 100L))
    val dir = events(
      (1L, 1L, 10L, "view"),
      (2L, 1L, 50L, "click"),
      (3L, 1L, 120L, "purchase"),  // click 2 at lag 70 ≤ 100 → attributed
      (4L, 2L, 10L, "view"),
      (5L, 2L, 500L, "purchase"),  // only touch is 490 ms old > 100 → direct
      (6L, 3L, 30L, "purchase"),   // no touch at all → direct
      (7L, 4L, 40L, "view"),
      (8L, 4L, 40L, "click"),      // equal-ms tie with 7 → max id wins
      (9L, 4L, 40L, "purchase"))   // touch at the conversion's exact ms qualifies
    val got = ops.q141Attribution(spark, dir).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))).toMap
    assert(got(3L) == ((Some(2L), Some("click"), Some(70L))))
    assert(got(5L) == ((None, None, None)))
    assert(got(6L) == ((None, None, None)))
    assert(got(9L) == ((Some(8L), Some("click"), Some(0L))))
    assert(got.size == 4) // one row per conversion, direct ones included
  }

  test("q85: real data — one row per matched purchase, view never after purchase") {
    val out = Temporal.q85AsofJoin(spark, sf).cache()
    try {
      assert(out.filter(col("view_ms") > col("purchase_ms")).count() == 0)
      assert(out.filter(col("lag_ms") < 0).count() == 0)
      val n = out.count()
      assert(n > 0 && out.select("purchase_id").distinct().count() == n)
    } finally out.unpersist()
  }

  private val H = 3600000L // ms per hour

  test("q86: counts other-user points inside the daily interval, keeps zero-count intervals") {
    val day0 = 0L
    val dir = events(
      // user 1 active 01:00–05:00 on day 0
      (1L, 1L, day0 + 1 * H, "click"),
      (2L, 1L, day0 + 5 * H, "click"),
      // user 1's own error inside its interval must NOT count
      (3L, 1L, day0 + 2 * H, "error"),
      // user 2 errors: one inside user 1's interval, one outside
      (4L, 2L, day0 + 3 * H, "error"),
      (5L, 2L, day0 + 7 * H, "error"),
      // user 3: no errors near it → zero-count interval
      (6L, 3L, day0 + 10 * H, "click"))
    val got = Temporal.q86IntervalErrors(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    // user 1 interval [1h,5h]: user-2 error at 3h → 1
    assert(got(1L) == 1L)
    // user 2 interval [3h,7h]: user-1 error at 2h outside? no — 2h < 3h;
    // no other-user errors in [3h,7h] except... user 1's error at 2h is
    // before a_start → 0
    assert(got(2L) == 0L)
    assert(got(3L) == 0L)
  }

  test("q86: bucketed equi-join equals the naive inequality join on real data") {
    val fast = Temporal.q86IntervalErrors(spark, sf)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_type"))
    val iv = ev.groupBy(col("user_id"), expr("ms div 86400000").as("day"))
      .agg(min("ms").as("a_start"), max("ms").as("a_end"))
    val pts = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("p_user"), col("ms").as("p_ms"))
    val naive = iv.join(pts,
        pts("p_user") =!= iv("user_id") &&
          pts("p_ms") >= iv("a_start") && pts("p_ms") <= iv("a_end"), "left")
      .groupBy("user_id", "day", "a_start", "a_end")
      .agg(count(col("p_ms")).as("n_errors"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("q228: gap hours interpolate linearly between brackets; observed hours keep exact values") {
    val dir = java.nio.file.Files.createTempDirectory("temporal").toString
    Seq((1L, 1L, 0L, 10.0), (2L, 1L, 3 * H + 5L, 40.0), (3L, 2L, 10 * H, 7.5))
      .toDF("event_id", "user_id", "ms", "value")
      .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
      .withColumn("event_type", lit("view")).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Temporal.q228ResampleInterp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3))).toSet
    assert(got == Set(
      (1L, 0L, true, 10.0),
      (1L, 1L, false, 20.0),  // 10 + 30·(1/3)
      (1L, 2L, false, 30.0),
      (1L, 3L, true, 40.0),
      (2L, 10L, true, 7.5)), s"got $got")
  }

  test("q228 real data: interpolated values stay inside their bracket, observed rows match q108's grid") {
    val out = Temporal.q228ResampleInterp(spark, sf).cache()
    try {
      // the grid is q108's (same span construction)
      assert(out.count() == Temporal.q108ResampleFfill(spark, sf).count())
      // between brackets: v lies in [min(pv,nv), max(pv,nv)] — recompute
      // the brackets with an independent self-join per interpolated row
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("h")
      val chk = out
        .withColumn("pv", last(when(col("observed"), col("value_interp")),
          ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("nv", first(when(col("observed"), col("value_interp")),
          ignoreNulls = true).over(w.rowsBetween(1, Window.unboundedFollowing)))
        .filter(!col("observed"))
      assert(chk.filter(col("value_interp") < least(col("pv"), col("nv")) ||
        col("value_interp") > greatest(col("pv"), col("nv"))).count() == 0)
    } finally out.unpersist()
  }

  test("q108: silent hours are densified and forward-filled from the last observed hour") {
    // user 1: events in hours 0 and 3 → hours 1,2 filled with hour 0's
    // aggregate, observed=false; user 2: single hour, no fill rows.
    val dir = events(
      (1L, 1L, 0L, "view"),          // hour 0, two events
      (2L, 1L, 1000L, "view"),
      (3L, 1L, 3 * H + 5L, "view"),  // hour 3
      (4L, 2L, 10 * H, "purchase"))
    val got = Temporal.q108ResampleFfill(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, true, 2L),
      (1L, 1L, false, 2L),  // filled: carries hour 0's count
      (1L, 2L, false, 2L),
      (1L, 3L, true, 1L),
      (2L, 10L, true, 1L)))
  }

  test("q257: basis points conserve exactly; remainder goes to the last touch; no-touch is direct") {
    val ops = new TemporalOps(GraftConfig(attributionHorizonMs = 100L))
    val dir = events(
      // user 1: two touches split 5000/5000
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 50L, "purchase"),
      // user 2: three views -> 3333 + 3333 + 3334 (remainder to the last)
      (4L, 2L, 0L, "view"), (5L, 2L, 1L, "view"), (6L, 2L, 2L, "view"),
      (7L, 2L, 50L, "purchase"),
      // user 3: the only touch is outside the 100 ms horizon -> direct
      (8L, 3L, 10L, "view"), (9L, 3L, 500L, "purchase"))
    val got = ops.q257LinearAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("view") == ((4L, 15000L)), s"got ${got("view")}")
    assert(got("click") == ((1L, 5000L)))
    assert(got("direct") == ((1L, 10000L)))
    assert(got.values.map(_._2).sum == 3 * 10000L, "credit conserves to the basis point")
  }

  test("q236: overlap counts are exact; touching endpoints overlap, point sessions count") {
    val ops = new TemporalOps(GraftConfig(sessionGapMs = 100))
    val dir = events(
      // user 1: A=[0,50], B=[300,300]
      (1L, 1L, 0L, "view"), (2L, 1L, 50L, "view"), (3L, 1L, 300L, "view"),
      // user 2: C=[40,40] (inside A), D=[600,600] (alone)
      (4L, 2L, 40L, "view"), (5L, 2L, 600L, "view"),
      // user 3: E=[50,170] — touches A exactly at ms 50
      (6L, 3L, 50L, "view"), (7L, 3L, 120L, "view"), (8L, 3L, 170L, "view"))
    val got = ops.q236SessionConcurrency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(got == Map(
      (1L, 1L) -> 2L, // A overlaps C and (endpoint-touching) E
      (1L, 2L) -> 0L, // B
      (2L, 1L) -> 1L, // C overlaps A only
      (2L, 2L) -> 0L, // D
      (3L, 1L) -> 1L  // E overlaps A via the shared ms-50 endpoint
    ))
  }

  test("q275: overlapping, contained, contiguous, and isolated intervals island correctly") {
    val ops = new TemporalOps(GraftConfig(sessionGapMs = 100))
    val dir = events(
      // A=[0,10] (user 1), B=[5,8] (user 2, contained in A)
      (1L, 1L, 0L, "v"), (2L, 1L, 10L, "v"),
      (3L, 2L, 5L, "v"), (4L, 2L, 8L, "v"),
      // C=[500,550] (user 3), D=[551,600] (user 4 — CONTIGUOUS with C:
      // ms 551 starts right after 550 ends, no uncovered ms between)
      (5L, 3L, 500L, "v"), (6L, 3L, 550L, "v"),
      (7L, 4L, 551L, "v"), (8L, 4L, 600L, "v"),
      // E=[900,900] isolated point; F=[902,902] — gap at ms 901 splits
      (9L, 5L, 900L, "v"), (10L, 6L, 902L, "v"))
    val got = ops.q275IntervalUnion(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (0L, 10L, 2L, 11L),    // A ∪ B
      (500L, 600L, 2L, 101L), // C ∪ D merge across the 550|551 seam
      (900L, 900L, 1L, 1L),
      (902L, 902L, 1L, 1L)))
    val ids = ops.q275IntervalUnion(spark, dir).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L), "islands number densely in start order")
  }

  test("q275 real corpus: islands partition the covered time exactly (vs collected reference)") {
    val rows = Temporal.q275IntervalUnion(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // brute reference: merge collected session intervals in driver code
    val sess = Temporal.q236SessionConcurrency(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3))).sorted
    val ref = sess.foldLeft(List.empty[(Long, Long, Long)]) {
      case (acc, (s, e)) => acc match {
        case (is, ie, n) :: t if s <= ie + 1 => (is, math.max(ie, e), n + 1) :: t
        case _ => (s, e, 1L) :: acc
      }
    }.reverse.map { case (s, e, n) => (s, e, n, e - s + 1) }
    val sorted = rows.sortBy(_._1)
    assert(sorted.toSeq == ref, "kernel islands must equal the merged reference")
    sorted.sliding(2).foreach {
      case Array((_, e1, _, _), (s2, _, _, _)) => assert(s2 > e1 + 1, "islands are maximal")
      case _ =>
    }
  }
}
