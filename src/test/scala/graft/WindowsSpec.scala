package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.agg.Windows

/** Guards the slice-rollup optimization: the sliced hopping aggregate must
  * equal the naive ×10 multi-assignment form on arbitrary event sets. */
class WindowsSpec extends TestBase {

  private val eventGen = for {
    // event times across ~3 hours incl. exact minute/window boundaries
    offMs <- Gen.oneOf(
      Gen.chooseNum(0L, 3L * 3600 * 1000),
      Gen.chooseNum(0L, 180L).map(_ * 60000L))
    entity <- Gen.oneOf("a", "b", "c")
    weight <- Gen.chooseNum(-50.0, 50.0)
  } yield (offMs, entity, weight)

  private val base = 1704067200000L // 2024-01-01 00:00:00 UTC

  test("sliced hopping aggregate equals naive multi-assignment") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.nonEmptyListOf(eventGen)) { evs =>
      val df = evs.map { case (off, e, w) =>
        (new Timestamp(base + off), e, w)
      }.toDF("ts", "entity_src", "value")

      val sliced = Windows
        .entityWindowAggSliced(df, col("entity_src"), col("value"))
        .select("window_end", "entity", "tweet_count", "follower_sum")
      val naive = df
        .groupBy(window(col("ts"), Windows.WindowSize, Windows.HopSize),
          col("entity_src").as("entity"))
        .agg(count("*").as("tweet_count"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("follower_sum"))
        .select(col("window.end").cast("long").as("window_end"),
          col("entity"), col("tweet_count"), col("follower_sum"))

      sliced.exceptAll(naive).isEmpty && naive.exceptAll(sliced).isEmpty
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("hopping counts: every event lands in exactly 10 windows") {
    import spark.implicits._
    val df = (0 until 500).map(i =>
      (new Timestamp(base + i * 13131L), "e", 1.0))
      .toDF("ts", "e", "v")
    val total = Windows.hoppingCounts(df)
      .agg(sum("cnt")).as[Long].collect()(0)
    assert(total == 500L * 10)
  }

  test("hop fan-out is DERIVED from the window constants: sliced == " +
      "direct at a non-default 6 min/2 min config (r12 verdict item 3)") {
    import spark.implicits._
    val (win, hop) = ("6 minutes", "2 minutes")
    val df = (0 until 400).map(i =>
      (new Timestamp(base + i * 17171L), s"e${i % 3}", (i % 7).toDouble))
      .toDF("ts", "entity_src", "value")
    val sliced = Windows
      .entityWindowAggSliced(df, col("entity_src"), col("value"),
        windowSize = win, hopSize = hop)
      .select("window_end", "entity", "tweet_count", "follower_sum")
    val direct = df
      .groupBy(window(col("ts"), win, hop), col("entity_src").as("entity"))
      .agg(count("*").as("tweet_count"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("follower_sum"))
      .select(col("window.end").cast("long").as("window_end"),
        col("entity"), col("tweet_count"), col("follower_sum"))
    assert(sliced.exceptAll(direct).isEmpty &&
      direct.exceptAll(sliced).isEmpty,
      "sliced 6m/2m hopping aggregate differs from direct window() form")
    // counts too, and the fan-out really is 3 windows per event
    val totalCnt = Windows
      .hoppingCounts(df, windowSize = win, hopSize = hop)
      .agg(sum("cnt")).as[Long].collect()(0)
    assert(totalCnt == 400L * 3)
    // the shape parser itself
    assert(Windows.hopShape("10 minutes", "1 minute") == ((10, 60L)))
    assert(Windows.hopShape("1 hour", "30 seconds") == ((120, 30L)))
    intercept[IllegalArgumentException](
      Windows.hopShape("10 minutes", "3 minutes")) // not divisible
    intercept[IllegalArgumentException](Windows.durationSec("10 fortnights"))
  }

  test("trend slopes: OLS fit hand-checked (rising, falling, flat, " +
      "degenerate single-period), min-shift invariance (ext152)") {
    import spark.implicits._
    val day = 86400000000L
    // per-(entity, day) event counts:
    //  up:   1, 2, 3 over days 0..2 -> slope 1 (1000000 ppm)
    //  down: 3, 1 over days 0..1    -> slope -2 (-2000000 ppm)
    //  flat: 2, 2 over days 0 and 2 -> slope 0
    //  one:  7 events on day 5      -> zero x-variance -> 0 guard
    val rows = Seq(("up", 0, 1), ("up", 1, 2), ("up", 2, 3),
      ("down", 0, 3), ("down", 1, 1), ("flat", 0, 2), ("flat", 2, 2),
      ("one", 5, 7))
    val ev = rows.flatMap { case (e, d, n) =>
      (0 until n).map(i => (e, d.toLong * day + i * 1000L))
    }.toDF("event_type", "us")
      .select($"event_type", expr("timestamp_micros(us)").as("ts"))
    val got = graft.agg.Windows.trendSlopes(ev, col("event_type"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("down", 2L, 4L, -2000000L),
      ("flat", 2L, 4L, 0L), ("one", 1L, 7L, 0L),
      ("up", 3L, 6L, 1000000L)), s"hand-check drifted: $got")
    // shift invariance: moving every event 1000 days later changes
    // nothing (x re-zeroes on the new global min)
    val shifted = graft.agg.Windows.trendSlopes(
        ev.select($"event_type",
          expr(s"timestamp_micros(unix_micros(ts) + 1000 * $day)")
            .as("ts")),
        col("event_type"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(shifted == got)
    graft.ops.Reuse.freeAll(spark)
  }

  test("trend slopes: count-weighted cross terms past int64 do not " +
      "wrap (10-year daily matrix at ~1.5e13 covariance mass)") {
    import spark.implicits._
    // Exact linear y = c·x + b over 3650 daily periods: the true
    // numerator c·(n·sxx − sx²) ≈ 3.4e19 leaves int64 (its two's-
    // complement difference lands negative), so pre-fix the slope came
    // out wrapped; decimal arithmetic must recover exactly c ppm-scaled.
    val c = 2300000L; val b = 1000L; val n = 3650
    val counts = (0 until n).map(x => ("big", x.toLong, c * x + b))
      .toDF("entity", "x", "y")
    val got = graft.agg.Windows.trendSlopesFromCounts(counts)
      .as[(String, Long, Long, Long)].collect().head
    // replicate the engines' one IEEE division on exact integers
    val sx = BigInt(n - 1) * n / 2
    val sxx = (0 until n).map(x => BigInt(x) * x).sum
    val num = BigInt(c) * (BigInt(n) * sxx - sx * sx)
    val den = BigInt(n) * sxx - sx * sx
    val want = math.floor(1e6 * (num.toDouble / den.toDouble)).toLong
    assert(num > BigInt(Long.MaxValue), "fixture no longer overflows")
    assert(got == (("big", n.toLong, counts.agg(sum("y"))
      .as[Long].collect().head, want)), s"wrapped cross term: $got")
    graft.ops.Reuse.freeAll(spark)
  }

  test("anomaly days: lower-median/MAD hand-checked — spike flagged, " +
      "constant series silent under the MAD floor, nonzero MAD scales " +
      "the threshold, duplicate partials re-sum (ext158)") {
    import spark.implicits._
    val counts = (
      (0 to 5).map(d => ("a", d.toLong, 5L)) ++ Seq(("a", 6L, 50L)) ++
      (0 to 2).map(d => ("b", d.toLong, 3L)) ++
      Seq(("c", 0L, 1L), ("c", 1L, 2L), ("c", 2L, 3L), ("c", 3L, 4L),
        ("c", 4L, 100L)) ++
      Seq(("d", 0L, 1L), ("d", 1L, 9L))
    ).toDF("entity", "x", "y")
    val got = graft.agg.Windows.anomalyDaysFromCounts(counts)
      .orderBy("entity", "x")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // a: med 5, mad 0 (floored 1): only the 50 (dev 45 > 7) flags
    assert(got.filter(_._1 == "a").map(r => (r._4, r._5, r._7)) ==
      Seq.fill(6)((5L, 0L, 0L)) :+ ((5L, 0L, 1L)))
    // b: constant — med 3, mad 0, zero flags
    assert(got.filter(_._1 == "b").forall(r =>
      r._4 == 3L && r._5 == 0L && r._7 == 0L))
    // c: med 3, devs [2,1,0,1,97], mad 1 — only 100 (dev 97 > 7) flags
    assert(got.filter(_._1 == "c").map(r => (r._4, r._5, r._6, r._7)) ==
      Seq((3L, 1L, 2L, 0L), (3L, 1L, 1L, 0L), (3L, 1L, 0L, 0L),
        (3L, 1L, 1L, 0L), (3L, 1L, 97L, 1L)))
    // d (even n): LOWER median 1, mad 0 floored — the 9 (dev 8 > 7)
    // flags; the asymmetry of the lower median is the documented rule
    assert(got.filter(_._1 == "d").map(r => (r._4, r._7)) ==
      Seq((1L, 0L), (1L, 1L)))
    // duplicate (entity, x) partials re-sum before ranking
    val dup = Seq(("a", 0L, 2L), ("a", 0L, 3L), ("a", 1L, 5L))
      .toDF("entity", "x", "y")
    val d2 = graft.agg.Windows.anomalyDaysFromCounts(dup)
      .orderBy("x").as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(d2.map(_._3) == Seq(5L, 5L) && d2.forall(_._7 == 0L))
    graft.ops.Reuse.freeAll(spark)
  }

  test("burstiness: hand-computed Fano ppm — regular reads 0, bursty " +
      "clumps read > 1e6, silent in-span days count as zeros, " +
      "single-period span reads 0, duplicate partials re-sum (ext166)") {
    import spark.implicits._
    // u: 1/day over 5 days -> var 0 -> fano 0 (metronomic)
    // b: 4 on day0 + 4 on day4, span 5 (3 silent zeros):
    //    n=5, s1=8, s2=32 -> (5*32-64)/(5*8) = 96/40 -> 2_400_000 ppm
    // m: 1,2,1,2 -> n=4, s1=6, s2=10 -> (40-36)/24 -> 166_666 ppm
    // p: single day -> n=1 -> (9-9)/3 = 0 by definition
    val counts = (
      (0 to 4).map(d => ("u", d.toLong, 1L)) ++
      Seq(("b", 0L, 4L), ("b", 4L, 4L)) ++
      (0 to 3).map(d => ("m", d.toLong, (1 + d % 2).toLong)) ++
      Seq(("p", 3L, 3L))
    ).toDF("entity", "x", "y")
    val got = graft.agg.Windows.burstinessFromCounts(counts)
      .orderBy("entity")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("b", 5L, 8L, 2400000L, 1L), ("m", 4L, 6L, 166666L, 0L),
      ("p", 1L, 3L, 0L, 0L), ("u", 5L, 5L, 0L, 0L)),
      s"hand-computed fano drifted: $got")
    // duplicate (entity, x) partials re-sum first (the batching law)
    val dup = Seq(("b", 0L, 2L), ("b", 0L, 2L), ("b", 4L, 4L))
      .toDF("entity", "x", "y")
    val d2 = graft.agg.Windows.burstinessFromCounts(dup)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(d2 == Seq(("b", 5L, 8L, 2400000L, 1L)),
      s"partials did not re-sum: $d2")
    graft.ops.Reuse.freeAll(spark)
  }

  test("cohort retention: churn, late cohorts, rejoin and ppm cells " +
      "hand-checked (ext136)") {
    import spark.implicits._
    val week = 7L * 86400000000L
    // Cohort week 0: users 1, 2, 3 (3 users). Week 1: user 1 and 2
    // return (2/3); week 2: only user 1 (1/3) — user 3 REJOINS in week
    // 3 with user 1 (2/3). Cohort week 1: user 4 alone, never returns.
    // Duplicate events within a week must not double-count.
    val ev = Seq(
      (1L, 0L), (1L, 1L), (2L, 0L), (2L, 0L), (2L, 1L), (3L, 0L),
      (1L, 2L), (1L, 3L), (3L, 3L), (4L, 1L), (4L, 1L))
      .map { case (u, w) => (u, w * week + u * 1000L) }
      .toDF("uid", "us")
      .select($"uid".as("user_id"),
        expr("timestamp_micros(us)").as("ts"))
    val got = Windows.cohortRetention(ev, col("user_id"))
      .select("cohort_p", "p_offset", "active_users", "cohort_users",
        "retention_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq(
      (0L, 0L, 3L, 3L, 1000000L),
      (0L, 1L, 2L, 3L, 666666L),
      (0L, 2L, 1L, 3L, 333333L),
      (0L, 3L, 2L, 3L, 666666L),
      (1L, 0L, 1L, 1L, 1000000L)))
  }

  test("funnel: order, strictness, horizon and ppm cells hand-checked " +
      "(ext139)") {
    import spark.implicits._
    val hour = 3600000000L
    val day = 24L * hour
    // u1 converts fully in order. u2 stalls after B. u3 has C BEFORE
    // its B (out of order — must not count as step 3). u4's B lands
    // past the 7-day horizon. u5 never does step A at all (its B/C
    // must not enter the funnel). u6's B is at the SAME µs as its A —
    // strictly-after must reject it.
    val ev = Seq(
      (1L, "A", 0L), (1L, "B", hour), (1L, "C", 2 * hour),
      (2L, "A", 0L), (2L, "B", hour),
      (3L, "A", 0L), (3L, "C", hour), (3L, "B", 2 * hour),
      (4L, "A", 0L), (4L, "B", 8 * day),
      (5L, "B", hour), (5L, "C", 2 * hour),
      (6L, "A", hour), (6L, "B", hour))
      .toDF("user_id", "event_type", "us")
      .select($"user_id", $"event_type",
        expr("timestamp_micros(us)").as("ts"))
    val got = Windows.funnel(ev, col("user_id"), Seq("A", "B", "C"))
      .orderBy("step")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // step A: users 1,2,3,4,6 = 5. step B: 1,2,3 (u4 horizon, u6 not
    // strictly after) = 3. step C: only u1 (u3's C precedes its B) = 1.
    assert(got == Seq(
      (1L, "A", 5L, 1000000L, 1000000L),
      (2L, "B", 3L, 600000L, 600000L),
      (3L, "C", 1L, 333333L, 200000L)))
  }
}
