package graft

import org.apache.spark.sql.functions._

import graft.agg.Windows
import graft.ingest.Tables
import graft.ops.AsOf

/** AsOf.joinAsOf (union-merge, linear) must equal the naive range-join
  * formulation (quadratic, only viable at test scale), and session_window
  * aggregation must equal a gaps-and-islands reconstruction. */
class AsOfSpec extends TestBase {
  import spark.implicits._

  private def sides(dir: String) = {
    val ev = Tables.events(spark, dir)
    (ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value")),
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value")))
  }

  test("union-merge as-of == naive range-join as-of") {
    val (purchases, clicks) = sides(sf("sf0.001"))
    val got = AsOf.joinAsOf(purchases, clicks, "user_id", "ts",
        Seq("value"), prefix = "click_")
      .select("event_id", "click_ts", "click_value")

    // Naive: range-join all prior clicks, keep latest (ts DESC) per left.
    val naive = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("c.ts") <= col("p.ts"),
        "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("p.event_id")).orderBy(col("c.ts").desc)))
      .filter(col("rn") === 1)
      .select(col("p.event_id").as("event_id"),
        col("c.ts").as("click_ts"), col("c.value").as("click_value"))

    assert(got.count() === purchases.count())
    assert(got.except(naive).count() === 0 && naive.except(got).count() === 0)
  }

  test("equal timestamps are visible; missing history yields nulls") {
    val left = Seq((1L, 100L, "L1"), (1L, 50L, "L0")).toDF("k", "t", "l")
    val right = Seq((1L, 100L, "R100"), (1L, 60L, "R60"))
      .toDF("k", "t", "payload")
    val out = AsOf.joinAsOf(left, right, "k", "t", Seq("payload"))
      .select("l", "asof_t", "asof_payload").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    // L1 at t=100 sees the right row AT t=100 (>= semantics);
    // L0 at t=50 predates all right rows -> null payload.
    assert(out === Set(("L1", 100L, "R100"), ("L0", -1L, null)))
  }

  test("null field inside a matched right row does not skip backwards") {
    val left = Seq((1L, 100L, "L")).toDF("k", "t", "l")
    val right = Seq((1L, 90L, Some("old")), (1L, 95L, None))
      .toDF("k", "t", "payload")
    val out = AsOf.joinAsOf(left, right, "k", "t", Seq("payload"))
      .select("asof_t", "asof_payload").collect().head
    // The latest right row (t=95) matches even though its payload field is
    // null — last(ignoreNulls) operates on the struct, not the field.
    assert(out.getLong(0) === 95L && out.isNullAt(1))
  }

  test("session_window aggregation == gaps-and-islands reconstruction") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val got = Windows.sessionAgg(ev, col("user_id"), col("value"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = 6L * 3600 * 1000000
    val naive = ev
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(unix_micros(col("ts")) - col("prev_us") < gapUs, 0)
          .otherwise(1))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy(col("user_id").as("entity"), col("sid"))
      .agg(min(unix_micros(col("ts"))).as("session_start_us"),
        (max(unix_micros(col("ts"))) + gapUs).as("session_end_us"),
        count("*").as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("weight_sum"))
      .drop("sid")

    assert(got.count() > 0)
    assert(got.except(naive).count() === 0 && naive.except(got).count() === 0)
  }
}
