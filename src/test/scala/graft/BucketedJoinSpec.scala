package graft

import org.apache.spark.sql.functions._

import graft.ingest.Tables
import graft.sources.BucketedTables

/** The point of bucketing is the ABSENCE of exchanges — asserted on the
  * plan, with result parity against the plain shuffled join. */
class BucketedJoinSpec extends TestBase {

  test("bucketed join + aggregate plans with zero exchanges") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bucketed-spec").toString
    BucketedTables.writeBucketed(Tables.lineitem(spark, sf("sf0.001")),
      "spec_li_b", s"$dir/li", "l_orderkey", 8)
    BucketedTables.writeBucketed(Tables.orders(spark, sf("sf0.001")),
      "spec_ord_b", s"$dir/ord", "o_orderkey", 8)
    // At test SF Spark would rather broadcast the small side; disable
    // that to plan as if both sides were too big to broadcast — the
    // regime bucketing is for.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val j = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = BucketedTables
        .bucketedJoin(spark, "spec_ord_b", "spec_li_b", "o_orderkey",
          "l_orderkey")
        .groupBy("o_orderkey")
        .agg(sum(col("l_extendedprice").cast("decimal(18,6)"))
          .cast("double").as("sum_price"))
      // Bucketing satisfies the join AND the follow-on groupBy
      // distribution: no Exchange anywhere in the plan.
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"))
      df
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)

    val plain = Tables.orders(spark, sf("sf0.001"))
      .join(Tables.lineitem(spark, sf("sf0.001")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double").as("sum_price"))
    assert(j.except(plain).isEmpty && plain.except(j).isEmpty)
    assert(j.count() > 0)
  }
}
