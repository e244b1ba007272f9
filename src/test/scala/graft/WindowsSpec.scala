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
}
