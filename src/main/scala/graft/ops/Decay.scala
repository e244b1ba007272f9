package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exponentially-decayed counting for trending/recency ranking — the
 * "what is hot NOW" query class the reference's windowed top-k family
 * (SURVEY §2, OP-26/28) answers only for fixed tumbling windows. A
 * tumbling count forgets an entity the instant its window closes; a
 * decayed count lets every event vote with weight 2^(−age/half-life),
 * so rankings blend volume and recency with one knob.
 *
 * Engine-portable by the same trick as the HLL sketch
 * ([[Sketches.hllRegisters]]): decay is QUANTIZED to whole half-life
 * buckets, so every event's weight is a power of two, every addend of
 * the 2^(K−1)-scaled score is a whole number, and the per-entity score
 * is an EXACT int64 — order-independent, mergeable, and recomputable
 * bit-for-bit by the DuckDB oracle (a float e^−λt decay is none of
 * those). The sketch state is the DECAY HISTOGRAM: at most K = 30
 * int64 counters per entity (events per age bucket), which
 *  - merges across shards/micro-batches by summing counters,
 *  - ages IN PLACE when the reference clock advances one half-life:
 *    shift every bucket up one slot and drop the oldest ([[shift]] —
 *    no re-scan of history, the property that makes a 100 TB trending
 *    store maintainable: K int64s per entity, halved-and-appended per
 *    half-life, exactly how a serving store would keep it),
 *  - collapses to the scalar score with [[scoreFromHistogram]].
 *
 * Scale shape: one map-side-combined groupBy to the histogram (the
 * exchange carries ≤ K rows per entity per map task), a tiny broadcast
 * of the 1-row reference-clock frame, and a per-group-bounded rank over
 * the already-aggregated (entity-pair) relation — |types|×|users| rows,
 * not |events|. K = 30 caps the scaled weight at 2^29, so int64
 * overflow needs > 1.7×10^10 same-bucket events per entity.
 */
object Decay {

  /** Age buckets kept: events older than K half-lives weigh 0. */
  val AgeBuckets = 30

  /** Decay histogram: (groupCols…, age_bucket, cnt), age ∈ [0, K).
    * `trefUs` is the reference clock ("now") as a 1-row broadcastable
    * frame column or literal; events after it are age 0. */
  def histogram(df: DataFrame, groupCols: Seq[Column], ts: Column,
      trefUs: Column, halfLifeUs: Long): DataFrame = {
    val named = groupCols.zipWithIndex.map { case (c, i) => c.as(s"g$i") }
    val gNames = named.indices.map(i => col(s"g$i"))
    df.select(named :+
        greatest(trefUs - unix_micros(ts), lit(0L)).as("age_us"): _*)
      .select(gNames :+
        expr(s"age_us DIV $halfLifeUs").as("age_bucket"): _*)
      .filter(col("age_bucket") < AgeBuckets)
      .groupBy(gNames :+ col("age_bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** One half-life of in-place aging: every bucket moves up a slot, the
    * oldest expires. scoreFromHistogram(shift(h)) equals the score
    * recomputed from raw events at tref + halfLife — exactly (spec law;
    * integer DIV 2 of the SUM could not say the same, the scale-1
    * addends of the oldest bucket round wrong). */
  def shift(hist: DataFrame): DataFrame =
    hist.withColumn("age_bucket", col("age_bucket") + 1L)
      .filter(col("age_bucket") < AgeBuckets)

  /** Collapse a histogram to per-entity scores: the 2^(K−1)-scaled
    * decayed count Σ cnt·2^(K−1−age) — every addend a whole number, so
    * the sum is an exact, order-independent int64. */
  def scoreFromHistogram(hist: DataFrame): DataFrame = {
    val gNames = hist.columns.filter(_.startsWith("g")).map(col).toSeq
    hist.groupBy(gNames: _*)
      .agg(sum(expr(s"shiftleft(CAST(cnt AS BIGINT), " +
          s"CAST(${AgeBuckets - 1} - age_bucket AS INT))"))
        .as("decayed_scaled"),
        sum("cnt").as("n_events"))
  }

  /**
   * Absolute-grid decay histogram — the STREAMING-MERGEABLE member of
   * the family. [[histogram]] quantizes age as distance-from-tref, so
   * two partials built under different reference clocks cannot merge
   * (their bucket boundaries disagree unless the trefs differ by an
   * exact half-life multiple). Here buckets sit on the absolute epoch
   * grid (`ts DIV halfLife`), so per-shard / per-micro-batch partial
   * histograms merge by PURE ADDITION with no tref agreement at all,
   * and the reference clock is derivable FROM the merged state
   * (max bucket) — exactly how a production trending store keys its
   * counters. Advancing the clock one half-life is [[shift]] on the
   * derived ages, i.e. free.
   */
  def alignedHistogram(df: DataFrame, groupCols: Seq[Column], ts: Column,
      halfLifeUs: Long): DataFrame = {
    val named = groupCols.zipWithIndex.map { case (c, i) => c.as(s"g$i") }
    val gNames = named.indices.map(i => col(s"g$i"))
    df.select(named :+ unix_micros(ts).as("ts_us"): _*)
      .select(gNames :+
        expr(s"ts_us DIV $halfLifeUs").as("abs_bucket"): _*)
      .groupBy(gNames :+ col("abs_bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Rank an [[alignedHistogram]] (possibly the sum of many partials):
    * reference bucket = max over the state, age = distance on the
    * absolute grid, then the same exact-int64 scoring and bounded rank
    * as [[trendingTopK]]. */
  def trendingFromAligned(hist: DataFrame, k: Int): DataFrame = {
    val trefB = hist.agg(max("abs_bucket").as("tref_b"))
    val aged = hist.crossJoin(broadcast(trefB))
      .withColumn("age_bucket", col("tref_b") - col("abs_bucket"))
      .filter(col("age_bucket") < AgeBuckets)
      .drop("tref_b", "abs_bucket")
    scoreFromHistogram(aged)
      .withColumn("rank", row_number().over(Window.partitionBy("g0")
        .orderBy(col("decayed_scaled").desc, col("g1"))))
      .filter(col("rank") <= k)
      .select(col("g0").as("part"), col("g1").as("entity"),
        col("decayed_scaled"), col("n_events"), col("rank"))
  }

  /** [[trendingTopK]] under absolute-grid quantization — identical
    * algebra, bucket boundaries anchored at the epoch instead of at
    * tref (weights differ from the tref-anchored form by at most one
    * half-life of quantization; the trade buys mergeability). */
  def trendingTopKAligned(df: DataFrame, part: Column, entity: Column,
      ts: Column, halfLifeUs: Long, k: Int): DataFrame =
    trendingFromAligned(
      alignedHistogram(df, Seq(part, entity), ts, halfLifeUs), k)

  /** Trending top-k: per `part` (e.g. event type), the k `entity`s
    * (e.g. users) with the highest decayed count, reference clock =
    * max(ts) over the input. Rank runs over the aggregated pair
    * relation (|part|×|entity| rows), never over raw events; ties break
    * on entity for determinism. */
  def trendingTopK(df: DataFrame, part: Column, entity: Column,
      ts: Column, halfLifeUs: Long, k: Int): DataFrame = {
    val tref = df.agg(max(unix_micros(ts)).as("tref_us"))
    val scored = scoreFromHistogram(histogram(
      df.crossJoin(broadcast(tref)),
      Seq(part, entity), ts, col("tref_us"), halfLifeUs))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("g0")
        .orderBy(col("decayed_scaled").desc, col("g1"))))
      .filter(col("rank") <= k)
      .select(col("g0").as("part"), col("g1").as("entity"),
        col("decayed_scaled"), col("n_events"), col("rank"))
  }
}
