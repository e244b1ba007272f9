package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (time-range) join, binned: for every left row, aggregate the
 * right rows of the same key whose time falls in
 * `[left.time - interval, left.time)` — the "how many clicks in the hour
 * before this purchase" attribution shape, and the batch twin of a
 * stream-stream interval join.
 *
 * Why binning: the naive encoding `l.key = r.key AND r.t BETWEEN ...` is
 * an equi-join only on the key, so one hot key degenerates to a per-key
 * cross product (|L_k|·|R_k| comparisons) — quadratic at 100 TB. Binning
 * by `floor(t / interval)` adds the bin to the join key: a right row at
 * time t can only match left rows in bins {bin(t), bin(t)+1}, so each
 * right row is replicated exactly 2× (bounded fan-out, no skew blow-up)
 * and the join is a plain hash join on (key, bin) with the range
 * predicate as a cheap residual filter. Same technique Spark applies
 * internally to stream-stream joins with event-time bounds.
 */
object IntervalJoin {

  /**
   * Count, per left row, the right rows with the same `key` and
   * `right.time ∈ [left.time - intervalUs, left.time)`. Left rows with no
   * match keep count 0 (left-outer). Contract: `left`'s rows must be
   * distinct (they are the output's group-by key).
   */
  def countRecent(left: DataFrame, right: DataFrame, key: String,
      time: String, intervalUs: Long,
      countName: String = "n_recent"): DataFrame = {
    val lb = left
      .withColumn("_us", unix_micros(col(time)))
      .withColumn("_bin", floor(col("_us") / intervalUs))
    val rb = right
      .select(col(key).as("_r_key"), unix_micros(col(time)).as("_r_us"))
      .withColumn("_b0", floor(col("_r_us") / intervalUs))
      .select(col("_r_key"), col("_r_us"),
        explode(array(col("_b0"), col("_b0") + 1)).as("_bin"))
    lb.join(rb,
        lb(key) === rb("_r_key") && lb("_bin") === rb("_bin") &&
          rb("_r_us") >= lb("_us") - intervalUs && rb("_r_us") < lb("_us"),
        "left")
      .groupBy(left.columns.map(lb(_)): _*)
      .agg(count(col("_r_us")).as(countName))
  }
}
