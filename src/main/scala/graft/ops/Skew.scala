package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resilient aggregation (SURVEY.md §4 / 100 TB design): when one key
 * dominates — a viral hashtag, a bot user — a plain groupBy sends the
 * whole hot key to one reducer. Salted two-phase aggregation splits every
 * key across `numSalts` reducers and recombines:
 *
 *   phase 1: groupBy(key, salt)  — hot key spread over numSalts tasks
 *   phase 2: groupBy(key)        — numSalts partial rows per key
 *
 * Only algebraic aggregates (count/sum/min/max and compositions) can ride
 * this; the salt is derived from a uniform hash of a discriminator column
 * so the split is even and deterministic. For joins, prefer AQE's runtime
 * skew-join splitting (enabled by default); this helper covers the
 * aggregation side AQE does not rebalance.
 */
object Skew {

  /** Salted count+sum per key. `discriminator` should be high-cardinality
    * (a row id) so the hot key's rows spread uniformly. */
  def saltedCountSum(df: DataFrame, key: Column, weight: Column,
      discriminator: Column, numSalts: Int = 16): DataFrame = {
    val salted = df.groupBy(key.as("key"),
        pmod(hash(discriminator), lit(numSalts)).as("salt"))
      .agg(count("*").as("c"),
        sum(weight.cast("decimal(18,6)")).as("s"))
    salted.groupBy(col("key"))
      .agg(sum(col("c")).as("cnt"),
        sum(col("s")).cast("double").as("weight_sum"))
  }
}
