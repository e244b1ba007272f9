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

  /**
   * Salt-and-replicate equi-join — the manual skew-join for the cases
   * AQE's runtime splitting cannot reach: a sort-merge join whose hot
   * key floods one reducer when the dimension side is too big to
   * broadcast yet small enough to replicate ×numSalts (AQE skew-join
   * also cannot rebalance stream-stream or stateful joins). The big
   * side gets a uniform salt from `discriminator`; the small side
   * replicates into every salt; the join keys on (key, salt), so the
   * hot key's rows spread over numSalts reducers. Result set is
   * EXACTLY the plain inner join (each big row meets exactly the one
   * replica carrying its salt) — the salt never leaks into results,
   * so correctness is oracle-checkable against the unsalted join
   * (ext114). Cost: small side ×numSalts rows; pick numSalts ≈ the
   * hot key's skew factor, not more — [[measuredNumSalts]] reads that
   * factor off the key histogram, [[saltedJoinAuto]] wires it in.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      discriminator: Column, numSalts: Int = 16): DataFrame = {
    val b = big.withColumn("_salt",
      pmod(hash(discriminator), lit(numSalts)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /**
   * Measure the salt count [[saltedJoin]]'s doc tells the caller to
   * pick by hand: the hot key's SKEW FACTOR — its row count over the
   * mean per-key row count — read off one keyed-count aggregate over
   * the big side (the exact top-1 share; at corpora where even the
   * key histogram is too hot to count exactly, [[Sketches]]'
   * Count-Min heavy-hitter estimate substitutes, same decision).
   * Replicating the small side beyond the skew factor buys nothing
   * (the hot key is already spread to parity with the average key)
   * and costs ×salts small-side rows, so the result is clamped to
   * [1, maxSalts]. One driver action, run ONCE per join build — the
   * measurement is part of planning, like AQE's runtime statistics,
   * not part of the per-row path.
   */
  def measuredNumSalts(big: DataFrame, key: String,
      maxSalts: Int = 64): Int = {
    val row = big.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx"), sum(col("c")).as("tot"),
        count(lit(1)).as("nk"))
      .head()
    if (row.isNullAt(0)) 1 // empty big side: any salt count is a no-op
    else {
      val skew = math.ceil(
        row.getLong(0).toDouble * row.getLong(2) / row.getLong(1)).toInt
      math.min(maxSalts, math.max(1, skew))
    }
  }

  /** [[saltedJoin]] with the salt count derived from the measured key
    * histogram instead of a hardcoded guess (r8 verdict item 5):
    * even spread for a 90%-hot-key frame, ~zero replication overhead
    * for a uniform one. Result set is still exactly the plain inner
    * join. */
  def saltedJoinAuto(big: DataFrame, small: DataFrame, key: String,
      discriminator: Column, maxSalts: Int = 64): DataFrame =
    saltedJoin(big, small, key, discriminator,
      measuredNumSalts(big, key, maxSalts))
}
