package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * KMV (k-minimum-values) distinct-count sketch, per group.
 *
 * Why KMV instead of HyperLogLog here: the estimate is a pure function of
 * the k smallest distinct hash values, and the hash is the portable md5
 * scheme of [[Hashing]] — so the sketch is DETERMINISTIC and reproducible
 * in any engine (the DuckDB oracle recomputes the same estimate
 * bit-for-bit), unlike `approx_count_distinct`'s engine-private HLL.
 * Estimator (Bar-Yossef et al., "Counting distinct elements in a data
 * stream", RANDOM 2002): with hashes uniform on [0, P), the k-th smallest
 * distinct hash h_k estimates density k/D ≈ h_k/P, so
 * D̂ = (k-1)·P / h_k (the unbiased variant); when a group has fewer than
 * k distinct hashes the sketch IS the exact distinct set, so D̂ = count.
 *
 * Scale shape: one map-side-combined `distinct` on (group, hash) — the
 * only full shuffle, keyed and combine-reduced so duplicates collapse
 * before the exchange — then a per-group sort limited to k rows via
 * `row_number`. The sketch itself (k int64s per group) is mergeable:
 * union two groups' min-k sets and re-take the k smallest — the property
 * that makes KMV work as a partial aggregate or a stored per-partition
 * summary at 100 TB.
 */
object Sketches {

  val DefaultK = 64

  /** Per-group distinct estimate. Output: (entity, n_mins, kth_min,
    * est_distinct, exact_distinct) — exact included for error inspection.
    */
  def kmvDistinct(df: DataFrame, group: Column, value: Column,
      k: Int = DefaultK): DataFrame = {
    val h = Hashing.portableHash32(
      concat(lit("kmv:"), value.cast("string")))
    val pairs = df.select(group.as("entity"), h.as("h")).distinct()
    val w = Window.partitionBy(col("entity")).orderBy(col("h"))
    val mins = pairs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("entity"))
      .agg(count(lit(1)).as("n_mins"), max(col("h")).as("kth_min"))
    val exact = df.groupBy(group.as("entity"))
      .agg(countDistinct(value).as("exact_distinct"))
    // (k-1)*P as one plan-time double literal; the estimate is then a
    // single IEEE division — bit-identical across engines.
    val numer = (k - 1).toDouble * Hashing.Mersenne31.toDouble
    mins.join(exact, Seq("entity"))
      .select(col("entity"), col("n_mins"), col("kth_min"),
        when(col("n_mins") < k, col("n_mins").cast("double"))
          .otherwise(lit(numer) / col("kth_min").cast("double"))
          .as("est_distinct"),
        col("exact_distinct"))
  }
}
