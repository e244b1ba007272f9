package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed storage — the data-layout lever for repeated large-scale
 * joins. Writing both sides of a recurring join `bucketBy(n, key)` (plus
 * sorted within buckets) makes every later join on that key a zero-
 * exchange sort-merge join: each task reads bucket i of both tables and
 * merges locally. At 100 TB the join's shuffle — normally the dominant
 * cost, all bytes over the network, skew-exposed — disappears entirely;
 * the price is paid once at write time and amortized over every
 * downstream query. (The same idea as Hive bucketing / Iceberg
 * bucket-partition transforms.)
 *
 * Bucket count guidance: pick so a single bucket of the LARGER table
 * fits an executor's memory slice (e.g. 100 TB / 8192 buckets ≈ 12 GB);
 * both sides must use the same count for exchange-free planning (Spark
 * can one-sided-coalesce when counts differ by an integer factor —
 * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
 */
object BucketedTables {

  /** Persist `df` bucketed+sorted by `key` as managed-metadata table
    * `name` with files under `path`. Overwrites idempotently. */
  def writeBucketed(df: DataFrame, name: String, path: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Join two same-bucket-count tables on their bucket keys. With both
    * sides bucketed this plans as SortMergeJoin with NO Exchange on
    * either side (asserted in BucketedJoinSpec). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
