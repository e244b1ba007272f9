package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic dataset splitting — the train/val/test assignment step of
 * a training-data pipeline.
 *
 * Why hash-based and not `randomSplit`: at 100 TB the split must be (a)
 * reproducible across reruns and engines (no RNG, no partition-order
 * dependence), (b) stable under re-partitioning and incremental appends
 * (a document keeps its split forever, so later pipeline runs never leak
 * val/test docs into train), and (c) a pure per-row projection — no
 * shuffle, no state, stays inside the scan's WholeStageCodegen span.
 * `randomSplit` gives none of these. The portable md5 scheme of
 * [[Hashing]] makes the same assignment computable in any engine (the
 * DuckDB oracle checks it row by row).
 *
 * The salt namespaces the split: different salts give independent
 * assignments of the same ids (e.g. one per experiment).
 */
object Splits {

  /** Adds `bucket` (0..99, hash of salt:id) and `split`
    * (train/val/test by bucket cutoffs). */
  def assign(df: DataFrame, id: Column, salt: String = "split",
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct <= 100, "train+val percent must be <= 100")
    val bucket =
      Hashing.portableHash32(concat(lit(salt + ":"), id.cast("string"))) %
        lit(100L)
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }
}
