package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional storage-layout clustering (Z-ordering) — the
 * write-time operator behind "which rows share a file" at 100 TB.
 * Single-key layouts (the entity store's date+entity sort, the
 * bucketed-join tables) bound ONE dimension's span per file; a query
 * that prunes on a second dimension still reads everything. Z-ordering
 * interleaves the bits of two normalized dimensions so rows close in
 * the curve are close in BOTH dimensions — per-file min/max footers
 * then prune on either predicate (the Delta/Iceberg OPTIMIZE ZORDER
 * story, Morton 1966).
 *
 * Everything here is exact integer arithmetic: dimensions normalize to
 * `bits`-bit grids by integer DIV against the (min, max) envelope (one
 * 1-row aggregate, broadcast), the Morton code is a fixed bit-interleave
 * expression, and a file/bucket is the Z-code's top `bucketBits` bits —
 * a pure projection, NO global sort (a range-partition by Z would
 * sample; the bit-prefix bucket is the deterministic, engine-portable
 * equivalent at equal-width granularity). The audit reports what the
 * layout buys: per-bucket row count and the span of each dimension
 * inside the bucket, side by side with the same stats under a
 * single-dimension sort layout — the d2 spans collapse under Z-order,
 * stay at full range under d1-sort.
 */
object Layout {

  /** Grid resolution per dimension (bits) and the Morton interleave of
    * two `bits`-bit values: d1's bit i lands at 2i+1, d2's at 2i. */
  def morton(d1: Column, d2: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(d1, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(
          shiftleft(shiftright(d2, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduceLeft(_ bitwiseOR _)

  /** Normalize a value into the [0, 2^bits) grid of its (min, max)
    * envelope — integer DIV, exact (never double division, whose
    * rounding the oracle could not reproduce past 2^53); a constant
    * dimension maps to 0. Caller must pre-coarsen dimensions so
    * (range × 2^bits) fits int64 (e.g. days, not µs). */
  def gridCellSql(v: String, vMin: String, vMax: String,
      bits: Int): String =
    s"CAST(CASE WHEN $vMax = $vMin THEN 0 ELSE " +
      s"(($v - $vMin) * ${(1L << bits) - 1}) DIV ($vMax - $vMin) END " +
      "AS BIGINT)"

  /**
   * Layout audit: per (layout, bucket) the row count and each
   * dimension's grid-span — `zorder` buckets by the Morton code's top
   * `bucketBits` bits, `d1sort` by d1's top bits (what a single-key
   * sort layout yields at the same file granularity). One scan
   * computes both layouts' cells; the envelope is a 1-row broadcast.
   */
  def zOrderAudit(df: DataFrame, d1: Column, d2: Column,
      bucketBits: Int = 4, bits: Int = 16): DataFrame = {
    val vals = df.select(d1.cast("long").as("d1"), d2.cast("long").as("d2"))
    val mm = vals.agg(min("d1").as("min1"), max("d1").as("max1"),
      min("d2").as("min2"), max("d2").as("max2"))
    val cells = vals.crossJoin(broadcast(mm))
      .select(
        expr(gridCellSql("d1", "min1", "max1", bits)).as("c1"),
        expr(gridCellSql("d2", "min2", "max2", bits)).as("c2"))
    val tagged = cells.select(lit("zorder").as("layout"),
        shiftright(morton(col("c1"), col("c2"), bits),
          2 * bits - bucketBits).as("bucket"),
        col("c1"), col("c2"))
      .union(cells.select(lit("d1sort").as("layout"),
        shiftright(col("c1"), bits - bucketBits).as("bucket"),
        col("c1"), col("c2")))
    tagged.groupBy("layout", "bucket")
      .agg(count(lit(1)).as("n_rows"),
        (max("c1") - min("c1")).as("d1_span"),
        (max("c2") - min("c2")).as("d2_span"))
  }
}
