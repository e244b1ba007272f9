package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join: for every left row, attach the most recent
 * right row with `right.time <= left.time` in the same key group — the
 * lookup a feature store / trade-vs-quote / attribution pipeline needs.
 *
 * Spark has no ASOF JOIN operator, and the naive encodings don't scale:
 * a range join `l.key = r.key AND r.t <= l.t` produces |matches| ∝
 * |L|·|R| per key before the "latest" filter, and a per-row subquery is
 * driver-bound. This is the union-merge formulation instead: tag the two
 * sides, shuffle ONCE by key, sort within partitions by (time, side),
 * and carry the latest right payload forward with a running
 * `last(_, ignoreNulls)` window. Cost: one exchange per side + one sort —
 * linear in |L|+|R|, skew-bounded by the hottest key, no blow-up at
 * 100 TB.
 *
 * Correctness details:
 *  - The right payload rides in ONE struct column: a null FIELD inside a
 *    matched right row can't make `last(ignoreNulls)` skip further back
 *    (the struct itself is null only on left rows).
 *  - Equal timestamps: right sorts before left (side 0 < 1), so a right
 *    row at exactly left.time IS visible — `ASOF JOIN ... ON l.t >= r.t`
 *    (DuckDB) semantics.
 *  - Left rows with no prior right row get a null payload (left-outer).
 *  - Determinism contract: (key, time) must uniquely identify right rows;
 *    pre-aggregate the right side otherwise.
 */
object AsOf {

  /**
   * @param rightPayload right columns to attach (the right time column is
   *                     always included); emitted as `prefix + name`.
   */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val fields = (time +: rightPayload).distinct
    val pStruct = struct(fields.map(col): _*)
    val pType = right.select(pStruct.as("_p")).schema("_p").dataType
    val leftU = left.select(
      left.columns.map(col).toSeq
        :+ lit(1).as("_side") :+ lit(null).cast(pType).as("_p"): _*)
    val rightU = right.select(
      left.schema.map { f =>
        if (f.name == key || f.name == time) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      } :+ lit(0).as("_side") :+ pStruct.as("_p"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftU.unionByName(rightU)
      .withColumn("_last", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col).toSeq
        ++ fields.map(f => col(s"_last.$f").as(prefix + f)): _*)
  }
}
