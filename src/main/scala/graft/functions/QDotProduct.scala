package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-level kernel for [[QDotProduct]]: exact int64 dot product over two
  * quantized vectors — one tight primitive loop, no intermediate array. */
object QDotImpl {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc = 0L
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

/**
 * Native Catalyst expression for the quantized integer dot product — the
 * hot inner loop of every similarity/ANN operator (candidate × dim
 * multiply-adds dominate the verify stage).
 *
 * The composed built-in form `aggregate(zip_with(a, b, _*_), 0L, _+_)`
 * materializes an intermediate ArrayData of products per ROW and walks it
 * again to sum; this fused form is one primitive loop with no allocation,
 * inside whole-stage codegen via `doGenCode` (a static call, not a UDF
 * closure). Same value on equal-length non-null inputs — parity-tested in
 * QDotProductSpec; the composed form stays in Similarity's scaladoc as
 * the readable specification.
 *
 * Contract: element nulls and length mismatches are undefined (quantized
 * embeddings have neither); a null ARRAY on either side yields null.
 */
case class QDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"qdot needs two array<bigint> arguments, got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QDotImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.QDotImpl.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "qdot"
}

object QDotProduct {
  /** Column-level form, usable anywhere a built-in is. */
  def apply(a: Column, b: Column): Column =
    SqlBridge.column(QDotProduct(SqlBridge.expression(a),
      SqlBridge.expression(b)))

  /** Register `qdot` for SQL use on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "qdot", exprs => QDotProduct(exprs.head, exprs(1)), "scala_udf")
}
