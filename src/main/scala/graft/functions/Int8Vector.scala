package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-level kernel for [[Int8Vector]]: re-quantize an int64-quantized
  * vector ([[QuantizeVector]]'s frame) to the symmetric int8 range
  * [-127, 127] by per-vector max-abs scaling. The scaling is exact
  * integer arithmetic — `((q + m) * 254) / (2m) - 127` with a
  * non-negative numerator, so Java's truncating division equals floor
  * division and the DuckDB oracle's `//` computes the identical codes.
  * An all-zero vector (m = 0) maps to all-zero codes. */
object Int8Impl {
  def requantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var m = 0L
    var i = 0
    while (i < n) {
      val v = math.abs(a.getLong(i))
      if (v > m) m = v
      i += 1
    }
    val out = new Array[Long](n)
    if (m > 0L) {
      i = 0
      while (i < n) {
        out(i) = (a.getLong(i) + m) * 254L / (2L * m) - 127L
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

/**
 * Native Catalyst expression for int8 vector re-quantization — the
 * storage-precision half of the ext93 fidelity audit (8× smaller than
 * the float frame, 2 bytes-per-dim smaller than the int64 audit frame;
 * the audit prices what that compression costs in ranking fidelity).
 * Two primitive loops (max-abs, then rescale) in one codegen'd kernel,
 * no intermediate array — the composed `transform(...)` form would be
 * an interpreted `CodegenFallback` HOF, banned from scan hot paths
 * (see [[QuantizeVector]]'s scaladoc for the measured pathology).
 *
 * Codes are kept as `array<long>` so [[QDotProduct]] consumes them
 * unchanged; the int8 claim is about the VALUE RANGE (a real store
 * would pack them 1-byte-per-dim), and dot products of [-127,127]
 * codes stay exact in int64 for any realistic dimension.
 */
case class Int8Vector(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"int8_vector needs array<bigint> (the quantize_vector frame), got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any =
    Int8Impl.requantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Int8Impl.requantize($a)")

  override protected def withNewChildInternal(
      newChild: Expression): Int8Vector = copy(child = newChild)

  override def prettyName: String = "int8_vector"
}

object Int8Vector {
  /** Column-level form, usable anywhere a built-in is. */
  def apply(q: Column): Column =
    SqlBridge.column(Int8Vector(SqlBridge.expression(q)))

  /** Register `int8_vector(q)` for SQL use on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_vector", exprs => Int8Vector(exprs.head), "scala_udf")
}
