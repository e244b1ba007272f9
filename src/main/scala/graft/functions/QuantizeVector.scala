package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Row-level kernel for [[QuantizeVector]]: floor-quantize a float/double
  * vector to int64 in one primitive loop (`floor(double(v) * scale)`,
  * the [[graft.ops.Similarity.QuantScale]] contract). */
object QuantizeImpl {
  def quantizeFloat(a: ArrayData, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(a.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  def quantizeDouble(a: ArrayData, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(a.getDouble(i) * scale).toLong
      i += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Native Catalyst expression for embedding quantization — the scan-side
 * twin of [[QDotProduct]]. The composed built-in form
 * `transform(emb, v -> CAST(floor(CAST(v AS DOUBLE) * scale) AS BIGINT))`
 * is a higher-order function, and HOFs are `CodegenFallback`: every
 * element evaluates through the interpreted lambda path (the same
 * pathology the dedup shingle pipeline hit — see Dedup's scaladoc).
 * This form is one primitive loop inside whole-stage codegen.
 *
 * Contract: element nulls are undefined (embeddings have none); a null
 * array yields null. Same values as the composed form — parity-tested
 * in QDotProductSpec.
 */
case class QuantizeVector(child: Expression, scale: Double)
    extends UnaryExpression {

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"quantize needs array<float|double>, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any =
    if (isFloat) QuantizeImpl.quantizeFloat(a.asInstanceOf[ArrayData], scale)
    else QuantizeImpl.quantizeDouble(a.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "quantizeFloat" else "quantizeDouble"
    defineCodeGen(ctx, ev,
      a => s"graft.functions.QuantizeImpl.$fn($a, $scale)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeVector = copy(child = newChild)

  override def prettyName: String = "quantize_vector"
}

object QuantizeVector {
  /** Column-level form, usable anywhere a built-in is. */
  def apply(emb: Column, scale: Double): Column =
    SqlBridge.column(QuantizeVector(SqlBridge.expression(emb), scale))

  /** The optional literal `scale` argument of the SQL form. A
    * non-foldable (or null) second argument fails analysis with the
    * standard NON_FOLDABLE_ARGUMENT error instead of an opaque NPE at
    * plan time. */
  private[functions] def scaleOf(exprs: Seq[Expression]): Double =
    exprs.lift(1).map { e =>
      val v = if (e.foldable) e.eval(null) else null
      if (v == null) throw new org.apache.spark.sql.AnalysisException(
        "NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> "`quantize_vector`", "paramName" -> "`scale`",
          "paramType" -> "\"DOUBLE\""))
      v.toString.toDouble
    }.getOrElse(graft.ops.Similarity.QuantScale)

  /** Register `quantize_vector(emb [, scale])` for SQL use on an
    * existing session (the extensions path in [[GraftExtensions]]
    * covers sessions built with `withExtensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantize_vector",
      exprs => QuantizeVector(exprs.head, scaleOf(exprs)),
      "scala_udf")
}
