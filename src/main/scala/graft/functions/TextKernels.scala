package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels for the text-scan expressions below: one primitive
  * loop each, shared by the interpreted and the generated paths. */
object TextKernelImpl {
  /** Occurrences of array elements that belong to `set` (null elements
    * skipped — `split` never produces them, but the kernel stays total). */
  def countInSet(a: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = a.numElements()
    var i = 0
    var acc = 0L
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) acc += 1L
      i += 1
    }
    acc
  }

  /** Σ ceil(numChars/4) over the tokens — the BPE-ish subword estimate
    * ((len+3) div 4 per token, exact integer math). */
  def bpeEstimate(a: ArrayData): Long = {
    val n = a.numElements()
    var i = 0
    var acc = 0L
    while (i < n) {
      if (!a.isNullAt(i)) acc += (a.getUTF8String(i).numChars() + 3L) / 4L
      i += 1
    }
    acc
  }
}

/**
 * Native membership-count over a token array against a PLAN-TIME word
 * set — the kernel behind stopword counting (quality scoring, ext09/24/
 * 47/67) and per-language marker scoring (language-ID, ext08).
 *
 * The composed built-in `size(filter(toks, t.isInCollection(words)))`
 * is a higher-order ArrayFilter — CodegenFallback, so every document on
 * a 100 TB scan pays interpreted per-element lambda dispatch AND an
 * intermediate filtered-array allocation (the exact failure mode of the
 * r3 ext02 spike that banned HOF lambdas from scan hot paths; this file
 * closes the last three such sites in TextOps). This form is one
 * primitive loop against a hashed set reference inside whole-stage
 * codegen. Parity with the composed form is property-tested
 * (TextKernelsSpec); the composed form remains the readable spec.
 */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_in_set needs array<string>, got $t")
  }

  override def dataType: DataType = LongType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(a: Any): Any =
    TextKernelImpl.countInSet(a.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernelImpl.countInSet($a, $setRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CountInSet = copy(child = newChild)

  override def prettyName: String = "count_in_set"
}

object CountInSet {
  def apply(toks: Column, words: Seq[String]): Column =
    SqlBridge.column(CountInSet(SqlBridge.expression(toks), words))
}

/**
 * Native Σ ceil(len/4) over a token array — the BPE-ish token-count
 * estimate (ext10). Replaces the composed
 * `aggregate(transform(toks, …), 0L, _+_)` chain: TWO CodegenFallback
 * higher-order functions and an intermediate per-row array, where this
 * is one fused loop in whole-stage codegen.
 */
case class BpeEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_estimate needs array<string>, got $t")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any =
    TextKernelImpl.bpeEstimate(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernelImpl.bpeEstimate($a)")

  override protected def withNewChildInternal(
      newChild: Expression): BpeEstimate = copy(child = newChild)

  override def prettyName: String = "bpe_estimate"
}

object BpeEstimate {
  def apply(toks: Column): Column =
    SqlBridge.column(BpeEstimate(SqlBridge.expression(toks)))

  /** Register `bpe_estimate` for SQL use. (`count_in_set` stays
    * Column-API-only: its word set is a plan-time Scala constant, and a
    * SQL surface would need per-word-list function builders nothing
    * currently asks for.) */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_estimate", exprs => BpeEstimate(exprs.head), "scala_udf")
  }
}
