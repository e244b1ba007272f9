package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernel for [[PortableHash32]]: md5 digest of the UTF-8
  * bytes, first 4 digest bytes as a big-endian unsigned int, mod 2^31-1 —
  * numerically identical to the composed built-ins
  * `conv(substr(md5(x),1,8),16,10) % 2147483647` (see
  * [[graft.ops.Hashing.portableHash32]]) and to the DuckDB oracle's
  * `CAST('0x'||substr(md5(x),1,8) AS BIGINT) % 2147483647`. */
object PortableHash32Impl {
  val P: Long = 2147483647L

  // One digest instance per task thread, reset per row —
  // MessageDigest.getInstance contends on the JDK security-provider
  // lookup under concurrent tasks (measured 10×+ slowdowns at local[4]).
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(s.getBytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % P
  }
}

/**
 * Native Catalyst expression for the portable 32-bit content hash —
 * the hot inner operation of the dedup operators (every shingle and
 * token flows through it).
 *
 * Why a custom `Expression` here and nowhere else (SURVEY.md §4 found
 * none *required*): the composed built-in form materializes a 32-char
 * hex `UTF8String`, substrings it, and parses it back per row; this
 * fused form computes the digest once and does three integer ops —
 * same value, no intermediate allocations, and it stays inside
 * whole-stage codegen via `doGenCode` (a static call, not a UDF
 * closure). Preference order respected: built-ins first (kept as
 * `Hashing.portableHash32Composed`), native Expression where the
 * built-in composition is measurably wasteful, UDF never.
 */
case class PortableHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_hash32 needs a string argument, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    PortableHash32Impl.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHash32Impl.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PortableHash32 = copy(child = newChild)

  override def prettyName: String = "portable_hash32"
}

object PortableHash32 {
  /** Column-level form, usable anywhere a built-in is. */
  def apply(c: Column): Column =
    SqlBridge.column(PortableHash32(SqlBridge.expression(c)))

  /** Register `portable_hash32` for SQL use on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_hash32", exprs => PortableHash32(exprs.head), "scala_udf")
}

/** Session extension wiring (`SparkSessionExtensions` path): build the
  * session with `.withExtensions(new GraftExtensions)` — or configure
  * `spark.sql.extensions=graft.functions.GraftExtensions` — and
  * `portable_hash32` / `qdot` / `quantize_vector` resolve in plain
  * SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("portable_hash32"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PortableHash32].getName, "portable_hash32"),
      (exprs: Seq[Expression]) => PortableHash32(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("qdot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[QDotProduct].getName, "qdot"),
      (exprs: Seq[Expression]) => QDotProduct(exprs.head, exprs(1))))
    // quantize_vector(emb [, scale]) — scale defaults to the engine's
    // 1e6 quantization contract (Similarity.QuantScale).
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("quantize_vector"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[QuantizeVector].getName, "quantize_vector"),
      (exprs: Seq[Expression]) => QuantizeVector(exprs.head,
        QuantizeVector.scaleOf(exprs))))
    // Composed aggregate(zip_with(·,·,*),0L,+) → native qdot kernel.
    e.injectOptimizerRule(_ => QDotFusionRule)
  }
}
