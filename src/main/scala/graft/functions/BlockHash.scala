package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Row-level kernel for [[BlockHash60]]: one primitive pass over the
  * byte array, shared by the interpreted and generated paths. */
object BlockHashImpl {
  final val NumBits = 60

  /** 60-bit 1-D blockhash ("average hash" over a byte signal): the
    * array splits into 60 contiguous blocks (block of byte i =
    * i*60 div n — block sizes differ by at most one), bit b is set
    * when block b's mean byte value strictly exceeds the global mean.
    * The compare is the exact integer cross-multiply
    * `s_b * n > total * c_b` — no division, no float, so DuckDB
    * reproduces it bit for bit. Empty input (and blocks that receive
    * no bytes when n < 60) hash to 0 bits.
    *
    * Overflow: both products are ≤ 255·n²; long math is exact below
    * n ≈ 1.9e8 bytes and the rare huge-blob rows (videos) take an
    * exact BigInteger compare instead of wrapping silently. */
  def blockHash60(b: Array[Byte]): Long = {
    val n = b.length
    if (n == 0) return 0L
    val sums = new Array[Long](NumBits)
    val cnts = new Array[Long](NumBits)
    var total = 0L
    var i = 0
    while (i < n) {
      val blk = ((i.toLong * NumBits) / n).toInt
      val v = (b(i) & 0xff).toLong
      sums(blk) += v
      cnts(blk) += 1
      total += v
      i += 1
    }
    val exactLong = n < 190000000 // 255·n² stays inside int64
    var h = 0L
    var blk = 0
    while (blk < NumBits) {
      val set =
        if (cnts(blk) == 0L) false
        else if (exactLong) sums(blk) * n > total * cnts(blk)
        else java.math.BigInteger.valueOf(sums(blk))
          .multiply(java.math.BigInteger.valueOf(n))
          .compareTo(java.math.BigInteger.valueOf(total)
            .multiply(java.math.BigInteger.valueOf(cnts(blk)))) > 0
      if (set) h |= (1L << blk)
      blk += 1
    }
    h
  }
}

/**
 * Native 60-bit byte-blockhash over a `binary` column — the perceptual
 * "average hash" primitive behind the multimodal near-dup detector
 * (`ops.Multimodal.phashPairs`). 60 bits (not 64) keeps the hash a
 * positive int64 in BOTH engines (DuckDB's `1 << 63` overflows a signed
 * BIGINT) — the same width choice as `Dedup.simhashWide` — and divides
 * evenly into the 4×15-bit pigeonhole chunks the Hamming candidate join
 * uses.
 *
 * One fused loop in whole-stage codegen (the CountInSet discipline): a
 * composed-builtin form would need a per-byte explode or a chain of
 * CodegenFallback higher-order lambdas per scanned blob.
 */
case class BlockHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"block_hash60 needs binary, got $t")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any =
    BlockHashImpl.blockHash60(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.BlockHashImpl.blockHash60($a)")

  override protected def withNewChildInternal(
      newChild: Expression): BlockHash60 = copy(child = newChild)

  override def prettyName: String = "block_hash60"
}

object BlockHash60 {
  def apply(bytes: Column): Column =
    SqlBridge.column(BlockHash60(SqlBridge.expression(bytes)))

  /** Register `block_hash60` for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "block_hash60", exprs => BlockHash60(exprs.head), "scala_udf")
  }
}
