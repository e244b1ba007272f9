package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Row-level kernel for [[BloomProbe]]: k universal-hash positions off
  * ONE base hash, each tested against the literal word array — all
  * inside one fused loop (no per-probe re-evaluation of the md5 base
  * hash, which the composed column form paid ~6× per row). */
object BloomProbeImpl {
  final val Mersenne31 = 2147483647L

  def probe(h: Long, words: Array[Long], m: Long, seedA: Array[Long],
      seedB: Array[Long]): Boolean = {
    var j = 0
    while (j < seedA.length) {
      val pos = ((h * seedA(j) + seedB(j)) % Mersenne31) % m
      if (((words((pos >> 6).toInt) >>> (pos & 63).toInt) & 1L) == 0L)
        return false
      j += 1
    }
    true
  }
}

/**
 * Native Bloom-membership probe against a PLAN-TIME word array — the
 * fact-side scan predicate of the Bloom semi-join
 * (`ops.Sketches.bloomSemiJoin`). The child is the row's 31-bit
 * portable base hash; the k derived positions and bit tests run in one
 * codegen'd kernel against a reference-object long[] (the CountInSet
 * discipline). The composed `element_at(lit(words), …)` form
 * re-evaluated the md5 base hash once per position AND once per
 * div/mod use (~6× per row, measured 9.6 s vs 2.9 s for the plain
 * join at 10 M rows); this form pays the hash exactly once.
 */
case class BloomProbe(child: Expression, words: Array[Long], m: Long,
    seedA: Array[Long], seedB: Array[Long]) extends UnaryExpression {

  require(words.length.toLong * 64 == m,
    s"word array (${words.length} longs) must cover m=$m bits")
  require(seedA.length == seedB.length && seedA.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe needs a bigint base hash, got $t")
  }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(a: Any): Any =
    BloomProbeImpl.probe(a.asInstanceOf[Long], words, m, seedA, seedB)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val sa = ctx.addReferenceObj("bloomSeedA", seedA, "long[]")
    val sb = ctx.addReferenceObj("bloomSeedB", seedB, "long[]")
    defineCodeGen(ctx, ev, h =>
      s"graft.functions.BloomProbeImpl.probe($h, $w, ${m}L, $sa, $sb)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomProbe = copy(child = newChild)

  override def prettyName: String = "bloom_probe"
}

object BloomProbe {
  def apply(baseHash: Column, words: Array[Long], m: Long,
      seedA: Array[Long], seedB: Array[Long]): Column =
    SqlBridge.column(BloomProbe(SqlBridge.expression(baseHash), words,
      m, seedA, seedB))
}
