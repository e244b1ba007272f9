package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types._

/**
 * Loud-failure guards for user-supplied columns entering the
 * integer rails — the require/raise_error house discipline
 * ([[Sketches]]' key-type guard, [[Similarity]]'s geometry guards):
 * a fractional score or value silently floored by `cast("long")`
 * changes which rows a selection admits (the order the caller
 * believes in and the one executed diverge), so the cast is refused
 * up front instead of flooring quietly.
 */
object Guards {

  /** Require an integral (byte/short/int/long) column before a
    * `cast("long")` whose result drives a SELECTION (a bisection
    * domain, an admission order, a quantile rank). Fractional,
    * decimal, date/time and string callers quantize explicitly
    * (ppm scaling, `unix_micros`) so the rounding rule is theirs,
    * never an implicit floor. */
  def requireIntegral(df: DataFrame, c: Column, who: String,
      what: String): Unit = {
    val dt = df.select(c).schema.head.dataType
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok, s"$who requires an integral $what (the ppm-" +
      s"quantization house rule: a fractional $what would be " +
      s"silently floored by cast('long'), changing the selection " +
      s"vs the caller's intent); got $dt — quantize explicitly " +
      s"(ppm scaling / unix_micros) and cast before calling")
  }

  /** Null-refusing projection of a selection-domain column: a null
    * id/score would silently leave a bisection domain while still
    * counting in the card's totals — a latent engine/oracle
    * divergence (an ANSI oracle replay can never produce it). The
    * error carries `who`/`what` so the failing seam is named. */
  def notNull(c: Column, who: String, what: String): Column =
    org.apache.spark.sql.functions.when(c.isNull,
      org.apache.spark.sql.functions.raise_error(
        org.apache.spark.sql.functions.lit(
          s"$who: null $what — every row must carry a non-null " +
          s"$what (a null would silently leave the selection " +
          s"domain while still counting in the totals)")))
      .otherwise(c)
}
