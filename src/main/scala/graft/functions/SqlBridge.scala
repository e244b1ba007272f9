package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column ↔ Expression bridge (`ExpressionUtils`)
  * `private[sql]`; libraries adding native expressions reach it from a
  * subpackage of `org.apache.spark.sql` — the conventional shim, no
  * internals copied. */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unpersist the RDD behind a `localCheckpoint`ed DataFrame. The
    * checkpoint blocks live on the `LogicalRDD`'s RDD, which neither
    * `Dataset.unpersist` nor `catalog.clearCache` reaches — without this a
    * long-lived session leaks executor-local blocks per checkpoint. */
  def freeCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Stable per-session identity for lifecycle registries: keying by
    * UUID (not the session object) keeps registry KEYS from pinning a
    * session — values must be dropped explicitly either way, see
    * graft.ops.Reuse.dropIndexes. */
  def sessionUUID(spark: org.apache.spark.sql.SparkSession): String =
    // public on the classic concrete class only (the api-level
    // SparkSession does not expose it); every local/cluster session is
    // a classic one.
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionUUID

  /** The id of the checkpointed RDD under a `localCheckpoint`ed
    * DataFrame — extracted EAGERLY so lifecycle registries can hold the
    * plain int (freeing by id survives the wrapper Dataset being GC'd;
    * a WeakReference would not). */
  def checkpointRddId(df: org.apache.spark.sql.DataFrame): Option[Int] =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd.id)
      case _ => None
    }
}
