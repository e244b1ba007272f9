package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.unpersistRDD` is `private[spark]`; freeing a
  * localCheckpoint's blocks BY ID (rather than via the RDD object)
  * lets the Reuse registry hold plain ints instead of object
  * references — deterministic freeing with zero GC interaction. Same
  * conventional-shim pattern as `org.apache.spark.sql.graftbridge`. */
object SparkBridge {
  def unpersistRdd(sc: SparkContext, rddId: Int): Unit =
    sc.unpersistRDD(rddId, blocking = false)
}
