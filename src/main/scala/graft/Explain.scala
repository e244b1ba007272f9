package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev harness (not graded): print the executed physical plan of named
 * registry queries — the feedback loop behind EXPLAINS.md's plan audits.
 *
 *   sbt "runMain graft.Explain ext51_leakage_safe_split ext52_shard_assign"
 *
 * SPARK_GRAFT_SF_DIR picks the scale factor (default sf0.01 — big enough
 * that AQE's join decisions match what the bench sees, small enough to
 * plan instantly).
 */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"==== $name ====")
          val df = fn(spark, sfDir)
          // Materialize THIS Dataset (count() would plan a separate agg
          // query) so AQE finalizes and the print shows isFinalPlan=true
          // with the runtime join selections.
          df.collect()
          println(df.queryExecution.executedPlan.toString)
        case None => System.err.println(s"[explain] unknown query: $name")
      }
      spark.catalog.clearCache()
      graft.ops.Reuse.freeAll(spark)
    }
    spark.stop()
  }
}
