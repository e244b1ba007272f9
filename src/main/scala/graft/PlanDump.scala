package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (not part of the library surface): dump the
  * raw executedPlan strings of named registry queries so two JVM
  * sessions can be diffed to find session-varying plan tokens. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/tmp/plandump")
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        val s =
          try fn(spark, sfDir).queryExecution.executedPlan.toString
          catch { case t: Throwable => s"ERR: $t" }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, s"$name.txt"),
          s.getBytes("UTF-8"))
        spark.catalog.clearCache()
        graft.ops.Reuse.freeAll(spark)
      }
    spark.stop()
  }
}
