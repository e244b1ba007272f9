package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev harness: times a subset of SparkEntry.queries under a chosen
 * [[graft.ops.Reuse]] strategy. Not part of the graded surface.
 *
 *   SPARK_GRAFT_REUSE=eager_persist|checkpoint|recompute \
 *   SPARK_GRAFT_ONLY=ext02,ext03 sbt "runMain graft.PerfLab"
 */
object PerfLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val strategy = sys.env.getOrElse("SPARK_GRAFT_REUSE", "eager_persist")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      "ext02,ext03,ext04,ext14,ext15,ext16").split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.ops.Reuse.ConfKey, strategy)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.exists(n.startsWith) }
    // Two timed rounds: round 0 pays codegen, round 1 is the steady state.
    (0 to 1).foreach { round =>
      val times = picked.map { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        f"$name%s=$dt%.2f"
      }
      println(s"PERFLAB strategy=$strategy round=$round " + times.mkString(" ") )
    }
    spark.stop()
  }
}
