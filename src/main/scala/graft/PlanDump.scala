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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PLANDUMP_WARM=1 reproduces Bench's exact pre-
    // fingerprint state (the sf0.001 warmup pass + bucketed-layout
    // seeding) so a two-JVM diff sees the same plans the changed-mode
    // fingerprints hash.
    if (sys.env.get("SPARK_GRAFT_PLANDUMP_WARM").contains("1")) {
      try {
        val warmDir = {
          val w = sfDir.replaceAll("sf[0-9.]+/*$", "sf0.001")
          if (new java.io.File(w).isDirectory) w else sfDir
        }
        if (warmDir != sfDir)
          SparkEntry.queries.values.foreach { fn =>
            try { fn(spark, warmDir).count() }
            catch { case _: Throwable => () }
            graft.ops.Reuse.freeAll(spark)
          }
        graft.ingest.Tables.events(spark, sfDir)
          .groupBy("event_type").count().count()
        spark.read.parquet(s"$sfDir/documents.parquet").count()
        spark.read.parquet(s"$sfDir/embeddings.parquet").count()
        ExtEntry.ensureBucketed(spark, sfDir)
        spark.catalog.clearCache()
      } catch { case _: Throwable => () }
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    // Mirror Bench's fingerprint pass exactly: pre-checkpoint
    // Reuse lineage is part of the fingerprint text (r18 — see
    // Bench's changed-mode comment), so the dump carries the same
    // composite main-plan + sub-plan text the bench hashes.
    spark.conf.set("graft.reuse.planlog", "1")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        val s =
          try {
            graft.ops.Reuse.drainPlans(spark)
            val main =
              fn(spark, sfDir).queryExecution.executedPlan.toString
            val subs = graft.ops.Reuse.drainPlans(spark)
            (main +: subs).mkString("\n=== reuse ===\n")
          }
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
