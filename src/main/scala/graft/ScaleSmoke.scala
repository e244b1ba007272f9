package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dev harness (like [[PerfLab]], not graded): scale-smoke the dedup
 * family at Nx the sf0.1 corpus by unioning id-shifted copies —
 * checks that candidate volumes and wall-clock grow roughly linearly
 * (bucketed candidate generation), not quadratically, as the 100 TB
 * design claims. Shifted copies are exact near-dup families by
 * construction, so this also stresses the mass-duplicate path.
 *
 *   SPARK_GRAFT_SCALE=10 sbt "runMain graft.ScaleSmoke"
 */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.ingest.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source")
    val big = (0 until mult).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
    }.reduce(_ union _)
    val n = big.count()
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = df.count()
      println(f"[scale-smoke] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s  $rows%10d rows  ($n docs)")
      graft.ops.Reuse.freeAll(spark)
    }
    time("ngram_jaccard_pairs") { graft.ops.Dedup.ngramJaccard(big) }
    time("minhash_lsh_pairs") { graft.ops.Dedup.minhashLsh(big) }
    time("simhash_pairs") { graft.ops.Dedup.simhashPairs(big) }
    time("simhash_pairs_wide") { graft.ops.Dedup.simhashPairsWide(big) }
    time("dedup_clusters") {
      graft.ops.Components.connectedComponents(
        graft.ops.Dedup.minhashLsh(big).select("id_a", "id_b"))
    }
    spark.stop()
  }
}
