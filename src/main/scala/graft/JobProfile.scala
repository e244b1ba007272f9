package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Dev harness (not part of the graded surface): per-query job/stage/
 * task accounting for the optimization round. For each selected query
 * it runs one untimed warm pass, then a measured pass under a
 * SparkListener, and reports wall seconds, job count, stage count,
 * task count and summed executor task time — the split that says
 * whether a query is driver-round-bound (many tiny sequential jobs)
 * or genuinely compute/shuffle-bound.
 *
 *   SPARK_GRAFT_ONLY=ext169,ext177 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *     sbt "runMain graft.JobProfile"
 */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
    // A/B knobs: SPARK_GRAFT_SYSPROPS="graft.bisect.fanout=64;k=v"
    sys.env.getOrElse("SPARK_GRAFT_SYSPROPS", "").split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); sys.props(k) = v
      }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized { stages += 1 }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        synchronized {
          tasks += 1
          val m = t.taskMetrics
          if (m != null) {
            taskMs += m.executorRunTime
            shuffleRead += m.shuffleReadMetrics.totalBytesRead
            shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // Match Bench's warmup so measurements are steady-state.
    try {
      graft.ingest.Tables.events(spark, sfDir)
        .groupBy("event_type").count().count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").count()
      ExtEntry.ensureBucketed(spark, sfDir)
      spark.catalog.clearCache()
    } catch { case _: Throwable => () }
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    println(f"${"query"}%-32s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"taskCpu_s"}%9s ${"shufMB"}%7s")
    sel.foreach { case (name, fn) =>
      // warm pass
      try { fn(spark, sfDir).count() } catch { case t: Throwable =>
        println(s"$name WARM-FAILED: $t") }
      spark.catalog.clearCache()
      graft.ops.Reuse.freeAll(spark)
      // measured pass (brief sleep lets the async listener bus drain)
      Thread.sleep(300)
      synchronized { jobs = 0; stages = 0; tasks = 0; taskMs = 0L
        shuffleRead = 0L; shuffleWrite = 0L }
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case t: Throwable =>
        println(s"$name FAILED: $t") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"$name%-32s $wall%7.2f $jobs%5d $stages%7d $tasks%6d ${taskMs / 1e3}%9.2f ${(shuffleRead + shuffleWrite) / 1e6}%7.1f")
      spark.catalog.clearCache()
      graft.ops.Reuse.freeAll(spark)
    }
    spark.stop()
  }
}
