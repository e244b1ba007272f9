package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/**
 * Streaming-throughput benchmark: generate a synthetic tweet-line replay
 * of `N` tweets (default 200k), run the full unified live pipeline
 * (parse → project → watermark → 4-family windowed aggregation with
 * per-entity examples → ranked idempotent store writes), and report
 * end-to-end tweets/second.
 *
 * Context (BASELINE.md): the reference publishes no numbers; its input —
 * the Twitter filter stream — delivers on the order of tens of tweets/s,
 * which any result here exceeds by orders of magnitude.
 *
 * Usage: runMain graft.StreamBench [numTweets]
 */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_ROCKSDB=true: keep streaming state off-heap in RocksDB
    // (the cluster-scale default — bounds executor memory; also the
    // reference's own store). Default HDFS-backed in-memory provider
    // otherwise.
    if (sys.env.get("SPARK_GRAFT_ROCKSDB").contains("true"))
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft-sbench").toFile
    val store = Files.createTempDirectory("graft-sbench-store").toString
    val ckpt = Files.createTempDirectory("graft-sbench-ckpt").toString
    val base = 1704067200000L
    // Chunked replay (~100k tweets per file) + maxFilesPerTrigger=1:
    // the backlog streams as BOUNDED micro-batches, the way a production
    // trigger admits it — a single-batch 500k replay with full example
    // payloads is a 69-hour backlog in one batch and OOMs the cache of
    // the batch aggregate (see unifiedSink's persist note).
    // Sharded-ingress mode replays 8 writers: smaller chunks so each
    // micro-batch (8 files) carries one file per shard and the
    // auto-keyed clamp runs 8 parallel state groups — the deployment
    // shape, not 8 shards trickling through one-file batches.
    val adjustMode = sys.env.getOrElse("SPARK_GRAFT_ADJUST", "off")
    val chunk = if (adjustMode == "sharded") n / 16 + 1 else 100000
    var w: java.io.PrintWriter = null
    var i = 0
    while (i < n) {
      if (i % chunk == 0) {
        if (w != null) w.close()
        w = new java.io.PrintWriter(
          new java.io.File(dir, f"replay-${i / chunk}%03d.jsonl"))
      }
      val t = base + (i.toLong * 500) // 2 tweets per second of event time
      val tag = s"tag${i % 1000}"
      val rt =
        if (i % 5 == 0) s"""{"id":${i / 5},"extended_tweet":null}"""
        else "null"
      w.println(
        s"""{"id":${1000000 + i},"text":"tweet $i #$tag","timestamp_ms":"$t","lang":"en","extended_tweet":null,"entities":{"hashtags":[{"text":"$tag"}],"user_mentions":[{"screen_name":"m${i % 500}"}]},"user":{"followers_count":${(i * 37) % 10000},"screen_name":"u${i % 2000}"},"retweeted_status":$rt}""")
      i += 1
    }
    if (w != null) w.close()

    val includeExamples =
      sys.env.getOrElse("SPARK_GRAFT_EXAMPLES", "true").toBoolean
    // SPARK_GRAFT_STREAM_MODE=chained benches the two-stateful
    // FULL-payload emission (topEntitiesPayloadStreamChained) instead of
    // the unified 4-family store pipeline — the other novel stateful
    // shape worth a recorded number.
    val mode = sys.env.getOrElse("SPARK_GRAFT_STREAM_MODE", "unified")
    // SPARK_GRAFT_ADJUST=global|sharded: run ingress under the Trill
    // DisorderPolicy.Adjust clamp (OP-19) before the aggregation —
    // `global` is the reference-faithful ONE-key clamp over the
    // single-stream replay (every micro-batch serializes through one
    // task: the measured ceiling); `sharded` REWRITES the replay as a
    // file-sharded layout (shard=<id>/ partition dirs, 8 shards — the
    // shardSequencerStream deployment shape) and runs the SAME
    // auto-keyed clamp the pipeline applies by default
    // (adjustDisorderStreamAuto): the per-shard key comes from the
    // source layout, not an opt-in knob (r14 verdict item 3).
    val adjust = adjustMode
    val srcDir =
      if (adjust == "sharded") {
        val sharded = Files.createTempDirectory("graft-sbench-sh").toFile
        dir.listFiles().sortBy(_.getName).zipWithIndex.foreach {
          case (f, i) =>
            val d = new java.io.File(sharded, s"shard=${i % 8}")
            d.mkdirs()
            val dst = new java.io.File(d, f.getName)
            Files.move(f.toPath, dst.toPath)
            dst.setLastModified(base + i * 1000L)
        }
        sharded.toString
      } else dir.toString
    val rawSrc = graft.stream.StreamingPipeline.tweetStream(spark,
      srcDir,
      maxFilesPerTrigger = Some(if (adjust == "sharded") 8 else 1))
    val src = adjust match {
      case "global" | "sharded" =>
        graft.stream.StreamingPipeline.adjustDisorderStreamAuto(rawSrc)
      case _ => rawSrc
    }
    val t0 = System.nanoTime()
    val q =
      if (mode == "chained")
        graft.stream.StreamingPipeline
          .topEntitiesPayloadStreamChained(src)
          .writeStream.outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            b.write.mode("overwrite").parquet(s"$store/ranks/batch=$id")
          }
          .option("checkpointLocation", ckpt)
          .start()
      else
        graft.stream.StreamingPipeline.unifiedSink(
            graft.stream.StreamingPipeline.unifiedAggStream(src,
              includeExamples),
            store)
          .option("checkpointLocation", ckpt)
          .start()
    q.processAllAvailable()
    q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val stored =
      if (mode == "chained")
        spark.read.parquet(s"$store/ranks").count()
      else
        graft.stream.AggregateStore.read(spark, s"$store/counts").count()
    println(f"""{"metric":"stream_tweets_per_sec","value":${n / sec}%.0f,"tweets":$n,"seconds":$sec%.1f,"count_windows":$stored,"examples":$includeExamples,"mode":"$mode","adjust":"$adjust"}""")
    spark.stop()
  }
}
