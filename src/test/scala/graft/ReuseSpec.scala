package graft

import org.apache.spark.sql.functions._

import graft.ops.Reuse

/** Lifecycle guards for the shared-relation registry (Reuse). */
class ReuseSpec extends TestBase {

  test("checkpointRddId resolves for a localCheckpoint'ed frame " +
      "(freeAll depends on it — silent None re-opens the r2 block leak)") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("v").localCheckpoint(true)
    val id = org.apache.spark.sql.graftbridge.SqlBridge.checkpointRddId(df)
    assert(id.nonEmpty,
      "localCheckpoint plan no longer resolves to a LogicalRDD id — " +
        "Spark plan shape changed; fix SqlBridge.checkpointRddId")
    assert(id.get >= 0)
  }

  test("freeAll releases the blocks of a shared() checkpoint") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val shared = Reuse.shared(Seq(1L, 2L).toDF("v"))
    assert(shared.count() == 2)
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "shared() did not materialize a tracked RDD")
    Reuse.freeAll(spark)
    val after = sc.getPersistentRDDs.keySet
    assert(added.forall(!after.contains(_)),
      s"freeAll left checkpoint RDDs ${added.filter(after.contains)} alive")
  }

  test("index() artifacts SURVIVE freeAll and stay readable — the " +
      "build-once lifecycle the IVF/audit/cluster consumers rely on") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; Seq(1L, 2L, 3L).toDF("v") }
    val idx = Reuse.index(spark, "reusespec-artifact")(build())
    assert(idx.count() == 3 && builds == 1)
    // the between-queries block free must NOT touch the index; a freed
    // checkpoint would throw "checkpoint block not found" on re-read
    Reuse.freeAll(spark)
    assert(idx.count() == 3, "freeAll dropped an index artifact's blocks")
    // later requests get the SAME materialized frame, no rebuild
    val again = Reuse.index(spark, "reusespec-artifact") {
      fail("index() rebuilt an existing artifact"); build()
    }
    assert((again eq idx) && builds == 1)
    assert(again.count() == 3)
  }

  test("index() footprint is measured and dropIndexes releases the " +
      "blocks — accumulation is observable and bounded, not forever") {
    import spark.implicits._
    val sc = spark.sparkContext
    var builds = 0
    val idx = Reuse.index(spark, "reusespec-evict") {
      builds += 1
      (1L to 1000L).toDF("v")
    }
    assert(idx.count() == 1000 && builds == 1)
    val fp = Reuse.indexFootprint(spark)
      .filter(_._1 == "reusespec-evict")
    assert(fp.size == 1, s"footprint missing the built index: $fp")
    val (_, parts, mem, disk) = fp.head
    assert(parts > 0 && mem + disk > 0,
      s"block manager reports no storage for a built index: $fp")
    val rddId = org.apache.spark.sql.graftbridge.SqlBridge
      .checkpointRddId(idx).get
    assert(sc.getPersistentRDDs.contains(rddId))
    Reuse.dropIndexes(spark)
    assert(Reuse.indexFootprint(spark).forall(_._1 != "reusespec-evict"))
    assert(!sc.getPersistentRDDs.contains(rddId),
      "dropIndexes left the checkpoint RDD's blocks registered")
    // a dropped key REBUILDS on the next request (fresh artifact, not a
    // dangling reference to freed blocks)
    val idx2 = Reuse.index(spark, "reusespec-evict") {
      builds += 1
      (1L to 5L).toDF("v")
    }
    assert(builds == 2 && idx2.count() == 5)
    Reuse.dropIndexes(spark)
  }

  test("checkpoint stats are clamped: deep iterative checkpoint chains " +
      "keep bounded sizeInBytes instead of a power-tower BigInt (the " +
      "r9 bpe_merges_32 hang)") {
    import spark.implicits._
    // Each round joins the previous round's checkpoint with itself, so
    // the INHERITED size estimate squares per round. Pre-clamp, 24
    // rounds meant a ~2^24-digit BigInt — the driver hung for minutes
    // inside BigInteger.multiply while CHECKPOINTING round ~20+. With
    // the clamp this chain is instant and the leaf's stats stay at the
    // cap. (The data itself stays 3 rows throughout — only the
    // estimate explodes.)
    var state = Reuse.shared((1L to 3L).toDF("id"))
    (1 to 24).foreach { _ =>
      val nxt = state.toDF("id")
        .join(state.toDF("id2"), col("id") === col("id2"))
        .select(col("id"))
      state = Reuse.shared(nxt)
    }
    assert(state.count() == 3L)
    val stats = state.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes <=
      org.apache.spark.sql.graftbridge.SqlBridge.StatsCapBytes,
      s"leaf stats not clamped: ${stats.sizeInBytes}")
    // and a small frame keeps its REAL (unclamped) size estimate, so
    // broadcast decisions are untouched
    val small = Reuse.shared((1L to 10L).toDF("v"))
    assert(small.queryExecution.optimizedPlan.stats.sizeInBytes <
      1000000L)
    Reuse.freeAll(spark)
  }
}
