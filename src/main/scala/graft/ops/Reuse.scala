package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Materialization strategy for a small-ish shared sub-relation consumed by
 * several downstream joins (a shingle set, a MinHash signature table, an
 * LSH signature table).
 *
 * Why this exists: naively each consumer recomputes the sub-relation
 * (Spark DAGs are trees below exchange-reuse), so a self-join + two size
 * lookups recomputes the scan→explode→hash→distinct chain up to 6×. A
 * plain lazy `persist()` is WORSE here: concurrent broadcast exchanges
 * race to materialize the same cache and serialize on its build lock
 * (observed 5 s → 250 s swings in round 1).
 *
 * Round-2/3 measurements (PerfLab, sf0.1, local[32], steady-state round):
 * `localCheckpoint(eager)` looked fastest in isolation but regressed the
 * full bench ~3× with violent run-to-run variance — checkpoint RDD blocks
 * are NOT freed by `spark.catalog.clearCache()`, so a long session
 * accumulates executor-local blocks until the ContextCleaner happens to
 * run, and later queries pay the memory pressure. The fix is a lifecycle:
 * every materialized frame is registered here and the harness frees it
 * after the query ([[freeAll]]).
 *
 * Strategy is a session conf (`graft.reuse`):
 *  - `checkpoint` (default): `localCheckpoint(eager = true)` — cuts
 *    lineage so consumers plan against a materialized leaf. With the
 *    [[freeAll]] lifecycle this is both the fastest AND stable across
 *    rounds (PerfLab r3: ext02 2.4-2.9 s, ext03 1.5-2.1 s vs recompute's
 *    3.9-4.5/2.5-2.7 s). Storage is executor-local and NOT fault-tolerant
 *    to executor loss (acceptable: cheap to rebuild by re-running the
 *    query); blocks are freed only via [[freeAll]] (clearCache does not
 *    see them).
 *  - `eager_persist`: `persist(MEMORY_AND_DISK)` + a blocking `count()` —
 *    same race-free eager build, keeps lineage (survives executor loss by
 *    recompute), ~20-50% slower because each consumer re-plans the full
 *    subtree below the InMemoryRelation. Freed by [[freeAll]] or
 *    `spark.catalog.clearCache()`.
 *  - `recompute`: build the plan tree as-is. At 100 TB with a shared
 *    input too big to cache, write it to parquet once and re-read instead
 *    (see stream.AggregateStore for the pattern).
 */
object Reuse {
  val ConfKey = "graft.reuse"

  /** Frames materialized by [[shared]]/[[pin]] and not yet freed — per
    * session, held WEAKLY: a caller that never invokes [[freeAll]] (a
    * library user, a test JVM) does not leak — once its query results
    * are unreachable the frames get GC'd and Spark's ContextCleaner
    * reclaims the blocks, exactly as if this registry did not exist.
    * [[freeAll]] only accelerates that for harnesses that know the
    * query is over. */
  private val live =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      java.util.concurrent.ConcurrentLinkedQueue[
        java.lang.ref.WeakReference[DataFrame]]]()

  private def track(df: DataFrame): DataFrame = {
    live.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[
        java.lang.ref.WeakReference[DataFrame]]())
      .add(new java.lang.ref.WeakReference(df))
    df
  }

  /** Track an externally-materialized frame (e.g. a semantically-required
    * localCheckpoint like Packing's frozen partitioning) so [[freeAll]]
    * releases its blocks with everything else. */
  def pin(df: DataFrame): DataFrame = track(df)

  def shared(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "checkpoint") match {
      case "recompute" => df
      case "eager_persist" =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        track(p)
      case _ => track(df.localCheckpoint(true))
    }

  /**
   * Free every materialization [[shared]]/[[pin]] produced on this
   * session since the last call: unpersists cached frames AND removes
   * localCheckpoint RDD blocks (which `spark.catalog.clearCache()` does
   * not touch). Harnesses (Bench/Verify/PerfLab) call this after each
   * query so one query's blocks never degrade the next.
   *
   * CONTRACT: call only BETWEEN queries. Checkpointed frames have no
   * lineage, so results produced since the last freeAll become
   * unrecomputable ("checkpoint block not found") if acted on again
   * after freeing — freeing is for when the query's outputs are done,
   * not a cache hint. Callers that keep results alive should simply not
   * call this; the weak registry then defers to normal GC +
   * ContextCleaner cleanup.
   */
  def freeAll(spark: SparkSession): Unit = {
    val q = live.remove(spark)
    if (q != null) q.forEach { ref =>
      val df = ref.get()
      if (df != null) try {
        df.unpersist(blocking = false)
        org.apache.spark.sql.graftbridge.SqlBridge.freeCheckpoint(df)
      } catch { case _: Throwable => () }
    }
  }
}
