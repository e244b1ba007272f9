package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Serving / read-path queries (SURVEY.md §2.8, OP-36..41) — the Spark
 * equivalent of the reference REPL's 8 commands
 * (TweetGate/Program.Repl.cs:44-107) over RocksDB range scans
 * (TweetGateCore/RocksDBStore.cs:138-264).
 *
 * The stored relation is a windowed-aggregate DataFrame keyed by
 * `window_end` (epoch seconds). In the reference, D19 tick keys make
 * RocksDB iterate exactly [start, end); here the same pruning comes from
 * writing the store partitioned/sorted by window_end (see
 * graft.stream.AggregateStore) so range filters become partition +
 * row-group pruning instead of a full scan.
 *
 * Note on OP-38/39: the reference *documents* entity-restricted scans but
 * its loop never re-checks the entity after the seek
 * (RocksDBStore.cs:241-262), returning every record to `end`. We implement
 * the documented intent — a true entity filter — as a deliberate fix
 * (SURVEY.md §2.8 quirk #1).
 */
object Serve {

  /** OP-36 `getsummary` (RocksDBStore.DbSummary.cs:19-30): fold the counts
    * store. Quirk #2 kept as-specified: `total_tweets` sums *hopping*
    * (overlapping) window counts, exactly like the reference. */
  def summary(counts: DataFrame): DataFrame =
    counts.agg(
      min(col("window_end")).as("min_window_end"),
      max(col("window_end")).as("max_window_end"),
      (max(col("window_end")) - min(col("window_end")))
        .as("duration_seconds"),
      count("*").as("window_count"),
      sum(col("cnt")).as("total_tweets"))

  /** OP-37 `getcounts start end`: [start, end) time-range scan. */
  def rangeScan(store: DataFrame, startEpoch: Long, endEpoch: Long): DataFrame =
    store
      .filter(col("window_end") >= startEpoch && col("window_end") < endEpoch)
      .orderBy(col("window_end"))

  /** OP-38/39 `gettop{mentions,hashtags}string start end [entity]`:
    * range scan with optional entity restriction (the documented-intent
    * semantics). */
  def rangeScanEntity(
      store: DataFrame, startEpoch: Long, endEpoch: Long,
      entity: Option[String]): DataFrame = {
    val ranged = store
      .filter(col("window_end") >= startEpoch && col("window_end") < endEpoch)
    entity.fold(ranged)(e => ranged.filter(col("entity") === e))
      .orderBy(col("window_end"), col("entity"))
  }

  /** Optional entity restriction applied to an already-ranged frame
    * (used by the REPL's partition-pruned read path). */
  def entityFilter(ranged: DataFrame, entity: Option[String]): DataFrame =
    entity.fold(ranged)(e => ranged.filter(col("entity") === e))

  /** OP-41 `getrecent*string N` (RocksDBStore.cs:174-196, SeekToLast+Prev):
    * newest N records. Spark plans this as TakeOrderedAndProject — a
    * per-partition top-N + driver merge, no global sort. The reference's
    * reverse key iteration is total (D19 ticks + entity bytes), so when
    * the store carries an entity column it joins the sort — `limit(n)`
    * over a non-total order would pick arbitrary same-window rows. */
  def recent(store: DataFrame, n: Int): DataFrame = {
    val order =
      if (store.columns.contains("entity"))
        Seq(col("window_end").desc, col("entity").desc)
      else Seq(col("window_end").desc)
    store.orderBy(order: _*).limit(n)
  }
}
