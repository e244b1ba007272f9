package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-level reporting aggregates (dedup impact report ext64, data
 * card ext66), factored so the batch queries and their streaming twins
 * share one derivation.
 *
 * The split mirrors production's artifact boundary:
 *  - [[cardPartials]] is the ALGEBRAIC per-(lang, source) partial —
 *    commutative and associative, so any partitioning of the corpus
 *    into micro-batches sums back to the corpus-wide card. The
 *    streaming twin writes one partial per micro-batch and never
 *    re-reads corpus text.
 *  - [[clusterStats]] reads the build-once near-dup cluster map (a
 *    corpus-SNAPSHOT artifact, like ext69's shingle-df table): the
 *    redundancy term of a card is a property of a corpus generation,
 *    computed offline, not drifted incrementally.
 */
object Reporting {

  /**
   * The one corpus scan behind the data card: per-(lang, source) doc
   * and token counts. Every card field is a duplicate-key-insensitive
   * aggregate over these rows (sum / countDistinct / grouped sum), so
   * callers may pass partials that repeat a (lang, source) key — e.g.
   * the union of per-micro-batch partials — without merging first.
   */
  def cardPartials(doc: DataFrame): DataFrame =
    doc.groupBy("lang", "source")
      .agg(count(lit(1)).as("c"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("t"))

  /**
   * Cluster-map summary feeding both reports: family count, docs in
   * families, and the largest family, off the stored `(doc_id,
   * cluster_id)` map. One keyed count + a 1-row rollup.
   */
  def clusterStats(clusterMap: DataFrame): DataFrame =
    clusterMap.groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_clusters"),
        coalesce(sum(col("n")), lit(0L)).as("n_clustered_docs"),
        coalesce(max(col("n")), lit(0L)).as("max_cluster"))

  /**
   * ext64's dedup impact report from its two artifacts: the cluster
   * summary ([[clusterStats]]) and a 1-row `n_total` doc count.
   * `dup_mass_q` is the corpus ppm a min-per-cluster keeper removes.
   */
  def dupStats(cluster: DataFrame, total: DataFrame): DataFrame =
    cluster.crossJoin(broadcast(total))
      .select(col("n_clusters"), col("n_clustered_docs"),
        col("max_cluster"),
        expr("((n_clustered_docs - n_clusters) * 1000000) DIV n_total")
          .as("dup_mass_q"))

  /**
   * ext66's one-row data card from [[cardPartials]] rows (merged or
   * per-batch) and the [[clusterStats]] summary. Both extra terms ride
   * broadcast 1-row relations; the partials are scanned twice (base
   * rollup + top-source), which is why the batch query wraps them in
   * `Reuse.shared` — partials are |langs × sources| rows, so the
   * streaming derivation reads its tiny state table twice instead.
   */
  def dataCard(partials: DataFrame, cluster: DataFrame): DataFrame = {
    val base = partials.agg(sum(col("c")).as("n_docs"),
      sum(col("t")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    val topSrc = partials.groupBy("source").agg(sum(col("c")).as("sc"))
      .agg(max(col("sc")).as("max_src"))
    val cl = cluster.select(col("n_clusters"),
      col("n_clustered_docs").as("n_clustered"))
    base.crossJoin(broadcast(topSrc)).crossJoin(broadcast(cl))
      .select(col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_sources"),
        expr("(max_src * 1000000) DIV n_docs").as("top_source_share_q"),
        expr("((n_clustered - n_clusters) * 1000000) DIV n_docs")
          .as("dup_mass_q"))
  }
}
