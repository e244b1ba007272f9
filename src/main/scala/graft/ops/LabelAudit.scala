package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{qdot, qnorm2, quantize}

/**
 * Label-quality auditing over the embedding table — the two standard
 * training-data curation passes that exploit a label column:
 *
 *  - [[knnLabelAudit]]: confident-learning-style kNN label-noise
 *    detection (Northcutt et al., "Confident Learning", JAIR 2021 —
 *    the k-nearest-neighbor agreement variant): a vector whose
 *    neighborhood votes for a different label is a candidate mislabel.
 *  - [[labelCentroidOutliers]]: per-label centroid distance ranking
 *    (SemDeDup / SSL-prototype-style pruning): the vectors farthest
 *    from their own class centroid are the noisiest examples of the
 *    class — the ones a curation pass drops or re-routes for review.
 *
 * Determinism follows the [[Similarity]] contract: embeddings are
 * floor-quantized to int64, every distance/dot is an exact integer
 * sum, votes tie-break by (votes DESC, label ASC) and ranks by
 * (dist DESC, vec_id ASC) — so both operators are DuckDB-oracle
 * checkable bit for bit.
 */
object LabelAudit {

  /**
   * kNN label-noise audit over an audited query subset: for each
   * audited vector, the majority label among its k nearest cosine
   * neighbors (neighbors drawn from the FULL corpus, all labels —
   * restricting candidates by label would hide exactly the
   * disagreements the audit exists to find). Output one row per
   * audited vector: its own label, the neighborhood's majority label,
   * the vote count, and flagged=1 where they differ.
   *
   * Scale shape: the audited set is broadcast ([[Similarity.bruteTopK]]
   * — one corpus scan, WindowGroupLimit bounds the rank shuffle at k
   * rows per query per map task); the vote is a |audited × labels|-row
   * hash aggregate. Like the ext54/57 audits this is a sampled pricing
   * run — at 100 TB audit a sampled query set against the probe-index
   * candidates ([[Similarity.kmeansProbeIndex]] + the [[votesFor]]
   * tail, which accepts any (q_id, t_id) neighbor relation) instead of
   * the exact scan (ext89 prices that path: flag recall 93.75% at
   * sf0.01).
   *
   * `metric` picks the neighborhood geometry (cosine | dot | l2 —
   * [[Similarity.bruteTopKMetric]]): cosine for direction-normalized
   * embeddings, dot where norms carry signal, l2 for clustering-style
   * distance. The vote/flag tail is metric-blind.
   */
  def knnLabelAudit(emb: DataFrame, queries: DataFrame, k: Int = 5,
      id: String = "vec_id", vec: String = "embedding",
      label: String = "label", metric: String = "cosine"): DataFrame =
    votesFor(Similarity.bruteTopKMetric(emb, queries, k, metric, id, vec),
      emb.select(col(id), col(label)), id, label)

  /** The vote/flag tail: majority neighbor label per audited vector
    * from ANY (q_id, t_id) neighbor relation — brute at audit scale,
    * probe-index candidates at 100 TB. */
  def votesFor(neighbors: DataFrame, labels: DataFrame,
      id: String = "vec_id", label: String = "label"): DataFrame = {
    val lab = labels.select(col(id).cast("long").as("lid"),
      col(label).cast("long").as("l"))
    val votes = neighbors
      .join(broadcast(lab.toDF("lid", "nl")),
        col("t_id") === col("lid"), "inner")
      .groupBy(col("q_id"), col("nl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("nl").asc)
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(lab), col("q_id") === col("lid"), "inner")
      .select(col("q_id").as(id), col("l").as(label),
        col("nl").as("knn_label"), col("votes"),
        when(col("nl") =!= col("l"), 1L).otherwise(0L).as("flagged"))
  }

  /**
   * Per-label centroid outliers: floor-quantized per-dimension mean of
   * each label's quantized vectors (the [[Similarity.kmeansBuckets]]
   * centroid-update rule, so the centroid is integer-exact and
   * engine-portable), then exact integer distance
   * |v−c|² = n2(v) + n2(c) − 2·qdot(v,c) of every vector to its OWN
   * label's centroid, ranked (dist DESC, vec_id ASC) within the label;
   * the top `topN` per label are the outliers.
   *
   * Scale shape: the centroid build is one keyed shuffle
   * (posexplode → per-(label, dim) sum, map-side combined); the
   * centroid relation is |labels| rows and broadcasts; the rank's
   * window shuffle is bounded by WindowGroupLimit at topN rows per
   * label per map task. Per-dimension sums stay under 2^53 at any
   * per-label count below ~9e9 (quantized |v| ≤ ~1e6); beyond that
   * aggregate as DECIMAL before the division.
   */
  def labelCentroidOutliers(emb: DataFrame, topN: Int = 3,
      id: String = "vec_id", vec: String = "embedding",
      label: String = "label"): DataFrame = {
    val w = Window.partitionBy(col(label))
      .orderBy(col("dist").desc, col(id).asc)
    centroidDistances(emb, labelCentroids(emb, vec, label), id, vec, label)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col(label), col(id), col("dist"),
        col("rank").cast("long").as("rank"))
  }

  /** The per-label centroid ARTIFACT (l, cq, cn2) — |labels| rows of
    * floor-quantized per-dimension means; in production stored once per
    * corpus snapshot and read by scoring passes (the streaming twin
    * broadcasts it against arriving vectors). One keyed shuffle
    * (posexplode → per-(label, dim) sum, map-side combined); the
    * |labels|-row reassembly HOF never touches a scan. */
  def labelCentroids(emb: DataFrame, vec: String = "embedding",
      label: String = "label"): DataFrame =
    emb.select(col(label).cast("long").as("l"),
      posexplode(quantize(col(vec))).as(Seq("pos", "v")))
      .groupBy("l", "pos")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .withColumn("cv", floor(col("s").cast("double") / col("n")).cast("long"))
      .groupBy("l")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("cq"))
      .withColumn("cn2", qnorm2(col("cq")))

  /** Exact integer distance of every vector to its OWN label's centroid
    * from a prebuilt [[labelCentroids]] artifact — a stateless
    * broadcast-join projection (the streaming twin applies it unchanged
    * to arriving micro-batches). */
  def centroidDistances(emb: DataFrame, cents: DataFrame,
      id: String = "vec_id", vec: String = "embedding",
      label: String = "label"): DataFrame =
    emb.select(col(id).cast("long").as("vid"),
      col(label).cast("long").as("l"), quantize(col(vec)).as("q"))
      .withColumn("n2", qnorm2(col("q")))
      .join(broadcast(cents), "l")
      .withColumn("dist",
        col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .select(col("l").as(label), col("vid").as(id), col("dist"))

  /**
   * Per-label dispersion card — the embedding-space health summary a
   * labeled dataset ships with: per label, the member count, the
   * floor-quantized mean and the max of the exact |v−c|² distance to
   * the label's own centroid, and the centroid's norm². A collapsed
   * label (near-zero dispersion) marks redundant/templated members;
   * a label whose dispersion rivals its centroid norm is incoherent —
   * the two failure modes a class-balance count can't see. The
   * [[labelCentroidOutliers]] rank answers "which vectors"; this card
   * answers "which labels", off the same stored centroid artifact.
   *
   * Scale shape: one corpus scan (the [[centroidDistances]] broadcast
   * projection) into a |labels|-row aggregate, map-side combined; the
   * mean is integer `DIV` (exact on any engine). Σdist per label stays
   * under 2^63 below ~1e6 members per label at 16 dims (dist ≤
   * ~4·dim·1e12) — past that, aggregate as DECIMAL like the ext77
   * centroid sums.
   */
  def labelDispersion(emb: DataFrame, id: String = "vec_id",
      vec: String = "embedding", label: String = "label"): DataFrame = {
    val cents = Reuse.shared(labelCentroids(emb, vec, label))
    dispersionFromCounts(dispersionPartials(emb, cents, id, vec, label),
      cents, label)
  }

  /** Per-batch ALGEBRAIC partial of the [[labelDispersion]] card
    * against a prebuilt [[labelCentroids]] artifact: per label
    * (n, Σdist, max dist) — commutative and associative, so the
    * streaming fold ([[dispersionFromCounts]], via
    * `StreamingPipeline.dispersionPartialsSink`) reproduces the batch
    * card at ANY batching; every derived column (the integer-DIV mean)
    * is computed after duplicate label keys are summed. */
  def dispersionPartials(emb: DataFrame, cents: DataFrame,
      id: String = "vec_id", vec: String = "embedding",
      label: String = "label"): DataFrame =
    centroidDistances(emb, cents, id, vec, label)
      .groupBy(col(label))
      .agg(count(lit(1)).as("n"),
        sum(col("dist")).as("sd"),
        max(col("dist")).as("dm"))

  /** Fold of accumulated [[dispersionPartials]] relations into the
    * ext83 card — the batch [[labelDispersion]] routes through this
    * same tail (one-partial case), so batch and stream agree by
    * construction. */
  def dispersionFromCounts(partials: DataFrame, cents: DataFrame,
      label: String = "label"): DataFrame =
    partials.groupBy(col(label))
      .agg(sum(col("n")).as("n_vecs"),
        sum(col("sd")).as("_sd"),
        max(col("dm")).as("dist_max"))
      .withColumn("dist_mean_q", expr("_sd DIV n_vecs"))
      .join(broadcast(cents.select(col("l").as(label), col("cn2"))),
        Seq(label))
      .select(col(label), col("n_vecs"), col("dist_mean_q"),
        col("dist_max"), col("cn2"))
}
