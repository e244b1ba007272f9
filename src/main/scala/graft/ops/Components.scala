package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over a near-dup pair graph — the exact
 * counterpart of [[Dedup.keepRepresentatives]]'s single-pass min-id
 * approximation (that pass keeps ≥1 representative per cluster but can
 * keep several when a cluster's pairs don't all touch the minimum).
 * Clustering duplicates exactly — "every doc in a transitive duplicate
 * chain maps to one canonical id" — is the standard last step of a
 * large-scale dedup pipeline.
 *
 * Algorithm: iterative min-label propagation. `label(v)` starts as `v`;
 * each round every vertex takes the min of its own and its neighbors'
 * labels; converged when a round changes nothing. Each round is ONE
 * keyed shuffle (join edges⋈labels + min-aggregate) — no all-pairs
 * anything; rounds needed = cluster diameter, and near-dup clusters are
 * short-diameter by construction (pairs come from shared buckets). At
 * extreme diameters the alternating large-star/small-star scheme
 * (Kiveris et al., "Connected Components in MapReduce and Beyond")
 * drops rounds to ~log n with the same per-round join shape — the
 * upgrade path if a 100 TB corpus ever produces chain-shaped clusters.
 *
 * Spark-specific load-bearing detail: each round's result is
 * `localCheckpoint`ed (and registered for [[Reuse.freeAll]]). Without
 * cutting lineage the plan DOUBLES per round (labels appears twice in
 * the next round's tree) and Catalyst re-optimization goes exponential —
 * the classic iterative-DataFrame trap.
 */
object Components {

  /**
   * Vertex → component label (the min vertex id reachable via `pairs`).
   * `pairs` is an undirected edge list as (id_a, id_b) columns; only
   * vertices appearing in `pairs` are returned (isolated docs are their
   * own singleton cluster by definition — joining them in would just
   * echo the id).
   */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxRounds: Int = 25): DataFrame = {
    // Materialize the pair list ONCE — `pairs` is typically an expensive
    // candidate-generation plan (band explode + self-join) that must not
    // re-execute per round, and checkpointing BEFORE the symmetric union
    // runs that plan exactly once (a union of two selects over the raw
    // plan would execute it twice inside the one checkpoint job). The
    // union itself is a narrow scan of the checkpointed blocks, cheap to
    // recompute per round.
    val p = Reuse.pin(pairs
      .select(col(idA).as("src"), col(idB).as("dst"))
      .localCheckpoint(true))
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
    // Init fused with the first propagation round: label₀(v) =
    // min(v, min neighbor) is one aggregate over the edge list — it
    // replaces the vertex-distinct AND the first join round (LSH pair
    // graphs are near-star-shaped around the min id, so most vertices
    // are already final after this).
    var labels = Reuse.pin(edges
      .groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("label"))
      .localCheckpoint(true))
    // Convergence probe: per-round labels are monotonically
    // non-increasing per vertex (each round takes a min including the
    // old label) over a FIXED vertex set, so the exact label sum
    // strictly decreases iff any label changed. One partial-aggregate
    // scan of the fresh checkpoint per round — no join against the
    // previous round (the former probe was an extra join job per
    // round). DECIMAL(38,0) keeps the sum exact for any int64 ids.
    // sum() over zero rows is SQL-null — an empty pair graph (duplicate-
    // free corpus) must read as checksum 0, not NPE in compareTo.
    def checksum(l: DataFrame): java.math.BigDecimal = {
      val d = l.agg(sum(col("label").cast("decimal(38,0)"))).first()
        .getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    var sumPrev = checksum(labels)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neighborLabels = edges
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .select(col("dst").as("id"), col("label"))
      val next = Reuse.pin(neighborLabels.union(labels)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(true))
      val sumNext = checksum(next)
      converged = sumNext.compareTo(sumPrev) == 0
      sumPrev = sumNext
      // The superseded round's checkpoint blocks are dead the moment the
      // convergence probe has run — free them now rather than letting
      // O(rounds × |V|) blocks pile up inside one query.
      org.apache.spark.sql.graftbridge.SqlBridge.freeCheckpoint(labels)
      labels = next
      round += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxRounds rounds — " +
        "cluster diameter exceeds the bound; raise maxRounds or switch " +
        "to connectedComponentsAlternating")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /**
   * Alternating large-star/small-star connected components (Kiveris et
   * al., "Connected Components in MapReduce and Beyond") — the
   * extreme-diameter path: rounds grow ~logarithmically in component
   * size where min-label propagation needs diameter-many rounds, so a
   * chain-shaped duplicate cluster (pathological but real: pairwise
   * near-dup chains across crawl snapshots) converges in a handful of
   * rounds. Per round: two keyed shuffles (one aggregate + one join per
   * star operation), same as one propagation round.
   *
   * Edges are kept directed high→low (`u > v`); each operation
   * re-points nodes at the minimum of a local neighborhood:
   *  - large-star: every neighbor LARGER than u re-points to
   *    min(N(u) ∪ u);
   *  - small-star: every neighbor of u (all smaller, plus u itself)
   *    re-points to min(N(u)).
   * Fixpoint = every component is a star centered at its min id.
   * Output contract matches [[connectedComponents]]: (id, cluster_id),
   * vertices appearing in `pairs` only.
   */
  def connectedComponentsAlternating(pairs: DataFrame,
      idA: String = "id_a", idB: String = "id_b",
      maxRounds: Int = 50): DataFrame = {
    def ckpt(df: DataFrame): DataFrame =
      Reuse.pin(df.localCheckpoint(true))
    def free(df: DataFrame): Unit =
      org.apache.spark.sql.graftbridge.SqlBridge.freeCheckpoint(df)
    // Checkpoint BEFORE dropping self-pairs: a vertex appearing only as
    // (x, x) must still come out labeled (x → x), matching
    // connectedComponents, so the self-loop vertices are retained for
    // the final union below.
    val p = ckpt(pairs
      .select(greatest(col(idA), col(idB)).as("u"),
        least(col(idA), col(idB)).as("v"))
      .distinct())
    var edges = ckpt(p.filter(col("u") =!= col("v")))
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v"), col("u")).toDF("u", "v"))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min("v").as("m"))
      e.join(mins, "u").select(col("v").as("x"), col("m"))
        .union(mins.select(col("u").as("x"), col("m")))
        .filter(col("x") =!= col("m"))
        .select(col("x").as("u"), col("m").as("v")).distinct()
    }
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val ls = ckpt(largeStar(edges))
      val ss = ckpt(smallStar(ls))
      // Set equality of two distinct relations: same size + no novel row.
      converged = ss.count() == edges.count() &&
        ss.except(edges).limit(1).count() == 0
      free(ls)
      free(edges)
      edges = ss
      round += 1
    }
    require(converged,
      s"alternating components did not converge in $maxRounds rounds")
    // Star members + star centers + self-loop-only vertices; a vertex
    // can appear in several of the three (e.g. a self-loop on a chain
    // member), so take the min label — the star label is always ≤ the
    // self label, matching connectedComponents exactly.
    edges.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(edges.select(col("v"), col("v")).toDF("id", "cluster_id"))
      .union(p.filter(col("u") === col("v"))
        .select(col("u").as("id"), col("u").as("cluster_id")))
      .groupBy("id").agg(min("cluster_id").as("cluster_id"))
  }
}
