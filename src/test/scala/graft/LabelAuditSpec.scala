package graft

import org.apache.spark.sql.functions._

import graft.ingest.Tables
import graft.ops.{LabelAudit, Similarity}

/** Label-quality audits vs independent driver-side recomputation, plus
  * the vote tie-break law on a hand-built neighbor relation. */
class LabelAuditSpec extends TestBase {

  private lazy val emb = Tables.embeddings(spark, sf("sf0.001"))
  private lazy val queries = emb.filter(col("vec_id") < 10)

  test("knn label audit = majority vote over brute top-k (ext76)") {
    import spark.implicits._
    val got = LabelAudit.knnLabelAudit(emb, queries, 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val labels = emb.select("vec_id", "label").as[(Long, Int)]
      .collect().toMap
    val expected = Similarity.bruteTopK(emb, queries, 5)
      .select("q_id", "t_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (qid, nbrs) =>
        val votes = nbrs.map(n => labels(n._2).toLong)
          .groupBy(identity).map { case (l, g) => (l, g.size.toLong) }
        val (nl, v) = votes.toSeq.minBy { case (l, n) => (-n, l) }
        val own = labels(qid).toLong
        (qid, own, nl, v, if (nl != own) 1L else 0L)
      }.toSet
    assert(got == expected)
    // one row per audited vector; flagged is the disagreement bit
    assert(got.size == queries.count())
    assert(got.forall { case (_, l, nl, _, f) => (f == 1L) == (l != nl) })
  }

  test("vote tie-break: lower label wins at equal votes") {
    import spark.implicits._
    // q 1 sees neighbors with labels {7, 7, 3, 3} — tie at 2 votes each.
    val neighbors = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L))
      .toDF("q_id", "t_id")
    val labels = Seq((1L, 9L), (10L, 7L), (11L, 7L), (12L, 3L), (13L, 3L))
      .toDF("vec_id", "label")
    val r = LabelAudit.votesFor(neighbors, labels)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 9L, 3L, 2L, 1L)))
  }

  test("label centroid outliers = exact integer recompute (ext77)") {
    import spark.implicits._
    val got = LabelAudit.labelCentroidOutliers(emb, 3)
      .as[(Long, Long, Long, Long)].collect().toSeq

    val rows = emb.select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect()
      .map { case (id, l, e) =>
        (id, l.toLong,
          e.map(v => math.floor(v.toDouble * Similarity.QuantScale).toLong))
      }
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (l, g) =>
      val dims = g.head._3.length
      val cent = (0 until dims).map { i =>
        math.floor(g.map(_._3(i)).sum.toDouble / g.size).toLong
      }.toArray
      val cn2 = cent.map(c => c * c).sum
      g.map { case (id, _, q) =>
        val n2 = q.map(v => v * v).sum
        val dot = q.zip(cent).map { case (a, b) => a * b }.sum
        (l, id, n2 + cn2 - 2 * dot)
      }.sortBy { case (_, id, d) => (-d, id) }.take(3).zipWithIndex
        .map { case ((lab, id, d), i) => (lab, id, d, i + 1L) }
    }.sortBy(r => (r._1, r._4))
    assert(got == expected)
    // every label contributes exactly topN ranked outliers
    assert(got.map(_._1).distinct.size == 10 && got.size == 30)
  }

  test("label dispersion = per-label fold of the exact distances " +
      "(ext83)") {
    import spark.implicits._
    val got = LabelAudit.labelDispersion(emb)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    val dists = LabelAudit.centroidDistances(emb,
      LabelAudit.labelCentroids(emb))
      .as[(Long, Long, Long)].collect().toSeq
    val cn2s = LabelAudit.labelCentroids(emb)
      .select($"l", $"cn2").as[(Long, Long)].collect().toMap
    val expected = dists.groupBy(_._1).toSeq.map { case (l, g) =>
      val ds = g.map(_._3)
      (l, g.size.toLong, ds.sum / ds.size, ds.max, cn2s(l))
    }.sortBy(_._1)
    assert(got == expected && got.size == 10)
    // a single-member label disperses to exactly 0
    val solo = Seq((1L, Array(1.0f, 2.0f), 7)).toDF(
      "vec_id", "embedding", "label")
    val soloGot = LabelAudit.labelDispersion(solo)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(soloGot == Seq((7L, 1L, 0L, 0L,
      1000000L * 1000000L + 2000000L * 2000000L)))
    graft.ops.Reuse.freeAll(spark)
  }

  test("metric param changes the neighborhood: cosine follows direction, " +
      "l2 follows distance, dot follows norm (ext90)") {
    import spark.implicits._
    // Query (1,0). Corpus: a LONG same-direction vector labeled 1 (cos
    // 1.0 but l2-far, dot-huge), and a NEARBY off-direction vector
    // labeled 2 (l2-close, cos lower, dot small). k=1: the three
    // metrics pick three defensible — and here distinct — majorities.
    val emb = Seq(
      (1L, Array(1f, 0f), 9L),      // the audited vector, own label 9
      (2L, Array(10f, 0f), 1L),     // same direction, far away
      (3L, Array(0.8f, 0.3f), 2L))  // close by, off direction
      .toDF("vec_id", "embedding", "label")
    val q = emb.filter($"vec_id" === 1)
    def verdict(metric: String): Long =
      LabelAudit.knnLabelAudit(emb, q, 1, metric = metric)
        .select("knn_label").as[Long].head()
    assert(verdict("cosine") == 1L) // (10,0) has cos exactly 1
    assert(verdict("l2") == 2L)     // |q-(0.8,0.3)|² < |q-(10,0)|²
    assert(verdict("dot") == 1L)    // 10·1 beats 0.8
    // all three flag: own label 9 matches no neighborhood
    assert(LabelAudit.knnLabelAudit(emb, q, 1, metric = "l2")
      .select("flagged").as[Long].head() == 1L)
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.bruteTopKMetric(emb, q, 1, "manhattan")
    }
  }
}
