package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check: distributed min-label propagation agrees with a
  * driver-side union-find on random pair graphs. Few iterations (each
  * case runs Spark jobs), diverse shapes (chains, merges, self-dense). */
class ComponentsSpec extends TestBase {

  /** Plain union-find (min root wins) as the executable specification. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toList.map(v => v -> find(v)).toMap
  }

  // Self-pairs (a, a) included deliberately: a vertex appearing only in
  // a self-pair must still come out labeled with itself (both
  // implementations guarantee it; the alternating form needs a
  // dedicated carry-through for them).
  private val pairGen = Gen.nonEmptyListOf(
    for {
      a <- Gen.choose(0L, 19L)
      b <- Gen.choose(0L, 19L)
    } yield (math.min(a, b), math.max(a, b)))

  test("connectedComponents == union-find on random graphs") {
    import spark.implicits._
    val p = Prop.forAll(pairGen) { pairs =>
      val df = pairs.toDF("id_a", "id_b")
      val got = graft.ops.Components.connectedComponents(df)
        .as[(Long, Long)].collect().toMap
      got == unionFind(pairs)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("alternating large/small-star == union-find on random graphs") {
    import spark.implicits._
    val p = Prop.forAll(pairGen) { pairs =>
      val df = pairs.toDF("id_a", "id_b")
      val got = graft.ops.Components.connectedComponentsAlternating(df)
        .as[(Long, Long)].collect().toMap
      got == unionFind(pairs)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("empty pair graph (duplicate-free corpus) yields an empty result " +
      "in both algorithms, not an NPE") {
    import spark.implicits._
    // Gen.nonEmptyListOf never covers this; minhashLsh on a duplicate-
    // free corpus returns zero pairs and the checksum probe must read
    // the null sum as zero (r4 ADVICE).
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.ops.Components.connectedComponents(empty).count() == 0L)
    assert(graft.ops.Components.connectedComponentsAlternating(empty)
      .count() == 0L)
  }

  test("self-pair-only vertices keep their own label in both algorithms") {
    import spark.implicits._
    val pairs = Seq((7L, 7L), (1L, 2L), (2L, 2L)).toDF("id_a", "id_b")
    val prop = graft.ops.Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val alt = graft.ops.Components.connectedComponentsAlternating(pairs)
      .as[(Long, Long)].collect().toMap
    val want = Map(7L -> 7L, 1L -> 1L, 2L -> 1L)
    assert(prop == want, s"propagation: $prop")
    assert(alt == want, s"alternating: $alt")
  }

  test("alternating stars close a 40-chain in far fewer rounds than " +
      "its diameter (the chain-shaped-cluster upgrade path)") {
    import spark.implicits._
    // Worst case for min-label propagation: a pure chain 0-1-2-...-40
    // needs diameter-many propagation rounds; the alternating scheme
    // must finish within maxRounds = 10 ≪ 40 and still label every
    // vertex with the chain minimum.
    val chain = (0L until 40L).map(i => (i, i + 1))
    val got = graft.ops.Components
      .connectedComponentsAlternating(chain.toDF("id_a", "id_b"),
        maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 41)
    assert(got.values.forall(_ == 0L))
  }
}
