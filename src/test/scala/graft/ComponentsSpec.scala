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

  private val pairGen = Gen.nonEmptyListOf(
    for {
      a <- Gen.choose(0L, 19L)
      b <- Gen.choose(0L, 19L) if a != b
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
}
