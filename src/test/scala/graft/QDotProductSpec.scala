package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.QDotProduct
import graft.ops.Similarity

/** The native fused dot product must agree with the composed built-in
  * specification on every input and run inside whole-stage codegen. */
class QDotProductSpec extends TestBase {

  test("native == composed on arbitrary long vectors (property)") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1000000L, 1000000L))
    val prop = Prop.forAll(Gen.listOfN(20, Gen.zip(vecGen, vecGen))) { xs =>
      val df = xs.toDF("a", "b")
      df.select(
          Similarity.qdot(col("a"), col("b")).as("x"),
          Similarity.qdotComposed(col("a"), col("b")).as("y"))
        .filter(col("x") =!= col("y")).count() == 0
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("native == composed over the embeddings corpus") {
    val e = graft.ingest.Tables.embeddings(spark, sf("sf0.01"))
      .select(Similarity.quantize(col("embedding")).as("q"))
    assert(e.select(
        Similarity.qdot(col("q"), col("q")).as("x"),
        Similarity.qdotComposed(col("q"), col("q")).as("y"))
      .filter(col("x") =!= col("y")).count() == 0)
  }

  test("null array yields null; SQL registration resolves") {
    import spark.implicits._
    QDotProduct.register(spark)
    val got = Seq((Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),
        (None, Some(Seq(3L, 4L))))
      .toDF("a", "b")
      .selectExpr("qdot(a, b) AS d")
      .collect().map(r => if (r.isNullAt(0)) Long.MinValue else r.getLong(0))
    assert(got.toSeq === Seq(11L, Long.MinValue))
  }

  test("quantize_vector SQL form: non-foldable scale is a clean " +
      "analysis error, not an NPE") {
    import spark.implicits._
    graft.functions.QuantizeVector.register(spark)
    val df = Seq((Seq(1.0f, 2.0f), 2.0d)).toDF("e", "s")
    // Literal scale still works through the SQL path.
    assert(df.selectExpr("quantize_vector(e, 1000000.0) AS q")
      .collect()(0).getSeq[Long](0) == Seq(1000000L, 2000000L))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("quantize_vector(e, s)").collect()
    }
    assert(err.getCondition == "NON_FOLDABLE_ARGUMENT", err.toString)
  }

  test("stays inside WholeStageCodegen (no eval fallback)") {
    val d = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(Similarity.quantize(col("embedding")).as("q"))
    val plan = d.select(Similarity.qdot(col("q"), col("q")).as("d"))
      .queryExecution.executedPlan.toString
    // Both the native quantize scan and the qdot projection must carry
    // the *(n) codegen prefix (the composed transform() lambda never
    // does — that is exactly why the native forms exist).
    val qdotLine = plan.linesIterator.find(_.contains("qdot(")).getOrElse("")
    assert(qdotLine.matches(""".*\*\(\d+\) Project.*"""), plan)
    val quantLine = plan.linesIterator
      .find(_.contains("quantize_vector(")).getOrElse("")
    assert(quantLine.matches(""".*\*\(\d+\) (Project|ColumnarToRow).*""") ||
      plan.linesIterator.exists(l => l.contains("quantize_vector(") &&
        l.contains("*(")), plan)
  }

  test("native quantize == composed transform on floats (parity)") {
    import spark.implicits._
    val vecGen = Gen.listOfN(8,
      Gen.chooseNum(-4.0f, 4.0f).map(f => f * 0.37f))
    val prop = Prop.forAll(Gen.listOfN(20, vecGen)) { xs =>
      val df = xs.toDF("e")
      df.select(
          Similarity.quantize(col("e")).as("x"),
          Similarity.quantizeComposed(col("e")).as("y"))
        .filter(col("x") =!= col("y")).count() == 0
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
    // Null array propagates; negative values floor downward.
    val got = Seq(Some(Seq(-1.5f, 0.0f, 2.25f)), None).toDF("e")
      .select(Similarity.quantize(col("e")).as("q")).collect()
    assert(got(0).getSeq[Long](0) == Seq(-1500000L, 0L, 2250000L))
    assert(got(1).isNullAt(0))
  }

  test("QDotFusionRule rewrites the composed form to the native kernel") {
    import spark.implicits._
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      Seq(graft.functions.QDotFusionRule)
    // Build over range() (literal rows fold to a LocalRelation before the
    // assertion could see the rewritten expression); row id 1 has a
    // length mismatch → NULL.
    def arrays(df: org.apache.spark.sql.DataFrame) = df.select(
      when(col("id") === 0, typedLit(Seq(1L, 2L, 3L)))
        .otherwise(typedLit(Seq(7L, 8L))).as("a"),
      when(col("id") === 0, typedLit(Seq(4L, 5L, 6L)))
        .otherwise(typedLit(Seq(9L, 10L, 11L))).as("b"))
    val d2 = arrays(s.range(2).toDF())
    val fused = d2.select(
      Similarity.qdotComposed(col("a"), col("b")).as("d"))
    val optimized = fused.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.QDotProduct])), optimized.toString)
    val got = fused.orderBy(col("d").asc_nulls_last).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(32L), None)) // 1*4+2*5+3*6; mismatch→NULL
    // Control: without the rule the composed form stays composed.
    val plain = arrays(spark.range(2).toDF())
      .select(Similarity.qdotComposed(col("a"), col("b")).as("d"))
      .queryExecution.optimizedPlan
    assert(!plain.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.QDotProduct])))
  }
}
