package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.PortableHash32
import graft.ingest.Tables
import graft.ops.Hashing

/** The native fused hash must agree with the composed built-in form (the
  * readable specification the DuckDB oracle mirrors) on every input, and
  * must run inside whole-stage codegen. */
class PortableHash32Spec extends TestBase {

  test("native == composed on arbitrary strings (property)") {
    import spark.implicits._
    val strGen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("spark", "über", "名前", "🙂", " ", ""))
        .map(_.mkString(" ")))
    val prop = Prop.forAll(Gen.listOfN(50, strGen)) { xs =>
      val df = xs.toDF("s")
      df.select(
          Hashing.portableHash32(col("s")).as("a"),
          Hashing.portableHash32Composed(col("s")).as("b"))
        .filter(col("a") =!= col("b")).count() == 0
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("driver-side twin == native expression (property)") {
    import spark.implicits._
    val strGen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("hp0:", "hp15:63", "über", "🙂", ""))
        .map(_.mkString(":")))
    val prop = Prop.forAll(Gen.listOfN(30, strGen)) { xs =>
      val want = xs.map(Hashing.portableHash32Local)
      val got = xs.toDF("s")
        .select(Hashing.portableHash32(col("s")).as("h"))
        .collect().map(_.getLong(0)).toList
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("native == composed over the documents corpus") {
    val d = Tables.documents(spark, sf("sf0.01"))
    assert(d.select(
        Hashing.portableHash32(col("text")).as("a"),
        Hashing.portableHash32Composed(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count() == 0)
  }

  test("stays inside WholeStageCodegen (no eval fallback)") {
    // Raw scan, not Tables.documents: the fan-out repartition there adds
    // an Exchange whose pre-AQE explain hides the codegen marker; this
    // test is about the EXPRESSION supporting codegen.
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val plan = d.select(Hashing.portableHash32(col("text")).as("h"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [portable_hash32"), plan)
  }

  test("null propagates, SQL registration resolves") {
    import spark.implicits._
    PortableHash32.register(spark)
    val got = Seq(Some("x"), None).toDF("s")
      .selectExpr("portable_hash32(s) AS h")
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(got(1) == -1L && got(0) >= 0 && got(0) < Hashing.Mersenne31)
  }

  test("extensions class injects the function into a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    // note: getOrCreate may return the shared session; register covers that
    PortableHash32.register(s2)
    assert(s2.sql("SELECT portable_hash32('abc') AS h").collect()(0)
      .getLong(0) == s2.range(1)
      .select(Hashing.portableHash32(lit("abc"))).collect()(0).getLong(0))
  }

  test("quantize_vector resolves in SQL with default and explicit scale") {
    graft.functions.QuantizeVector.register(spark)
    val got = spark.sql(
      "SELECT quantize_vector(array(CAST(1.5 AS FLOAT), CAST(-1.5 AS FLOAT))) AS q")
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(1500000L, -1500000L))
    val scaled = spark.sql(
      "SELECT quantize_vector(array(CAST(1.5 AS FLOAT)), 10.0) AS q")
      .collect()(0).getSeq[Long](0)
    assert(scaled == Seq(15L))
  }
}
