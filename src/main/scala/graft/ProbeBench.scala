package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (not graded): prices one bisection ROUND three ways on
  * a checkpointed partials-shaped relation — (a) DataFrame agg with
  * literal probes (re-planned every round), (b) DataFrame agg with
  * probes as broadcast-joined data (plan shape constant), (c)
  * queryExecution.toRdd + treeAggregate closure (no Catalyst work
  * after the first call). The winner becomes the probe-round engine. */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 500000
    val e = spark.range(n.toLong)
      .select(col("id").as("_id"),
        pmod(col("id") * 2654435761L, lit(1000000L)).as("_score"),
        (pmod(col("id") * 40503L, lit(900L)) + 100L).as("_toks"))
      .localCheckpoint(true)
    val rounds = 15
    val probeCols = 31
    def timeIt(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm all paths once
    e.count()
    // (a) literal probes, fresh plan each round
    timeIt("warm-a") {
      val aggs = (1 to probeCols).map(i =>
        coalesce(sum(when(col("_score") > lit(i * 7L), col("_toks"))
          .otherwise(0L)), lit(0L)).as(s"_s$i"))
      e.agg(aggs.head, aggs.tail: _*).first()
    }
    timeIt(s"a literal-agg x$rounds") {
      (1 to rounds).foreach { r =>
        val aggs = (1 to probeCols).map(i =>
          coalesce(sum(when(col("_score") > lit(r * 1000L + i), col("_toks"))
            .otherwise(0L)), lit(0L)).as(s"_s$i"))
        e.agg(aggs.head, aggs.tail: _*).first()
      }
    }
    // (c) toRdd + treeAggregate
    val rdd = e.queryExecution.toRdd
    val scoreOrd = e.schema.fieldIndex("_score")
    val toksOrd = e.schema.fieldIndex("_toks")
    timeIt("warm-c") {
      val ms = Array.tabulate(probeCols)(i => i * 7L)
      rdd.treeAggregate(new Array[Long](probeCols))(
        (acc, row) => {
          val s = row.getLong(scoreOrd); val t = row.getLong(toksOrd)
          var i = 0
          while (i < ms.length) { if (s > ms(i)) acc(i) += t; i += 1 }
          acc
        },
        (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
    }
    timeIt(s"c toRdd-treeAgg x$rounds") {
      (1 to rounds).foreach { r =>
        val ms = Array.tabulate(probeCols)(i => r * 1000L + i)
        rdd.treeAggregate(new Array[Long](probeCols))(
          (acc, row) => {
            val s = row.getLong(scoreOrd); val t = row.getLong(toksOrd)
            var i = 0
            while (i < ms.length) { if (s > ms(i)) acc(i) += t; i += 1 }
            acc
          },
          (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
      }
    }
    // repeat (a) and (c) to see steady-state
    timeIt(s"a2 literal-agg x$rounds") {
      (1 to rounds).foreach { r =>
        val aggs = (1 to probeCols).map(i =>
          coalesce(sum(when(col("_score") > lit(r * 2000L + i), col("_toks"))
            .otherwise(0L)), lit(0L)).as(s"_s$i"))
        e.agg(aggs.head, aggs.tail: _*).first()
      }
    }
    timeIt(s"c2 toRdd-treeAgg x$rounds") {
      (1 to rounds).foreach { r =>
        val ms = Array.tabulate(probeCols)(i => r * 2000L + i)
        rdd.treeAggregate(new Array[Long](probeCols))(
          (acc, row) => {
            val s = row.getLong(scoreOrd); val t = row.getLong(toksOrd)
            var i = 0
            while (i < ms.length) { if (s > ms(i)) acc(i) += t; i += 1 }
            acc
          },
          (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
      }
    }
    spark.stop()
  }
}
