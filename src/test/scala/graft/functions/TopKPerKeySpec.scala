package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aggregator top-k equals the window rank formulation on orders") {
    val orders = Tables(spark, TestSpark.sf0001, "orders")

    val viaAgg = orders.groupBy("o_custkey")
      .agg(TopKPerKey.topK(3)(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rk"),
        col("e._2").as("o_orderkey"), col("e._1").as("o_totalprice"))

    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val viaWindow = orders
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk").cast("long").as("rk"),
        col("o_orderkey"), col("o_totalprice"))

    val a = viaAgg.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val b = viaWindow.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("k is validated up front: k <= 0 fails fast instead of empty arrays (r14)") {
    intercept[IllegalArgumentException] { TopKPerKey.topK(0) }
    intercept[IllegalArgumentException] { TopKPerKey.topK(-5) }
    intercept[IllegalArgumentException] { TopKPerKey.topK(5000) } // > recursion-safe bound
  }

  test("plan aggregates with partial combine — no Window, no full sort") {
    val orders = Tables(spark, TestSpark.sf0001, "orders")
    val plan = orders.groupBy("o_custkey")
      .agg(TopKPerKey.topK(3)(col("o_totalprice"), col("o_orderkey")).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("Window"))
  }

  test("merge keeps order, tiebreak, and bound under arbitrary splits") {
    val agg = TopKPerKey.TopK(3)
    val rows = Seq((5.0, 9L), (5.0, 2L), (7.0, 1L), (1.0, 4L), (7.0, 8L))
    // reduce in one go vs merge of every 2-way split: same result
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    (0 to rows.length).foreach { cut =>
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged === whole, s"split at $cut")
    }
    assert(whole === List((7.0, 1L), (7.0, 8L), (5.0, 2L)))
  }

  test("NaN sort keys: merge commutes (total order — NaN ranks above all)") {
    // the bare `>` this replaces answered false BOTH ways on NaN, so
    // merge([(NaN,1)],[(5.0,2)]) != merge([(5.0,2)],[(NaN,1)]) and the
    // survivor set depended on partitioning (r10 review)
    val agg = TopKPerKey.TopK(1)
    val a = List((Double.NaN, 1L))
    val b = List((5.0, 2L))
    val ab = agg.merge(a, b)
    val ba = agg.merge(b, a)
    assert(ab === ba)
    // java.lang.Double.compare ranks NaN above every double — Spark's
    // own sort order for doubles
    assert(ab.head._2 === 1L)
  }
}
