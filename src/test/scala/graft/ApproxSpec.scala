package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates: approx_count_distinct (HLL++) must land within its
  * advertised error of the exact count — the profile-style check from
  * SURVEY §2.2's aggregation row (approximate → no DuckDB oracle; the
  * tolerance bound is the contract).
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
    val r = li.agg(
      countDistinct("l_partkey").as("exact_part"),
      approx_count_distinct("l_partkey", 0.02).as("approx_part"),
      countDistinct("l_orderkey").as("exact_order"),
      approx_count_distinct("l_orderkey", 0.02).as("approx_order"))
      .collect()(0)
    def close(exact: Long, approx: Long): Boolean =
      math.abs(approx - exact).toDouble / exact < 0.05
    assert(close(r.getLong(0), r.getLong(1)),
      s"parts: exact=${r.getLong(0)} approx=${r.getLong(1)}")
    assert(close(r.getLong(2), r.getLong(3)),
      s"orders: exact=${r.getLong(2)} approx=${r.getLong(3)}")
  }

  test("HLL sketch mergeability: union of per-day sketches == one global sketch") {
    // the law q64 depends on: building partials and merging must lose
    // nothing vs sketching the whole input at once (same lgk)
    val ev = Tables(spark, TestSpark.sf0001, "events")
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
    val merged = ev.groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val global = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("est"))
      .collect()(0).getLong(0)
    assert(merged === global, s"merged=$merged global=$global")
    val exact = ev.agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05)
  }
}
