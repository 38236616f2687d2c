package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class WeightedMeanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("typed Aggregator: discount-weighted price equals the expression form") {
    import spark.implicits._
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
    // typed path
    val typedResult = li
      .select(col("l_extendedprice"), col("l_quantity"))
      .as[(Double, Double)]
      .select(udaf(new WeightedMean).apply(col("l_extendedprice"), col("l_quantity")))
      .collect()(0).getDouble(0)
    // expression form: sum(p*q)/sum(q)
    val exprResult = li.agg(
      (sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")))
        .as("wm")).collect()(0).getDouble(0)
    assert(math.abs(typedResult - exprResult) < 1e-6)
  }

  test("aggregator merge handles empty input as NaN") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Double)].toDF("p", "w")
    val got = empty.select(udaf(new WeightedMean).apply(col("p"), col("w")))
      .collect()(0).getDouble(0)
    assert(got.isNaN)
  }

  test("null values or weights skip their pair instead of aborting the job") {
    // the old primitive (Double, Double) IN type hit the tuple encoder's
    // AssertNotNull on the first NULL and died with 'Null value appeared
    // in non-nullable field' (r11 review). Contract: a pair with a null
    // value OR weight is skipped entirely — a weight without a value must
    // not inflate the denominator.
    import spark.implicits._
    val df = Seq(
      (Some(10.0), Some(1.0)),
      (None: Option[Double], Some(99.0)), // null value: skipped wholesale
      (Some(99.0), None: Option[Double]), // null weight: skipped wholesale
      (Some(20.0), Some(3.0)))
      .toDF("p", "w")
    val got = df.select(udaf(new WeightedMean).apply(col("p"), col("w")))
      .collect()(0).getDouble(0)
    assert(math.abs(got - (10.0 * 1 + 20.0 * 3) / 4.0) < 1e-12, got)
  }
}
