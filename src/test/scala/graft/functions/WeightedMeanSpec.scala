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
}
