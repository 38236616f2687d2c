package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Scale mechanics: bucketed tables co-locate join keys, so a key-equi join
  * plans with NO shuffle exchange on either side (SURVEY §1.3 / the 100 TB
  * partitioning argument — at cluster scale this is the difference between
  * a full network shuffle of the fact table and a local merge).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join over bucketed tables plans without shuffle exchanges") {
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
    val o = Tables(spark, TestSpark.sf0001, "orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      // pre-AQE physical plan: the join itself must not shuffle either side
      // (the later groupBy aggregation legitimately shuffles on its key)
      val joinNode = joined.queryExecution.sparkPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joinNode.isDefined, "expected a sort-merge join")
      val shufflesUnderJoin = joinNode.get.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed join should not shuffle, found: $shufflesUnderJoin")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
