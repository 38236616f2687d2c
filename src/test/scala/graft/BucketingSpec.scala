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

  test("bucketed LSH signature table makes the band self-join exchange-free") {
    // the lake deployment of dd02/dd07: the signature table is PERSISTED
    // bucketed on the banded hash, so every nightly dedup run's candidate
    // self-join co-locates both sides and plans with zero shuffles — the
    // band shuffle is paid once at signature-build time, not per run
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    docs.select(col("doc_id"), xxhash64(col("text")).as("bh"))
      .write.mode("overwrite").bucketBy(8, "bh").sortBy("bh")
      .saveAsTable("sig_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sig = spark.table("sig_bucketed")
      val pairs = sig.select(col("doc_id").as("id1"), col("bh"))
        .join(sig.select(col("doc_id").as("id2"), col("bh")), Seq("bh"))
        .filter(col("id1") < col("id2"))
      val joinNode = pairs.queryExecution.sparkPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joinNode.isDefined, "expected a sort-merge join")
      assert(joinNode.get.collect { case s: ShuffleExchangeExec => s }.isEmpty,
        "bucketed signature self-join must not shuffle")
      assert(pairs.count() >= 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS sig_bucketed")
    }
  }

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
