package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime filtering: on a shuffle join whose build side is selective,
  * Catalyst injects a bloom filter on the probe side (SPARK-32268) so the
  * big scan drops non-joining rows BEFORE the shuffle — at 100 TB this is
  * the difference between shuffling the full fact table and shuffling the
  * matching fraction. The thresholds defend against tiny builds locally;
  * a session clone lowers them to prove the mechanism end to end.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("selective shuffle join injects a bloom filter on the probe side") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // creationSideThreshold is a MAX (build side must be small enough to
    // bloom cheaply); applicationSideScanSizeThreshold is a MIN (probe must
    // be big enough to be worth filtering) — local fixtures clear the
    // former already, zero the latter
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    val o = Tables(s2, TestSpark.sf0001, "orders")
      .filter(col("o_totalprice") > 400000)
    val l = Tables(s2, TestSpark.sf0001, "lineitem")
    val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(col("l_orderkey"), col("o_totalprice"))
    val optimized = j.queryExecution.optimizedPlan.toString
    assert(optimized.contains("bloom_filter") ||
      optimized.contains("BloomFilter"),
      s"no bloom runtime filter injected:\n${optimized.take(3000)}")
    // and the filtered join still returns the right rows
    val expected = l.join(broadcast(o), l("l_orderkey") === o("o_orderkey")).count()
    assert(j.count() == expected)
  }
}
