package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join produces exactly the unsalted join's result") {
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables(spark, TestSpark.sf0001, "orders")
      .select("o_orderkey", "o_orderstatus")

    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    val salted = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", salts = 7)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    assert(salted == plain)
  }

  test("salted join refuses join types that duplicate unmatched build rows") {
    import spark.implicits._
    val probe = Seq((1L, "a")).toDF("k", "v")
    val build = Seq((1L, "x"), (2L, "unmatched")).toDF("bk", "bv")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, "k", "bk", salts = 8,
        joinType = "right_outer")
    }
    assert(e.getMessage.contains("duplicate unmatched build rows"))
    // the allowed left-preserving types still work
    assert(Skew.saltedJoin(probe, build, "k", "bk", salts = 8,
      joinType = "left_anti").count() === 0L)
  }

  test("salted join key includes the salt (spreads a hot key)") {
    import spark.implicits._
    // a pathologically hot key: 1000 probe rows, one build row
    val probe = (1 to 1000).map(i => (42L, i)).toDF("k", "v")
    val build = Seq((42L, "hot")).toDF("bk", "name")
    val out = Skew.saltedJoin(probe, build, "k", "bk", salts = 8)
    assert(out.count() == 1000)
    // the probe side fans out over multiple salt values
    val saltSpread = probe
      .withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("v"))), lit(8)))
      .select("__salt").distinct().count()
    assert(saltSpread > 1)
  }
}
