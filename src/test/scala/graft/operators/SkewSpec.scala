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

  test("dotted column names, map columns, and a user __salt column all survive") {
    import spark.implicits._
    // r11 review: col("user.id") parsed as nested-field access (crash),
    // xxhash64 rejected MapType (crash), and a probe column literally
    // named __salt was overwritten then dropped (silent data loss)
    val probe = Seq((1L, "a", 7), (1L, "b", 9), (2L, "c", 3))
      .toDF("user.id", "__salt", "n")
      .withColumn("attrs", map(lit("k"), col("`user.id`")))
    val build = Seq((1L, "x"), (2L, "y")).toDF("bk", "bv")
    val out = Skew.saltedJoin(probe, build, "user.id", "bk", salts = 4)
    assert(out.count() === 3)
    // the user's own __salt column is intact in the output
    assert(out.select("__salt").collect().map(_.getString(0)).sorted
      === Array("a", "b", "c"))
    assert(out.columns.count(_ == "__salt") === 1)
    // map-typed attrs column rode through untouched
    assert(out.select("attrs").count() === 3)
  }

  test("a probe with ONLY unhashable non-key columns still joins correctly") {
    import spark.implicits._
    val probe = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)))
      .toDF("k", "m")
    // k is hashable, m is not: salt hashes k alone; multiset still exact
    val build = Seq((1L, "x")).toDF("bk", "bv")
    val out = Skew.saltedJoin(probe, build, "k", "bk", salts = 8)
    assert(out.count() === 1)
    assert(out.select("bv").head.getString(0) === "x")
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
