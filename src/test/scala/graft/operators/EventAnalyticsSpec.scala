package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Contract checks for the behavioral-analytics tranche: funnel ORDER
  * matters (a click before any view must not advance the user), the
  * transition matrix rows are proper distributions, the tertile lookup
  * places boundaries at the rank-based cut, and the integer 3σ flag
  * agrees with a driver-side float z-score on a planted outlier.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("ev01 funnel: out-of-order clicks don't advance the stage") {
    // user 1: view(1) click(2) purchase(3)  -> reaches stage 4
    // user 2: click(1) view(2) purchase(3)  -> click precedes the first
    //         view, so stage 3 is never reached (and 4 can't be)
    // user 3: view(1) click(2), purchase BEFORE the click -> stage 3 only
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(3)),
      (3L, "purchase", ts(1)), (3L, "view", ts(2)), (3L, "click", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnelStages(ev)
      .select("stage", "n_users").as[(Int, Long)].collect().toMap
    assert(got(1) === 3) // all users
    assert(got(2) === 3) // all have a view
    assert(got(3) === 2) // users 1 and 3 click after viewing
    assert(got(4) === 1) // only user 1 purchases after that click
  }

  test("ev01 funnel on the gate table: stage counts never increase") {
    val stages = EventAnalytics.queries("ev01_funnel")(spark, dir)
      .select("stage", "n_users").as[(Int, Long)].collect()
      .sortBy(_._1).map(_._2)
    assert(stages.length === 4)
    assert(stages.sliding(2).forall { case Array(a, b) => b <= a })
  }

  test("ev03 transition rows are distributions over observed next-events") {
    val ev = Seq(
      (1L, "a", ts(1), 1L), (1L, "b", ts(2), 2L), (1L, "a", ts(3), 3L),
      (1L, "b", ts(4), 4L),
      (2L, "a", ts(1), 5L), (2L, "a", ts(2), 6L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.transitionMatrix(ev)
      .select("from_ev", "to_ev", "n", "prob_ppm")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // from 'a': a->b twice (user 1), a->a once (user 2) = 3 transitions
    assert(got(("a", "b")) === ((2L, 666666L)))
    assert(got(("a", "a")) === ((1L, 333333L)))
    // from 'b': b->a once; the final event of each user emits nothing
    assert(got(("b", "a")) === ((1L, 1000000L)))
    assert(!got.contains(("b", "b")))
  }

  test("tertile boundaries sit at the rank-based cuts") {
    // 9 values 10..90: ranks 0..8, b1 = value at rank ⌊8/3⌋=2 → 30,
    // b2 = value at rank ⌊16/3⌋=5 → 60
    val df = (1 to 9).map(i => i * 10L).toDF("v")
    val b = Relational6.tertiles(df, "v", "t").collect()(0)
    assert(b.getLong(0) === 30L)
    assert(b.getLong(1) === 60L)
  }

  test("q62 score matches a sequential exact reference on the gate table") {
    val r = Relational6.queries("q62_zscore_outliers")(spark, dir)
      .select("o_orderkey", "o_custkey", "units", "z2_milli", "is_outlier")
      .as[(Long, Long, Long, Long, Int)].collect()
    // sequential BigInt reference (overflow-free by construction) — the
    // distributed aggregation + join-back must agree on every order
    val byCust = r.groupBy(_._2)
    r.foreach { case (ok, ck, units, z2, flag) =>
      val xs = byCust(ck).map(_._3).map(BigInt(_))
      val n = BigInt(xs.length)
      val s = xs.sum
      val q = xs.map(x => x * x).sum
      val lhs = (n * units - s).pow(2)
      val varN = n * q - s * s
      val expectScore = if (varN == 0) BigInt(0) else lhs * 1000 / varN
      val expectFlag = xs.length >= 4 && lhs > 4 * varN
      assert(BigInt(z2) === expectScore, s"order $ok cust $ck")
      assert(flag === (if (expectFlag) 1 else 0), s"order $ok cust $ck")
    }
  }

  test("q62 kernel: planted heavy-tailed key flags at 2σ, uniform key doesn't") {
    // 12 calm days + one 50x spike: spike z ≈ 3.3 (flaggable); a uniform
    // key never exceeds z ≈ 1.8 (population z is bounded by (n−1)/√n, so
    // tiny keys mathematically can't trip large thresholds — the reason
    // the operator emits the score, not just the flag)
    val planted = (1 to 12).map(i => (i.toLong, 1L, 100L + (i % 3))) :+
      (13L, 1L, 5000L)
    val uniform = (21 to 32).map(i => (i.toLong, 2L, (90 + i).toLong))
    val df = (planted ++ uniform).toDF("row_id", "key", "x")
    val r = Relational6.zscoreAnomalies(df)
      .select("row_id", "z2_milli", "is_outlier")
      .as[(Long, Long, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(13L)._2 === 1, s"spike row: ${r(13L)}")
    assert(r(13L)._1 > 4000L) // z² > 4 in milli
    (1 to 12).foreach(i => assert(r(i.toLong)._2 === 0))
    (21 to 32).foreach(i => assert(r(i.toLong)._2 === 0))
    // zero-variance key scores 0, never divides by zero
    val zv = Relational6.zscoreAnomalies(
      Seq((1L, 9L, 5L), (2L, 9L, 5L), (3L, 9L, 5L), (4L, 9L, 5L))
        .toDF("row_id", "key", "x"))
      .select("z2_milli", "is_outlier").as[(Long, Int)].collect()
    assert(zv.forall(_ == ((0L, 0))))
  }
}
