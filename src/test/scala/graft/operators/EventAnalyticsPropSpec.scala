package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property check for the chained-min funnel kernel: on ARBITRARY event
  * logs (random users, types, times, duplicates and all-out-of-order
  * arrivals included), the distributed `funnelTimes` must equal a
  * sequential per-user reference of the same contract — view reached at
  * min(view ts); click reached at min(click ts strictly after that);
  * purchase at min(purchase ts strictly after that).
  */
class EventAnalyticsPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eventGen: Gen[(Long, String, Int)] = for {
    u <- Gen.chooseNum(1L, 12L)
    t <- Gen.oneOf("view", "click", "purchase", "error")
    m <- Gen.chooseNum(0, 40)
  } yield (u, t, m)

  private def reference(log: List[(Long, String, Int)])
      : Map[Long, (Option[Int], Option[Int], Option[Int])] =
    log.groupBy(_._1).map { case (u, evs) =>
      def minAfter(tpe: String, after: Option[Int]): Option[Int] =
        after.flatMap(a =>
          evs.filter(e => e._2 == tpe && e._3 > a).map(_._3).minOption)
      val v = evs.filter(_._2 == "view").map(_._3).minOption
      val c = minAfter("click", v)
      val p = minAfter("purchase", c)
      u -> (v, c, p)
    }

  test("funnelTimes equals the sequential chained-min reference on random logs") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(eventGen)) { log =>
      val df = log.map { case (u, t, m) =>
        (u, t, Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"))
      }.toDF("user_id", "event_type", "ts")
      val got = EventAnalytics.funnelTimes(df)
        .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
        .collect()
        .map(r => r._1 -> ((r._2.map(minuteOf), r._3.map(minuteOf),
          r._4.map(minuteOf))))
        .toMap
      got == reference(log)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  private def minuteOf(t: Timestamp): Int =
    t.toLocalDateTime.getMinute

  test("transitionMatrix equals the sequential per-user bigram count on random logs") {
    // events get DISTINCT event_ids so the (ts, event_id) order is total;
    // ts collisions across users are fine (windows partition by user)
    val prop = Prop.forAll(Gen.nonEmptyListOf(eventGen)) { log0 =>
      val log = log0.zipWithIndex.map { case ((u, t, m), i) =>
        (u, t, m, i.toLong)
      }
      val df = log.map { case (u, t, m, id) =>
        (u, t, Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"), id)
      }.toDF("user_id", "event_type", "ts", "event_id")
      val got = EventAnalytics.transitionMatrix(df)
        .select("from_ev", "to_ev", "n")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // sequential reference: per user, sort by (minute, event_id), count
      // adjacent pairs
      val expect = log.groupBy(_._1).toList.flatMap { case (_, evs) =>
        val ordered = evs.sortBy(e => (e._3, e._4)).map(_._2)
        ordered.zip(ordered.drop(1))
      }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
      got == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
