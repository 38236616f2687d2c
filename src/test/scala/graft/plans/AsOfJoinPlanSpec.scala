package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TemporalJoins

class AsOfJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def leftDf = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 12:00:00")),
    (3L, 20L, ts("2024-01-01 09:00:00")),
    (4L, 30L, ts("2024-01-01 09:00:00"))
  ).toDF("id", "k", "ts")

  private def rightDf = Seq(
    (10L, ts("2024-01-01 09:30:00"), 100L),
    (10L, ts("2024-01-01 10:00:00"), 101L), // equal ts counts
    (10L, ts("2024-01-01 11:00:00"), 102L),
    (20L, ts("2024-01-01 09:30:00"), 200L)
  ).toDF("rk", "rts", "payload")

  test("custom exec matches the composed union+window asOf semantics") {
    val got = AsOfJoinPlan.asOfJoin(leftDf, rightDf,
      Seq("k"), Seq("rk"), "ts", "rts")
      .select("id", "payload").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      1L -> Some(101L), 2L -> Some(102L), 3L -> None, 4L -> None))
  }

  test("raw exec output survives UnsafeRow-requiring parents (no select above)") {
    // collect() straight off the exec (getByteArrayRdd casts each row to
    // UnsafeRow), and a sort DIRECTLY above it (UnsafeExternalRowSorter) —
    // both died with ClassCastException before the resultProj (r10 review)
    val df = AsOfJoinPlan.asOfJoin(leftDf, rightDf,
      Seq("k"), Seq("rk"), "ts", "rts")
    val raw = df.collect()
    assert(raw.length === 4)
    val sorted = df.orderBy("payload").collect()
    assert(sorted.length === 4)
    assert(df.groupBy("k").count().count() === 3)
  }

  test("plan uses AsOfJoinExec with requirements satisfied by the planner") {
    val df = AsOfJoinPlan.asOfJoin(leftDf, rightDf,
      Seq("k"), Seq("rk"), "ts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan.take(1500))
    // EnsureRequirements inserted the exchanges + sorts the contract asks for
    assert(plan.contains("Sort"), plan.take(1500))
    assert(plan.contains("ENSURE_REQUIREMENTS"), plan.take(1500))
  }

  test("pre-partitioned, pre-sorted children need NO extra exchange") {
    val l = leftDf.repartition(4, col("k")).sortWithinPartitions("k", "ts")
    val r = rightDf.repartition(4, col("rk")).sortWithinPartitions("rk", "rts")
    val df = AsOfJoinPlan.asOfJoin(l, r, Seq("k"), Seq("rk"), "ts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    // only the two explicit repartitions — the operator itself added none
    // (satisfied children ⇒ no ENSURE_REQUIREMENTS exchange or extra sort)
    assert(!plan.contains("ENSURE_REQUIREMENTS"), plan)
    assert(plan.split("Exchange").length - 1 === 2, plan)
    val got = df.select("id", "payload")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(101L))
  }

  test("mixed inputs: one side pre-partitioned, other raw — still correct") {
    // EnsureRequirements must bring the raw side to a co-partitioning the
    // zipPartitions merge can consume (mismatched partition counts would
    // throw at runtime)
    val l = leftDf.repartition(3, col("k")).sortWithinPartitions("k", "ts")
    val got = AsOfJoinPlan.asOfJoin(l, rightDf,
      Seq("k"), Seq("rk"), "ts", "rts")
      .select("id", "payload").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      1L -> Some(101L), 2L -> Some(102L), 3L -> None, 4L -> None))
  }

  test("null right timestamps and null keys match nothing") {
    val r = Seq(
      (Some(10L), Option.empty[Timestamp], Some(666L)),
      (Option.empty[Long], Some(ts("2024-01-01 09:00:00")), Some(667L)),
      (Some(10L), Some(ts("2024-01-01 09:00:00")), Some(1L))
    ).toDF("rk", "rts", "payload")
    val got = AsOfJoinPlan.asOfJoin(leftDf, r, Seq("k"), Seq("rk"), "ts", "rts")
      .select("id", "payload").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      1L -> Some(1L), 2L -> Some(1L), 3L -> None, 4L -> None))
  }

  test("shared-lineage right side (self-as-of) works via re-aliasing") {
    // events as-of their own earlier events per key — both sides derive
    // from ONE frame, so without re-aliasing the exprIds would collide
    val ev = leftDf
    val prior = ev.select(col("k").as("rk"), col("ts").as("rts"),
      col("id").as("prior_id"))
    val got = AsOfJoinPlan.asOfJoin(ev, prior,
      Seq("k"), Seq("rk"), "ts", "rts")
      .select("id", "prior_id").as[(Long, Option[Long])].collect().toMap
    // each row's latest at-or-before match is itself (equal ts counts)
    assert(got === Map(1L -> Some(1L), 2L -> Some(2L),
      3L -> Some(3L), 4L -> Some(4L)))
  }

  test("dotted right-column names survive the re-alias (no nested-field parse)") {
    // Dataset.apply("price.usd") parses the dot as a struct path and threw
    // before the join was built; the re-alias now works from the plan's
    // own attributes (r14 review)
    val r = rightDf.withColumnRenamed("payload", "price.usd")
    val got = AsOfJoinPlan.asOfJoin(leftDf, r, Seq("k"), Seq("rk"), "ts", "rts")
      .select(col("id"), col("`price.usd`"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(101L))
  }

  test("key/ts type mismatches are rejected, not silently mis-ordered") {
    val r = rightDf.select(col("rk").cast("int").as("rk"),
      col("rts"), col("payload"))
    val ex = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asOfJoin(leftDf, r, Seq("k"), Seq("rk"), "ts", "rts")
    }
    assert(ex.getMessage.contains("type mismatch"))
  }

  test("column lookup honors the session resolver (case-insensitive)") {
    val got = AsOfJoinPlan.asOfJoin(leftDf, rightDf,
      Seq("K"), Seq("RK"), "TS", "RTS")
      .select("id", "payload").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(101L))
  }

  test("property: custom exec equals the composed asOf on random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowGen = for {
      k <- Gen.choose(0L, 5L)
      t <- Gen.choose(0L, 50L)
    } yield (k, t)
    val prop = Prop.forAll(
      Gen.listOfN(25, rowGen), Gen.listOfN(25, rowGen)) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new Timestamp(t * 1000)) }
        .toDF("id", "k", "ts")
      val right = rs.distinct
        .map { case (k, t) => (k, new Timestamp(t * 1000), k * 1000 + t) }
        .toDF("rk", "rts", "p")
        .groupBy("rk", "rts").agg(max("p").as("p"))
      val viaExec = AsOfJoinPlan.asOfJoin(left, right,
        Seq("k"), Seq("rk"), "ts", "rts")
        .select("id", "p").as[(Long, Option[Long])].collect().toMap
      val viaWindow = TemporalJoins.asOf(left,
        right.select(col("rk").as("k"), col("rts").as("ts"), col("p")),
        Seq("k"), "ts", Seq("p"))
        .select("id", "p").as[(Long, Option[Long])].collect().toMap
      viaExec == viaWindow
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
