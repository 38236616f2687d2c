package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOf picks latest right row at-or-before each left ts, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")), // before any right row for key 20
      (4L, 30L, ts("2024-01-01 09:00:00"))  // key with no right rows at all
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 100L),
      (10L, ts("2024-01-01 10:00:00"), 101L), // equal ts → counts (<=)
      (10L, ts("2024-01-01 11:00:00"), 102L),
      (20L, ts("2024-01-01 09:30:00"), 200L)
    ).toDF("k", "ts", "payload")

    val out = TemporalJoins.asOf(left, right, Seq("k"), "ts", Seq("payload"))
      .orderBy("id")
      .select("id", "payload")
      .as[(Long, Option[Long])].collect().toSeq

    assert(out === Seq(
      (1L, Some(101L)), // equal-ts right row wins over the 09:30 one
      (2L, Some(102L)),
      (3L, None),
      (4L, None)))
  }

  test("asOf ignores null-ts right rows (they satisfy no <= comparison)") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      (10L, Option.empty[Timestamp], 666L), // must never match
      (10L, Some(ts("2024-01-01 09:00:00")), 1L)
    ).toDF("k", "ts", "p")
    val out = TemporalJoins.asOf(left, right, Seq("k"), "ts", Seq("p"))
      .select("id", "p").as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq((1L, Some(1L))))
  }

  test("asOf null keys never match — left emits nulls, right is dropped") {
    // join-predicate semantics: null = null is NOT a match (DuckDB ASOF,
    // AsOfJoinExec). Window partitioning groups nulls together, so without
    // the right-side null-key filter the 666 payload would leak through.
    val left = Seq(
      (1L, Option.empty[Long], ts("2024-01-01 10:00:00")),
      (2L, Some(10L), ts("2024-01-01 10:00:00"))
    ).toDF("id", "k", "ts")
    val right = Seq(
      (Option.empty[Long], ts("2024-01-01 09:00:00"), 666L), // null key
      (Some(10L), ts("2024-01-01 09:00:00"), 1L)
    ).toDF("k", "ts", "p")
    val out = TemporalJoins.asOf(left, right, Seq("k"), "ts", Seq("p"))
      .orderBy("id").select("id", "p")
      .as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq((1L, None), (2L, Some(1L))))
  }

  test("null-ts LEFT rows (purchases) are dropped by aj01/aj02/aj03 — both-side " +
    "null-ts filter semantics (r13 co-edit, left leg spec-pinned r14)") {
    // The as-of contract is undefined for a missing timestamp and the
    // engines disagree about it (DuckDB ASOF sorts a NULL ts as +infinity;
    // the Spark kernels would give a null-ts purchase no match and drop a
    // null-ts signup), so purchasesAndSignups filters BOTH sides and the
    // oracle CTEs carry the same filter. The right-side legs are pinned
    // above; this leg injects a null-ts PURCHASE (and a null-ts signup)
    // into a copy of the fixture and asserts all three as-of queries —
    // window kernel (aj01), custom AsOfJoinExec (aj02), tolerance (aj03) —
    // emit exactly the un-injected output: the injected rows are invisible,
    // not matched-as-latest and not null-matched.
    import org.apache.spark.sql.functions.{col, lit, max}
    val src = graft.TestSpark.sf0001
    val tmp = java.nio.file.Files.createTempDirectory("graft_nullts").toString
    val ev = graft.Tables(spark, src, "events")
    val maxId = ev.agg(max("event_id")).head.getLong(0)
    val someUser = ev.filter(col("event_type") === "purchase")
      .select("user_id").head.getLong(0)
    val extras = Seq(
      (maxId + 1, someUser, "purchase"),
      (maxId + 2, someUser, "signup")
    ).toDF("event_id", "user_id", "event_type")
      .withColumn("ts", lit(null).cast("timestamp"))
    ev.unionByName(extras, allowMissingColumns = true)
      .write.parquet(s"$tmp/events.parquet")
    try {
      for (q <- Seq("aj01_asof_join", "aj02_asof_exec", "aj03_asof_tolerance")) {
        val base = TemporalJoins.queries(q)(spark, src).collect().toSeq
        val injected = TemporalJoins.queries(q)(spark, tmp).collect().toSeq
        assert(injected === base, s"$q output changed under null-ts injection")
        assert(!injected.exists(_.getLong(0) > maxId),
          s"$q emitted an injected null-ts purchase")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("asOf plan is one shuffle + window — no join operator") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq((10L, ts("2024-01-01 09:30:00"), 5L)).toDF("k", "ts", "p")
    val plan = TemporalJoins.asOf(left, right, Seq("k"), "ts", Seq("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"))
  }

  test("asOf property: equals brute-force latest-at-or-before on random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowGen = for {
      k <- Gen.choose(0L, 5L)
      t <- Gen.choose(0L, 50L)
    } yield (k, t)
    val prop = Prop.forAll(
      Gen.listOfN(30, rowGen), Gen.listOfN(30, rowGen)) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new Timestamp(t * 1000)) }
      val right = rs.distinct.zipWithIndex
        .map { case ((k, t), i) => (k, new Timestamp(t * 1000), i.toLong) }
      val leftDf = left.toDF("id", "k", "ts")
      // one payload per (k, ts) so the expected answer is unique
      val rightDf = right.toDF("k", "ts", "p")
        .groupBy("k", "ts").agg(org.apache.spark.sql.functions.max("p").as("p"))
      val got = TemporalJoins.asOf(leftDf, rightDf, Seq("k"), "ts", Seq("p"))
        .select("id", "p").as[(Long, Option[Long])].collect().toMap
      val dedupedRight = right.groupBy(r => (r._1, r._2))
        .map { case (kt, vs) => (kt._1, kt._2, vs.map(_._3).max) }
      val expected = left.map { case (id, k, t) =>
        val cands = dedupedRight.filter(r => r._1 == k && !r._2.after(t))
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(_._2.getTime)._3))
      }.toMap
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("asOf tolerance masks matches older than the window, keeps the rest") {
    import org.apache.spark.sql.functions.{col, expr}
    val out = TemporalJoins.queries("aj03_asof_tolerance")(
      spark, graft.TestSpark.sf0001)
    val base = TemporalJoins.queries("aj01_asof_join")(
      spark, graft.TestSpark.sf0001)
    // same row set as the un-toleranced as-of (left semantics preserved)
    assert(out.count() === base.count())
    // every surviving match is within the 1 h window
    val violations = out.filter(col("signup_ts").isNotNull &&
      col("signup_ts").cast("timestamp") <
        col("ts").cast("timestamp") - expr("INTERVAL 1 HOUR")).count()
    assert(violations === 0L)
    // the tolerance is not a no-op: some aj01 matches fall outside 1 h
    val masked = base.filter(col("signup_id").isNotNull).count() -
      out.filter(col("signup_id").isNotNull).count()
    assert(masked > 0L, "expected at least one match older than 1 h")
  }

  test("ts01 gap rows carry the last observed value forward, unchanged") {
    val out = TemporalJoins.queries("ts01_gap_fill")(
      spark, graft.TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        { assert(!r.isNullAt(3), s"unfilled row $r"); r.getDouble(3) }))
    assert(out.nonEmpty)
    assert(out.exists(_._3 == 0), "expected at least one gap hour")
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._3 == 1, "spine must start at an observed hour")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          if (b._3 == 0) assert(b._4 == a._4, s"gap row changed value: $a -> $b")
        case _ =>
      }
    }
  }

  test("range join counts only in-window purchases; zero-match rows kept") {
    val q = TemporalJoins.queries("rj01_range_join")
    val out = q(spark, graft.TestSpark.sf0001)
    // every error event appears exactly once (left-join semantics)
    val errs = graft.Tables(spark, graft.TestSpark.sf0001, "events")
      .filter($"event_type" === "error").count()
    assert(out.count() === errs)
  }

  test("aj04 nearest: direction consistent with timestamps, ties backward") {
    val rows = TemporalJoins.queries("aj04_asof_nearest")(
      spark, graft.TestSpark.sf0001).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val t = r.getString(2)
      Option(r.getString(5)) match {
        case Some("backward") => assert(r.getString(3) <= t)
        case Some("forward")  => assert(r.getString(3) > t)
        case Some(other)      => fail(s"unexpected direction $other")
        case None => assert(r.isNullAt(3) && r.isNullAt(4))
      }
    }
    // a backward pick at distance d implies no forward signup closer than d
    // and vice versa — verified against the raw signup set per user
    val signups = graft.Tables(spark, graft.TestSpark.sf0001, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "signup")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val t = fmt.parse(r.getString(2)).getTime / 1000
      val n = fmt.parse(r.getString(3)).getTime / 1000
      val best = signups(r.getLong(1)).map(s => math.abs(s - t)).min
      assert(math.abs(n - t) === best,
        s"picked distance ${math.abs(n - t)} but best is $best")
    }
  }
}
