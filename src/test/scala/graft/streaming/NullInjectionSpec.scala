package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Pins the r14 review wave's latent-null forks in the streaming family —
  * the same injection discipline as the as-of null-ts leg: copy the
  * fixture, plant rows with a null value / ts / event_id, and assert each
  * query's engine-side semantics matches what its oracle would compute
  * (the oracles' filters were aligned in the same commit):
  *
  *  - st07/st13: a null VALUE keeps the event (counts, shapes gaps) and
  *    contributes 0 to session_value — previously the non-nullable Event
  *    encoder ABORTED st07's whole query while st13 kept the row.
  *  - st16: a null-TS event cannot claim to be a user's latest — struct
  *    ordering ranks it below the 1970 seed, so without the filter the
  *    engine kept the seed while the oracle's ROW_NUMBER pick replaced it.
  *  - st17: a null EVENT_ID is no identity to dedup on and the oracle's
  *    COUNT(DISTINCT) never counts NULLs — the stream must not count it
  *    either.
  */
class NullInjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // fixture copy with: (maxId+1, userA, 'click', userA's min ts + 1 s,
  // NULL value), (maxId+2, seedU, 'view', NULL ts, 1.0), and a NULL-id
  // 'view' row at userA's min ts + 2 s. userA is the corpus's first user;
  // seedU is resolved as an eventless customer in st16's seed range.
  private lazy val (tmpDir, userA, userAStart, seedU) = {
    val src = TestSpark.sf0001
    val tmp = Files.createTempDirectory("graft_nullinj").toString
    val ev = Tables(spark, src, "events")
    val maxId = ev.agg(max("event_id")).head.getLong(0)
    val first = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .orderBy("ts", "event_id").select("user_id", "ts").head
    val (ua, uaTs) = (first.getLong(0), first.getTimestamp(1))
    // an EXISTING seed customer (c_custkey in st16's 100-199 window) with
    // no fixture events — at sf0.001 customer stops at 150, so resolve it
    // instead of hardcoding
    val seedUser = Tables(spark, src, "customer")
      .filter(col("c_custkey").between(100, 199))
      .select(col("c_custkey").cast("long").as("u"))
      .join(ev.select(col("user_id").as("u")).distinct(), Seq("u"),
        "left_anti")
      .orderBy("u").head.getLong(0)
    val plusSec = new java.sql.Timestamp(uaTs.getTime + 1000L)
    val plus2 = new java.sql.Timestamp(uaTs.getTime + 2000L)
    val extras = Seq(
      (Some(maxId + 1), ua, "click", Some(plusSec), Option.empty[Double]),
      (Some(maxId + 2), seedUser, "view",
        Option.empty[java.sql.Timestamp], Some(1.0)),
      (Option.empty[Long], ua, "view", Some(plus2), Some(1.0))
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    ev.unionByName(extras, allowMissingColumns = true)
      .write.parquet(s"$tmp/events.parquet")
    // st16 also reads the customer table for its seed rows
    Files.copy(Paths.get(s"$src/customer.parquet"),
      Paths.get(s"$tmp/customer.parquet"), StandardCopyOption.REPLACE_EXISTING)
    (tmp, ua, new java.sql.Timestamp(uaTs.getTime), seedUser)
  }

  private def sessions(q: String, dir: String): Map[(Long, String), (Long, Double)] =
    EventsStream.queries(q)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(3), r.getDouble(4))).toMap

  test("st07: a null-value event is kept (n_events +1) and adds 0 to session_value") {
    val startKey = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss") {
      setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    }.format(userAStart)
    val base = sessions("st07_stream_sessionize", TestSpark.sf0001)
    val got = sessions("st07_stream_sessionize", tmpDir)
    val k = (userA, startKey)
    assert(base.contains(k), s"fixture must close userA's first session ($k)")
    assert(got(k)._1 === base(k)._1 + 2, // null-value + null-id events
      "both injected in-gap events must count")
    assert(got(k)._2 === base(k)._2 + 1.0, // only the null-id row's 1.0
      "the null value must contribute exactly 0")
  }

  test("st13: session_window agrees — events kept, null value sums as 0") {
    val startKey = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss") {
      setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    }.format(userAStart)
    val base = sessions("st13_session_window", TestSpark.sf0001)
    val got = sessions("st13_session_window", tmpDir)
    val k = (userA, startKey)
    assert(base.contains(k))
    assert(got(k)._1 === base(k)._1 + 2)
    assert(got(k)._2 === base(k)._2 + 1.0)
  }

  test("st16: a null-ts event never displaces the seed row") {
    val out = EventsStream.queries("st16_stream_merge_sink")(spark, tmpDir)
      .filter(col("user_id") === seedU).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(1) === "seed", s"null-ts event displaced the seed: $r")
    assert(r.getString(2) === "1970-01-01 00:00:00")
    assert(r.getLong(3) === -1L)
  }

  test("st17: a null-id event is not counted (matches COUNT(DISTINCT) semantics)") {
    def rows(dir: String): Map[(String, String), Long] =
      EventsStream.queries("st17_stream_dedup_agg")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val base = rows(TestSpark.sf0001)
    val got = rows(tmpDir)
    // expected drift: ONLY the null-VALUE row (valid id + ts) adds 1 to
    // its (hour, click) bucket; the null-id and null-ts rows vanish
    val hourKey = {
      val c = java.util.Calendar.getInstance(
        java.util.TimeZone.getTimeZone("UTC"))
      c.setTime(userAStart)
      c.set(java.util.Calendar.MINUTE, 0)
      c.set(java.util.Calendar.SECOND, 0)
      c.set(java.util.Calendar.MILLISECOND, 0)
      new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss") {
        setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      }.format(c.getTime)
    }
    val expected = base + ((hourKey, "click") ->
      (base.getOrElse((hourKey, "click"), 0L) + 1L))
    assert(got === expected)
  }
}
