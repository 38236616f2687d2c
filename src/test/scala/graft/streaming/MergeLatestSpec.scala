package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit coverage for [[EventsStream.mergeLatest]]'s core claims (ADVICE r7:
  * st16's end-to-end run processes the corpus as ONE micro-batch, so the
  * multi-batch/reorder paths were never exercised in isolation): max-wins
  * on late batches, tie keeps the current row, idempotent replay, and
  * batch-only / cur-only key passthrough.
  */
class MergeLatestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(rows: Seq[(Long, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "last_type", "last_ts", "last_event_id")
  }

  private def merged(cur: Seq[(Long, String, String, Long)],
      batch: Seq[(Long, String, String, Long)]) =
    EventsStream.mergeLatest(frame(cur), frame(batch))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet

  private val base = (1L, "view", "2024-05-01 10:00:00", 100L)

  test("an older-only late batch never regresses the current row") {
    val older = (1L, "click", "2024-05-01 09:00:00", 50L)
    assert(merged(Seq(base), Seq(older)) == Set(base))
  }

  test("a newer batch row wins") {
    val newer = (1L, "purchase", "2024-05-01 11:00:00", 200L)
    assert(merged(Seq(base), Seq(newer)) == Set(newer))
  }

  test("equal (ts, event_id) keeps the current row — replay is idempotent") {
    val replay = (1L, "replayed-type", base._3, base._4)
    // same sort key, different payload: current row must survive
    assert(merged(Seq(base), Seq(replay)) == Set(base))
    // exact replay of the whole row is a no-op
    assert(merged(Seq(base), Seq(base)) == Set(base))
  }

  test("event_id breaks ts ties: higher id wins, lower loses") {
    val higherId = (1L, "tie-hi", base._3, 101L)
    val lowerId = (1L, "tie-lo", base._3, 99L)
    assert(merged(Seq(base), Seq(higherId)) == Set(higherId))
    assert(merged(Seq(base), Seq(lowerId)) == Set(base))
  }

  test("batch-only keys insert; cur-only keys survive untouched") {
    val other = (2L, "signup", "2024-05-01 08:00:00", 10L)
    assert(merged(Seq(base), Seq(other)) == Set(base, other))
    assert(merged(Seq(base, other), Seq.empty) == Set(base, other))
    assert(merged(Seq.empty, Seq(other)) == Set(other))
  }

  test("sub-second ordering wins over a higher event_id (native-timestamp key)") {
    // the r10 review's latent regression: a second-truncated STRING key
    // ties 10:00:00.900 with 10:00:00.100 and falls to the id tiebreak,
    // letting the chronologically older event (higher ingestion id) win.
    // st16 stores last_ts as a native timestamp, where .900 > .100 decides
    // before ids are consulted.
    import org.apache.spark.sql.functions.{col, to_timestamp}
    def tsFrame(rows: Seq[(Long, String, String, Long)]) = {
      import spark.implicits._
      rows.toDF("user_id", "last_type", "raw_ts", "last_event_id")
        .select(col("user_id"), col("last_type"),
          to_timestamp(col("raw_ts")).as("last_ts"), col("last_event_id"))
    }
    val newerTsLowerId = (1L, "new", "2024-05-01 10:00:00.900", 500L)
    val olderTsHigherId = (1L, "old", "2024-05-01 10:00:00.100", 700L)
    val out = EventsStream.mergeLatest(
      tsFrame(Seq(newerTsLowerId)), tsFrame(Seq(olderTsHigherId)))
      .select(col("user_id"), col("last_type"), col("last_event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "new", 500L)),
      s"older sub-second event must not win: $out")
  }

  test("multi-batch sequence is order-insensitive: any arrival order of the same batches converges") {
    val b1 = Seq((1L, "a", "2024-05-01 09:00:00", 1L),
      (2L, "b", "2024-05-01 09:30:00", 2L))
    val b2 = Seq((1L, "c", "2024-05-01 11:00:00", 9L))
    val b3 = Seq((2L, "d", "2024-05-01 08:00:00", 1L)) // older for user 2
    def apply(batches: Seq[Seq[(Long, String, String, Long)]]) =
      batches.foldLeft(frame(Seq.empty)) { (cur, b) =>
        EventsStream.mergeLatest(cur, frame(b))
      }.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    val expected = Set((1L, "c", "2024-05-01 11:00:00", 9L),
      (2L, "b", "2024-05-01 09:30:00", 2L))
    assert(apply(Seq(b1, b2, b3)) == expected)
    assert(apply(Seq(b3, b2, b1)) == expected)
    assert(apply(Seq(b2, b1, b3)) == expected)
  }
}
