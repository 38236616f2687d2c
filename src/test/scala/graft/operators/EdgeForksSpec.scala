package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The r11 review's fixture-dormant divergence forks, pinned on degenerate
  * fixtures the frozen testdata never carries (probed against DuckDB before
  * fixing — each assertion below is the value BOTH engines now produce):
  * an empty embedding aborted q21; control-char-padded JSON integers
  * counted in q22 on Spark only; a negative user_id made q53's shiftleft
  * silently set a masked high bit where the oracle errors; one malformed
  * props row aborted vr01 wholesale, and a fractional k truncated on Spark
  * while the oracle rounded.
  */
class EdgeForksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("edgeforks").toString
    Seq(
      (1L, "2024-01-15 10:00:00", -5L, "click", 1.0, """{"k": 2.7}"""),
      (2L, "2024-01-15 10:10:00", 3L, "click", 2.0, """{"k": "\t7"}"""),
      (3L, "2024-01-15 10:20:00", 4L, "click", 3.0, "oops"),
      (4L, "2024-01-15 10:30:00", 5L, "click", 4.0, """{"k": 10}"""))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("tss").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(s"$d/events.parquet")
    Seq(
      (0L, Array.empty[Float], 0),
      (1L, Array(3f, 1f, 2f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("q21: an empty embedding yields NULL boundary cells, not an abort") {
    val r = Relational.queries("q21_array_funcs")(spark, dir)
      .orderBy("vec_id").collect()
    assert(r.length === 2)
    assert(r(0).getInt(1) === 0)
    assert(r(0).isNullAt(2) && r(0).isNullAt(3),
      s"empty vector must produce NULL e_first/e_last: ${r(0)}")
    assert(r(1).getDouble(2) === 3.0 && r(1).getDouble(3) === 2.0)
  }

  test("q22: control-char-padded k is rejected like the oracle's space-trim gate") {
    val r = Relational.queries("q22_json_funcs")(spark, dir).collect()
    assert(r.length === 1)
    // only 2.7 (non-integer regex-fail), "\t7" (control char), "oops"
    // (invalid json) are rejected; k=10 survives
    assert(r(0).getLong(1) === 4L) // n counts all rows
    assert(r(0).getDouble(2) === 10.0 && r(0).getInt(3) === 10)
  }

  test("q53: negative user_id masks via pmod, never a negative shift count") {
    val r = Relational5.queries("q53_bit_aggs")(spark, dir).collect()
    assert(r.length === 1)
    val mask = r(0).getLong(2)
    // buckets: pmod(-5,32)=27, 3, 4, 5 — and NEVER bit 59 (the Java-masked
    // 1L << -5 the old % produced)
    assert(mask === ((1L << 27) | (1L << 3) | (1L << 4) | (1L << 5)), mask)
    assert((mask & (1L << 59)) === 0L)
    assert(r(0).getInt(3) === 4)
  }

  test("vr01: malformed props is contained to its row; fractional k truncates") {
    val r = Relational5.queries("vr01_variant")(spark, dir).collect()
    assert(r.length === 1)
    // k: 2.7→2 (truncated, both engines probed), "\t7"→7 (string→int cast),
    // oops→NULL (contained), 10→10
    assert(r(0).getLong(1) === 3L, s"n_k: ${r(0)}")
    assert(r(0).getLong(2) === 19L, s"sum_k: ${r(0)}")
    assert(r(0).getInt(3) === 10)
  }
}
