package graft

import org.scalatest.funsuite.AnyFunSuite

/** The INT64 TIMESTAMP(NANOS) events vintage, END TO END — not just schema
  * inference. The fixture (`src/test/resources/fixtures/nanos`, written
  * with a nanosecond-timestamp writer; Spark cannot produce one itself)
  * pins two defects the frozen µs fixture can never see (r11 review):
  *
  *  1. the legacy `nanosAsLong` conf was restored right after the eager
  *     schema read, but the parquet EXECUTION path re-reads the session
  *     conf when the scan is built — so the very vintage the scoping
  *     existed for crashed at collect() with "Illegal Parquet type";
  *  2. `ts div 1000` truncates toward zero, so pre-epoch nanos rounded UP
  *     a microsecond instead of flooring onto the µs containing the
  *     instant (-1500 ns lies in µs −2, not −1).
  */
class TablesNanosSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "src/test/resources/fixtures/nanos"

  test("nanos events EXECUTE (schema-scoped conf must also cover the scan)") {
    val rows = Tables.events(spark, dir).orderBy("event_id").collect()
    assert(rows.length === 3)
    assert(Tables.events(spark, dir).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("nanos→µs conversion floors (pre-epoch instants land in the µs containing them)") {
    val micros = Tables.events(spark, dir).orderBy("event_id")
      .selectExpr("unix_micros(ts) AS us").collect().map(_.getLong(0)).toSeq
    assert(micros === Seq(-2L, 1L, 1699999999123456L))
  }

  test("the nanos conf does not leak into the caller's session") {
    Tables.events(spark, dir).collect()
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .forall(_ == "false"))
  }
}
