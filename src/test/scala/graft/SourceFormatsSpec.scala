package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth (SURVEY §2.2 scans/sinks row): the engine
  * reads and writes parquet (primary), ORC, JSON lines, and CSV with
  * identical results — so a reference user can land data in any of them.
  */
class SourceFormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val sample = Tables(spark, TestSpark.sf0001, "orders")
    .filter(col("o_orderkey") <= 500)
    // CSV cannot carry timestamps losslessly without format config; use an
    // ISO string column for the cross-format comparison
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
      col("o_orderstatus"), col("o_totalprice").cast("double"),
      col("order_date"))
      .collect().map(_.toString).toSet

  test("parquet / orc / json / csv round-trip identically") {
    val base = Files.createTempDirectory("formats").toString
    val expected = canon(sample)
    assert(expected.nonEmpty)

    sample.write.parquet(s"$base/p")
    assert(canon(spark.read.parquet(s"$base/p")) == expected)

    sample.write.orc(s"$base/o")
    assert(canon(spark.read.orc(s"$base/o")) == expected)

    sample.write.json(s"$base/j")
    assert(canon(spark.read.json(s"$base/j")) == expected)

    sample.write.option("header", "true").csv(s"$base/c")
    assert(canon(spark.read.options(Map("header" -> "true",
      "inferSchema" -> "true")).csv(s"$base/c")) == expected)
  }

  test("compressed text sources: gzip csv reads transparently") {
    val base = Files.createTempDirectory("gz").toString
    sample.write.option("header", "true").option("compression", "gzip")
      .csv(s"$base/gz")
    val files = new java.io.File(s"$base/gz").listFiles()
      .filter(_.getName.endsWith(".csv.gz"))
    assert(files.nonEmpty, "expected gzip-compressed part files")
    assert(canon(spark.read.options(Map("header" -> "true",
      "inferSchema" -> "true")).csv(s"$base/gz")) == canon(sample))
  }
}
