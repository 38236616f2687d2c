package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The shared prefix-sum primitive vs the single-task window it replaces:
  * identical cums on any axis, INCLUDING a null value row (nulls-first,
  * Spark's ASC order — the inner pid join used to silently drop it while
  * the grand total still counted its freq; r10 review).
  */
class DistributedCumsumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(rows: Seq[(Option[Long], Long)]): Unit = {
    import spark.implicits._
    val counts = rows.toDF("v", "f")
    val got = DistributedCumsum.cumulative(counts, "v", "f")
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2)))
    val n = rows.map(_._2).sum
    // oracle: nulls first, then ascending value — inclusive running total
    val sorted = rows.sortBy { case (v, _) => (v.isDefined, v.getOrElse(0L)) }
    val expect = sorted.scanLeft(0L)(_ + _._2).tail
      .zip(sorted).map { case (c, (v, _)) => (v, c, n) }
    assert(got.sortBy { case (v, _, _) => (v.isDefined, v.getOrElse(0L)) }
      .toSeq === expect)
  }

  test("matches the sorted prefix sum on a plain axis") {
    check(Seq(Some(10L) -> 3L, Some(20L) -> 1L, Some(5L) -> 2L,
      Some(40L) -> 5L, Some(11L) -> 7L))
  }

  test("a null value row cums FIRST and reaches the grand total") {
    check(Seq(Some(10L) -> 3L, None -> 100L, Some(20L) -> 1L,
      Some(5L) -> 2L))
  }

  test("all-null axis degenerates cleanly") {
    check(Seq(None -> 4L))
  }

  test("single-value axis (hi = lo + 1 guard)") {
    check(Seq(Some(7L) -> 9L))
  }

  test("an axis past 2^53 stays exact (integer DIV, not double division) — r14") {
    // with Column `/` the double quotient for v = 2^53 over hi-lo = 2^53+1
    // rounds to exactly `buckets`, minting a phantom P+1th bucket; DIV is
    // exact and the cum must still be the plain prefix sum
    check(Seq(Some(0L) -> 1L, Some(1L << 53) -> 2L))
  }

  test("buckets knob is validated: 0, negative, and oversized fail fast (r14)") {
    import spark.implicits._
    val counts = Seq((1L, 1L)).toDF("v", "f")
    intercept[IllegalArgumentException] {
      DistributedCumsum.cumulative(counts, "v", "f", buckets = 0)
    }
    intercept[IllegalArgumentException] {
      DistributedCumsum.cumulative(counts, "v", "f", buckets = -4)
    }
    intercept[IllegalArgumentException] {
      DistributedCumsum.cumulative(counts, "v", "f", buckets = 1000)
    }
  }
}
