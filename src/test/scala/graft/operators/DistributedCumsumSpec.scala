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
}
