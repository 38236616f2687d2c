package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the bounded bottom-k aggregator. tx08/tx12's
  * de-skewed sampling is only correct if partial aggregation commutes: any
  * partitioning of the input, reduced per partition and merged in any
  * order, must equal the global sorted-take-k. (This is exactly what Spark
  * assumes when it runs the Aggregator map-side.) Raw ScalaCheck driven
  * from scalatest, as in PropertySpec.
  */
class BottomKPerKeyPropSpec extends AnyFunSuite {

  private def check(name: String, p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val entryGen: Gen[(String, Long)] = for {
    h <- Gen.stringOfN(4, Gen.alphaNumChar)
    v <- Gen.chooseNum(0L, 50L)
  } yield (h, v)

  private def global(k: Int, xs: List[(String, Long)]): Seq[(String, Long)] =
    xs.sortBy(identity).take(k)

  test("reduce-then-merge over any split equals global sorted take-k") {
    check("split-invariance", Prop.forAll(
      Gen.listOf(entryGen), Gen.chooseNum(1, 8)) {
      (xs: List[(String, Long)], k: Int) =>
        val agg = BottomKPerKey.BottomK(k)
        // arbitrary 3-way split (deterministic by hash)
        val parts = xs.groupBy(e => math.abs(e.hashCode) % 3).values.toList
        val reduced = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = reduced.foldLeft(agg.zero)(agg.merge)
        agg.finish(merged) == global(k, xs)
    })
  }

  test("merge is order-insensitive and equals the global answer") {
    check("merge-commutativity", Prop.forAll(
      Gen.listOf(entryGen), Gen.listOf(entryGen), Gen.chooseNum(1, 6)) {
      (a: List[(String, Long)], b: List[(String, Long)], k: Int) =>
        val agg = BottomKPerKey.BottomK(k)
        val ra = a.foldLeft(agg.zero)(agg.reduce)
        val rb = b.foldLeft(agg.zero)(agg.reduce)
        agg.finish(agg.merge(ra, rb)) == agg.finish(agg.merge(rb, ra)) &&
          agg.finish(agg.merge(ra, rb)) == global(k, a ++ b)
    })
  }
}
