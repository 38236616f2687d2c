package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The ss03 plane-count rule: log₂ growth with corpus size, pinned at the
  * minimum across every oracle-scale corpus (so the hash-gated oracle's
  * inlined 4-plane signature stays exact).
  */
class SimilarityScaleSpec extends AnyFunSuite {

  test("plane count pins at 4 through the oracle scales, grows log2 beyond") {
    assert(SimilarityOps.planesFor(500) === 4)    // sf0.001–0.01 corpora
    assert(SimilarityOps.planesFor(5000) === 4)   // sf0.1 corpus
    assert(SimilarityOps.planesFor(65536) === 4)  // pin range upper edge
    assert(SimilarityOps.planesFor(1L << 20) === 8)
    assert(SimilarityOps.planesFor(1L << 30) === 18)
  }

  test("expected bucket occupancy stays bounded once the rule engages") {
    for (n <- Seq(1L << 17, 1L << 20, 1L << 26, 1L << 30, 1L << 36)) {
      val p = SimilarityOps.planesFor(n)
      val expectedOccupancy = n.toDouble / (1L << p)
      assert(expectedOccupancy <= SimilarityOps.TargetBucket.toDouble,
        s"n=$n p=$p occupancy=$expectedOccupancy")
    }
  }
}
