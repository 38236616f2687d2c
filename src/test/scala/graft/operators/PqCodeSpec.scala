package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ss09's PQ encode must be DATA-DEPENDENT. The r10 review found the
  * original codebook grid degenerate (dead per-dimension term + values an
  * order of magnitude above component scale): every corpus vector encoded
  * to one shared code tuple, so the "ANN" output ignored the vectors
  * entirely — and the oracle, mirroring the formula, hashed green. Only a
  * structural spec over the codes frame can hold this property.
  */
class PqCodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("PQ codes vary across the corpus and within each sub-space") {
    val codes = SimilarityOps.pqCodes(
      SimilarityOps.fxEmb(spark, TestSpark.sf0001),
      SimilarityOps.pqCodebook(spark))
    val tuples = codes.groupBy("vec_id")
      .pivot("m", Seq(0, 1, 2, 3)).agg(first(col("code")))
    val nVecs = tuples.count()
    val nTuples = tuples.drop("vec_id").distinct().count()
    // the degenerate codebook gave nTuples == 1 at every scale
    assert(nTuples > 1, s"all $nVecs vectors share one code tuple")
    // stronger: real PQ spreads codes across the codebook — demand at
    // least a quarter of the 256 possible tuples at smoke scale, and
    // every sub-space individually using >1 of its 4 codes
    assert(nTuples >= 16, s"only $nTuples distinct code tuples for $nVecs vectors")
    val perSub = codes.groupBy("m")
      .agg(countDistinct(col("code")).as("k_used"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    (0 to 3).foreach { m =>
      assert(perSub(m) > 1L, s"sub-space $m collapsed to one code")
    }
  }
}
