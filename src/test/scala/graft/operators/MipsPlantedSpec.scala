package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GraftFunctions

/** ss10's norm-augmentation math on a VARIED-NORM planted corpus. The
  * oracle fixture is unit-normalized, so augc = √(M²−‖x‖²) ≈ 0 on every
  * row and the hash gate exercises the augmentation only degenerately — a
  * sign error or operand swap in the 65th-component handling would stay
  * green there (r10 review finding). Here norms span 0.5–3.0, the spec
  * asserts the augmentation actually flips signature bits, and the full
  * kernel is checked bit-for-bit against a driver-side replication.
  */
class MipsPlantedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 64
  private val n = 24

  // deterministic fixture: gaussian directions, norms varied by id
  private val vecs: Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(123)
    (0 until n).map { i =>
      val raw = Array.fill(dim)(rng.nextGaussian())
      val norm = math.sqrt(raw.map(x => x * x).sum)
      val target = 0.5 + (i % 6) * 0.5 // 0.5 .. 3.0
      (i.toLong, raw.map(x => (x / norm * target).toFloat))
    }
  }

  // the engine's double-precision kernel, replicated exactly: floats
  // widened per element, sequential accumulation
  private def dot(a: Array[Float], b: Array[Double], nb: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < nb) { acc += a(i).toDouble * b(i); i += 1 }
    acc
  }
  private def dotFF(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("mipsTopK equals a driver-side replication on a varied-norm corpus") {
    import spark.implicits._
    val e = vecs.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(GraftFunctions.dot_product(col("v"), col("v"))))
    val got = SimilarityOps.mipsTopK(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))

    // reference: same augmentation, same planes, same bucket-and-rerank
    val nrm = vecs.map { case (_, v) => math.sqrt(dotFF(v, v)) }
    val m = nrm.max
    val augc = nrm.map(x => math.sqrt(m * m - x * x))
    val pl = SimilarityOps.planesSeeded(77, SimilarityOps.MinPlanes, 65)
    def sig(v: Array[Float], aug: Double): Int =
      pl.indices.map { p =>
        if (dot(v, pl(p), dim) + pl(p)(dim) * aug > 0) 1 << p else 0
      }.sum
    val corpusSig = vecs.map { case (id, v) => id -> sig(v, augc(id.toInt)) }.toMap
    // the point of the fixture: augmentation must MATTER here
    assert(vecs.exists { case (id, v) => sig(v, augc(id.toInt)) != sig(v, 0.0) },
      "planted norms never flip a signature bit — fixture too tame")
    val expected = (0L until 3L).flatMap { qid =>
      val qSig = sig(vecs(qid.toInt)._2, 0.0)
      vecs.filter { case (id, _) => id != qid && corpusSig(id) == qSig }
        .map { case (id, v) => (id, round6(dotFF(vecs(qid.toInt)._2, v))) }
        .sortBy { case (id, d) => (-d, id) }
        .take(3).zipWithIndex
        .map { case ((id, d), i) => (qid, id, d, i + 1) }
    }
    assert(got.toSeq == expected,
      s"got ${got.toSeq}\nexpected $expected")
    assert(expected.nonEmpty, "no query produced candidates — fixture too sparse")
  }
}
