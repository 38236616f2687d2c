package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Empty-blob edge semantics for the media kernels and the quality model —
  * the frozen fixture's shortest document is 47 chars, so only a fixture
  * with a zero-length document can pin these (r10 review: under ANSI the
  * old paths DIED — element_at on mm04's empty resize array, div-by-zero
  * on tx17's n_chars — or silently forked the oracle's NULLs with 0/NaN).
  */
class MultimodalEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mmedge").toString
    Seq(
      (0L, "", "en", "src0", 0L),
      (1L, "the quick brown fox. jumps!", "en", "src0", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("mm02: empty blob decodes to seed hash + NULL f0 (not 0.0)") {
    val r = Multimodal.queries("mm02_decode_features")(spark, dir)
      .orderBy("doc_id").collect()
    assert(r.length === 2)
    assert(r(0).getInt(1) === 0 && r(0).getInt(2) === 1)
    // empty frame reduces to the bare seed on both engines
    assert(r(0).getLong(3) === 1125899906842597L)
    assert(r(0).isNullAt(4), "f0 must be NULL for an empty blob")
    assert(!r(1).isNullAt(4))
  }

  test("mm04: empty blob yields NULL boundary cells, no ANSI abort") {
    val r = Multimodal.queries("mm04_resize")(spark, dir)
      .orderBy("doc_id").collect()
    assert(r.length === 2)
    assert(r(0).getInt(2) === 0)
    assert(r(0).isNullAt(3) && r(0).isNullAt(4))
    assert(!r(1).isNullAt(3) && !r(1).isNullAt(4))
  }

  test("mm05: zero-length recording emits NO windows (not a NaN rms row)") {
    val r = Multimodal.queries("mm05_audio_windows")(spark, dir).collect()
    assert(r.forall(_.getLong(0) == 1L), r.mkString(","))
    assert(r.nonEmpty && r.forall(!_.isNullAt(4)))
  }

  test("tx17: empty doc gets NULL punct_micro/logit, not a DIVIDE_BY_ZERO") {
    val r = TextOps.queries("tx17_quality_model")(spark, dir)
      .orderBy("doc_id").collect()
    assert(r.length === 2)
    assert(r(0).isNullAt(2) && r(0).isNullAt(4),
      "punct_micro and logit must be NULL on n_chars = 0: " + r(0))
    assert(!r(1).isNullAt(2) && !r(1).isNullAt(4))
  }

  test("null-text doc is outside the decode domain: dropped, not an NPE") {
    // contract (r10 ADVICE): a NULL blob is not decodable media — the
    // decode plumbing filters it (fakeDecode would NPE on bytes.length)
    // and the oracle mirror applies the same text IS NOT NULL, so both
    // engines agree. mm01 (pure expressions, no decode) keeps the row
    // with NULL metadata on both sides.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mmnull").toString
    Seq(
      (0L, Some("the quick brown fox"), "en", "s", 19L),
      (1L, None: Option[String], "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val decodedRows = Multimodal.queries("mm02_decode_features")(spark, d)
      .collect()
    assert(decodedRows.map(_.getLong(0)).toSeq === Seq(0L),
      "null-text row must be dropped by the decode path")
    val meta = Multimodal.queries("mm01_binary_meta")(spark, d)
      .orderBy("doc_id").collect()
    assert(meta.length === 2)
    assert(meta(1).isNullAt(1) && meta(1).isNullAt(3),
      "mm01 keeps the null-text row with NULL metadata: " + meta(1))
  }

  test("mm06: empty embeddings table returns empty pairs, not an ANSI abort") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mmedge6").toString
    Seq((0L, "a", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    assert(Multimodal.queries("mm06_pair_negatives")(spark, d).count() === 0L)
  }
}
