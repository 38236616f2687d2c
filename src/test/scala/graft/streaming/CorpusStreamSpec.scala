package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** st05 behavior on a planted corpus: gates drop low-quality/non-English
  * docs, the state store dedups identical cleaned docs, and the emitted
  * key set is deterministic.
  */
class CorpusStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("st05 gates + state-store dedup emit one fingerprint per distinct doc") {
    import spark.implicits._
    val d = Files.createTempDirectory("corpusstream").toString
    // ~0.5 stopword ratio clears the 0.12 quality gate; "el la de" votes es
    val good = "the cat and the dog in a house of the hill keeps running"
    val tmp = Files.createTempDirectory("corpusstream-w").toString
    Seq(
      (0L, good, "en", "src0", good.length.toLong),
      (1L, good, "en", "src0", good.length.toLong), // exact dup of 0
      (2L, good + " extra tail words", "en", "src0", 70L),
      (3L, "el la de el la de el la de", "es", "src1", 26L)) // language-gated
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    // testdata layout: ONE parquet FILE named documents.parquet (the
    // pathGlobFilter matches leaf file names, not directories)
    val part = Files.list(java.nio.file.Paths.get(tmp)).iterator()
    var moved = false
    while (part.hasNext && !moved) {
      val p = part.next()
      if (p.toString.endsWith(".parquet")) {
        Files.move(p, java.nio.file.Paths.get(d, "documents.parquet"))
        moved = true
      }
    }
    assert(moved, "no parquet part file produced")

    val fps = CorpusStream.queries("st05_stream_clean_corpus")(spark, d)
      .collect().map(_.getString(0))
    assert(fps.length == 2) // docs 0/1 collapse; doc 2 distinct; doc 3 gated
    assert(fps.distinct.length == 2)
    assert(fps.sorted.sameElements(fps)) // deterministic sorted key set
  }
}
