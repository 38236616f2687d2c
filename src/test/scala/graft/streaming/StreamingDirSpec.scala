package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** File-stream sources must read a table that is a DIRECTORY of part files
  * — the only layout that exists at production scale — identically to the
  * single-file fixture layout. The old `pathGlobFilter` recipe matched only
  * a file literally named `events.parquet`, so a directory layout streamed
  * ZERO rows and every streaming query "succeeded" on an empty stream (the
  * r11 10× rehearsal's streaming column: 0.2 s across the board).
  */
class StreamingDirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val src = TestSpark.sf0001

  private lazy val dirLayout: String = {
    val d = java.nio.file.Files.createTempDirectory("sdir").toString
    // same rows, directory-of-part-files layout
    spark.read.parquet(s"$src/events.parquet").repartition(3)
      .write.parquet(s"$d/events.parquet")
    spark.read.parquet(s"$src/documents.parquet").repartition(3)
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def dump(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("events stream: directory layout equals single-file layout (st04)") {
    val single = dump(
      EventsStream.queries("st04_stream_stream_join")(spark, src))
    val multi = dump(
      EventsStream.queries("st04_stream_stream_join")(spark, dirLayout))
    assert(single.nonEmpty, "fixture must produce rows")
    assert(multi === single)
  }

  test("documents stream: directory layout equals single-file layout (st05)") {
    val single = dump(
      CorpusStream.queries("st05_stream_clean_corpus")(spark, src))
    val multi = dump(
      CorpusStream.queries("st05_stream_clean_corpus")(spark, dirLayout))
    assert(single.nonEmpty, "fixture must produce rows")
    assert(multi === single)
  }
}
