package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Near-dup detectors on a corpus with planted duplicates. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("dedup").toString
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src0", base.length.toLong), // exact dup of 0
      (2L, base.replace("lazy", "sleepy"), "en", "src1", base.length.toLong), // near-dup
      (3L, "completely different content about spark query engines and shuffles here",
        "en", "src2", 70L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("exact dedup groups verbatim copies (dd01)") {
    val rows = TextOps.queries("dd01_dedup_exact")(spark, dir).collect()
    assert(rows.length == 3) // 4 docs, one duplicated
    val dupGroup = rows.find(_.getLong(0) == 0L).get
    assert(dupGroup.getLong(1) == 2L)
  }

  test("minhash LSH finds the exact pair with est_jaccard 1.0 and the near pair (dd02)") {
    val pairs = MinHashDedup.queries("dd02_minhash_lsh")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    pairs.get((0L, 2L)).foreach(j => assert(j > 0.4 && j < 1.0))
    assert(!pairs.contains((0L, 3L)) || pairs((0L, 3L)) < 0.3)
  }

  test("simhash: identical docs at hamming 0, near-dups closer than unrelated (dd03)") {
    val rows = MinHashDedup.queries("dd03_simhash")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(rows((0L, 1L)) == 0)
    rows.get((0L, 2L)).foreach { near =>
      rows.get((0L, 3L)).foreach(far => assert(near < far))
    }
  }

  test("word jaccard: dup pair = 1.0, near pair high, unrelated low (dd04)") {
    val rows = TextOps.queries("dd04_word_jaccard")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows((0L, 1L)) == 1.0)
    assert(rows((0L, 2L)) > 0.7)
    assert(rows((0L, 3L)) < 0.2)
  }
}
