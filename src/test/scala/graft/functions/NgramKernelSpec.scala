package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Pins [[WordNgrams]] (the r20 codegen n-gram kernel) bit-identical to
  * the SQL formulation it replaced — the suite's ONE n-gram spelling:
  * `transform(sequence(1, greatest(size(w) - n + 1, 1)),
  * i -> concat_ws(' ', slice(w, i, n)))` — over the REAL corpus and the
  * edge cases the floor/clamp/skip semantics exist for. dc01/tx10 and
  * the shingle family are oracle-gated end-to-end on top of this.
  */
class NgramKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sqlForm(wordsCol: String, n: Int) =
    expr(s"""transform(sequence(1, greatest(size($wordsCol) - ${n - 1}, 1)),
            | i -> concat_ws(' ', slice($wordsCol, i, $n)))""".stripMargin)

  test("kernel == SQL formulation over the real corpus, n = 2/3/5") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
      .filter(col("text").isNotNull)
      .select(split(col("text"), " ").as("w"))
    Seq(2, 3, 5).foreach { n =>
      val mismatches = docs.select(
        GraftFunctions.word_ngrams(col("w"), n).as("k"),
        sqlForm("w", n).as("s"))
        .filter(not(col("k") <=> col("s")))
        .count()
      assert(mismatches == 0L, s"n=$n: kernel diverged from SQL form")
    }
  }

  test("kernel edge cases: short doc, exact length, empty, null elements, null array") {
    import spark.implicits._
    val df = Seq(
      Seq("a"),                      // shorter than n -> one partial gram
      Seq("a", "b", "c"),            // exactly n for n=3
      Seq.empty[String],             // empty -> single empty-string gram
      // null array -> the single empty-string gram [''] on BOTH sides
      // (greatest skips the null size, concat_ws over a null slice is '');
      // NOT null — WordNgrams.nullable = false is load-bearing for
      // dc01/tx10 parity (r20 ADVICE: the old comment here invited a
      // "fix" to return NULL, which would break it)
      null.asInstanceOf[Seq[String]]
    ).toDF("w")
    Seq(1, 3).foreach { n =>
      val rows = df.select(
        GraftFunctions.word_ngrams(col("w"), n).as("k"),
        sqlForm("w", n).as("s"))
        .collect()
      rows.foreach { r =>
        assert(!r.isNullAt(0) && !r.isNullAt(1),
          "both forms are total: the null-array answer is [''], never null")
        assert(r.getSeq[String](0) == r.getSeq[String](1))
      }
    }
    // null ELEMENTS are skipped like concat_ws (split never produces
    // them, but the kernel must not diverge if a caller's array does)
    val withNulls = Seq(Seq[String]("a", null, "b", "c")).toDF("w")
    val r = withNulls.select(
      GraftFunctions.word_ngrams(col("w"), 3).as("k"),
      sqlForm("w", 3).as("s")).collect()(0)
    assert(r.getSeq[String](0) == r.getSeq[String](1))
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
  }

  test("tx10's sort: sort_array == array_sort on never-null gram arrays") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
      .filter(col("text").isNotNull)
      .select(GraftFunctions.word_ngrams(
        split(lower(col("text")), " "), 2).as("bg"))
    val diff = docs.select(sort_array(col("bg")).as("a"),
      array_sort(col("bg")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0L)
  }
}
