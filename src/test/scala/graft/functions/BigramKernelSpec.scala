package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Pins [[WordBigrams]] (the r21 codegen bigram-pair kernel) bit-identical
  * to the SQL formulation it replaced — CorpusFilters' ONE bigram-pair
  * spelling: `transform(sequence(1, size(w) - 1),
  * i -> struct(w[i-1] AS a, w[i] AS b))` — over the REAL corpus and the
  * null-element edges, on the callers' domain (tx20/tx22 both filter
  * `size(w) >= 2` before building pairs; below 2 tokens the SQL form's
  * sequence steps downward into ANSI-erroring negative subscripts, so the
  * kernel's empty answer there is a defined superset, asserted directly).
  */
class BigramKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sqlForm = expr(graft.operators.CorpusFilters.bigramPairsSql)

  test("kernel == SQL formulation over the real corpus (size >= 2 domain)") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
      .filter(col("text").isNotNull)
      .select(split(lower(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val mismatches = docs.select(
      GraftFunctions.word_bigrams(col("w")).as("k"), sqlForm.as("s"))
      .filter(not(col("k") <=> col("s")))
      .count()
    assert(mismatches == 0L, "kernel diverged from the SQL form")
  }

  test("kernel edge cases: exact pair, null elements, null array, short docs") {
    import spark.implicits._
    // on the callers' domain (>= 2 tokens) the kernel must equal the SQL
    // form including null elements passing through as null struct fields
    val domain = Seq(
      Seq("a", "b"),
      Seq("a", "b", "c", "b", "a"),
      Seq[String]("a", null, "b"),
      Seq[String](null, null)).toDF("w")
    val rows = domain.select(
      GraftFunctions.word_bigrams(col("w")).as("k"), sqlForm.as("s"))
      .collect()
    rows.foreach(r => assert(r.get(0) == r.get(1), r.toString))
    // null array -> null, exactly like transform over a null sequence
    val nullArr = Seq(null.asInstanceOf[Seq[String]]).toDF("w")
      .select(GraftFunctions.word_bigrams(col("w")).as("k")).collect()(0)
    assert(nullArr.isNullAt(0))
    // below the domain the SQL form is not total (negative subscripts
    // error under ANSI); the kernel answers the empty pair list
    val short = Seq(Seq.empty[String], Seq("a")).toDF("w")
      .select(GraftFunctions.word_bigrams(col("w")).as("k")).collect()
    short.foreach(r => assert(r.getSeq[Any](0).isEmpty))
  }
}
