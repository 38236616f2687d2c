package graft

import org.scalatest.funsuite.AnyFunSuite

/** Failure honesty of the bench harness: a deliberately broken query must
  * land in the error map — never as a timing — so a crash can't masquerade
  * as a fast run in BENCH_rN deltas.
  */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a throwing query is reported as an error, not a timing") {
    val queries: Map[String, Bench.Q] = Map(
      "good" -> ((s, _) => s.range(10).toDF("x")),
      "broken_plan" -> ((s, _) =>
        s.range(1).selectExpr("assert_true(id > 0, 'boom')")),
      "broken_build" -> ((_, _) => throw new RuntimeException("constructor")))
    val (ok, errs) = Bench.run(spark, TestSpark.sf0001, queries.toSeq)
    assert(ok.keySet === Set("good"))
    assert(ok("good") > 0.0)
    assert(errs.keySet === Set("broken_plan", "broken_build"))
    assert(errs("broken_build").contains("constructor"))
  }
}
