package graft.plans

import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, Levenshtein}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BoundedLevenshteinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    ("kitten", "sitting"),  // distance 3
    ("flaw", "lawn"),       // distance 2
    ("abc", "abc"),         // distance 0
    ("short", "a much longer string entirely")).toDF("a", "b")

  private def thresholds(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
    var bounded = 0
    var unbounded = 0
    plan.transformAllExpressions {
      case l @ Levenshtein(_, _, Some(_)) => bounded += 1; l
      case l @ Levenshtein(_, _, None) => unbounded += 1; l
    }
    (bounded, unbounded)
  }

  test("rewrites lev <= k to banded lev(k) >= 0; result unchanged") {
    val q = df.filter(levenshtein($"a", $"b") <= 2)
    val rewritten = BoundedLevenshteinRule(q.queryExecution.analyzed)
    assert(thresholds(rewritten) === ((1, 0)))
    rewritten.expressions.foreach(_.foreach {
      case GreaterThanOrEqual(Levenshtein(_, _, Some(_)), _) => ()
      case _ => ()
    })
    // semantics preserved: bounded >= 0 keeps exactly the distance<=2 rows
    val viaBounded = df.filter(levenshtein($"a", $"b", 2) >= 0)
      .collect().map(_.getString(0)).toSet
    val original = q.collect().map(_.getString(0)).toSet
    assert(viaBounded === original)
    assert(original === Set("flaw", "abc"))
  }

  test("strict < and flipped comparisons rewrite too") {
    val lt = df.filter(levenshtein($"a", $"b") < 3)
    assert(thresholds(BoundedLevenshteinRule(lt.queryExecution.analyzed))
      === ((1, 0)))
    val flipped = df.filter(lit(2) >= levenshtein($"a", $"b"))
    assert(thresholds(BoundedLevenshteinRule(flipped.queryExecution.analyzed))
      === ((1, 0)))
  }

  test("lower bounds band too: lev > k becomes banded lev(k) < 0, result unchanged") {
    // lev(a,b) > k ⟺ lev(a,b,k) = -1 — the fuzzy ANTI-match filter was
    // needlessly on the quadratic kernel (r11 review)
    for ((q, expected) <- Seq(
        (df.filter(levenshtein($"a", $"b") > 2), Set("kitten", "short")),
        (df.filter(levenshtein($"a", $"b") >= 3), Set("kitten", "short")),
        (df.filter(lit(2) < levenshtein($"a", $"b")), Set("kitten", "short")),
        (df.filter(lit(3) <= levenshtein($"a", $"b")), Set("kitten", "short")))) {
      val rewritten = BoundedLevenshteinRule(q.queryExecution.analyzed)
      assert(thresholds(rewritten) === ((1, 0)), q.queryExecution.analyzed)
      assert(q.collect().map(_.getString(0)).toSet === expected)
      // the rewritten plan computes the same rows through the banded kernel
      val viaBounded = df.filter(levenshtein($"a", $"b", 2) < 0)
        .collect().map(_.getString(0)).toSet
      assert(viaBounded === expected)
    }
    // lev >= 0 must NOT rewrite with a negative band (it is a tautology on
    // non-null inputs; leave it alone)
    val ge0 = df.filter(levenshtein($"a", $"b") >= 0)
    assert(thresholds(BoundedLevenshteinRule(ge0.queryExecution.analyzed))
      === ((0, 1)))
  }

  test("equality bands: lev = k becomes banded lev(k) = k, result unchanged") {
    // lev(a,b) = k ⟺ lev(a,b,k) = k: exact distance when ≤ k, -1 ≠ k above
    for ((q, expected) <- Seq(
        (df.filter(levenshtein($"a", $"b") === 2), Set("flaw")),
        (df.filter(lit(2) === levenshtein($"a", $"b")), Set("flaw")),
        (df.filter(levenshtein($"a", $"b") <=> 0), Set("abc")))) {
      val rewritten = BoundedLevenshteinRule(q.queryExecution.analyzed)
      assert(thresholds(rewritten) === ((1, 0)), q.queryExecution.analyzed)
      assert(q.collect().map(_.getString(0)).toSet === expected)
    }
    // the banded twin computes the same rows
    assert(df.filter(levenshtein($"a", $"b", 2) === 2)
      .collect().map(_.getString(0)).toSet === Set("flaw"))
  }

  test("idempotent: a second application is a no-op") {
    val q = df.filter(levenshtein($"a", $"b") <= 2)
    val once = BoundedLevenshteinRule(q.queryExecution.analyzed)
    val twice = BoundedLevenshteinRule(once)
    assert(once === twice)
  }
}
