package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: bound edit-distance computations by the comparison they
  * feed (builder brief: custom Catalyst `Rule` where built-ins fall short).
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic program and
  * then throws most of it away. Spark's three-argument
  * `levenshtein(a, b, k)` runs the banded O(k·min(|a|,|b|)) algorithm and
  * returns -1 when the distance exceeds k — so the predicate is equivalent
  * to `levenshtein(a, b, k) >= 0`. For fuzzy-match filters with small k
  * (the common case: k ≤ 3 typo tolerance over long strings) this turns a
  * quadratic per-row kernel into a linear one. The rewrite is expression-
  * level (valid in any context), fires only on an unbounded Levenshtein
  * against a non-negative integer literal, and is idempotent because the
  * rewritten form carries a threshold.
  */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), k @ IntegerLiteral(kv))
          if kv >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
      case GreaterThanOrEqual(k @ IntegerLiteral(kv), Levenshtein(a, b, None))
          if kv >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
      case LessThan(Levenshtein(a, b, None), IntegerLiteral(kv)) if kv >= 1 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(kv - 1))), Literal(0))
      case GreaterThan(IntegerLiteral(kv), Levenshtein(a, b, None)) if kv >= 1 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(kv - 1))), Literal(0))
      // LOWER bounds band just as validly: lev(a,b) > k ⟺ lev(a,b,k) < 0
      // (the banded kernel returns -1 past its threshold; nulls stay null
      // on both sides). The fuzzy ANTI-match filter was left on the
      // quadratic kernel for no reason (r11 review).
      case GreaterThan(Levenshtein(a, b, None), k @ IntegerLiteral(kv))
          if kv >= 0 =>
        LessThan(Levenshtein(a, b, Some(k)), Literal(0))
      case LessThan(k @ IntegerLiteral(kv), Levenshtein(a, b, None))
          if kv >= 0 =>
        LessThan(Levenshtein(a, b, Some(k)), Literal(0))
      case GreaterThanOrEqual(Levenshtein(a, b, None), IntegerLiteral(kv))
          if kv >= 1 =>
        LessThan(Levenshtein(a, b, Some(Literal(kv - 1))), Literal(0))
      case LessThanOrEqual(IntegerLiteral(kv), Levenshtein(a, b, None))
          if kv >= 1 =>
        LessThan(Levenshtein(a, b, Some(Literal(kv - 1))), Literal(0))
      // EQUALITY bands too: lev(a,b) = k ⟺ lev(a,b,k) = k (the banded
      // kernel returns the exact distance when ≤ k and -1 ≠ k when above;
      // null inputs give null = k ⟹ null on both forms, and for <=> both
      // sides give false). The "exactly one edit" filter was left on the
      // quadratic kernel for no reason (r16 review).
      case EqualTo(Levenshtein(a, b, None), k @ IntegerLiteral(kv))
          if kv >= 0 =>
        EqualTo(Levenshtein(a, b, Some(k)), k)
      case EqualTo(k @ IntegerLiteral(kv), Levenshtein(a, b, None))
          if kv >= 0 =>
        EqualTo(Levenshtein(a, b, Some(k)), k)
      case EqualNullSafe(Levenshtein(a, b, None), k @ IntegerLiteral(kv))
          if kv >= 0 =>
        EqualNullSafe(Levenshtein(a, b, Some(k)), k)
      case EqualNullSafe(k @ IntegerLiteral(kv), Levenshtein(a, b, None))
          if kv >= 0 =>
        EqualNullSafe(Levenshtein(a, b, Some(k)), k)
    }

  /** Installs the rule into a session's experimental optimizations if
    * absent — for sessions NOT configured with `GraftExtensions`: the
    * driver's Verify/Bench mains and any library user building a plain
    * session. Without this programmatic path the banded rewrite silently
    * never fired in exactly the production paths it exists to speed up —
    * only extensions-configured test sessions got it (r17 review). Called
    * from the query builders that emit bounded-lev comparisons, mirroring
    * `AsOfJoinPlan.register`. Synchronized on the holder:
    * `extraOptimizations` is a plain var, and a racing check-then-append
    * can silently drop a concurrent component's rule.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations
          .contains(BoundedLevenshteinRule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ BoundedLevenshteinRule
    }
}
