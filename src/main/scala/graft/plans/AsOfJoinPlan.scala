package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, InterpretedOrdering, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge

/** AS-OF join as a FULL custom operator — logical node + planner strategy +
  * physical sort-merge exec (builder brief preference (c), the path for
  * whole-operator semantics Spark lacks). This complements the composed
  * union+window form in [[graft.operators.TemporalJoins.asOf]]:
  *
  *  - the composed form is one shuffle of `left ∪ right` through a window —
  *    simple, declarative, codegen-friendly; the right default.
  *  - THIS operator declares the join's true physical contract instead:
  *    children need only be co-partitioned on the key and sorted by
  *    (key, ts). `EnsureRequirements` then inserts exchanges/sorts ONLY
  *    when the children don't already satisfy them — so bucketed or
  *    pre-sorted inputs as-of join with NO shuffle at all, which the
  *    union+window formulation cannot express (its window is a new
  *    partitioning over the concatenation). Per partition it is a
  *    streaming merge: O(|left| + |right|) with one retained row of state.
  *
  * Semantics (matching DuckDB `ASOF LEFT JOIN` and `TemporalJoins.asOf`):
  * for each left row, the LATEST right row with `right.ts <= left.ts` on
  * the same key; unmatched (including null-key and null-ts rows) emit
  * nulls for the right side. Equal timestamps match. Ties among right rows
  * at the same (key, ts) resolve to the last in sort order.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute)
  extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  require((leftKeys :+ leftTs).map(_.dataType) ==
    (rightKeys :+ rightTs).map(_.dataType),
    "as-of join sides must have identical key/ts types")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinNode = copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition on the key; EnsureRequirements adds exchanges only if the
  // children aren't already distributed this way (bucketed input → none)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition order (key..., ts) — the merge's only requirement
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lExprs = leftKeys :+ leftTs
    val rExprs = rightKeys :+ rightTs
    val types = lExprs.map(_.dataType)
    val nKeys = leftKeys.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key..., ts) projected to one shared shape on both sides, so plain
      // field-wise orderings implement both the advance rule (full compare:
      // rKey < lKey, or equal key and rTs <= lTs) and match validity (key
      // prefix compare)
      val lProj = UnsafeProjection.create(lExprs, lOut)
      val rProj = UnsafeProjection.create(rExprs, rOut)
      val fullOrd = InterpretedOrdering.forSchema(types)
      val keyOrd = InterpretedOrdering.forSchema(types.take(nKeys))
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // project the joined output to UnsafeRow (SortMergeJoinExec's
      // resultProj contract): parents like shuffle, sort, cache and the
      // collect path's getByteArrayRdd CAST rows to UnsafeRow, and a raw
      // JoinedRow there is a ClassCastException. Every in-repo caller
      // happened to put a codegen'd select above the exec, masking it
      // (r10 review).
      val resultProj = UnsafeProjection.create(output, output)

      val joined = new Iterator[InternalRow] {
        private var rHead: InternalRow = _      // fetched, not yet consumed
        private var rHeadKey: UnsafeRow = _
        private var lastMatch: InternalRow = _  // latest right row consumed
        private var lastMatchKey: UnsafeRow = _

        // fetch the next usable right row (null key/ts rows match nothing);
        // the projected row is exactly keys+ts, so anyNull covers all fields
        private def fetchRight(): Unit = {
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rProj(r)
            if (!k.anyNull) {
              rHead = r.copy()        // iterators reuse row objects
              rHeadKey = k.copy()
            }
          }
        }

        // consume right rows while (key, ts) <= the left row's (key, ts)
        private def advance(limit: UnsafeRow): Unit = {
          fetchRight()
          while (rHead != null && fullOrd.compare(rHeadKey, limit) <= 0) {
            lastMatch = rHead
            lastMatchKey = rHeadKey
            rHead = null
            fetchRight()
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lProj(lRow)
          if (lKey.anyNull) joiner(lRow, nullRight)
          else {
            advance(lKey)
            if (lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0)
              joiner(lRow, lastMatch)
            else joiner(lRow, nullRight)
          }
        }
      }
      joined.map(resultProj)
    }
  }
}

/** Column-level API + session wiring for the custom operator. */
object AsOfJoinPlan {

  /** AS-OF join `left` to `right` on equal `leftKeys`/`rightKeys`, taking
    * the latest right row with `rightTs <= leftTs`. Output = all left
    * columns followed by all right columns (nullable); name right-side
    * columns distinctly before calling. Registers the planner strategy on
    * the session if absent (also injectable via `GraftExtensions`).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lp = PlanBridge.analyzed(left)
    // re-alias every right column: a right side sharing lineage with the
    // left (self-join, common ancestor) would otherwise carry the SAME
    // exprIds on both sides and bind to the wrong attributes. Aliases are
    // built from the plan's OWN output attributes, not Dataset.apply(name):
    // right("a.b") parses the dot as a nested-field path and throws on a
    // legitimately dotted column name (r14 review)
    val rp = PlanBridge.analyzed(
      right.select(PlanBridge.analyzed(right).output.map(a =>
        org.apache.spark.sql.graft.ColumnBridge.column(
          Alias(a, a.name)())): _*))
    val resolver = spark.sessionState.analyzer.resolver
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.filter(a => resolver(a.name, n)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $n not found in [${p.output.map(_.name).mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: ${many.map(_.name).mkString(", ")}")
      }
    val lk = leftKeys.map(attr(lp, _))
    val rk = rightKeys.map(attr(rp, _))
    val lt = attr(lp, leftTs)
    val rt = attr(rp, rightTs)
    // the merge compares raw projected values with the LEFT side's types —
    // coercion is the caller's job, mismatches would be silently wrong
    (lk :+ lt).zip(rk :+ rt).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of column type mismatch: ${a.name}: ${a.dataType} vs " +
          s"${b.name}: ${b.dataType} — cast the inputs first")
    }
    PlanBridge.ofRows(spark, AsOfJoinNode(lp, rp, lk, rk, lt, rt))
  }

  /** Synchronized on the holder: `extraStrategies` is a plain var, and a
    * racing check-then-append (two first-use as-of joins planning
    * concurrently) can lose one append — the loser then fails planning
    * with Spark's "No plan for AsOfJoinNode" assertion (r17 review).
    * Scope (r17 ADVICE): the lock serializes graft's OWN registrars only
    * (this and [[BoundedLevenshteinRule.register]], which takes the same
    * monitor); Spark internals or third-party code appending to
    * `extraStrategies` without it can still race — nothing stronger is
    * possible against a public plain var.
    */
  def register(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
}
