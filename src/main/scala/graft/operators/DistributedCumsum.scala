package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum over an NDV-sized `(value, freq)` aggregate —
  * the shared stats-build primitive behind q59's equi-depth histogram and
  * q61's RFM tertile boundaries.
  *
  * Why not `Window.orderBy(value)` with no partition spec: that executes
  * as ONE sorted task holding the whole axis. NDV-bounded is not
  * constant-bounded — a money/price axis scales its distinct-value count
  * with the data, so at 100× the single task becomes the straggler (and
  * at lake scale, an OOM). Instead the value range is cut into P
  * deterministic buckets from a broadcast min/max (value-derived, so every
  * branch of the plan assigns the same bucket; a `repartitionByRange` pid
  * would be sample-nondeterministic across branches), the cumsum runs
  * per-bucket in parallel, and each bucket adds a broadcast offset from a
  * P-row (≤32, constant-bounded) exclusive running total computed as a
  * P×P broadcast triangular join (≤1024 pairs) — not a window, so the
  * plan carries ZERO partition-less WindowExecs (PlanShapeSpec enforces
  * this suite-wide).
  */
private[graft] object DistributedCumsum {
  /** Inclusive cumulative sum of `freqCol` over `counts` ordered by the
    * BIGINT `valueCol`. Returns `(valueCol, cum, n)` where `cum` is the
    * running total up to and including this value and `n` the grand
    * total — the inputs rank-based boundary lookups need. `counts` must
    * be one row per distinct value (a `groupBy(value).count()` output)
    * and must not already carry columns named lo/hi/n/pid/psum/off/cum.
    */
  def cumulative(counts: DataFrame, valueCol: String, freqCol: String,
      buckets: Int = 32): DataFrame = {
    val keyed = cumulativeKeyed(
      counts.withColumn("_k", lit(1)), "_k", valueCol, freqCol, buckets)
    keyed.drop("_k")
  }

  /** Per-key [[cumulative]]: one pipeline computes an independent prefix
    * sum for EVERY distinct value of `keyCol` (per-key lo/hi/n, per
    * (key, pid) bucket cumsum and offsets) — the fused form behind q61's
    * three tertile axes, which used to run three full cumsum pipelines
    * over the same scratch table (3× the exchanges and a ~100-exchange
    * plan; r20 plan audit — guide §2.4 "share one exchange"). `keyCol`'s
    * cardinality must be constant-bounded (q61: 3 metrics): the per-key
    * min/max/total frame and the (key × P) offsets frame are broadcast.
    * [[cumulative]] is this with a constant key, so the two spellings
    * cannot drift.
    */
  def cumulativeKeyed(counts: DataFrame, keyCol: String, valueCol: String,
      freqCol: String, buckets: Int = 32): DataFrame = {
    // buckets = 0 would silently collapse the whole axis into one pid —
    // the single-sorted-task shape this object exists to prevent — and
    // the P×P offsets join bounds the broadcast only while P is small
    // (r14 review; Skew.saltedJoin's salts guard)
    require(buckets > 0 && buckets <= 256,
      s"cumulative needs 0 < buckets <= 256, got $buckets")
    val v = col(valueCol)
    val k = col(keyCol)
    // hi = max+1 keeps (hi - lo) >= 1 even on a single-value axis; the
    // *buckets product stays in BIGINT for any axis narrower than
    // Long.Max/buckets (~2.9e17 at P=32) — true for every cents/days/count
    // axis in the suite.
    val mm = counts.groupBy(k).agg(min(v).as("lo"), (max(v) + 1).as("hi"),
      sum(col(freqCol)).as("n"))
    // a NULL value takes pid -1: it sorts BEFORE every bucket, exactly
    // where the partition-less `Window.orderBy(value)` this helper
    // replaces would cum it (Spark ASC = nulls first). The arithmetic pid
    // is null for a null value, and the inner offsets join would silently
    // DROP the row while `n` still counted its freq — every rank-based
    // boundary downstream then reads against an unreachable total (r10
    // review; current callers are non-null, but the precondition doc
    // never excluded nulls).
    // Integer DIV, not Column `/` (double division): above 2^52 the
    // double quotient can round UP to exactly `buckets`, minting a
    // phantom P+1th bucket and breaking the documented P×P bound; DIV is
    // exact in BIGINT and v <= hi-1 keeps pid <= buckets-1 (r14 review).
    val bucketed = counts.join(broadcast(mm), keyCol)
      .withColumn("pid",
        when(v.isNull, lit(-1)).otherwise(
          expr(s"CAST(((`$valueCol` - lo) * $buckets) DIV (hi - lo) AS INT)")))
    val psums = bucketed.groupBy(k, col("pid"))
      .agg(sum(col(freqCol)).as("psum"))
    val offsets = psums.as("a")
      .join(broadcast(psums.as("b")),
        col(s"b.$keyCol") === col(s"a.$keyCol") &&
          col("b.pid") < col("a.pid"), "left")
      .groupBy(col(s"a.$keyCol"), col("a.pid"))
      .agg(coalesce(sum(col("b.psum")), lit(0L)).as("off"))
    val wLocal = Window.partitionBy(keyCol, "pid").orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), Seq(keyCol, "pid"))
      .select(k, v, (sum(col(freqCol)).over(wLocal) + col("off")).as("cum"),
        col("n"))
  }

  /** One-row rank-based boundary lookup over [[cumulative]]'s output: for
    * each `(alias, num, den)` cut, boundary = MIN value whose cumulative
    * count exceeds rank ⌊(n−1)·num/den⌋ — pure BIGINT arithmetic,
    * identical in both engines. ONE spelling for q59's quartile bounds
    * and q61's tertiles: the fold was previously stated independently in
    * Relational5 and Relational6, free to drift — the exact twin-drift
    * the cumsum extraction exists to stop (r14 review).
    */
  def rankBoundaries(counts: DataFrame, valueCol: String, freqCol: String,
      cuts: Seq[(String, Int, Int)]): DataFrame =
    // EMPTY-INPUT contract (r20 ADVICE): since the r20 delegation to the
    // keyed form, an empty `counts` yields ZERO rows (the groupBy has no
    // groups) where the old global aggregate emitted one all-null row.
    // The sole unkeyed consumer (q59) crossJoins the result against the
    // same `counts`, so both shapes produce the identical EMPTY output —
    // documented here rather than restored: a one-null-row resurrection
    // would be dead code serving no caller.
    rankBoundariesKeyed(counts.withColumn("_k", lit(1)), "_k",
      valueCol, freqCol, cuts).drop("_k")

  /** Per-key [[rankBoundaries]] over [[cumulativeKeyed]] — one row per
    * key value, each carrying every cut's boundary for THAT key's axis.
    * The unkeyed form is this with a constant key (one spelling — the
    * r14 twin-drift discipline).
    */
  def rankBoundariesKeyed(counts: DataFrame, keyCol: String,
      valueCol: String, freqCol: String,
      cuts: Seq[(String, Int, Int)]): DataFrame = {
    require(cuts.nonEmpty, "rankBoundaries needs at least one cut")
    val cum = cumulativeKeyed(counts, keyCol, valueCol, freqCol)
    def boundary(c: (String, Int, Int)) = {
      val (alias, num, den) = c
      min(when(col("cum") > expr(s"((n - 1) * $num) div $den"),
        col(valueCol))).as(alias)
    }
    cum.groupBy(col(keyCol)).agg(boundary(cuts.head),
      cuts.tail.map(boundary): _*)
  }
}
