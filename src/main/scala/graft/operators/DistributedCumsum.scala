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
    val v = col(valueCol)
    // hi = max+1 keeps (hi - lo) >= 1 even on a single-value axis; the
    // *buckets product stays in BIGINT for any axis narrower than
    // Long.Max/buckets (~2.9e17 at P=32) — true for every cents/days/count
    // axis in the suite.
    val mm = counts.agg(min(v).as("lo"), (max(v) + 1).as("hi"),
      sum(col(freqCol)).as("n"))
    // a NULL value takes pid -1: it sorts BEFORE every bucket, exactly
    // where the partition-less `Window.orderBy(value)` this helper
    // replaces would cum it (Spark ASC = nulls first). The arithmetic pid
    // is null for a null value, and the inner offsets join would silently
    // DROP the row while `n` still counted its freq — every rank-based
    // boundary downstream then reads against an unreachable total (r10
    // review; current callers are non-null, but the precondition doc
    // never excluded nulls).
    val bucketed = counts.crossJoin(broadcast(mm))
      .withColumn("pid",
        when(v.isNull, lit(-1)).otherwise(
          (((v - col("lo")) * buckets) / (col("hi") - col("lo"))).cast("int")))
    val psums = bucketed.groupBy("pid").agg(sum(col(freqCol)).as("psum"))
    val offsets = psums.as("a")
      .join(broadcast(psums.as("b")), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid"))
      .agg(coalesce(sum(col("b.psum")), lit(0L)).as("off"))
    val wLocal = Window.partitionBy("pid").orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), "pid")
      .select(v, (sum(col(freqCol)).over(wLocal) + col("off")).as("cum"),
        col("n"))
  }
}
