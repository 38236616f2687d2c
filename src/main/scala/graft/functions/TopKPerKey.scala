package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udaf

/** Bounded-heap top-k per key as an AGGREGATION (SURVEY §2.2 UDAF row; the
  * scale-first alternative to `rank() <= k`).
  *
  * The window formulation shuffles every row of a group to one reducer and
  * SORTS the whole group to keep k rows. As an `Aggregator`, top-k gets
  * partial aggregation for free: every map task keeps at most k rows per
  * key (ObjectHashAggregate partial), so the shuffle carries ≤ k rows per
  * (key, map task) and no full group is ever sorted or even co-located.
  * For a hot key with 10⁸ rows and k=3, the window plan moves 10⁸ rows to
  * one task; this plan moves 3 per map task.
  *
  * Ordering: descending by `sortKey`, ascending `payload` as the
  * deterministic tiebreak — through `java.lang.Double.compare`, which is
  * TOTAL: NaN ranks above every other double (Spark's own sort order), so
  * a NaN score cannot make the merge order-dependent (the bare `>` it
  * replaces answered false both ways on NaN — reduce/merge stopped
  * commuting and survivors varied with partitioning; r10 review). The
  * sort key is a non-nullable primitive through the input encoder: rows
  * with a null score must be filtered (or defaulted) by the caller, as
  * the encoder rejects them at runtime.
  */
object TopKPerKey {

  type Entry = (Double, Long) // (sortKey, payload)

  case class TopK(k: Int) extends BoundedK[Entry](k) {
    override protected def better(a: Entry, b: Entry): Boolean = {
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }
  }

  /** Untyped-`agg` form: `topK(3)(col("price"), col("id")).as("top")`
    * yields `array<struct<_1: double, _2: bigint>>` sorted best-first.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(TopK(k))
    (sortKey, payload) => fn(sortKey, payload)
  }
}
