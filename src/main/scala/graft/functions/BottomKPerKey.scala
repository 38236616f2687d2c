package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udaf

/** Bounded bottom-k per key over a STRING sort key — the sampling twin of
  * [[TopKPerKey]] (ascending, e.g. "k smallest md5(id) per stratum").
  *
  * This is the scale-safe core of stratified sampling: the window
  * formulation (`row_number() over (partition by stratum order by h)`)
  * shuffles EVERY row of a stratum to one reducer — with a handful of
  * language strata that is a single-task wall at 100 TB. As an
  * `Aggregator` it gets partial aggregation: each map task keeps at most
  * k entries per stratum (ObjectHashAggregate partial), so the shuffle
  * carries ≤ k rows per (stratum, map task) and no stratum is ever
  * co-located or fully sorted.
  *
  * Ordering: ascending by `sortKey` (nulls FIRST — Spark's ASC default,
  * instead of the NPE the unguarded compareTo threw), ascending `payload`
  * tiebreak — matching `ORDER BY h, id` exactly, so the emitted array
  * position IS the row_number the window would have produced. Key
  * comparison is CODE-POINT order, which equals the UTF-8 binary order
  * Spark's sort compares: `String.compareTo` is UTF-16 code-unit order,
  * which ranks supplementary-plane characters below U+E000..U+FFFF and
  * would fork the claimed window parity on non-ASCII keys (r10 review;
  * ASCII keys like the md5-hex callers' are unaffected).
  */
object BottomKPerKey {

  type Entry = (String, Long) // (sortKey, payload)

  /** Code-point (== UTF-8 binary) comparison, nulls first. */
  private def cmpKeys(x: String, y: String): Int =
    if (x eq y) 0
    else if (x == null) -1
    else if (y == null) 1
    else {
      val nx = x.length
      val ny = y.length
      var i = 0
      while (i < nx && i < ny) {
        val cx = x.codePointAt(i)
        val cy = y.codePointAt(i)
        if (cx != cy) return Integer.compare(cx, cy)
        i += Character.charCount(cx) // equal code points advance equally
      }
      Integer.compare(nx, ny) // equal prefix: the shorter sorts first
    }

  case class BottomK(k: Int) extends BoundedK[Entry](k) {
    override protected def better(a: Entry, b: Entry): Boolean = {
      val c = cmpKeys(a._1, b._1)
      c < 0 || (c == 0 && a._2 < b._2)
    }
  }

  /** Untyped-`agg` form: `bottomK(20)(col("h"), col("doc_id")).as("sample")`
    * yields `array<struct<_1: string, _2: bigint>>` sorted smallest-first.
    */
  def bottomK(k: Int): (Column, Column) => Column = {
    val fn = udaf(BottomK(k))
    (sortKey, payload) => fn(sortKey, payload)
  }
}
