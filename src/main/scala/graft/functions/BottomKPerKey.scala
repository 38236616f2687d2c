package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
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
  * Ordering: ascending by `sortKey`, ascending `payload` tiebreak —
  * matching `ORDER BY h, id` exactly, so the emitted array position IS the
  * row_number the window would have produced.
  */
object BottomKPerKey {

  type Entry = (String, Long) // (sortKey, payload)

  /** `buf` is kept sorted best(smallest)-first and truncated at k. */
  case class BottomK(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    private def better(a: Entry, b: Entry): Boolean = {
      val c = a._1.compareTo(b._1)
      c < 0 || (c == 0 && a._2 < b._2)
    }

    override def zero: List[Entry] = Nil

    override def reduce(buf: List[Entry], in: Entry): List[Entry] =
      insert(buf, in, k)

    private def insert(buf: List[Entry], in: Entry, room: Int): List[Entry] =
      buf match {
        case _ if room == 0 => Nil
        case Nil => in :: Nil
        case h :: t if better(h, in) => h :: insert(t, in, room - 1)
        case _ => in :: buf.take(room - 1)
      }

    override def merge(a: List[Entry], b: List[Entry]): List[Entry] = {
      @annotation.tailrec
      def go(x: List[Entry], y: List[Entry], acc: List[Entry], room: Int): List[Entry] =
        (x, y) match {
          case _ if room == 0 => acc.reverse
          case (Nil, Nil) => acc.reverse
          case (xs, Nil) => acc.reverse ::: xs.take(room)
          case (Nil, ys) => acc.reverse ::: ys.take(room)
          case (xh :: xt, yh :: _) if better(xh, yh) => go(xt, y, xh :: acc, room - 1)
          case (_, yh :: yt) => go(x, yt, yh :: acc, room - 1)
        }
      go(a, b, Nil, k)
    }

    override def finish(buf: List[Entry]): Seq[Entry] = buf

    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Untyped-`agg` form: `bottomK(20)(col("h"), col("doc_id")).as("sample")`
    * yields `array<struct<_1: string, _2: bigint>>` sorted smallest-first.
    */
  def bottomK(k: Int): (Column, Column) => Column = {
    val fn = udaf(BottomK(k))
    (sortKey, payload) => fn(sortKey, payload)
  }
}
