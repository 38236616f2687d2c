package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
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
  * deterministic tiebreak.
  */
object TopKPerKey {

  type Entry = (Double, Long) // (sortKey, payload)

  /** `buf` is kept sorted best-first and truncated at k (k is small — the
    * O(k) insertion beats heap constant factors and keeps merge trivial).
    */
  case class TopK(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    private def better(a: Entry, b: Entry): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

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

  /** Untyped-`agg` form: `topK(3)(col("price"), col("id")).as("top")`
    * yields `array<struct<_1: double, _2: bigint>>` sorted best-first.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(TopK(k))
    (sortKey, payload) => fn(sortKey, payload)
  }
}
