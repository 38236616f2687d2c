package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** The bounded-k aggregation core shared by [[TopKPerKey]] and
  * [[BottomKPerKey]] (previously duplicated verbatim in both — a fix to
  * one silently missed the other, the r10 review's finding). The buffer is
  * a best-first sorted list truncated at k: O(k) insertion beats heap
  * constant factors at the small k these operators run, and merge is a
  * bounded sorted-merge.
  *
  * `better` MUST be a total, deterministic strict order over every
  * representable entry — including NaN and null sort keys. An order where
  * both `better(a, b)` and `better(b, a)` are false for unequal entries
  * (e.g. a bare `>` on doubles, where every NaN comparison is false) makes
  * `merge` non-commutative and the whole aggregation
  * partitioning-dependent: the same data returns different survivors on
  * different cluster layouts.
  */
private[functions] abstract class BoundedK[E: TypeTag](k: Int)
    extends Aggregator[E, List[E], Seq[E]] {
  // fail fast like MinHashArray's require: k <= 0 silently aggregated
  // every group to an empty array, and insert() recurses up to k frames
  // so an unbounded k risks executor StackOverflowError mid-job (r14
  // review). 4096 is far above any top-k this engine serves and far
  // below any default thread stack.
  require(k > 0 && k <= 4096, s"bounded-k needs 0 < k <= 4096, got $k")

  protected def better(a: E, b: E): Boolean

  override def zero: List[E] = Nil

  override def reduce(buf: List[E], in: E): List[E] = insert(buf, in, k)

  private def insert(buf: List[E], in: E, room: Int): List[E] =
    buf match {
      case _ if room == 0 => Nil
      case Nil => in :: Nil
      case h :: t if better(h, in) => h :: insert(t, in, room - 1)
      case _ => in :: buf.take(room - 1)
    }

  override def merge(a: List[E], b: List[E]): List[E] = {
    @annotation.tailrec
    def go(x: List[E], y: List[E], acc: List[E], room: Int): List[E] =
      (x, y) match {
        case _ if room == 0 => acc.reverse
        case (Nil, Nil) => acc.reverse
        case (xs, Nil) => acc.reverse ::: xs.take(room)
        case (Nil, ys) => acc.reverse ::: ys.take(room)
        case (xh :: xt, yh :: _) if better(xh, yh) =>
          go(xt, y, xh :: acc, room - 1)
        case (_, yh :: yt) => go(x, yt, yh :: acc, room - 1)
      }
    go(a, b, Nil, k)
  }

  override def finish(buf: List[E]): Seq[E] = buf

  // the encoders live HERE for the same reason the kernel does: they were
  // copy-pasted verbatim in both subclasses after the r10 extraction, the
  // exact one-sided-fix hazard the base class exists to remove (r17
  // review). The context-bound TypeTag resolves at each concrete
  // subclass's definition site, where E is known.
  override def bufferEncoder: Encoder[List[E]] = ExpressionEncoder[List[E]]()
  override def outputEncoder: Encoder[Seq[E]] = ExpressionEncoder[Seq[E]]()
}
