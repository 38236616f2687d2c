package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass SimHash kernel: 64-bit signature of a token array.
  *
  * A document's SimHash depends only on its own tokens, so it must be a
  * row-local computation — this kernel replaces the previous
  * explode-every-token + 64-column groupBy formulation, which shuffled the
  * whole tokenized corpus to compute a per-row value (the round-1 bench's
  * worst query by 10×).
  *
  * Token hash = first 8 bytes of MD5(token) read big-endian — i.e. the
  * value of `CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT)` reinterpreted
  * as a signed long. MD5 (not xxhash64) so the DuckDB oracle can reproduce
  * the signature bit-for-bit in SQL and hash-gate the query output.
  * Bit b of the signature is the majority vote of bit b over all token
  * hashes (ties → 0), the standard Charikar construction.
  */
object SimHashKernel {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static so generated code calls it directly. */
  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val d = md5.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { i += 1 }
      else {
      d.reset()
      val dig = d.digest(arr.getUTF8String(i).getBytes)
      // first 8 digest bytes, big-endian (== leading 16 hex chars of md5())
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (dig(k) & 0xFFL); k += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** `simhash_array(array<string>) → long`: whole-stage-codegen SimHash.
  * Input type is enforced at ANALYSIS time (not a runtime ClassCastException)
  * and null array elements are skipped by the kernel (they carry no tokens).
  */
case class SimHashArray(child: Expression) extends UnaryExpression {
  // ExpectsInputTypes needs the private[sql] AbstractDataType, so enforce
  // the input type with the equivalent analysis-time check directly.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // `_: StringType`, not the StringType singleton: under a non-default
    // session collation the element type is a collated StringType whose
    // equals() compares collationIds — the singleton match spuriously
    // rejected what the byte-hashing kernel (and sibling MinHashArray)
    // handle identically (r14 review)
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_array requires array<string> input type, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHashKernel.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHashArray =
    copy(child = c)
}

object SimHashArray {
  def apply(c: Column): Column =
    ColumnBridge.column(SimHashArray(ColumnBridge.expression(c)))
}
