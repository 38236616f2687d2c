package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass k-minhash kernel. Static so generated code calls it directly. */
object MinHashKernel {
  /** For each seed j in [0, k): min over the array of xxhash64(elem, seed=j).
    * One traversal of the array computes all k minima — versus k separate
    * `array_min(transform(...))` passes through interpreted lambdas. The
    * inner hash goes straight to `XXH64.hashUnsafeBytes` (what
    * XxHash64Function dispatches to for strings) instead of re-running its
    * per-call DataType match n×k times in the hot loop. Null elements are
    * SKIPPED, like [[SimHashKernel]]: hashing a null returns the bare seed,
    * which would inject the constant j into slot j of every document that
    * carries one null token — a spurious cross-document signature
    * collision (r10 review).
    */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(base, off, len, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    // primitive-backed result: GenericArrayData's long[] ctor boxes all
    // k longs per ROW (it delegates to the Seq ctor) — pure GC pressure
    // in the kernel's hot path (r14 review)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** `minhash_array(array<string>, k) → array<long>`: the k minhash values of
  * a shingle set in one pass (SURVEY §2.3 MinHash; used by dd02). Stays in
  * whole-stage codegen via a static kernel call.
  */
case class MinHashArray(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 1024)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_array requires an ARRAY<STRING> argument, got ${other.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    MinHashKernel.minhash(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernel.minhash($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashArray =
    copy(child = c)
}

object MinHashArray {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashArray(ColumnBridge.expression(c), k))
}
