package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Analysis-time argument checking shared by the SQL-registered
  * expressions: without `checkInputDataTypes` a wrong-typed SQL call
  * (`cnpj_valid(123)`, `dot_product('a','b')`) passes analysis and then
  * dies deep in codegen / `ClassCastException` on an executor — the user
  * gets an opaque runtime crash instead of an error naming the expected
  * type.
  */
private[functions] object ArgCheck {
  def string(name: String, dt: DataType): TypeCheckResult = dt match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires a STRING argument, got ${other.sql}")
  }
  def floatArray(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, " +
        s"got ${other.sql}")
  }
}

/** Native Catalyst expressions (SURVEY §7.2: promote codegen-hot scalars to
  * `Expression`s). Both participate in whole-stage codegen — no
  * `CodegenFallback`, no UDF serialization overhead.
  */

/** `cnpj_valid(string) → boolean`: CNPJ check-digit validation. */
case class CnpjValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    ArgCheck.string("cnpj_valid", child.dataType)
  override def nullSafeEval(v: Any): Any =
    Cnpj.isValid(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Cnpj.isValid($c)")
  override protected def withNewChildInternal(c: Expression): CnpjValid =
    copy(child = c)
}

/** `dot_product(array<float|double>, array<float|double>) → double`:
  * double-precision sequential dot product — the cosine kernel. The
  * generated code is a tight primitive loop over `ArrayData`, identical
  * math (and therefore identical results) to
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (s,x) -> s+x)` but without
  * building the intermediate array.
  *
  * MISMATCHED lengths return NULL — the same answer the zip_with
  * formulation gives (its pad-nulls poison the sum): silently truncating
  * to the shorter side turned a corrupt or wrong-dimension embedding row
  * into a plausible-but-wrong cosine instead of a visible null (r10
  * review). Element nulls are not expected (embedding vectors are dense);
  * a null element contributes whatever the backing array holds, as with
  * the higher-order-function formulation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ArgCheck.floatArray("dot_product", left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ArgCheck.floatArray("dot_product", right.dataType)
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(left = l, right = r)
}

/** Runtime kernel for [[NfcNormalize]] — kept as a static helper so the
  * generated code is a single call. The `isNormalized` fast path matters at
  * scale: ASCII (the overwhelming majority of corpus bytes) short-circuits
  * without allocating a transformed copy.
  */
object TextNorm {
  private val NFC = java.text.Normalizer.Form.NFC
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, NFC))
  }
}

/** `nfc_normalize(string) → string`: Unicode canonical composition (NFC) —
  * the standard pre-tokenization canonicalization (é as one codepoint vs
  * e + combining acute hash differently, breaking dedup). Codegen'd, no UDF;
  * mirrors DuckDB's `nfc_normalize` so the oracle gates it exactly.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    ArgCheck.string("nfc_normalize", child.dataType)
  override def nullSafeEval(v: Any): Any =
    TextNorm.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** Registration + Column wrappers. `register` installs the SQL names into a
  * session's function registry (also injectable via
  * [[GraftExtensions]] for `spark.sql.extensions`-configured sessions).
  */
object GraftFunctions {
  def cnpj_valid(c: Column): Column = toCol(CnpjValid(toExpr(c)))
  def dot_product(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))
  def nfc_normalize(c: Column): Column = toCol(NfcNormalize(toExpr(c)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cnpj_valid",
      es => CnpjValid(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize",
      es => NfcNormalize(es.head), "scala_udf")
  }

  private def toExpr(c: Column): Expression = ColumnBridge.expression(c)
  private def toCol(e: Expression): Column = ColumnBridge.column(e)
}

/** `SparkSessionExtensions` hook: sessions built with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")` get
  * the functions without calling `register`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("cnpj_valid"),
      new ExpressionInfo(classOf[CnpjValid].getName, "cnpj_valid"),
      (es: Seq[Expression]) => CnpjValid(es.head)))
    e.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
    e.injectOptimizerRule(_ => graft.plans.BoundedLevenshteinRule)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
