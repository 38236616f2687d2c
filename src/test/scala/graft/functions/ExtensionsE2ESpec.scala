package graft.functions

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end `spark.sql.extensions` wiring: the shared test session is
  * built with `GraftExtensions` in its config (TestSpark), so the SQL
  * functions resolve WITHOUT any `register()` call and the Levenshtein
  * rule runs inside the session's own optimizer. (`spark.sql.extensions`
  * is a static conf — it must be set when the SparkContext is created,
  * which is why this asserts on the shared session rather than building a
  * second one.)
  */
class ExtensionsE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("config-injected SQL functions resolve without register()") {
    val row = spark.sql(
      """SELECT cnpj_valid('11222333000181') AS ok,
        |  ROUND(dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)), 4) AS dp
        |""".stripMargin).head()
    assert(row.getBoolean(0))
    assert(row.getDouble(1) === 11.0)
  }

  test("config-injected optimizer rule fires in the session optimizer") {
    // a parquet-backed frame: a literal LocalRelation would be constant-
    // folded away before the plan can be inspected
    val part = graft.Tables(spark, TestSpark.sf0001, "part")
    val q = part.filter(levenshtein(col("p_name"), col("p_brand")) <= 2)
    val bounded = q.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case Levenshtein(_, _, Some(_)) => true
      case _ => false
    })
    assert(bounded, q.queryExecution.optimizedPlan.toString)
  }
}
