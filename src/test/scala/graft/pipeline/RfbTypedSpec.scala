package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Cnpj

class RfbTypedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("empresas typed layer: comma-decimal capital_social → DECIMAL(18,2)") {
    import spark.implicits._
    val raw = Seq(
      ("11222333", "ACME LTDA", "2062", "49", "1234,56", "03", ""),
      ("99887766", "BETA SA", "2046", "05", "0,00", "05", ""))
      .toDF("c0", "c1", "c2", "c3", "c4", "c5", "c6")
    val t = RfbTyped.typed("rfb_empresas", raw)
    assert(t.columns.contains("capital_social"))
    val vals = t.select("capital_social").collect().map(_.getDecimal(0))
    assert(vals(0) == new java.math.BigDecimal("1234.56"))
    assert(vals(1) == new java.math.BigDecimal("0.00"))
  }

  test("simples typed layer: S/N flags → boolean, zero-dates → null") {
    import spark.implicits._
    val raw = Seq(
      ("11222333", "S", "20200101", "00000000", "N", "0", ""))
      .toDF("c0", "c1", "c2", "c3", "c4", "c5", "c6")
    val t = RfbTyped.typed("rfb_simples", raw).collect()(0)
    assert(t.getAs[Boolean]("opcao_simples"))
    assert(!t.getAs[Boolean]("opcao_mei"))
    assert(t.getAs[java.sql.Date]("data_opcao_simples").toString == "2020-01-01")
    assert(t.getAs[java.sql.Date]("data_exclusao_simples") == null)
    assert(t.getAs[java.sql.Date]("data_opcao_mei") == null)
  }

  test("socios typed layer: yyyyMMdd data_entrada → DATE") {
    import spark.implicits._
    val raw = Seq(
      ("11222333", "2", "JOAO", "***123**", "49", "19991231", "", "", "", "", "4"))
      .toDF((0 to 10).map(i => s"c$i"): _*)
    val t = RfbTyped.typed("rfb_socios", raw).collect()(0)
    assert(t.getAs[java.sql.Date]("data_entrada").toString == "1999-12-31")
  }

  test("withCnpj assembles and validates the 14-digit number") {
    import spark.implicits._
    // build a valid CNPJ from the generator so the flag must be true
    val prefix = "112223330001"
    val dvs = Cnpj.checkDigits(prefix)
    val df = Seq(
      ("11222333", "0001", dvs),   // valid
      ("11222333", "0001", "99")) // invalid dv
      .toDF("cnpj_basico", "cnpj_ordem", "cnpj_dv")
    val got = RfbTyped.withCnpj(df)
      .select("cnpj", "cnpj_valido").collect()
    assert(got(0).getString(0) == prefix + dvs)
    assert(got(0).getBoolean(1))
    assert(!got(1).getBoolean(1))
  }

  test("estabelecimentos typed layer: cnpj assembly, dates, cnae array") {
    import spark.implicits._
    val prefix = "112223330001"
    val dvs = Cnpj.checkDigits(prefix)
    val row = Seq("11222333", "0001", dvs, "1", "LOJA", "02", "20200315",
      "00", "", "", "19991231", "0111301", "0111302,0111303", "RUA", "X",
      "1", "", "CENTRO", "01000000", "SP", "7107", "11", "999", "", "", "",
      "", "a@b.c", "", "0")
    val raw = Seq(row).map(r => (r(0), r(1), r(2), r(3), r(4), r(5), r(6),
      r(7), r(8), r(9), r(10), r(11), r(12), r(13), r(14), r(15), r(16),
      r(17), r(18), r(19), r(20), r(21))).toDF((0 to 21).map(i => s"c$i"): _*)
      // pad remaining columns c22..c29
      .select((0 to 21).map(i => col(s"c$i")) ++
        (22 to 29).map(i => lit(row(i)).as(s"c$i")): _*)
    val t = RfbTyped.typed("rfb_estabelecimentos", raw).collect()(0)
    assert(t.getAs[String]("cnpj") == prefix + dvs)
    assert(t.getAs[Boolean]("cnpj_valido"))
    assert(t.getAs[java.sql.Date]("data_inicio").toString == "1999-12-31")
    assert(t.getAs[java.sql.Date]("data_situacao_especial") == null)
    assert(t.getAs[scala.collection.Seq[String]]("cnae_secundaria").toSeq ==
      Seq("0111302", "0111303"))
  }

  test("unknown table passes through unchanged") {
    import spark.implicits._
    val raw = Seq(("a", "b")).toDF("c0", "c1")
    assert(RfbTyped.typed("rfb_whatever", raw).columns.toSeq == Seq("c0", "c1"))
  }
}
