package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class RoutingSpec extends AnyFunSuite {
  test("every reference suffix routes to its table (main.py:166-171)") {
    val expected = Map(
      "K1.D509.EMPRECSV" -> "rfb_empresas",
      "K1.D509.ESTABELE" -> "rfb_estabelecimentos",
      "K1.D509.SOCIOCSV" -> "rfb_socios",
      "K1.D509.SIMPLES" -> "rfb_simples",
      "K1.D509.CNAECSV" -> "rfb_cnaes",
      "K1.D509.MOTIV" -> "rfb_motivos",
      "K1.D509.MUNIC" -> "rfb_municipios",
      "K1.D509.NATJU" -> "rfb_naturezas",
      "K1.D509.PAIS" -> "rfb_paises",
      "K1.D509.QUALS" -> "rfb_qualificacoes")
    expected.foreach { case (f, t) => assert(RfbTables.route(f).contains(t)) }
  }

  test("__corrigido marker is stripped before routing (main.py:188)") {
    assert(RfbTables.route("K1.D509__corrigido.CNAECSV").contains("rfb_cnaes"))
    assert(RfbTables.route("K1.D509.CNAECSV__corrigido").contains("rfb_cnaes"))
  }

  test("dotless filename uses the whole name (main.py:190)") {
    assert(RfbTables.route("CNAECSV").contains("rfb_cnaes"))
  }

  test("case-insensitive match (uppercased before lookup)") {
    assert(RfbTables.route("k1.d509.cnaecsv").contains("rfb_cnaes"))
  }

  test("unmapped suffix → None → status ignorada (main.py:192-194)") {
    assert(RfbTables.route("FOO.BAR").isEmpty)
    assert(RfbTables.route("K1.D509.LEIAME").isEmpty)
  }
}
