package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Typed-layer flagship query (SURVEY §7.1 M1): establishments per CNAE
  * description, end to end through `typedView` over the lake layout the
  * pipeline writes — the typed layer carrying a real analytical workload,
  * not just renaming columns.
  */
class RfbQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A raw 30-column estabelecimentos row (positional public layout),
    * defaulting every cell to "" and setting only what the test needs.
    */
  private def estab(
      basico: String, ordem: String, dv: String,
      situacao: String, dataInicio: String, cnae: String): Row =
    Row.fromSeq(Seq.tabulate(30) {
      case 0 => basico
      case 1 => ordem
      case 2 => dv
      case 5 => situacao
      case 10 => dataInicio
      case 11 => cnae
      case _ => ""
    })

  test("establishments per CNAE through typedView: golden result + plan") {
    val out = Files.createTempDirectory("rfb-lake")
    val work = Files.createTempDirectory("rfb-work")

    // lake layout the pipeline writes: outDir/<table>/ref_month=YYYYMM
    val estabs = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        // 11.222.333/0001-81 — check digits valid
        estab("11222333", "0001", "81", "02", "20200115", "0111301"),
        estab("11222333", "0002", "62", "02", "20210301", "0111301"),
        estab("99887766", "0001", "00", "02", "20190710", "4711302"),
        // baixada (08) — excluded by the active filter
        estab("55555555", "0001", "00", "08", "20100101", "0111301"))),
      RfbTables.rawSchema(30))
    estabs.write.parquet(s"$out/rfb_estabelecimentos/ref_month=202601")

    import spark.implicits._
    Seq(("0111301", "Cultivo de café"), ("4711302", "Comércio varejista"),
      ("9999999", "Sem estabelecimentos"))
      .toDF("c0", "c1")
      .write.parquet(s"$out/rfb_cnaes/ref_month=202601")

    val pipe = new RfbPipeline(spark, work, out.toString, "202601",
      new LocalFetcher(work))
    val estabTyped = pipe.typedView("rfb_estabelecimentos")
    val cnaesTyped = pipe.typedView("rfb_cnaes")

    // typed layer really typed: dates are DATE, cnpj assembled + validated
    assert(estabTyped.schema("data_inicio").dataType.typeName === "date")
    val first = estabTyped.filter($"cnpj_ordem" === "0001" &&
      $"cnpj_basico" === "11222333").select("cnpj", "cnpj_valido").head()
    assert(first.getString(0) === "11222333000181")
    assert(first.getBoolean(1))

    val result = RfbQueries.establishmentsPerCnae(estabTyped, cnaesTyped)
    val got = result.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("0111301", "Cultivo de café", 2L),
      ("4711302", "Comércio varejista", 1L)))

    // scale shape: the tiny CNAE dim is broadcast, and the aggregation sits
    // BELOW the join (shuffle carries distinct CNAEs, not establishments)
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
