package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Typed layer over the raw all-string tables (SURVEY §1.2/§7.1 M0: the raw
  * mode preserves reference fidelity — `dtype=str`, `main.py:204` — and this
  * layer adds the real types from the public RFB layout): `yyyyMMdd` strings
  * → DATE, comma-decimal money → DECIMAL, S/N flags → BOOLEAN, plus CNPJ
  * assembly/validation via the native [[graft.functions.CnpjValid]]
  * expression. All conversions are null-safe: RFB uses empty strings and
  * zero-dates ("0"/"00000000") for "absent".
  */
object RfbTyped {
  /** `yyyyMMdd` → DATE, with RFB's empty/zero sentinels → null. */
  def rfbDate(c: Column): Column =
    when(c.isNull || c === "" || c === "0" || c === "00000000", lit(null))
      .otherwise(to_date(c, "yyyyMMdd"))

  /** Comma-decimal money string ("1234,56") → DECIMAL(18,2). */
  def rfbMoney(c: Column): Column =
    regexp_replace(c, ",", ".").cast("decimal(18,2)")

  /** "S"/"N" → BOOLEAN (null-safe). */
  def rfbFlag(c: Column): Column =
    when(c === "S", lit(true)).when(c === "N", lit(false)).otherwise(lit(null))

  /** Apply typed-layer conversions for `table` over a raw positional frame
    * (c0..cN). Unknown tables pass through unchanged.
    */
  def typed(table: String, raw: DataFrame): DataFrame = {
    val named = RfbTables.typedColumns.get(table) match {
      case Some(names) =>
        val keep = raw.columns.filter(!_.startsWith("c")).map(col)
        raw.select(names.zipWithIndex.map { case (nm, i) =>
          col(s"c$i").as(nm)
        } ++ keep: _*)
      case None => return raw
    }
    table match {
      case "rfb_empresas" =>
        named
          .withColumn("capital_social", rfbMoney(col("capital_social")))
      case "rfb_estabelecimentos" =>
        withCnpj(named)
          .withColumn("data_situacao", rfbDate(col("data_situacao")))
          .withColumn("data_inicio", rfbDate(col("data_inicio")))
          .withColumn("data_situacao_especial",
            rfbDate(col("data_situacao_especial")))
          // comma-joined secondary CNAEs → array column
          .withColumn("cnae_secundaria",
            when(col("cnae_secundaria").isNull || col("cnae_secundaria") === "",
              lit(null)).otherwise(split(col("cnae_secundaria"), ",")))
      case "rfb_socios" =>
        named
          .withColumn("data_entrada", rfbDate(col("data_entrada")))
      case "rfb_simples" =>
        named
          .withColumn("opcao_simples", rfbFlag(col("opcao_simples")))
          .withColumn("opcao_mei", rfbFlag(col("opcao_mei")))
          .withColumn("data_opcao_simples", rfbDate(col("data_opcao_simples")))
          .withColumn("data_exclusao_simples", rfbDate(col("data_exclusao_simples")))
          .withColumn("data_opcao_mei", rfbDate(col("data_opcao_mei")))
          .withColumn("data_exclusao_mei", rfbDate(col("data_exclusao_mei")))
      case _ => named
    }
  }

  /** Assemble a full 14-digit CNPJ from its parts and validate it with the
    * codegen'd check-digit expression (estabelecimentos carry
    * basico/ordem/dv as separate columns in the public layout).
    */
  def withCnpj(df: DataFrame, basico: String = "cnpj_basico",
      ordem: String = "cnpj_ordem", dv: String = "cnpj_dv"): DataFrame = {
    val full = concat(
      lpad(col(basico), 8, "0"), lpad(col(ordem), 4, "0"), lpad(col(dv), 2, "0"))
    df.withColumn("cnpj", full)
      .withColumn("cnpj_valido", GraftFunctions.cnpj_valid(col("cnpj")))
  }
}
