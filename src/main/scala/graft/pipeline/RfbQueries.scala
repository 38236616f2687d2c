package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Analytical queries over the TYPED layer (SURVEY §7.1 M1 flagship) — the
  * workload the reference's loaded warehouse exists to serve. These run on
  * [[RfbPipeline.typedView]] output, proving the typed layer is load-bearing:
  * the raw all-string tables stay reference-faithful, and analysis gets real
  * names/types without re-reading the CSVs.
  */
object RfbQueries {

  /** Active establishments per principal CNAE, with the human description.
    *
    * Scale shape (60M establishments vs ~1.4k CNAE codes): aggregate FIRST —
    * the shuffle carries one row per distinct CNAE, not per establishment —
    * then hash-join the tiny dimension with an explicit `broadcast`. The
    * filter on `situacao_cadastral` (02 = ativa in the public layout) is a
    * pushable string equality that prunes before the aggregation.
    */
  def establishmentsPerCnae(
      estabelecimentos: DataFrame, cnaes: DataFrame): DataFrame =
    estabelecimentos
      .filter(col("situacao_cadastral") === "02")
      .groupBy("cnae_principal")
      .agg(count(lit(1)).as("estabelecimentos"))
      .join(broadcast(cnaes.select(
        col("codigo").as("cnae_principal"), col("descricao"))),
        Seq("cnae_principal"), "left")
      .select(col("cnae_principal"), col("descricao"), col("estabelecimentos"))
      .orderBy(desc("estabelecimentos"), asc("cnae_principal"))
}
