package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Post-load integrity audits — the README-claimed checks the reference
  * never implemented (`READme.md:27-29`, SURVEY §0.1/§5.1 item 5): essential
  * columns non-null, and column-shift detection (a delimiter bug that slides
  * values one column over would silently corrupt every row; the reference's
  * count-only audit can't see it).
  *
  * All metrics come from ONE pass via `observe()` so the audit adds no extra
  * scan at 100 TB.
  */
object Audits {
  /** Key column + its expected shape per table: every RFB table leads with
    * a numeric code whose width is fixed by the public layout. A low match
    * rate on c0 (or a high match rate of c1 against c0's pattern) indicates
    * a column shift.
    */
  private val keyPattern: Map[String, String] = Map(
    "rfb_empresas" -> "^\\d{8}$",
    "rfb_estabelecimentos" -> "^\\d{8}$",
    "rfb_socios" -> "^\\d{8}$",
    "rfb_simples" -> "^\\d{8}$",
    "rfb_cnaes" -> "^\\d{5,7}$",
    "rfb_motivos" -> "^\\d{1,2}$",
    "rfb_municipios" -> "^\\d{1,4}$",
    "rfb_naturezas" -> "^\\d{3,4}$",
    "rfb_paises" -> "^\\d{1,3}$",
    "rfb_qualificacoes" -> "^\\d{1,2}$")

  case class AuditResult(
      table: String,
      rows: Long,
      keyNulls: Long,
      keyPatternMatches: Long,
      shiftSuspects: Long) {
    /** Pass iff the key column is never null, ≥99% of keys match the
      * expected shape, and fewer rows' c1 look like keys than c0's.
      */
    def passed: Boolean =
      rows == 0 || (keyNulls == 0
        && keyPatternMatches >= (rows * 0.99).toLong
        && shiftSuspects < keyPatternMatches)
  }

  /** Single-pass audit of a raw (c0..cN) loaded table. Attach BEFORE an
    * action (e.g. the parquet write); read the result after.
    */
  def observed(df: DataFrame, table: String): (DataFrame, Observation) = {
    val pat = keyPattern.getOrElse(table, "^.+$")
    val obs = new Observation()
    val out = df.observe(obs,
      count(lit(1)).as("rows"),
      sum(col("c0").isNull.cast("long")).as("key_nulls"),
      sum(col("c0").rlike(pat).cast("long")).as("key_matches"),
      sum((if (df.columns.contains("c1")) col("c1").rlike(pat)
           else lit(false)).cast("long")).as("shift_suspects"))
    (out, obs)
  }

  def result(table: String, obs: Observation): AuditResult = {
    val m = obs.get
    AuditResult(table,
      m("rows").asInstanceOf[Long],
      m("key_nulls").asInstanceOf[Long],
      m("key_matches").asInstanceOf[Long],
      m("shift_suspects").asInstanceOf[Long])
  }

  /** Eager form for an already-loaded table (runs its own action). */
  def run(df: DataFrame, table: String): AuditResult = {
    val (observedDf, obs) = observed(df, table)
    observedDf.foreach(_ => ())
    result(table, obs)
  }
}
