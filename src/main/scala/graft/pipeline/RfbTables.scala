package graft.pipeline

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Filename → table routing and schemas for the 10 RFB tables
  * (reference `mapa_tabelas`, `main.py:166-171`; layouts per the public RFB
  * dictionary, see FIXTURES.md §A).
  */
object RfbTables {
  /** Suffix → destination table (reference `main.py:166-171`). */
  val routing: Map[String, String] = Map(
    "EMPRECSV" -> "rfb_empresas",
    "ESTABELE" -> "rfb_estabelecimentos",
    "SOCIOCSV" -> "rfb_socios",
    "SIMPLES" -> "rfb_simples",
    "CNAECSV" -> "rfb_cnaes",
    "MOTIV" -> "rfb_motivos",
    "MUNIC" -> "rfb_municipios",
    "NATJU" -> "rfb_naturezas",
    "PAIS" -> "rfb_paises",
    "QUALS" -> "rfb_qualificacoes")

  /** Route a (possibly `__corrigido`-suffixed) filename to its table:
    * strip the marker, take the last dot-token uppercased (whole name when
    * dotless), exact map lookup; None → load status `ignorada`
    * (reference `main.py:186-194`).
    */
  def route(fileName: String): Option[String] = {
    // The reference takes `nome.split('__corrigido')[0]` (`main.py:189`),
    // which for `base__corrigido.EXT` drops the extension and can never
    // match the map — a latent routing bug (the repo has no tests). We
    // implement the documented intent: remove the marker, keep the rest.
    val base = java.nio.file.Paths.get(fileName).getFileName.toString
      .replace("__corrigido", "")
    val parts = base.split('.')
    // an all-dots name splits to ZERO tokens — unroutable, not an
    // ArrayIndexOutOfBounds (r10 review)
    if (parts.isEmpty) return None
    val id = (if (parts.length > 1) parts.last else parts(0)).toUpperCase
    routing.get(id)
  }

  /** Raw layer: positional all-string schema (reference
    * `pd.read_csv(..., header=None, dtype=str)`, `main.py:204`).
    */
  def rawSchema(nCols: Int): StructType =
    StructType((0 until nCols).map(i => StructField(s"c$i", StringType)))

  /** Typed-layer column names per table (public RFB layout; FIXTURES.md §A).
    * The raw loader stays all-string for fidelity; these names power the
    * typed view (`Rfb.typedView`).
    */
  val typedColumns: Map[String, Seq[String]] = Map(
    "rfb_empresas" -> Seq("cnpj_basico", "razao_social", "natureza_juridica",
      "qualificacao_responsavel", "capital_social", "porte", "ente_federativo"),
    "rfb_estabelecimentos" -> Seq("cnpj_basico", "cnpj_ordem", "cnpj_dv",
      "matriz_filial", "nome_fantasia", "situacao_cadastral", "data_situacao",
      "motivo_situacao", "cidade_exterior", "pais", "data_inicio",
      "cnae_principal", "cnae_secundaria", "tipo_logradouro", "logradouro",
      "numero", "complemento", "bairro", "cep", "uf", "municipio", "ddd1",
      "telefone1", "ddd2", "telefone2", "ddd_fax", "fax", "email",
      "situacao_especial", "data_situacao_especial"),
    "rfb_socios" -> Seq("cnpj_basico", "identificador_socio", "nome_socio",
      "cnpj_cpf_socio", "qualificacao_socio", "data_entrada", "pais",
      "representante_legal", "nome_representante", "qualificacao_representante",
      "faixa_etaria"),
    "rfb_simples" -> Seq("cnpj_basico", "opcao_simples", "data_opcao_simples",
      "data_exclusao_simples", "opcao_mei", "data_opcao_mei",
      "data_exclusao_mei"),
    "rfb_cnaes" -> Seq("codigo", "descricao"),
    "rfb_motivos" -> Seq("codigo", "descricao"),
    "rfb_municipios" -> Seq("codigo", "descricao"),
    "rfb_naturezas" -> Seq("codigo", "descricao"),
    "rfb_paises" -> Seq("codigo", "descricao"),
    "rfb_qualificacoes" -> Seq("codigo", "descricao"))
}
