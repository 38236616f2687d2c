package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Pipeline status machine values (reference `main.py:65-71`). */
object Status {
  val Pendente = "pendente"
  val Sucesso = "sucesso"
  val Falhou = "falhou"
  val Ignorada = "ignorada"
}

/** One manifest entry per source zip — the per-file state machine that makes
  * the pipeline resumable and idempotent at file granularity (reference
  * `main.py:65-71`, `:51-53`). The reference's nested `validacoes` map is
  * flattened into the `linhas*`/`registros*` fields.
  *
  * Divergence from the reference (deliberate, documented): `arquivosCorrigidos`
  * is a list — ALL files of a multi-entry zip are corrected and loaded, not
  * just the first (`main.py:130` quirk, SURVEY §3.3).
  */
case class ManifestEntry(
    arquivo: String,
    url: String,
    statusDownload: String = Status.Pendente,
    statusExtracao: String = Status.Pendente,
    statusCorrecao: String = Status.Pendente,
    statusCarga: String = Status.Pendente,
    tentativasDownload: Int = 0,
    caminhoZip: String = "",
    arquivosExtraidos: Seq[String] = Nil,
    arquivosCorrigidos: Seq[String] = Nil,
    tabelasDestino: Seq[String] = Nil,
    linhasOriginais: Long = -1L,
    linhasCorrigidas: Long = -1L,
    registrosCarregados: Long = -1L)

/** Manifest persistence: a `Dataset[ManifestEntry]` checkpointed as JSON
  * (SURVEY §1.3). Saved after every per-file state transition, matching the
  * reference's crash-resume granularity (`main.py:103,120,162,220`).
  *
  * Writes go driver-side via java.nio (atomic rename) — the manifest is tiny
  * (~37 rows/month) so a Spark job per save would be pure overhead; reads go
  * through the Spark JSON source so the schema stays the Encoder's.
  */
object Manifest {
  private val schema = Encoders.product[ManifestEntry].schema

  def exists(path: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path))

  def save(path: String, entries: Seq[ManifestEntry]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def arr(xs: Seq[String]): String = xs.map(q).mkString("[", ",", "]")
    val lines = entries.map { e =>
      s"""{"arquivo":${q(e.arquivo)},"url":${q(e.url)}""" +
        s""","statusDownload":${q(e.statusDownload)}""" +
        s""","statusExtracao":${q(e.statusExtracao)}""" +
        s""","statusCorrecao":${q(e.statusCorrecao)}""" +
        s""","statusCarga":${q(e.statusCarga)}""" +
        s""","tentativasDownload":${e.tentativasDownload}""" +
        s""","caminhoZip":${q(e.caminhoZip)}""" +
        s""","arquivosExtraidos":${arr(e.arquivosExtraidos)}""" +
        s""","arquivosCorrigidos":${arr(e.arquivosCorrigidos)}""" +
        s""","tabelasDestino":${arr(e.tabelasDestino)}""" +
        s""","linhasOriginais":${e.linhasOriginais}""" +
        s""","linhasCorrigidas":${e.linhasCorrigidas}""" +
        s""","registrosCarregados":${e.registrosCarregados}}"""
    }
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.write(tmp,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def load(spark: SparkSession, path: String): Seq[ManifestEntry] = {
    import spark.implicits._
    if (!exists(path)) Seq.empty
    else spark.read.schema(schema).json(path).as[ManifestEntry].collect().toSeq
  }

  def toDataset(spark: SparkSession, entries: Seq[ManifestEntry])
      : Dataset[ManifestEntry] = {
    import spark.implicits._
    spark.createDataset(entries)
  }
}
