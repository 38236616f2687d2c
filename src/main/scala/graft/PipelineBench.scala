package graft

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.SparkSession

import graft.pipeline.{LocalFetcher, RfbPipeline}

/** Ingestion-path benchmark: the part of the engine that IS the reference
  * (`main.py:240-282` — discover → download → extract → transcode → load →
  * report) timed per phase over a synthetic RFB month, at two fixture
  * scales, with zero network (FIXTURES.md §A recipe served by
  * [[LocalFetcher]]).
  *
  * The month mirrors the real dump's shape: ~37 archives — 10 Empresas
  * parts (7 cols), 10 Estabelecimentos parts (30 cols, Latin-1 with
  * accents so the transcode phase does real charset work), 10 Socios parts
  * (11 cols), 1 Simples (7 cols), 6 dimension zips (2 cols, one with BOM).
  *
  * Emits one JSON line `{"pipeline":{...}}` and writes it DURABLY to its
  * own `pipeline_bench.json` — never by editing `bench_detail.json` in
  * place (r8's in-place string merge was clobbered by the next query-bench
  * run, and re-running it appended duplicate `"pipeline"` keys — the r8
  * ADVICE finding). The query bench ([[Bench]]) embeds this file as the
  * `"pipeline"` section whenever it writes `bench_detail.json`, so the
  * merged view survives in whichever order the two benches run.
  */
object PipelineBench {

  private def mkZip(dir: Path, zipName: String,
      files: Seq[(String, Array[Byte])]): Unit = {
    val z = new ZipOutputStream(
      new FileOutputStream(dir.resolve(zipName).toFile))
    try files.foreach { case (name, bytes) =>
      z.putNextEntry(new ZipEntry(name)); z.write(bytes); z.closeEntry()
    } finally z.close()
  }

  /** Deterministic synthetic month; returns (zip count, total data rows). */
  def genMonth(src: Path, rowsPerPart: Int): (Int, Long) = {
    var totalRows = 0L
    def csv(rows: Iterator[String], cs: java.nio.charset.Charset)
        : Array[Byte] = {
      val sb = new StringBuilder
      rows.foreach { r => sb.append(r).append('\n'); totalRows += 1 }
      sb.toString.getBytes(cs)
    }
    val zips = scala.collection.mutable.ArrayBuffer[String]()
    def add(zip: String, member: String, bytes: Array[Byte]): Unit = {
      mkZip(src, zip, Seq(member -> bytes)); zips += zip
    }
    // 10 Empresas parts — 7 cols, UTF-8
    for (p <- 0 until 10)
      add(s"Empresas$p.zip", s"K3241.K03200Y$p.D50913.EMPRECSV",
        csv(Iterator.range(0, rowsPerPart).map { i =>
          val id = p * rowsPerPart + i
          f"$id%08d;EMPRESA COMERCIAL LTDA $id;2046;49;1000,5$i;03;"
        }, StandardCharsets.UTF_8))
    // 10 Estabelecimentos parts — 30 cols, Latin-1 WITH ACCENTS: the
    // transcode phase must do real charset conversion, not a byte copy
    for (p <- 0 until 10)
      add(s"Estabelecimentos$p.zip", s"K3241.K03200Y$p.D50913.ESTABELE",
        csv(Iterator.range(0, rowsPerPart).map { i =>
          val id = p * rowsPerPart + i
          f"$id%08d;0001;57;1;PADARIA SÃO JOÃO $id;02;20100312;00;;;" +
            "20050607;4712100;4721102,4729699;RUA;AÇAÍ;42;;CENTRO;" +
            "01310100;SP;7107;11;33334444;;;;;PADARIA@EXEMPLO.COM.BR;;"
        }, StandardCharsets.ISO_8859_1))
    // 10 Socios parts — 11 cols, UTF-8
    for (p <- 0 until 10)
      add(s"Socios$p.zip", s"K3241.K03200Y$p.D50913.SOCIOCSV",
        csv(Iterator.range(0, rowsPerPart).map { i =>
          val id = p * rowsPerPart + i
          f"$id%08d;2;JOSÉ DA SILVA $id;***123456**;49;20150101;;;" +
            ";00;4"
        }, StandardCharsets.UTF_8))
    // 1 Simples — 7 cols
    add("Simples.zip", "K3241.K03200Y0.D50913.SIMPLES",
      csv(Iterator.range(0, rowsPerPart).map { i =>
        f"$i%08d;S;20070701;;N;;"
      }, StandardCharsets.UTF_8))
    // 6 dims — 2 cols; Naturezas gets a UTF-8 BOM (main.py:146 semantics)
    add("Cnaes.zip", "K1.D509.CNAECSV",
      csv(Iterator.range(0, 50).map(i => f"$i%07d;Cultivo de café $i"),
        StandardCharsets.UTF_8))
    add("Motivos.zip", "K1.D509.MOTIV",
      csv(Iterator.range(0, 50).map(i => f"$i%02d;Motivo $i"),
        StandardCharsets.UTF_8))
    add("Municipios.zip", "K1.D509.MUNIC",
      csv(Iterator.range(0, 50).map(i => f"$i%04d;Município $i"),
        StandardCharsets.ISO_8859_1))
    val natju = {
      val body = csv(Iterator.range(0, 50).map(i => f"$i%04d;Natureza $i"),
        StandardCharsets.UTF_8)
      Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ body
    }
    add("Naturezas.zip", "K1.D509.NATJU", natju)
    add("Paises.zip", "K1.D509.PAIS",
      csv(Iterator.range(0, 50).map(i => f"$i%03d;País $i"),
        StandardCharsets.UTF_8))
    add("Qualificacoes.zip", "K1.D509.QUALS",
      csv(Iterator.range(0, 50).map(i => f"$i%02d;Qualificação $i"),
        StandardCharsets.UTF_8))
    // listing page the discovery phase parses
    Files.write(src.resolve("listing.html"),
      ("<html><body>" +
        zips.map(z => s"""<a href="$z">$z</a>""").mkString +
        """<a href="leiame.pdf">doc</a></body></html>""")
        .getBytes(StandardCharsets.UTF_8))
    (zips.size, totalRows)
  }

  /** One timed pipeline run at `rowsPerPart`; returns the JSON fragment. */
  def runScale(spark: SparkSession, rowsPerPart: Int): String = {
    val src = Files.createTempDirectory("pipebench-src")
    val work = Files.createTempDirectory("pipebench-work")
    val out = Files.createTempDirectory("pipebench-out")
    operators.MinHashDedup.registerScratchDir(src.toString)
    operators.MinHashDedup.registerScratchDir(work.toString)
    operators.MinHashDedup.registerScratchDir(out.toString)
    val (nZips, nRows) = genMonth(src, rowsPerPart)
    val pipe = new RfbPipeline(spark, work, out.toString, "202601",
      new LocalFetcher(src), backoffMs = 0L, ioParallelism = 8)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (planned, tPlan) = timed(pipe.plan("file://rfb/"))
    val (dl, tDl) = timed(pipe.download(planned))
    val (ex, tEx) = timed(pipe.extract(dl))
    val (fx, tFix) = timed(pipe.fix(ex))
    val (ld, tLoad) = timed(pipe.load(fx))
    val (rep, tRep) = timed(pipe.report(ld))
    val loaded = ld.map(_.registrosCarregados).sum
    require(rep.sucesso == nZips.toLong,
      s"pipeline bench: ${rep.sucesso}/$nZips archives loaded — " +
        rep.failed.map(_.arquivo).mkString(","))
    require(loaded == nRows, s"pipeline bench: $loaded of $nRows rows loaded")
    // locale-INDEPENDENT millisecond rounding: f"%.3f" honors the JVM
    // default locale and emits "0,123" on comma-decimal hosts — invalid
    // JSON that Bench's parse-validated embed silently drops and the
    // driver's json.load rejects (r15 review; the same trap Bench.num
    // documents). Double.toString always uses '.'.
    def s(v: Double): String = (math.round(v * 1000) / 1000.0).toString
    def rate(t: Double): Long = if (t > 0) (nRows / t).toLong else 0L
    s"""{"zips":$nZips,"rows":$nRows,"plan_s":${s(tPlan)},""" +
      s""""download_s":${s(tDl)},"extract_s":${s(tEx)},""" +
      s""""fix_s":${s(tFix)},"load_s":${s(tLoad)},"report_s":${s(tRep)},""" +
      s""""total_s":${s(tPlan + tDl + tEx + tFix + tLoad + tRep)},""" +
      s""""fix_rows_per_s":${rate(tFix)},"load_rows_per_s":${rate(tLoad)}}"""
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // two fixture scales (rows per big-table part): the small one is the
    // per-round smoke shape, the large one makes the distributed fix/load
    // phases dominate the constant phase overheads
    val small = sys.env.getOrElse("SPARK_GRAFT_PIPE_ROWS_SMALL", "2000").toInt
    val large = sys.env.getOrElse("SPARK_GRAFT_PIPE_ROWS_LARGE", "20000").toInt
    val frag =
      s"""{"rows_small":${runScale(spark, small)},""" +
        s""""rows_large":${runScale(spark, large)}}"""
    // overwrite-on-rerun: one well-formed artifact, no duplicate keys
    Files.write(Paths.get("pipeline_bench.json"),
      s"""{"pipeline":$frag}""".getBytes(StandardCharsets.UTF_8))
    // and refresh an EXISTING bench_detail.json in place (real JSON pass,
    // not string surgery) so the merged view holds in the bench-then-
    // pipeline order too — Bench handles the other order by embedding
    // pipeline_bench.json whenever it writes the detail file
    val detail = Paths.get("bench_detail.json")
    if (Files.isRegularFile(detail)) try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper
      val root = m.readTree(Files.readAllBytes(detail))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      root.set[com.fasterxml.jackson.databind.JsonNode](
        "pipeline", m.readTree(frag))
      root.put("pipeline_bench_age_s", 0L)
      Files.write(detail, m.writeValueAsBytes(root))
    } catch { case _: Exception => () } // merge is best-effort; own artifact is the source of truth
    operators.MinHashDedup.clearScratch()
    spark.stop()
    println(s"""{"pipeline":$frag}""")
    System.out.flush()
  }
}
