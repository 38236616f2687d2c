package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FileArrivalLoadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def drop(dir: Path, name: String, content: String): Unit =
    Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))

  test("arriving corrected files route and append incrementally; " +
    "unroutable files are ignored") {
    val watch = Files.createTempDirectory("fa-watch")
    val out = Files.createTempDirectory("fa-out").toString
    val ckpt = Files.createTempDirectory("fa-ckpt").toString

    drop(watch, "K1.D509__corrigido.CNAECSV",
      "0111301;Cultivo de café\n0111302;Ação agrícola\n")
    val q = FileArrivalLoad.start(spark, watch.toString, out, ckpt, nCols = 2)
    try {
      q.processAllAvailable()
      val cnaes = spark.read.parquet(out)
      assert(cnaes.filter(cnaes("table") === "rfb_cnaes").count() === 2)

      // second arrival: a different table + an unroutable file
      drop(watch, "K1.D509__corrigido.PAIS", "105;Brasil\n")
      drop(watch, "K1.D509__corrigido.LEIAME", "readme;x\n")
      q.processAllAvailable()
      val all = spark.read.parquet(out)
      assert(all.filter(all("table") === "rfb_paises").count() === 1)
      assert(all.filter(all("table") === "rfb_cnaes").count() === 2)
      assert(all.count() === 3) // LEIAME dropped (ignorada)
    } finally q.stop()

    // restart against the same checkpoint: nothing reprocessed (the
    // checkpointed file index is the manifest)
    val q2 = FileArrivalLoad.start(spark, watch.toString, out, ckpt, nCols = 2)
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(out).count() === 3)
    } finally q2.stop()
  }

  test("a correction with an ancient mtime is still ingested (no 7-day age cutoff)") {
    // FileStreamSource's default maxFileAge=7d silently skips any file
    // whose mtime trails the newest seen file by more than a week — a
    // corrected CSV copied in with its original timestamp (cp -p /
    // rsync -a) would be ingested ZERO times in the component whose
    // contract is exactly-once (r11 review). The checkpointed file log is
    // the dedup authority, so the age filter is effectively disabled.
    val watch = Files.createTempDirectory("fa-age-watch")
    val out = Files.createTempDirectory("fa-age-out").toString
    val ckpt = Files.createTempDirectory("fa-age-ckpt").toString
    drop(watch, "K1.D509__corrigido.CNAECSV", "0111301;fresh\n")
    val q = FileArrivalLoad.start(spark, watch.toString, out, ckpt, nCols = 2)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 1)
      // the late correction, carrying its original month-old timestamp
      drop(watch, "K2.D509__corrigido.PAIS", "105;Brasil\n")
      Files.setLastModifiedTime(watch.resolve("K2.D509__corrigido.PAIS"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis - 30L * 24 * 3600 * 1000))
      q.processAllAvailable()
      val all = spark.read.parquet(out)
      assert(all.filter(all("table") === "rfb_paises").count() === 1,
        "month-old-mtime correction must be ingested, not age-filtered")
    } finally q.stop()
  }

  test("in-query routing matches the batch router on the suffix grammar") {
    import spark.implicits._
    val names = Seq(
      "/x/K1.D509__corrigido.CNAECSV", "/x/K2.EMPRECSV",
      "/x/K3.D509__corrigido.ESTABELE", "/x/SIMPLES", "/x/weird.UNKNOWN",
      // trailing-dot and all-dots forms: split('.') drops trailing empty
      // tokens, so "X." routes like dotless "X" — the stream regex must
      // agree, and "..." is unroutable on both, not a crash (r10 review)
      "/x/EMPRECSV.", "/x/K4.SOCIOCSV..", "/x/...")
    val got = names.toDF("f")
      .select(FileArrivalLoad.tableFor($"f").as("t"))
      .as[Option[String]].collect().toSeq
    val expected = names.map(n =>
      graft.pipeline.RfbTables.route(n.split('/').last))
    assert(got === expected)
  }
}
