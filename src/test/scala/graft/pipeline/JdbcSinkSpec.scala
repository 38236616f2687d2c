package graft.pipeline

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.sql.DriverManager
import java.util.Properties
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JDBC relational sink — parity with the reference's actual deployment
  * (`main.py:198-216`: TRUNCATE then append into a per-month schema, then a
  * `COUNT(*)` read-back gates the load). Runs against embedded Derby (ships
  * with Spark's jars), which exercises the same Spark `jdbc` writer path a
  * Postgres deployment uses.
  */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDb(): String = {
    val dir = Files.createTempDirectory("derby-sink")
    // Derby wants to create the db directory itself
    Files.delete(dir)
    s"jdbc:derby:$dir;create=true"
  }

  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  import spark.implicits._

  test("overwrite is truncate-then-append: second write replaces, not appends") {
    val url = freshDb()
    val sink = new JdbcSink(url, props, numPartitions = 2)
    sink.overwrite(Seq(("1", "a"), ("2", "b"), ("3", "c")).toDF("c0", "c1"),
      "rfb_cnaes", "202401")
    assert(sink.readBack(spark, "rfb_cnaes", "202401").count() === 3)

    sink.overwrite(Seq(("9", "z")).toDF("c0", "c1"), "rfb_cnaes", "202401")
    val after = sink.readBack(spark, "rfb_cnaes", "202401")
    assert(after.count() === 1)
    assert(after.select("c0").as[String].collect().toSeq === Seq("9"))
  }

  test("truncate preserves the existing table's DDL (no drop/recreate)") {
    val url = freshDb()
    // Pre-create the table with VARCHAR columns — as a DBA would — and
    // seed a stale row. Spark's own string mapping for Derby is CLOB, so
    // if the overwrite dropped and recreated the table the column type
    // would flip; TRUNCATE (the reference's semantics, main.py:200-203)
    // keeps the DDL and only clears the rows.
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE SCHEMA rfb_202401")
      st.executeUpdate(
        "CREATE TABLE rfb_202401.rfb_paises (c0 VARCHAR(32), c1 VARCHAR(64))")
      st.executeUpdate(
        "INSERT INTO rfb_202401.rfb_paises VALUES ('stale', 'row')")
      st.close()
    } finally conn.close()

    val sink = new JdbcSink(url, props)
    sink.overwrite(Seq(("105", "Brasil")).toDF("c0", "c1"),
      "rfb_paises", "202401")

    val back = sink.readBack(spark, "rfb_paises", "202401")
    assert(back.count() === 1) // stale row truncated away
    assert(back.select("c0").as[String].collect().toSeq === Seq("105"))
    val conn2 = DriverManager.getConnection(url, props)
    try {
      val rs = conn2.getMetaData.getColumns(null, "RFB_202401", "RFB_PAISES", "C0")
      assert(rs.next())
      assert(rs.getString("TYPE_NAME") === "VARCHAR") // DDL survived
      rs.close()
    } finally conn2.close()
  }

  test("schema-per-month snapshots land side by side") {
    val url = freshDb()
    val sink = new JdbcSink(url, props)
    sink.overwrite(Seq(("105", "Brasil")).toDF("c0", "c1"), "rfb_paises", "202401")
    sink.overwrite(Seq(("105", "Brasil"), ("149", "Chile")).toDF("c0", "c1"),
      "rfb_paises", "202402")
    assert(sink.readBack(spark, "rfb_paises", "202401").count() === 1)
    assert(sink.readBack(spark, "rfb_paises", "202402").count() === 2)
  }

  private def mkZip(dir: Path, zipName: String,
      files: Seq[(String, Array[Byte])]): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(dir.resolve(zipName).toFile))
    try files.foreach { case (name, bytes) =>
      z.putNextEntry(new ZipEntry(name)); z.write(bytes); z.closeEntry()
    } finally z.close()
  }

  private def writeListing(src: Path, zips: Seq[String]): Unit =
    Files.write(src.resolve("listing.html"),
      ("<html><body>" +
        zips.map(z => s"""<a href="$z">$z</a>""").mkString +
        "</body></html>").getBytes(StandardCharsets.UTF_8))

  test("full pipeline run through the JDBC sink: load lands + audit gates") {
    val url = freshDb()
    val src = Files.createTempDirectory("rfb-src")
    val work = Files.createTempDirectory("rfb-work")
    mkZip(src, "Paises.zip", Seq(
      "K1.D509.PAIS" ->
        "105;Brasil\n160;Espanha\n".getBytes(StandardCharsets.ISO_8859_1)))
    writeListing(src, Seq("Paises.zip"))
    val sink = new JdbcSink(url, props)
    val pipe = new RfbPipeline(spark, work, outDir = "/unused", refMonth = "202401",
      fetcher = new LocalFetcher(src), backoffMs = 0, sink0 = sink)
    val entries = pipe.run("http://x/")
    assert(entries.forall(_.statusCarga == Status.Sucesso))
    assert(entries.head.registrosCarregados === 2)
    assert(sink.readBack(spark, "rfb_paises", "202401").count() === 2)
  }

  test("count-audit gate: short read-back marks the load falhou") {
    val url = freshDb()
    val src = Files.createTempDirectory("rfb-src")
    val work = Files.createTempDirectory("rfb-work")
    mkZip(src, "Paises.zip", Seq(
      "K1.D509.PAIS" -> "105;Brasil\n160;Espanha\n".getBytes(StandardCharsets.UTF_8)))
    writeListing(src, Seq("Paises.zip"))
    // A sink whose read-back loses a row (e.g. a concurrent writer or a
    // partial insert) must fail the count audit, reference main.py:207-216.
    val lossy = new JdbcSink(url, props) {
      override def readBack(s: org.apache.spark.sql.SparkSession,
          table: String, refMonth: String) =
        super.readBack(s, table, refMonth).limit(1)
    }
    val pipe = new RfbPipeline(spark, work, outDir = "/unused", refMonth = "202401",
      fetcher = new LocalFetcher(src), backoffMs = 0, sink0 = lossy)
    val entries = pipe.run("http://x/")
    assert(entries.head.statusCarga === Status.Falhou)
    assert(entries.head.registrosCarregados === -1L)
  }
}
