package graft.pipeline

import java.io.FileOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Real HTTP path: the pipeline against a local JDK HttpServer serving a
  * listing page + zips (the container has no egress, so this is the only
  * way to exercise [[HttpFetcher]] end-to-end).
  */
class HttpFetcherSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def respond(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    x.sendResponseHeaders(code, body.length)
    x.getResponseBody.write(body)
    x.close()
  }

  test("pipeline runs over real HTTP: listing, zip download, retry on 500") {
    val zipBytes: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new ZipOutputStream(bos)
      z.putNextEntry(new ZipEntry("K1.D509.MUNIC"))
      z.write("0001;São Paulo\n0002;Santos\n".getBytes(StandardCharsets.UTF_8))
      z.closeEntry(); z.close()
      bos.toByteArray
    }
    val listing =
      """<html><a href="Municipios.zip">Municipios.zip</a>
        |<a href="ignored.pdf">x</a></html>""".stripMargin
        .getBytes(StandardCharsets.UTF_8)

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val failuresLeft = new java.util.concurrent.atomic.AtomicInteger(1)
    server.createContext("/dados/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val path = x.getRequestURI.getPath
        if (path.endsWith("/")) respond(x, 200, listing)
        else if (path.endsWith("Municipios.zip")) {
          // first zip request fails → exercises the retry loop
          if (failuresLeft.getAndDecrement() > 0) respond(x, 500, Array[Byte]())
          else respond(x, 200, zipBytes)
        } else respond(x, 404, Array[Byte]())
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/dados/2026-01/"
      val work = Files.createTempDirectory("rfb-http-work")
      val out = Files.createTempDirectory("rfb-http-out")
      val pipe = new RfbPipeline(spark, work, out.toString, "202601",
        new HttpFetcher(), backoffMs = 0L)
      val done = pipe.run(base)
      assert(done.map(_.arquivo) == Seq("Municipios.zip"))
      assert(done.head.statusCarga == Status.Sucesso)
      val rows = spark.read.parquet(s"$out/rfb_municipios").collect()
      assert(rows.map(_.getString(1)).toSet == Set("São Paulo", "Santos"))
    } finally server.stop(0)
  }

  test("mid-body stall is cut by the watchdog near the configured timeout") {
    // headers + one byte arrive, then the server stalls forever: the
    // HttpRequest timeout only bounds time-to-headers, so without the
    // watchdog this download hangs. The capped 1 s re-check (r10 ADVICE)
    // bounds detection near timeout + 1 s even when the stall begins
    // right after a byte lands.
    val stallForever = new java.util.concurrent.CountDownLatch(1)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/slow.bin", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        x.sendResponseHeaders(200, 1000000L)
        x.getResponseBody.write(42)
        x.getResponseBody.flush()
        stallForever.await() // never released: stall until client cuts us
      }
    })
    server.start()
    try {
      val f = new HttpFetcher(java.time.Duration.ofMillis(500))
      val dest = Files.createTempDirectory("stall").resolve("slow.bin")
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/slow.bin"
      val t0 = System.nanoTime()
      intercept[java.io.IOException](f.fetchFile(url, dest))
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(elapsedMs < 10000L,
        s"stall detection must be bounded near the timeout, took ${elapsedMs}ms")
    } finally {
      stallForever.countDown()
      server.stop(0)
    }
  }

  test("404 listing surfaces as an error (no silent empty manifest)") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => respond(x, 404, Array[Byte]()))
    server.start()
    try {
      val f = new HttpFetcher()
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/missing/"
      intercept[java.io.IOException](f.fetchText(url))
    } finally server.stop(0)
  }
}
