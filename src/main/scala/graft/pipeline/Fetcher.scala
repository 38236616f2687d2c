package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Duration

/** Source-acquisition abstraction so the pipeline's retry/state semantics are
  * testable without network (this container has zero egress — tests use
  * [[LocalFetcher]]).
  */
trait Fetcher {

  /** Fetch a small text resource (the monthly directory listing page). */
  def fetchText(url: String): String

  /** Fetch a (large) binary resource to `dest`, streaming — never buffering
    * the whole body (reference streams 8192-byte chunks, `main.py:90-91`).
    */
  def fetchFile(url: String, dest: Path): Unit
}

/** Real HTTP fetcher; 60 s timeout per the reference (`main.py:87`). Retry
  * policy lives in the pipeline, not here, matching `main.py:85-96`.
  */
final class HttpFetcher(timeout: Duration = Duration.ofSeconds(60))
    extends Fetcher {
  private val client =
    HttpClient.newBuilder().connectTimeout(timeout)
      .followRedirects(HttpClient.Redirect.NORMAL).build()

  override def fetchText(url: String): String = {
    val req = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).build()
    val rsp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (rsp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"HTTP ${rsp.statusCode()} for $url")
    rsp.body()
  }

  override def fetchFile(url: String, dest: Path): Unit = {
    val req = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).build()
    if (dest.getParent != null) Files.createDirectories(dest.getParent)
    val rsp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
    if (rsp.statusCode() / 100 != 2) {
      // the body stream is already open on a non-2xx — close it or the
      // connection leaks once per retry attempt (r10 review)
      try rsp.body().close() catch { case _: java.io.IOException => () }
      throw new java.io.IOException(s"HTTP ${rsp.statusCode()} for $url")
    }
    val in = rsp.body()
    // HttpRequest.timeout only bounds time-to-HEADERS; the body read has
    // no timeout of its own, so a server that stalls mid-body would hang
    // the download thread forever (the reference's requests timeout=60
    // applies per socket READ — main.py:87). A watchdog closes the stream
    // when no bytes arrive for `timeout`, which surfaces as an
    // IOException out of Files.copy and feeds the normal retry path.
    val lastRead = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val guarded = new java.io.FilterInputStream(in) {
      override def read(): Int =
        { val n = super.read(); lastRead.set(System.nanoTime()); n }
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        { val n = super.read(b, off, len); lastRead.set(System.nanoTime()); n }
    }
    val watchdog = new Thread({ () =>
      try {
        var stop = false
        while (!stop && !done.get()) {
          val idleMs = (System.nanoTime() - lastRead.get()) / 1000000L
          if (idleMs > timeout.toMillis) {
            try in.close() catch { case _: java.io.IOException => () }
            stop = true
          } else {
            // sleep only to the next possible deadline, capped at 1s: an
            // uncapped (timeout - idle) sleep meant a stall beginning right
            // after a byte arrived was detected only after ~2x the
            // configured timeout, and the daemon lingered a full timeout
            // after each successful download (r10 ADVICE)
            Thread.sleep(math.min(1000L,
              math.max(50L, timeout.toMillis - idleMs)))
          }
        }
      } catch { case _: InterruptedException => () }
    }: Runnable)
    watchdog.setDaemon(true)
    watchdog.start()
    try Files.copy(guarded, dest, StandardCopyOption.REPLACE_EXISTING)
    finally {
      done.set(true)
      watchdog.interrupt()
      try in.close() catch { case _: java.io.IOException => () }
    }
    ()
  }
}

/** Serves "downloads" from a local directory; `failFirst` makes the first N
  * fetches of a given name throw, to exercise the retry/backoff path.
  */
final class LocalFetcher(root: Path, failFirst: Map[String, Int] = Map.empty)
    extends Fetcher {
  private val remaining = scala.collection.mutable.Map(failFirst.toSeq: _*)

  // synchronized: the pipeline downloads files concurrently
  private def maybeFail(name: String): Unit = synchronized {
    remaining.get(name).foreach { n =>
      if (n > 0) {
        remaining(name) = n - 1
        throw new java.io.IOException(s"injected failure for $name ($n left)")
      }
    }
  }

  override def fetchText(url: String): String = {
    // a directory URL (reference convention, trailing '/') serves the
    // listing page; otherwise the named file
    val name = if (url.endsWith("/")) "listing.html" else url.split('/').last
    maybeFail(name)
    new String(Files.readAllBytes(root.resolve(name)),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  override def fetchFile(url: String, dest: Path): Unit = {
    val name = url.split('/').last
    maybeFail(name)
    if (dest.getParent != null) Files.createDirectories(dest.getParent)
    Files.copy(root.resolve(name), dest, StandardCopyOption.REPLACE_EXISTING)
  }
}
