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
    if (rsp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"HTTP ${rsp.statusCode()} for $url")
    val in = rsp.body()
    try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
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
