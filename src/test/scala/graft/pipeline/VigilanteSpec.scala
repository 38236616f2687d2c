package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class VigilanteSpec extends AnyFunSuite {
  test("period naming: schema, ref_month, pt-BR folder, listing URL") {
    assert(Period.refMonth(2026, 1) == "202601")
    assert(Period.schemaName(2026, 1) == "rfb_202601")
    assert(Period.folderName(2026, 1) == "1. Janeiro")
    assert(Period.folderName(2026, 9) == "9. Setembro")
    assert(Period.folderName(2026, 12) == "12. Dezembro")
    assert(Period.listingUrl("http://x/dados/", 2026, 3) ==
      "http://x/dados/2026-03/")
  }

  test("vigilante polls until the publication appears") {
    val src = Files.createTempDirectory("vig")
    // listing absent for the first two polls, then published
    val fetcher = new LocalFetcher(src, failFirst = Map("listing.html" -> 2))
    Files.write(src.resolve("listing.html"),
      """<a href="Empresas0.zip">z</a>""".getBytes(StandardCharsets.UTF_8))
    var sleeps = 0
    val vig = new Vigilante(fetcher, pollIntervalMs = 123L,
      sleeper = ms => { assert(ms == 123L); sleeps += 1 })
    val got = vig.awaitPublication("file://rfb/", maxPolls = 5)
    assert(got.contains(Seq("Empresas0.zip")))
    assert(sleeps == 2)
  }

  test("vigilante gives up after maxPolls without publication") {
    val src = Files.createTempDirectory("vig2") // no listing.html at all
    val vig = new Vigilante(new LocalFetcher(src), sleeper = _ => ())
    assert(vig.awaitPublication("file://rfb/", maxPolls = 3).isEmpty)
  }
}
