package graft.pipeline

import java.time.Month
import java.time.format.TextStyle
import java.util.Locale

/** Period resolution + pt-BR naming (reference `main.py:243-259`,
  * SURVEY §2.1 #17): snapshot namespace `rfb_YYYYMM`, the reference's
  * `"{M}. {MonthName-pt_BR}"` destination folder, and the monthly listing
  * URL layout `.../{ano}-{mes}/`.
  */
object Period {
  private val ptBr = Locale.forLanguageTag("pt-BR")

  def refMonth(year: Int, month: Int): String = f"$year%04d$month%02d"

  def schemaName(year: Int, month: Int): String = s"rfb_${refMonth(year, month)}"

  /** Same snapshot namespace from an already-formatted `YYYYMM`. */
  def schemaName(refMonth: String): String = s"rfb_$refMonth"

  /** `"9. Setembro"` — the reference's locale-named month folder. Note
    * month 3 is "Março": creating that directory requires a UTF-8
    * `sun.jnu.encoding` (any modern distro; POSIX-locale JVMs fail).
    */
  def folderName(year: Int, month: Int): String = {
    val name = Month.of(month).getDisplayName(TextStyle.FULL, ptBr)
    s"$month. ${name.substring(0, 1).toUpperCase(ptBr)}${name.substring(1)}"
  }

  def listingUrl(base: String, year: Int, month: Int): String =
    f"$base$year%04d-$month%02d/"
}

/** The README-claimed (but unimplemented) "vigilante" monitor (reference
  * `READme.md:7-9`, SURVEY §0.1): poll the monthly listing until the
  * publication appears, then hand the listing to the pipeline. The sleep is
  * injectable so tests drive it synchronously; in production the same loop
  * runs on a scheduler (or the file-arrival stream plays this role,
  * SURVEY §2.2 streaming row).
  */
class Vigilante(
    fetcher: Fetcher,
    pollIntervalMs: Long = 24L * 3600 * 1000,
    sleeper: Long => Unit = Thread.sleep) {

  /** Poll until the listing page exists and contains at least one zip.
    * Returns the zip names, or None after `maxPolls` misses.
    */
  def awaitPublication(listingUrl: String, maxPolls: Int): Option[Seq[String]] = {
    var polls = 0
    while (polls < maxPolls) {
      polls += 1
      val zips =
        // only I/O failures mean "not published yet": the old blanket
        // Exception catch swallowed InterruptedException (turning a
        // shutdown request into another 24 h sleep) and converted
        // permanent config errors (malformed baseUrl) into a silent
        // poll-budget burn (r10 review)
        try RfbPipeline.parseListing(fetcher.fetchText(listingUrl))
        catch { case _: java.io.IOException => Seq.empty }
      if (zips.nonEmpty) return Some(zips)
      if (polls < maxPolls) sleeper(pollIntervalMs)
    }
    None
  }
}
