package graft.pipeline

/** Completion/alert hook for pipeline runs.
  *
  * The reference's README claims e-mail alerts on pipeline completion and
  * failure (`READme.md:32-34`) while the code itself only prints the final
  * report (`main.py:222-237`). This trait delivers the README contract as
  * an interface: the pipeline invokes exactly one of these methods at the
  * end of every run, and a deployment plugs in an e-mail/webhook/pager
  * implementation without touching pipeline code. [[StdoutReporter]] is the
  * default and reproduces the reference's printed report.
  */
trait Reporter {
  /** The pipeline ran to completion — `report` carries per-file status,
    * including any failed/pending files (the reference's partial-failure
    * report, `main.py:222-237`).
    */
  def completed(report: PipelineReport): Unit

  /** The monthly publication never appeared within the polling budget; the
    * pipeline aborted before any phase ran (the reference's "PROCESSO
    * INTERROMPIDO" branch, `main.py:281-282`).
    */
  def interrupted(listingUrl: String): Unit

  /** The run DIED — an exception escaped the phases (listing re-fetch,
    * a Spark job failure, a rethrown worker cause). Without this hook the
    * hardest failures were exactly the ones that never alerted (r10
    * review); default keeps existing implementors source-compatible.
    */
  def failed(listingUrl: String, error: Throwable): Unit =
    println(s"\n--- PROCESSO FALHOU: ${error.toString} ---")
}

/** Default reporter: the reference's stdout report, verbatim. */
object StdoutReporter extends Reporter {
  override def completed(report: PipelineReport): Unit = {
    RfbMain.printReport(report)
    println("\n--- PROCESSO CONCLUÍDO! ---")
  }
  override def interrupted(listingUrl: String): Unit =
    println("\n--- PROCESSO INTERROMPIDO! ---")
}
