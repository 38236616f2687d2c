package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal lake transaction log — the commit protocol the versioned-dir
  * writers (st16's `$lake/v$N`, the md01 scratch materializations) were
  * missing: without it a crashed writer leaves an orphan `v{N+1}` directory
  * that the next reader may pick up half-written, and two concurrent writers
  * silently clobber each other's version.
  *
  * Reference anchor: the pipeline's manifest ledger
  * (`/root/reference/src/main.py:29-37,103,120,162,220`) gives per-FILE
  * exactly-once via a JSON ledger consulted before work and appended after;
  * this is the same idea applied at TABLE granularity with the Delta-style
  * log layout:
  *
  * {{{
  *   table/
  *     _txlog/00000000000000000001.json   // one file per committed version
  *     _txlog/00000000000000000002.json
  *     v1-3fa9c1d2/ part-*.parquet        // data dirs: writer-unique names,
  *     v2-8be40a77/ part-*.parquet        // immutable once committed
  * }}}
  *
  *  - '''Commit''' = write the commit record to a temp file, then publish it
  *    at `_txlog/<version>.json` via [[Files.createLink]] — an atomic
  *    put-if-absent on POSIX (link(2) fails with EEXIST; a plain rename
  *    silently overwrites, which would let a lagging writer steal a version).
  *    This IS the expected-version CAS: a writer that prepared `v{N+1}`
  *    while another writer committed first gets [[CommitConflict]] and must
  *    re-read + retry against the new state; its orphan data dir is inert.
  *  - '''Read''' = latest committed version only. Data dirs without a commit
  *    file (crashed or losing writers) are invisible by construction —
  *    readers never list data dirs, only the log.
  *  - '''Time travel''' = pin any committed version.
  *  - '''Vacuum''' = delete data dirs no commit references (safe because
  *    losers/crashers never publish).
  *
  * Scale notes: the log is O(commits) tiny JSON files, listed (not read)
  * for the latest version — the same listing a 1000-executor driver does
  * once per query plan, never per task. Data stays in parquet dirs that
  * Spark reads with full pushdown; the protocol adds zero cost to the scan
  * path. A real multi-writer object-store deployment would swap
  * `createLink` for the store's put-if-absent (S3 conditional PUT, ABFS
  * rename-without-overwrite) — the protocol shape is identical.
  */
object TxLog {
  final case class CommitConflict(table: String, version: Long)
      extends RuntimeException(
        s"version $version of $table was committed by another writer")

  final case class Commit(version: Long, dataDir: String, action: String)

  private def logDir(table: String): Path = Paths.get(table, "_txlog")

  private def commitFile(table: String, version: Long): Path =
    logDir(table).resolve(f"$version%020d.json")

  /** Versions with a published commit file, ascending. Listing only — the
    * records themselves are read lazily by [[commitRecord]].
    */
  def versions(table: String): Seq[Long] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".json"))
        .flatMap(n => n.stripSuffix(".json").toLongOption)
        .toSeq.sorted
      finally s.close()
    }
  }

  def latestVersion(table: String): Option[Long] = versions(table).lastOption

  def commitRecord(table: String, version: Long): Commit = {
    val txt = new String(
      Files.readAllBytes(commitFile(table, version)), StandardCharsets.UTF_8)
    def field(k: String): String = {
      val m = s""""$k":"([^"]*)"""".r.findFirstMatchIn(txt)
      m.map(_.group(1)).getOrElse(
        throw new IllegalStateException(s"corrupt commit $version: $txt"))
    }
    Commit(field("version").toLong, field("dataDir"), field("action"))
  }

  /** Publish `dataDir` as version `expected + 1` — the CAS step. The data
    * must already be fully written (it becomes immutable on publish).
    * Throws [[CommitConflict]] if another writer committed first.
    */
  def commit(table: String, expected: Long, dataDir: String,
      action: String = "write"): Long = {
    val version = expected + 1
    val cur = latestVersion(table).getOrElse(0L)
    if (cur != expected) throw CommitConflict(table, cur)
    Files.createDirectories(logDir(table))
    val rec =
      s"""{"version":"$version","dataDir":"$dataDir","action":"$action"}"""
    val tmp = Files.createTempFile(logDir(table), s".tmp-$version-", ".json")
    Files.write(tmp, rec.getBytes(StandardCharsets.UTF_8))
    try Files.createLink(commitFile(table, version), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw CommitConflict(table, version)
    } finally Files.deleteIfExists(tmp)
    version
  }

  /** Write `df` as the next version of `table` with an expected-version CAS:
    * data lands in a fresh UNIQUELY-NAMED staging dir first (never visible
    * to readers), then one atomic publish. The staging name must NOT be
    * derived from the version alone — two writers racing the same expected
    * version would stage into the same path and the loser would clobber the
    * winner's already-committed data before its CAS even fails (caught by
    * TxLogSpec's stale-writer case). Only the log assigns versions; data
    * dir names are writer-unique, exactly like Delta's uniquely-named data
    * files. Returns the committed version; a losing writer's staging dir
    * becomes an orphan that [[vacuum]] reclaims.
    */
  def write(spark: SparkSession, table: String, df: DataFrame,
      expected: Long, action: String = "write"): Long = {
    val version = expected + 1
    val dataDir =
      s"v$version-${java.util.UUID.randomUUID.toString.take(8)}"
    df.write.mode("overwrite").parquet(s"$table/$dataDir")
    commit(table, expected, dataDir, action)
  }

  /** Latest committed state; empty-schema error if never committed. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table,
      latestVersion(table).getOrElse(
        throw new IllegalStateException(s"$table has no committed versions")))

  /** Time travel: the table exactly as of committed `version`. */
  def readVersion(spark: SparkSession, table: String, version: Long)
      : DataFrame = {
    val rec = commitRecord(table, version)
    spark.read.parquet(s"$table/${rec.dataDir}")
  }

  /** Delete data dirs no commit references (orphans from crashed or losing
    * writers). Never touches the log or committed dirs. Returns removed dirs.
    */
  def vacuum(table: String): Seq[String] = {
    val committed = versions(table).map(commitRecord(table, _).dataDir).toSet
    val root = Paths.get(table)
    if (!Files.isDirectory(root)) return Seq.empty
    val s = Files.list(root)
    val orphans =
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("v") &&
          !committed.contains(p.getFileName.toString))
        .toSeq
      finally s.close()
    orphans.foreach(deleteRecursively)
    orphans.map(_.getFileName.toString)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq.foreach(deleteRecursively)
      finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
