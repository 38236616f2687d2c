package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TxLog
import graft.pipeline.ParquetSink

/** The composed maintenance entry point (r11 order #5): one pass = log
  * cleanup to the retention horizon, then orphan vacuum — exercised over a
  * full write/overwrite/vacuum/time-travel cycle, and then against a LIVE
  * writer+reader loop where maintenance runs concurrently and no reader may
  * ever fail.
  */
class MaintainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("maintain").resolve("t").toString

  private def commitN(table: String, from: Long, n: Int): Long = {
    var v = from
    (0 until n).foreach { i =>
      v = TxLog.write(spark, table,
        Seq((v.toString, s"row$i")).toDF("c0", "c1"), v, action = "overwrite")
    }
    v
  }

  private def logFiles(table: String): Set[String] = {
    val dir = Paths.get(table, "_txlog")
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toSet
    finally s.close()
  }

  private def dataDirs(table: String): Set[String] = {
    val s = Files.list(Paths.get(table))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("v")).toSet
    finally s.close()
  }

  test("full cycle: write/overwrite 25 versions, maintain, time travel window intact") {
    val t = freshTable()
    val head = commitN(t, 0L, 25)
    assert(head === 25L)
    // plant two crash orphans: a data dir with no commit record, one aged
    // past any retention and one fresh (in-flight writer simulation)
    val aged = Paths.get(t, "v99-deadbeef")
    Files.createDirectories(aged)
    Files.write(aged.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(aged,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 3600_000L))
    val fresh = Paths.get(t, "v98-cafecafe")
    Files.createDirectories(fresh)
    Files.write(fresh.resolve("part-0.parquet"), Array[Byte](4, 5))

    val rep = Maintain.maintainTable(t, keepVersions = 5,
      vacuumRetainMs = 60_000L)
    assert(rep.head === 25L)
    // horizon = 25-5+1 = 21; checkpoint 10 and 20 exist (interval 10); the
    // anchor ≥ 21 is none, so it retreats to ckpt 20 → cleans commits 1-19
    assert(rep.cleanedCommits.nonEmpty)
    val files = logFiles(t)
    (1L to 19L).foreach(v =>
      assert(!files.contains(f"$v%020d.json"), s"commit $v should be cleaned"))
    (20L to 25L).foreach(v =>
      assert(files.contains(f"$v%020d.json") ||
        files.contains(f"$v%020d.checkpoint.json"), s"commit $v must survive"))
    // aged orphan reclaimed, fresh (presumed in-flight) retained
    assert(rep.vacuumedDirs.contains("v99-deadbeef"))
    assert(!rep.vacuumedDirs.contains("v98-cafecafe"))
    assert(dataDirs(t).contains("v98-cafecafe"))
    // head + the retained window still read and time-travel
    assert(TxLog.read(spark, t).count() === 1L)
    (20L to 25L).foreach { v =>
      assert(TxLog.readVersion(spark, t, v).count() === 1L, s"version $v")
    }
    // a second maintenance pass with zero in-flight window reclaims the
    // cleaned versions' data dirs (their commit records are gone) but never
    // a surviving version's
    val rep2 = Maintain.maintainTable(t, keepVersions = 5, vacuumRetainMs = 0L)
    assert(rep2.vacuumedDirs.nonEmpty)
    (20L to 25L).foreach { v =>
      assert(TxLog.readVersion(spark, t, v).count() === 1L,
        s"version $v must survive vacuum")
    }
    // checkpointed v10's record survives cleanup BY DESIGN (Delta's log
    // retention trade) so its data dir stays referenced and readable
    assert(TxLog.readVersion(spark, t, 10L).count() === 1L)
  }

  test("young table (no checkpoint yet): maintenance is a safe no-op on the log") {
    val t = freshTable()
    commitN(t, 0L, 3)
    val rep = Maintain.maintainTable(t, keepVersions = 1, vacuumRetainMs = 0L)
    assert(rep.cleanedCommits.isEmpty)
    assert(TxLog.read(spark, t).count() === 1L)
    (1L to 3L).foreach(v => assert(TxLog.readVersion(spark, t, v).count() === 1L))
  }

  test("never-committed and absent tables: maintenance does not throw") {
    val t = freshTable()
    assert(Maintain.maintainTable(t, 5, 0L).head === 0L)
    Files.createDirectories(Paths.get(t))
    assert(Maintain.maintainTable(t, 5, 0L).head === 0L)
  }

  test("live loop: writer + readers + concurrent maintenance, zero reader failures") {
    val t = freshTable()
    commitN(t, 0L, 12) // past the first checkpoint so cleanup engages early
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def guard(r: => Unit): Runnable = () =>
      try r catch { case e: Throwable => failure.compareAndSet(null, e); stop.set(true) }

    val writer = new Thread(guard {
      var v = TxLog.latestVersion(t).getOrElse(0L)
      var i = 0
      while (!stop.get() && i < 60) {
        try v = TxLog.write(spark, t,
          Seq((i.toString, "x")).toDF("c0", "c1"), v, action = "overwrite")
        catch { case c: TxLog.CommitConflict => v = c.version } // CAS retry
        i += 1
      }
      stop.set(true)
    })
    val readers = (0 until 2).map(_ => new Thread(guard {
      while (!stop.get()) {
        assert(TxLog.read(spark, t).count() === 1L)
      }
    }))
    val traveler = new Thread(guard {
      while (!stop.get()) {
        // travel strictly inside the retention window (keep=8, head-1)
        val head = TxLog.latestVersion(t).getOrElse(0L)
        if (head > 1) assert(TxLog.readVersion(spark, t, head - 1).count() === 1L)
      }
    })
    val maintainer = new Thread(guard {
      while (!stop.get()) {
        // in-flight window far above a single write's latency: a LIVE
        // writer's staged-but-uncommitted dir must never be reclaimed
        Maintain.maintainTable(t, keepVersions = 8, vacuumRetainMs = 30_000L)
        Thread.sleep(20L)
      }
    })
    val all = Seq(writer, traveler, maintainer) ++ readers
    all.foreach(_.start())
    writer.join(120_000L)
    stop.set(true)
    all.foreach(_.join(30_000L))
    assert(failure.get() === null,
      s"live-loop failure: ${Option(failure.get()).map(_.toString)}")
    val head = TxLog.latestVersion(t).getOrElse(0L)
    assert(head >= 60L)
    // the log was actually capped: plain commits far below the final
    // retention horizon are gone (the whole point of running maintenance)
    val files = logFiles(t)
    assert(!files.contains(f"${1L}%020d.json"))
    // and the final state still reads
    assert(TxLog.read(spark, t).count() === 1L)
  }

  test("malformed knobs fall to the usage exit before touching any table (r13 ADVICE)") {
    val t = freshTable()
    commitN(t, 0L, 2)
    val before = logFiles(t)
    // a cron-line typo ('5m', '1h') or a zero keep must exit 2 with the
    // usage message, never a NumberFormatException mid-iteration
    assert(Maintain.run(Array("5m", "0", t)) === 2)
    assert(Maintain.run(Array("5", "1h", t)) === 2)
    assert(Maintain.run(Array("0", "0", t)) === 2)
    assert(Maintain.run(Array("5m", "0", "--lake", t)) === 2)
    // negative retain parses but must ALSO fall to usage: the vacuum cutoff
    // would land in the future and reclaim a live writer's staged dir
    // (r14 review)
    assert(Maintain.run(Array("5", "-900000", t)) === 2)
    assert(Maintain.run(Array("5", "-1", "--lake", t)) === 2)
    assert(logFiles(t) === before, "usage exits must not maintain anything")
    // well-formed knobs still run
    assert(Maintain.run(Array("5", "0", t)) === 0)
  }

  test("--lake discovery finds versioned sink roots only") {
    val out = Files.createTempDirectory("mlake").toString
    val vsink = new ParquetSink(out, versioned = true)
    vsink.overwrite(Seq(("1", "a")).toDF("c0", "c1"), "rfb_paises", "202401")
    // a rename-mode table in the same lake must NOT be discovered
    new ParquetSink(out).overwrite(Seq(("2", "b")).toDF("c0", "c1"),
      "rfb_cnaes", "202401")
    val found = Maintain.discoverLake(Paths.get(out))
    assert(found === Seq(s"$out/rfb_paises/ref_month=202401"))
    // maintaining the discovered lake is a no-op-safe pass
    found.foreach(tbl => Maintain.maintainTable(tbl, 5, 0L))
    assert(vsink.readBack(spark, "rfb_paises", "202401").count() === 1L)
  }

  test("--lake skips a mixed-marker table loudly instead of vacuuming it (r13 order #5)") {
    // the adversarial state TableSink's layout guard refuses to CREATE but
    // a lake can still contain (mid-migration, outside interference): one
    // root carrying BOTH a _txlog and rename-mode artifacts. Maintenance
    // must not vacuum it — the rename protocol owns data the log knows
    // nothing about — and must say so, not silently drop it from the scan.
    val out = Files.createTempDirectory("mlakemix").toString
    val vsink = new ParquetSink(out, versioned = true)
    vsink.overwrite(Seq(("1", "a")).toDF("c0", "c1"), "rfb_paises", "202401")
    vsink.overwrite(Seq(("2", "b")).toDF("c0", "c1"), "rfb_quals", "202401")
    // contaminate rfb_quals with each rename-mode marker in turn
    val root = Paths.get(s"$out/rfb_quals/ref_month=202401")
    for (mk <- Seq(root.resolve("_SUCCESS"),
        root.resolveSibling("_staging_ref_month=202401"),
        root.resolveSibling("_backup_ref_month=202401"))) {
      if (mk.getFileName.toString == "_SUCCESS") Files.createFile(mk)
      else Files.createDirectories(mk)
      val (ok, mixed) = Maintain.classifyLake(Paths.get(out))
      assert(ok === Seq(s"$out/rfb_paises/ref_month=202401"),
        s"marker $mk must exclude the contested root")
      assert(mixed === Seq(root.toString))
      Files.delete(mk)
    }
    // clean again: both discovered
    assert(Maintain.discoverLake(Paths.get(out)).size === 2)
    // end-to-end through run(): the mixed root is reported AND the exit
    // code says so (3, not 0 — cron alerting must notice a permanently
    // unmaintained table; r14 review)
    Files.createFile(root.resolve("_SUCCESS"))
    assert(Maintain.run(Array("5", "0", "--lake", out)) === 3)
    // the contested table's live data survived untouched (nothing vacuumed)
    Files.delete(root.resolve("_SUCCESS"))
    assert(vsink.readBack(spark, "rfb_quals", "202401").count() === 1L)
  }
}
