package graft.sources

import java.io.FileOutputStream
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZipEntriesSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkZip(dir: Path, zipName: String,
      files: Seq[(String, Array[Byte])]): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(dir.resolve(zipName).toFile))
    try files.foreach { case (name, bytes) =>
      z.putNextEntry(new ZipEntry(name)); z.write(bytes); z.closeEntry()
    } finally z.close()
  }

  test("reads every member of every archive; one TASK per member group") {
    val dir = Files.createTempDirectory("zipsrc")
    mkZip(dir, "a.zip", Seq(
      "K1.CNAECSV" -> "0111301;x\n".getBytes("UTF-8"),
      "K2.MUNIC" -> ("y" * 500).getBytes("UTF-8")))
    mkZip(dir, "b.zip", Seq("K3.PAIS" -> "105;Brasil\n".getBytes("UTF-8")))
    Files.write(dir.resolve("not-a-zip.txt"), "ignored".getBytes("UTF-8"))

    val df = spark.read.format("graft.sources.ZipEntriesSource")
      .load(dir.toString)
    val rows = df.select("zip_name", "entry_name", "size").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(
      ("a.zip", "K1.CNAECSV", 10L),
      ("a.zip", "K2.MUNIC", 500L),
      ("b.zip", "K3.PAIS", 11L)))
    // metadata rows are ~free to emit, so the default groups members into
    // one task instead of scheduling 3 single-row tasks (r14 review)
    assert(df.rdd.getNumPartitions === 1)
    // per-member task granularity stays available for compositions that
    // hang heavyweight per-member work off the scan stage
    val perMember = spark.read.format("graft.sources.ZipEntriesSource")
      .option("zip.membersPerPartition", 1).load(dir.toString)
    assert(perMember.rdd.getNumPartitions === 3)
  }

  test("metadata scans chunk members into fixed-size groups") {
    val dir = Files.createTempDirectory("zipsrc6")
    mkZip(dir, "big.zip", (1 to 5).map(i =>
      f"PART$i%d.CSV" -> s"$i\n".getBytes("UTF-8")))
    mkZip(dir, "small.zip", Seq("PART6.CSV" -> "x\n".getBytes("UTF-8"),
      "PART7.CSV" -> "y\n".getBytes("UTF-8")))
    def scan(group: Int) = spark.read
      .format("graft.sources.ZipEntriesSource")
      .option("zip.membersPerPartition", group).load(dir.toString)
    // 7 members at groupSize 3 -> ceil(7/3) = 3 partitions, groups cutting
    // across the archive boundary (5 + 2 members flatten before chunking)
    val g3 = scan(3)
    assert(g3.rdd.getNumPartitions === 3)
    assert(g3.count() === 7L)
    // partition count never exceeds ceil(members/groupSize)
    assert(scan(4).rdd.getNumPartitions === 2)
    assert(scan(100).rdd.getNumPartitions === 1)
    val ex = intercept[Exception](scan(0).collect())
    assert(ex.getMessage.contains("membersPerPartition"))
  }

  test("walks nested directories recursively; empty dir fails fast") {
    val dir = Files.createTempDirectory("zipsrc4")
    val nested = Files.createDirectories(dir.resolve("month=2024-05"))
    mkZip(nested, "deep.zip", Seq("K9.PAIS" -> "105;x\n".getBytes("UTF-8")))
    val df = spark.read.format("graft.sources.ZipEntriesSource")
      .load(dir.toString)
    assert(df.select("entry_name").collect().map(_.getString(0)).toSeq ===
      Seq("K9.PAIS"))

    val empty = Files.createTempDirectory("zipsrc5")
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.ZipEntriesSource")
        .load(empty.toString).collect()
    }
    assert(ex.getMessage.contains("no .zip files") ||
      Option(ex.getCause).exists(_.getMessage.contains("no .zip files")))
  }

  test("name filters prune member partitions at planning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zipsrc7")
    mkZip(dir, "a.zip", Seq(
      "K1.EMPRECSV" -> "x\n".getBytes("UTF-8"),
      "K2.ESTABELE" -> "y\n".getBytes("UTF-8"),
      "K3.SOCIOCSV" -> "z\n".getBytes("UTF-8")))
    mkZip(dir, "b.zip", Seq("K4.EMPRECSV" -> "w\n".getBytes("UTF-8")))
    // membersPerPartition=1 makes member pruning directly observable as
    // the partition count (grouping would fold survivors together)
    val df = spark.read.format("graft.sources.ZipEntriesSource")
      .option("zip.membersPerPartition", 1).load(dir.toString)
    // suffix predicate: only the 2 EMPRECSV members plan as partitions
    val emp = df.filter($"entry_name".endsWith("EMPRECSV"))
    assert(emp.rdd.getNumPartitions === 2)
    assert(emp.select("entry_name").collect().map(_.getString(0)).toSet ===
      Set("K1.EMPRECSV", "K4.EMPRECSV"))
    // conjunction with zip_name narrows to 1
    val one = df.filter($"entry_name".endsWith("EMPRECSV") &&
      $"zip_name" === "b.zip")
    assert(one.rdd.getNumPartitions === 1)
    // non-name predicates (size) are residual-only: no pruning, same rows
    val bySize = df.filter($"size" > 0L)
    assert(bySize.rdd.getNumPartitions === 4)
    assert(bySize.count() === 4L)
    // an IN list written with a DUPLICATE still prunes. Probed: today's
    // Catalyst dedupes In values before the DSv2 pushdown even under an
    // OR branch, so this leg passes either way — it pins the end-to-end
    // shape, while the compile()-side guard (count collected values, not
    // the deduped set — r14 review) defends against any future optimizer
    // that forwards duplicates verbatim.
    val dupIn = df.filter(($"zip_name".isin("b.zip", "b.zip") &&
      $"size" >= 0L) || ($"zip_name" === "b.zip" && $"size" < 0L))
    assert(dupIn.count() === 1L)
    assert(dupIn.rdd.getNumPartitions === 1,
      "duplicate IN values must not disable partition pruning")
    // a HALF-compilable And under Or keeps its compilable side — superset
    // pruning is always safe with all-residual filters, and the size
    // conjunct used to sink the WHOLE Or into no-pruning (r17 review).
    // Unlike dupIn above, the branches share no common factor, so
    // BooleanSimplification can't rescue this shape — it exercises the
    // one-sided compile directly.
    val halfAnd = df.filter(($"entry_name".endsWith("EMPRECSV") &&
      $"size" > 0L) || $"zip_name" === "b.zip")
    assert(halfAnd.count() === 2L)
    assert(halfAnd.rdd.getNumPartitions === 2,
      "one-sided And pruning must survive under Or")
    // NEGATION prunes when the child is exact (r17 verdict #4):
    // `zip_name != 'a.zip'` skips a.zip's 3 members at planning instead
    // of planning a full-archive scan
    val notEq = df.filter($"zip_name" =!= "a.zip")
    assert(notEq.count() === 1L)
    assert(notEq.rdd.getNumPartitions === 1,
      "Not over an exact name predicate must prune")
    val notPrefix = df.filter(!$"entry_name".startsWith("K4"))
    assert(notPrefix.count() === 3L)
    assert(notPrefix.rdd.getNumPartitions === 3,
      "NOT startswith must prune the complement")
    // Not over a HALF-compilable And must NOT prune: the widened And keeps
    // a superset, so its complement would keep a SUBSET and silently drop
    // matching members — correctness first, rows must all come back
    val notHalfAnd = df.filter(!($"entry_name".endsWith("EMPRECSV") &&
      $"size" > 0L))
    assert(notHalfAnd.count() === 2L,
      "negated half-compilable And must not drop rows")
  }

  test("compile(): Not gates on exactness, widened And is non-negatable") {
    import org.apache.spark.sql.sources._
    def c(f: Filter) = ZipScan.compile(f)
    // exact leaves negate exactly
    val notEq = c(Not(EqualTo("zip_name", "a.zip")))
    assert(notEq.exists(_.exact))
    assert(notEq.get.keep("p", "b.zip", "e"))
    assert(!notEq.get.keep("p", "a.zip", "e"))
    // double negation stays exact
    assert(c(Not(Not(StringStartsWith("entry_name", "K")))).exists(_.exact))
    // a half-compilable And compiles WIDENED (superset, non-exact)...
    val half = And(StringEndsWith("entry_name", "EMPRECSV"),
      GreaterThan("size", 0L))
    assert(c(half).exists(!_.exact))
    assert(c(half).get.keep("p", "z", "K1.EMPRECSV"),
      "widened And keeps its compilable conjunct's matches")
    // ...so its negation must NOT compile (complement of a superset
    // under-keeps), while a FULLY-compilable And negates fine
    assert(c(Not(half)).isEmpty)
    val full = And(StringEndsWith("entry_name", "EMPRECSV"),
      EqualTo("zip_name", "a.zip"))
    assert(c(full).exists(_.exact))
    assert(c(Not(full)).exists(_.exact))
    // an Or carrying a widened branch is prunable but non-exact → its
    // negation must not compile either
    val orWide = Or(half, EqualTo("zip_name", "b.zip"))
    assert(c(orWide).exists(!_.exact))
    assert(c(Not(orWide)).isEmpty)
    // Not over an uncompilable child stays uncompilable
    assert(c(Not(GreaterThan("size", 0L))).isEmpty)
  }

  test("duplicate entry names yield distinct rows with their own sizes") {
    // zip legally allows N entries with one name; getEntry(name) resolves
    // them all to the FIRST record, so the reader must emit from the
    // directory record captured at planning, never re-resolve by name
    val dir = Files.createTempDirectory("zipsrc8")
    // ZipOutputStream refuses duplicates, so write the (legal) bytes by
    // hand: two STORED local entries + central directory + EOCD
    val out = new java.io.ByteArrayOutputStream
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    val name = "SAME.CSV".getBytes("UTF-8")
    val datas = Seq("a".getBytes("UTF-8"), "bbbb".getBytes("UTF-8"))
    val offsets = datas.map { d =>
      val off = out.size()
      val crc = new java.util.zip.CRC32; crc.update(d)
      le32(0x04034b50L); le16(20); le16(0); le16(0); le16(0); le16(0)
      le32(crc.getValue); le32(d.length); le32(d.length)
      le16(name.length); le16(0); out.write(name); out.write(d)
      (off, crc.getValue, d.length)
    }
    val cdStart = out.size()
    offsets.foreach { case (off, crc, len) =>
      le32(0x02014b50L); le16(20); le16(20); le16(0); le16(0); le16(0)
      le16(0); le32(crc); le32(len); le32(len); le16(name.length)
      le16(0); le16(0); le16(0); le16(0); le32(0); le32(off); out.write(name)
    }
    val cdSize = out.size() - cdStart
    le32(0x06054b50L); le16(0); le16(0); le16(2); le16(2)
    le32(cdSize); le32(cdStart); le16(0)
    Files.write(dir.resolve("dup.zip"), out.toByteArray)
    val df = spark.read.format("graft.sources.ZipEntriesSource")
      .option("zip.membersPerPartition", 1).load(dir.toString)
    val rows = df.select("entry_name", "size").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.sorted === Seq(("SAME.CSV", 1L), ("SAME.CSV", 4L)))
    assert(df.rdd.getNumPartitions === 2)
  }

  test("distributed planning emits the same partitions as the driver pool") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zipsrc9")
    for (i <- 0 until 5)
      mkZip(dir, f"m$i%02d.zip", Seq(
        f"K$i.EMPRECSV" -> ("e" * (i + 1)).getBytes("UTF-8"),
        f"K$i.ESTABELE" -> ("s" * (i + 10)).getBytes("UTF-8")))
    def scan(threshold: Int, group: Int = 1) = spark.read
      .format("graft.sources.ZipEntriesSource")
      .option("zip.distributedPlanningThreshold", threshold)
      .option("zip.membersPerPartition", group)
      .load(dir.toString)
    // threshold 1 < 5 archives -> distributed pre-pass; default -> driver
    val viaExecutors = scan(1)
    val viaDriver = scan(1000)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))
    assert(viaExecutors.collect().map(key).sorted.toSeq ===
      viaDriver.collect().map(key).sorted.toSeq)
    assert(viaExecutors.rdd.getNumPartitions ===
      viaDriver.rdd.getNumPartitions)
    // grouped chunking preserves dual-path equality too: both paths hand
    // the same path-sorted member list to the chunker (10 members at
    // groupSize 3 -> 4 partitions either way, same rows)
    assert(scan(1, 3).rdd.getNumPartitions === 4)
    assert(scan(1000, 3).rdd.getNumPartitions === 4)
    assert(scan(1, 3).collect().map(key).sorted.toSeq ===
      scan(1000, 3).collect().map(key).sorted.toSeq)
    // name pruning works identically through the distributed path
    val emp = scan(1).filter($"entry_name".endsWith("EMPRECSV"))
    assert(emp.rdd.getNumPartitions === 5)
    assert(emp.count() === 5L)
  }

  test("zip_path disambiguates same-named archives across months and prunes") {
    import spark.implicits._
    // the RFB layout: every month repeats the same archive basenames —
    // zip_name alone silently merged months in any name-keyed audit
    // (r11 review); zip_path recovers the month and its predicates prune
    val dir = Files.createTempDirectory("zipsrcA")
    val m5 = Files.createDirectories(dir.resolve("month=2024-05"))
    val m6 = Files.createDirectories(dir.resolve("month=2024-06"))
    mkZip(m5, "Empresas0.zip", Seq("K1.EMPRECSV" -> "a\n".getBytes("UTF-8")))
    mkZip(m6, "Empresas0.zip", Seq("K1.EMPRECSV" -> "bb\n".getBytes("UTF-8")))
    // membersPerPartition=1 keeps the pruning observable: at the grouped
    // default BOTH members fold into one partition and the count below
    // passes whether or not zip_path pushdown prunes (r15 review)
    val df = spark.read.format("graft.sources.ZipEntriesSource")
      .option("zip.membersPerPartition", 1).load(dir.toString)
    // both months visible and tellable apart
    val byPath = df.select("zip_path", "size").collect()
      .map(r => (r.getString(0).contains("month=2024-05"), r.getLong(1)))
      .toSet
    assert(byPath === Set((true, 2L), (false, 3L)))
    // a month-prefix predicate prunes partitions at planning
    val may = df.filter($"zip_path".contains("month=2024-05"))
    assert(may.rdd.getNumPartitions === 1)
    assert(may.select("size").head.getLong(0) === 2L)
  }

  test("zero or multiple load paths fail with the contract, not an NPE") {
    val ex = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.ZipEntriesSource").load()
        .collect()
    }
    assert(ex.getMessage.contains("exactly ONE load path"))
    val dirA = Files.createTempDirectory("zipsrcB")
    val dirB = Files.createTempDirectory("zipsrcC")
    mkZip(dirA, "a.zip", Seq("K1.PAIS" -> "x\n".getBytes("UTF-8")))
    mkZip(dirB, "b.zip", Seq("K2.PAIS" -> "y\n".getBytes("UTF-8")))
    val ex2 = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.ZipEntriesSource")
        .load(dirA.toString, dirB.toString).collect()
    }
    assert(ex2.getMessage.contains("exactly ONE load path"))
  }

  test("a corrupt archive fails planning with the archive's own error") {
    val dir = Files.createTempDirectory("zipsrcD")
    mkZip(dir, "good.zip", Seq("K1.PAIS" -> "x\n".getBytes("UTF-8")))
    Files.write(dir.resolve("bad.zip"), "not a zip at all".getBytes("UTF-8"))
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.ZipEntriesSource")
        .load(dir.toString).collect()
    }
    // the real ZipException surfaces (not an ExecutionException wrapper)
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.isInstanceOf[java.util.zip.ZipException]),
      chain(ex).map(_.getClass.getName).toString)
    assert(!chain(ex).exists(
      _.isInstanceOf[java.util.concurrent.ExecutionException]))
  }

  test("column pruning reaches the scan") {
    val dir = Files.createTempDirectory("zipsrc2")
    mkZip(dir, "a.zip", Seq("K1.CNAECSV" -> "x\n".getBytes("UTF-8")))
    val df = spark.read.format("graft.sources.ZipEntriesSource")
      .load(dir.toString).select("entry_name")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("K1.CNAECSV"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("entry_name") && !scan.contains("compressed_size"))
  }

  test("joins with the routing map like any other table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zipsrc3")
    mkZip(dir, "a.zip", Seq(
      "K1.D509.CNAECSV" -> "c\n".getBytes("UTF-8"),
      "K1.D509.LEIAME" -> "r\n".getBytes("UTF-8")))
    val entries = spark.read.format("graft.sources.ZipEntriesSource")
      .load(dir.toString)
    val routed = entries
      .withColumn("table",
        graft.streaming.FileArrivalLoad.tableFor($"entry_name"))
    assert(routed.filter($"table".isNotNull).count() === 1)
  }
}
