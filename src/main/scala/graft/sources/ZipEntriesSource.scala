package graft.sources

import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source over ZIP ARCHIVE MEMBERS: each row is one
  * entry of one `.zip` under the load path — name, sizes, compression — so
  * discovery audits ("which members exist, how big, before extracting")
  * run as ordinary distributed queries (SURVEY §2.1 #1/#3: the reference
  * walks archives imperatively on one thread, `main.py:111-115`).
  *
  * Scale shape: the driver LISTS the zip files and reads each archive's
  * CENTRAL DIRECTORY — a bounded tail-of-file metadata read, the same
  * class of work as the parquet footer reads file-source planning does —
  * and emits ONE INPUT PARTITION PER MEMBER. Entry-level splits matter
  * because the real RFB months are skewed: one archive (Estabelecimentos)
  * dominates, and per-archive partitions serialize all downstream
  * per-member work (decompress, transcode, audit) on one task while the
  * other tasks idle. Member bytes never visit the driver — only names and
  * sizes do (the member row IS that metadata). Column pruning is pushed
  * down ([[ZipScan.pruneColumns]]), and name predicates on `zip_name` /
  * `entry_name` prune member partitions at planning
  * ([[ZipScan.pushFilters]]) — the zip analogue of parquet
  * partition-column pruning.
  *
  * Usage: `spark.read.format("graft.sources.ZipEntriesSource").load(dir)`.
  */
class ZipEntriesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipEntriesSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ZipTable(properties.get("path"))
}

object ZipEntriesSource {
  val schema: StructType = StructType(Seq(
    StructField("zip_name", StringType, nullable = false),
    StructField("entry_name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("compressed_size", LongType, nullable = false)))
}

class ZipTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"zip_entries($path)"
  override def schema(): StructType = ZipEntriesSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZipScan(Option(path).getOrElse(options.get("path")),
      ZipEntriesSource.schema)
}

/** Scan + builder + batch in one: the source is simple enough that the
  * three roles share the pruned-schema and pushed-filter state.
  */
class ZipScan(path: String, var required: StructType)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  import org.apache.spark.sql.sources._

  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Member-level filter pushdown: name predicates on `zip_name` /
    * `entry_name` prune INPUT PARTITIONS at planning (each partition IS one
    * member, so a name filter is partition pruning — the zip analogue of
    * parquet's partition-column pruning). Every filter is also returned as
    * a residual so Spark re-applies it — pruning is an optimization, never
    * the correctness boundary.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => compile(f).isDefined)
    filters // all residual: Spark re-evaluates post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** A name filter compiled to a (zipName, entryName) => keep predicate;
    * None = not prunable (left to Spark's residual evaluation).
    */
  private def compile(f: Filter): Option[(String, String) => Boolean] = {
    def col(attr: String): Option[((String, String)) => String] = attr match {
      case "zip_name" => Some(_._1)
      case "entry_name" => Some(_._2)
      case _ => None
    }
    f match {
      case EqualTo(a, v: String) => col(a).map(c => (z, e) => c((z, e)) == v)
      case In(a, vs) =>
        val set = vs.collect { case s: String => s }.toSet
        col(a).filter(_ => set.size == vs.length)
          .map(c => (z, e) => set.contains(c((z, e))))
      case StringStartsWith(a, v) =>
        col(a).map(c => (z, e) => c((z, e)).startsWith(v))
      case StringEndsWith(a, v) =>
        col(a).map(c => (z, e) => c((z, e)).endsWith(v))
      case StringContains(a, v) =>
        col(a).map(c => (z, e) => c((z, e)).contains(v))
      case And(l, r) =>
        for (cl <- compile(l); cr <- compile(r))
          yield (z: String, e: String) => cl(z, e) && cr(z, e)
      case Or(l, r) =>
        for (cl <- compile(l); cr <- compile(r))
          yield (z: String, e: String) => cl(z, e) || cr(z, e)
      case _ => None
    }
  }

  private[sources] def keepPartition(zipName: String, entryName: String)
      : Boolean =
    pushed.forall(f => compile(f).forall(p => p(zipName, entryName)))

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // driver-side: LIST archives, then read each central directory (a
  // bounded metadata read off the archive tail — parquet-footer-class
  // work, parallelized over a small pool exactly like the file source's
  // footer reads) and split to ONE PARTITION PER MEMBER. The walk is
  // RECURSIVE like the built-in file sources, so nested layouts
  // (dir/month=…/x.zip) scan their archives instead of silently yielding
  // an empty table; a directory with zero archives is a loud error for
  // the same reason (a typo'd path must not look like an empty corpus).
  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(path)
    val zips =
      if (Files.isDirectory(p)) {
        val stream = Files.walk(p) // must close: holds directory handles
        val found =
          try stream.iterator().asScala
            .filter(f => Files.isRegularFile(f) &&
              f.toString.toLowerCase.endsWith(".zip")).map(_.toString)
            .toArray.sorted
          finally stream.close()
        if (found.isEmpty) throw new IllegalArgumentException(
          s"zip_entries: no .zip files under '$path' (recursive walk)")
        found
      } else Array(path)
    // central-directory listing per archive, bounded driver pool
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(8, zips.length)))
    try {
      val futures = zips.map { z =>
        val zipName = Paths.get(z).getFileName.toString
        pool.submit(new java.util.concurrent.Callable[Array[InputPartition]] {
          override def call(): Array[InputPartition] = {
            val zf = new ZipFile(z)
            try zf.entries().asScala.filterNot(_.isDirectory)
              .filter(e => keepPartition(zipName, e.getName))
              .map(e => ZipPartition(z, e.getName): InputPartition).toArray
            finally zf.close()
          }
        })
      }
      futures.flatMap(_.get()).toArray
    } finally pool.shutdown()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZipReaderFactory(required.fieldNames)
}

/** One archive MEMBER — the split unit. Carrying the entry name (not its
  * metadata) keeps the partition small and the read executor-side.
  */
case class ZipPartition(zipPath: String, entryName: String)
    extends InputPartition

class ZipReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val zp = partition.asInstanceOf[ZipPartition]
    new ZipEntryReader(zp.zipPath, zp.entryName, fields)
  }
}

/** Executor-side: one member of one archive (looked up by name in the
  * central directory — no decompression; sizes come from the directory
  * record).
  */
class ZipEntryReader(zipPath: String, entryName: String,
    fields: Array[String]) extends PartitionReader[InternalRow] {
  private val zf = new ZipFile(zipPath)
  private val zipName =
    UTF8String.fromString(Paths.get(zipPath).getFileName.toString)
  private var cur: java.util.zip.ZipEntry = _
  private var done = false

  override def next(): Boolean =
    if (done) false
    else {
      cur = zf.getEntry(entryName)
      if (cur == null) throw new IllegalStateException(
        s"zip_entries: member '$entryName' vanished from $zipPath between " +
          "planning and read (archive rewritten mid-query?)")
      done = true
      true
    }

  override def get(): InternalRow =
    InternalRow.fromSeq(fields.toSeq.map {
      case "zip_name" => zipName
      case "entry_name" => UTF8String.fromString(cur.getName)
      case "size" => cur.getSize
      case "compressed_size" => cur.getCompressedSize
    })

  override def close(): Unit = zf.close()
}
