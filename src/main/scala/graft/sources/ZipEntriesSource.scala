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
  * Scale shape: planning LISTS the zip files and reads each archive's
  * CENTRAL DIRECTORY — a bounded tail-of-file metadata read, the same
  * class of work as the parquet footer reads file-source planning does —
  * and emits ONE INPUT PARTITION PER MEMBER, carrying the member's
  * directory record (name + sizes) in the partition itself. Entry-level
  * splits matter because the real RFB months are skewed: one archive
  * (Estabelecimentos) dominates, and per-archive partitions serialize all
  * downstream per-member work (decompress, transcode, audit) on one task
  * while the other tasks idle. Carrying the record (16 bytes of metadata)
  * instead of re-resolving the name at read time also makes DUPLICATE
  * entry names — legal in zip — come back as N distinct rows with their
  * own sizes (`ZipFile.getEntry(name)` resolves every duplicate to the
  * first record), and drops the per-task archive reopen entirely: the
  * reader emits straight from the partition. Member BYTES never visit
  * anything — this is a metadata source.
  *
  * Directory reads run on a bounded driver pool for ordinary months
  * (~37 archives), and shift to a distributed Spark job when the archive
  * count exceeds `zip.distributedPlanningThreshold` (default 64) — at
  * 100k archives a serial driver walk is the planning bottleneck, the
  * same evolution parquet footer reading went through. Both paths emit
  * identical partitions (spec-asserted).
  *
  * Column pruning is pushed down ([[ZipScan.pruneColumns]]), and name
  * predicates on `zip_name` / `entry_name` prune member partitions at
  * planning ([[ZipScan.pushFilters]]) — the zip analogue of parquet
  * partition-column pruning. Pushed filters are compiled ONCE per scan
  * (not per member × filter — the planning walk is O(members)).
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
  // zip_path (the full archive path) disambiguates what zip_name cannot:
  // the recursive nested layout this source advertises (dir/month=…/x.zip)
  // repeats the same archive BASENAMES every month, so a basename-only
  // schema silently merged months in any zip_name-keyed audit (r11 review)
  val schema: StructType = StructType(Seq(
    StructField("zip_path", StringType, nullable = false),
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

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val resolved = Option(path).getOrElse(options.get("path"))
    // fail with the actual contract, not a Paths.get(null) NPE at planning:
    // load() with zero paths or load(a, b) with several stores a "paths"
    // (plural) property and leaves "path" null (r11 review)
    if (resolved == null) throw new IllegalArgumentException(
      "zip_entries requires exactly ONE load path (a .zip file or a " +
        "directory to walk recursively); multiple load(...) paths are not " +
        "supported — union several reads instead")
    new ZipScan(resolved,
      ZipEntriesSource.schema,
      options.getInt("zip.distributedPlanningThreshold",
        ZipScan.DefaultDistributedPlanningThreshold))
  }
}

object ZipScan {
  /** Archive count above which central-directory reads ship to executors
    * instead of the driver pool. ~37-archive months stay driver-side (a
    * Spark job has fixed latency the small case shouldn't pay); a lake of
    * archives plans distributed.
    */
  val DefaultDistributedPlanningThreshold = 64

  import org.apache.spark.sql.sources._

  /** A name filter compiled to a (zipPath, zipName, entryName) => keep
    * predicate; None = not prunable (left to Spark's residual evaluation).
    * zip_path predicates prune too — a `month=…` path-prefix filter is the
    * at-scale partition-pruning shape. Static so the distributed planning
    * closure captures filters (serializable), never the scan.
    */
  private[sources] def compile(f: Filter)
      : Option[(String, String, String) => Boolean] = {
    type Row3 = (String, String, String)
    def col(attr: String): Option[Row3 => String] = attr match {
      case "zip_path" => Some(_._1)
      case "zip_name" => Some(_._2)
      case "entry_name" => Some(_._3)
      case _ => None
    }
    f match {
      case EqualTo(a, v: String) =>
        col(a).map(c => (p, z, e) => c((p, z, e)) == v)
      case In(a, vs) =>
        // the all-strings probe counts the COLLECTED values, not the
        // deduped set: an IN list carrying a duplicate (survives when
        // OptimizeIn doesn't fold, e.g. under an OR branch) made
        // set.size != vs.length and silently disabled pruning for a
        // perfectly compilable filter (r14 review)
        val strs = vs.collect { case s: String => s }
        val set = strs.toSet
        col(a).filter(_ => strs.length == vs.length)
          .map(c => (p, z, e) => set.contains(c((p, z, e))))
      case StringStartsWith(a, v) =>
        col(a).map(c => (p, z, e) => c((p, z, e)).startsWith(v))
      case StringEndsWith(a, v) =>
        col(a).map(c => (p, z, e) => c((p, z, e)).endsWith(v))
      case StringContains(a, v) =>
        col(a).map(c => (p, z, e) => c((p, z, e)).contains(v))
      case And(l, r) =>
        for (cl <- compile(l); cr <- compile(r))
          yield (p: String, z: String, e: String) => cl(p, z, e) && cr(p, z, e)
      case Or(l, r) =>
        for (cl <- compile(l); cr <- compile(r))
          yield (p: String, z: String, e: String) => cl(p, z, e) || cr(p, z, e)
      case _ => None
    }
  }

  /** One archive's members as partitions: central-directory iteration (no
    * decompression), keep-filtered, with each member's directory record
    * captured in its partition. Runs on the driver pool OR inside the
    * distributed planning job — one body, identical partitions either path.
    */
  private[sources] def membersOf(zipPath: String,
      keep: Array[(String, String, String) => Boolean]): Array[ZipPartition] = {
    val zipName = Paths.get(zipPath).getFileName.toString
    val zf = new ZipFile(zipPath)
    try zf.entries().asScala.zipWithIndex
      .filterNot(_._1.isDirectory)
      .filter { case (e, _) => keep.forall(_(zipPath, zipName, e.getName)) }
      .map { case (e, i) =>
        ZipPartition(zipPath, e.getName, e.getSize, e.getCompressedSize, i)
      }
      .toArray
    finally zf.close()
  }
}

/** Scan + builder + batch in one: the source is simple enough that the
  * three roles share the pruned-schema and pushed-filter state.
  */
class ZipScan(path: String, var required: StructType,
    distThreshold: Int = ZipScan.DefaultDistributedPlanningThreshold)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  import org.apache.spark.sql.sources._

  private var pushed: Array[Filter] = Array.empty
  // compiled ONCE here; the planning walk applies them O(members) times
  private var compiled: Array[(String, String, String) => Boolean] = Array.empty

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
    val compilable = filters.flatMap(f => ZipScan.compile(f).map(f -> _))
    pushed = compilable.map(_._1)
    compiled = compilable.map(_._2)
    filters // all residual: Spark re-evaluates post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // Planning: LIST archives, then read each central directory and split to
  // ONE PARTITION PER MEMBER carrying its directory record. The walk is
  // RECURSIVE like the built-in file sources, so nested layouts
  // (dir/month=…/x.zip) scan their archives instead of silently yielding
  // an empty table; a directory with zero archives is a loud error for
  // the same reason (a typo'd path must not look like an empty corpus).
  // ≤ distThreshold archives: bounded driver pool (parquet-footer-class
  // work). Above it: a Spark job reads directories on executors and
  // collects only the member metadata — the driver never serially opens
  // 100k archive tails.
  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(path)
    val zips =
      if (Files.isDirectory(p)) {
        val stream = Files.walk(p) // must close: holds directory handles
        val found =
          try stream.iterator().asScala
            .filter(f => Files.isRegularFile(f) &&
              f.toString.toLowerCase(java.util.Locale.ROOT)
                .endsWith(".zip")).map(_.toString)
            .toArray.sorted
          finally stream.close()
        if (found.isEmpty) throw new IllegalArgumentException(
          s"zip_entries: no .zip files under '$path' (recursive walk)")
        found
      } else Array(path)
    val parts =
      if (zips.length > distThreshold) planDistributed(zips)
      else planOnDriver(zips)
    parts.map(p => p: InputPartition)
  }

  private def planOnDriver(zips: Array[String]): Array[ZipPartition] = {
    val keep = compiled
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(8, zips.length)))
    try {
      val futures = zips.map { z =>
        pool.submit(new java.util.concurrent.Callable[Array[ZipPartition]] {
          override def call(): Array[ZipPartition] =
            ZipScan.membersOf(z, keep)
        })
      }
      try futures.flatMap(_.get())
      catch {
        case e: java.util.concurrent.ExecutionException =>
          // surface the real archive error (ZipException with the path),
          // not the pool wrapper, and stop the remaining directory reads —
          // shutdown() alone let queued tasks keep opening archives after
          // planning had already failed (r11 review)
          pool.shutdownNow()
          throw e.getCause
      }
    } finally pool.shutdown()
  }

  /** Distributed central-directory pre-pass: ship archive paths to
    * executors, read each directory there, collect member metadata only
    * (names + sizes — the same bytes the driver pool would have produced).
    * Filters are RE-COMPILED from the serializable filter array once per
    * planning TASK (mapPartitions), so the closure captures no scan state.
    * The collect-side sortBy (path, then directory index) restores the
    * driver path's order — which is the same sort because
    * [[planInputPartitions]] hands BOTH paths a path-sorted `zips` array;
    * dropping either sort breaks the spec'd dual-path partition equality.
    * Like every distributed Spark source, this path requires the archive
    * paths to be EXECUTOR-VISIBLE (shared/distributed storage); archives
    * on driver-local disk only plan through the ≤threshold driver pool.
    */
  private def planDistributed(zips: Array[String]): Array[ZipPartition] = {
    val filters = pushed
    val spark = org.apache.spark.sql.SparkSession.active
    spark.sparkContext
      .parallelize(zips.toSeq, math.max(1, math.min(zips.length, 256)))
      .mapPartitions { zs =>
        val keep = filters.flatMap(ZipScan.compile)
        zs.flatMap(z => ZipScan.membersOf(z, keep))
      }
      .collect()
      .sortBy(zp => (zp.zipPath, zp.entryIndexKey))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZipReaderFactory(required.fieldNames)
}

/** One archive MEMBER — the split unit — with its central-directory record
  * captured at planning. The reader emits straight from this (no re-open,
  * no name re-resolution: `getEntry(name)` would collapse legal duplicate
  * entry names onto the first record). `entryIndexKey` disambiguates
  * duplicates for the distributed path's deterministic sort.
  */
case class ZipPartition(zipPath: String, entryName: String,
    size: Long, compressedSize: Long, entryIndexKey: Int = 0)
    extends InputPartition

class ZipReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val zp = partition.asInstanceOf[ZipPartition]
    new ZipEntryReader(zp, fields)
  }
}

/** Executor-side: one member row, emitted from the partition's captured
  * directory record — zero archive I/O at read time.
  */
class ZipEntryReader(zp: ZipPartition, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private var done = false

  override def next(): Boolean =
    if (done) false else { done = true; true }

  override def get(): InternalRow = {
    InternalRow.fromSeq(fields.toSeq.map {
      case "zip_path" => UTF8String.fromString(zp.zipPath)
      case "zip_name" =>
        UTF8String.fromString(Paths.get(zp.zipPath).getFileName.toString)
      case "entry_name" => UTF8String.fromString(zp.entryName)
      case "size" => zp.size
      case "compressed_size" => zp.compressedSize
    })
  }

  override def close(): Unit = ()
}
