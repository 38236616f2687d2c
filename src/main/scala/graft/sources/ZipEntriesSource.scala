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
  * then splits the flattened MEMBER list into fixed-size input partitions
  * (`zip.membersPerPartition`, default 1024), each carrying its members'
  * directory records (name + sizes). The MEMBER stays the planning unit —
  * name predicates prune members before grouping, and a skewed month (one
  * dominating archive) spreads evenly because groups cut across archive
  * boundaries — but the TASK is a group: this source emits 16-byte
  * metadata rows with zero read-time I/O, so one task per member was pure
  * scheduler overhead (a 1 M-member lake scheduled 1 M single-row tasks —
  * r14 review). MIGRATION NOTE — the default CHANGED in r15 from one
  * partition per member to 1024: a composition that hangs heavyweight
  * per-member work (decompress, transcode) off this scan in the same
  * stage and relied on the old default now runs up to 1024 members
  * serially per task — the skew the old default existed to avoid. Such
  * call sites MUST set `zip.membersPerPartition=1` explicitly to recover
  * per-member task granularity (no in-repo call site composes heavy work
  * into the scan stage today; the pipeline extracts via its own
  * per-archive tasks — r15 ADVICE).
  * Carrying the record instead of re-resolving the name at read time also
  * makes DUPLICATE entry names — legal in zip — come back as N distinct
  * rows with their own sizes (`ZipFile.getEntry(name)` resolves every
  * duplicate to the first record), and drops the per-task archive reopen
  * entirely: the reader emits straight from the partition. Member BYTES
  * never visit anything — this is a metadata source.
  *
  * Directory reads run on a bounded driver pool for ordinary months
  * (~37 archives), and shift to a distributed Spark job when the archive
  * count exceeds `zip.distributedPlanningThreshold` (default 64) — at
  * 100k archives a serial driver walk is the planning bottleneck, the
  * same evolution parquet footer reading went through. Both paths emit
  * identical partitions (spec-asserted).
  *
  * Column pruning is pushed down ([[ZipScan.pruneColumns]]), and name
  * predicates on `zip_name` / `entry_name` prune members at planning,
  * before grouping ([[ZipScan.pushFilters]]) — the zip analogue of parquet
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
    val groupSize = options.getInt("zip.membersPerPartition",
      ZipScan.DefaultMembersPerPartition)
    if (groupSize < 1) throw new IllegalArgumentException(
      s"zip.membersPerPartition must be >= 1, got $groupSize")
    new ZipScan(resolved,
      ZipEntriesSource.schema,
      options.getInt("zip.distributedPlanningThreshold",
        ZipScan.DefaultDistributedPlanningThreshold),
      groupSize)
  }
}

object ZipScan {
  /** Archive count above which central-directory reads ship to executors
    * instead of the driver pool. ~37-archive months stay driver-side (a
    * Spark job has fixed latency the small case shouldn't pay); a lake of
    * archives plans distributed.
    */
  val DefaultDistributedPlanningThreshold = 64

  /** Members per input partition. Each member costs the reader ~nothing
    * (one InternalRow from an in-partition record), so the floor is task
    * overhead: 1024 metadata rows per task keeps a 1 M-member lake at
    * ~1000 tasks instead of 1 M, while a ~500-member month collapses to
    * one. Set `zip.membersPerPartition=1` when composing per-member
    * heavyweight work into the scan stage.
    */
  val DefaultMembersPerPartition = 1024

  import org.apache.spark.sql.sources._

  /** A compiled name predicate plus whether it is EXACT — keeps precisely
    * the filter's matches — or a superset WIDENING (a half-compilable And
    * keeps only its compilable conjunct). Exactness gates negation: Not of
    * an exact predicate is exact (and safely prunable), while Not of a
    * widening would keep a SUBSET — an under-approximation that silently
    * drops matching members (r17 verdict #4).
    */
  private[sources] final case class Compiled(
      keep: (String, String, String) => Boolean, exact: Boolean)

  /** A name filter compiled to a (zipPath, zipName, entryName) => keep
    * predicate; None = not prunable (left to Spark's residual evaluation).
    * zip_path predicates prune too — a `month=…` path-prefix filter is the
    * at-scale partition-pruning shape. Static so the distributed planning
    * closure captures filters (serializable), never the scan.
    */
  private[sources] def compile(f: Filter): Option[Compiled] = {
    type Row3 = (String, String, String)
    def col(attr: String): Option[Row3 => String] = attr match {
      case "zip_path" => Some(_._1)
      case "zip_name" => Some(_._2)
      case "entry_name" => Some(_._3)
      case _ => None
    }
    def exact(fn: (String, String, String) => Boolean): Compiled =
      Compiled(fn, exact = true)
    f match {
      case EqualTo(a, v: String) =>
        col(a).map(c => exact((p, z, e) => c((p, z, e)) == v))
      case In(a, vs) =>
        // the all-strings probe counts the COLLECTED values, not the
        // deduped set: an IN list carrying a duplicate (survives when
        // OptimizeIn doesn't fold, e.g. under an OR branch) made
        // set.size != vs.length and silently disabled pruning for a
        // perfectly compilable filter (r14 review)
        val strs = vs.collect { case s: String => s }
        val set = strs.toSet
        col(a).filter(_ => strs.length == vs.length)
          .map(c => exact((p, z, e) => set.contains(c((p, z, e)))))
      case StringStartsWith(a, v) =>
        col(a).map(c => exact((p, z, e) => c((p, z, e)).startsWith(v)))
      case StringEndsWith(a, v) =>
        col(a).map(c => exact((p, z, e) => c((p, z, e)).endsWith(v)))
      case StringContains(a, v) =>
        col(a).map(c => exact((p, z, e) => c((p, z, e)).contains(v)))
      case And(l, r) =>
        // a half-compilable And keeps its compilable side: pruning is a
        // SUPERSET optimization (every filter re-applies as a residual,
        // and keeping l-matches ⊇ keeping (l ∧ r)-matches, also under any
        // enclosing Or), so the old both-or-nothing rule forfeited pruning
        // for e.g. Or(And(startsWith, size > 0), eq) — the size conjunct
        // sank the whole tree (r17 review). Both sides compiled still
        // conjoin for the tightest prune; a one-sided result is marked
        // non-exact so the Not case below can never re-negate it into an
        // under-approximation.
        (compile(l), compile(r)) match {
          case (Some(cl), Some(cr)) => Some(Compiled(
            (p, z, e) => cl.keep(p, z, e) && cr.keep(p, z, e),
            cl.exact && cr.exact))
          case (one, other) => one.orElse(other)
            .map(c => c.copy(exact = false))
        }
      case Or(l, r) =>
        // both disjuncts must compile (dropping one would UNDER-keep);
        // the union of a widened side is still a superset — prunable but
        // not negatable
        for (cl <- compile(l); cr <- compile(r))
          yield Compiled((p, z, e) => cl.keep(p, z, e) || cr.keep(p, z, e),
            cl.exact && cr.exact)
      case Not(child) =>
        // exact-only: EqualTo/In/StartsWith/EndsWith/Contains (and any
        // And/Or/Not tree of them) evaluate PRECISELY on the three name
        // columns, so their complement prunes safely — `zip_name != 'x'`
        // now skips that archive instead of planning a full scan (r17
        // verdict #4). A widened child stays un-negatable: its complement
        // would drop members the original filter keeps.
        compile(child).withFilter(_.exact)
          .map(c => exact((p, z, e) => !c.keep(p, z, e)))
      case _ => None
    }
  }

  /** One archive's members: central-directory iteration (no
    * decompression), keep-filtered, with each member's directory record
    * captured. Runs on the driver pool OR inside the distributed planning
    * job — one body, identical member lists either path.
    */
  private[sources] def membersOf(zipPath: String,
      keep: Array[(String, String, String) => Boolean]): Array[ZipMember] = {
    val zipName = Paths.get(zipPath).getFileName.toString
    val zf = new ZipFile(zipPath)
    try zf.entries().asScala.zipWithIndex
      .filterNot(_._1.isDirectory)
      .filter { case (e, _) => keep.forall(_(zipPath, zipName, e.getName)) }
      .map { case (e, i) =>
        ZipMember(zipPath, e.getName, e.getSize, e.getCompressedSize, i)
      }
      .toArray
    finally zf.close()
  }
}

/** Scan + builder + batch in one: the source is simple enough that the
  * three roles share the pruned-schema and pushed-filter state.
  */
class ZipScan(path: String, var required: StructType,
    distThreshold: Int = ZipScan.DefaultDistributedPlanningThreshold,
    groupSize: Int = ZipScan.DefaultMembersPerPartition)
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
    * `entry_name` prune MEMBERS at planning, before the member list is
    * chunked into input partitions — the zip analogue of parquet's
    * partition-column pruning (a pruned member never plans, ships, or
    * emits). Every filter is also returned as a residual so Spark
    * re-applies it — pruning is an optimization, never the correctness
    * boundary.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val compilable = filters.flatMap(f => ZipScan.compile(f).map(f -> _))
    pushed = compilable.map(_._1)
    compiled = compilable.map(_._2.keep)
    filters // all residual: Spark re-evaluates post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // Planning: LIST archives, read each central directory into a flat
  // keep-filtered MEMBER list, then chunk it into groupSize-member input
  // partitions, each carrying its members' directory records. The walk is
  // RECURSIVE like the built-in file sources, so nested layouts
  // (dir/month=…/x.zip) scan their archives instead of silently yielding
  // an empty table; a directory with zero archives is a loud error for
  // the same reason (a typo'd path must not look like an empty corpus).
  // ≤ distThreshold archives: bounded driver pool (parquet-footer-class
  // work). Above it: a Spark job reads directories on executors and
  // collects only the member metadata — the driver never serially opens
  // 100k archive tails. Both paths hand the SAME path-sorted member list
  // to the chunker, so dual-path partition equality holds group-for-group.
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
    val members =
      if (zips.length > distThreshold) planDistributed(zips)
      else planOnDriver(zips)
    members.grouped(groupSize).map(g => ZipPartition(g): InputPartition)
      .toArray
  }

  private def planOnDriver(zips: Array[String]): Array[ZipMember] = {
    val keep = compiled
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(8, zips.length)))
    try {
      val futures = zips.map { z =>
        pool.submit(new java.util.concurrent.Callable[Array[ZipMember]] {
          override def call(): Array[ZipMember] =
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
        case e: InterruptedException =>
          // job CANCELLATION is the same class as the error path above:
          // without shutdownNow every queued task keeps opening archive
          // directories after planning was abandoned (the r11 fix covered
          // failures but not interrupts — r17 review). Re-assert the
          // interrupt for the caller's own handling.
          pool.shutdownNow()
          Thread.currentThread().interrupt()
          throw e
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
  private def planDistributed(zips: Array[String]): Array[ZipMember] = {
    val filters = pushed
    val spark = org.apache.spark.sql.SparkSession.active
    spark.sparkContext
      .parallelize(zips.toSeq, math.max(1, math.min(zips.length, 256)))
      .mapPartitions { zs =>
        val keep = filters.flatMap(f => ZipScan.compile(f).map(_.keep))
        zs.flatMap(z => ZipScan.membersOf(z, keep))
      }
      .collect()
      .sortBy(zm => (zm.zipPath, zm.entryIndexKey))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZipReaderFactory(required.fieldNames)
}

/** One archive MEMBER — the planning/pruning unit — with its
  * central-directory record captured at planning. The reader emits straight
  * from this (no re-open, no name re-resolution: `getEntry(name)` would
  * collapse legal duplicate entry names onto the first record).
  * `entryIndexKey` disambiguates duplicates for the distributed path's
  * deterministic sort.
  */
case class ZipMember(zipPath: String, entryName: String,
    size: Long, compressedSize: Long, entryIndexKey: Int = 0)

/** The TASK unit: a fixed-size group of member records (see
  * `zip.membersPerPartition`). Metadata emission is ~free per member, so
  * the group amortizes task scheduling; the member list inside stays the
  * pruned, deterministically ordered planning output.
  */
case class ZipPartition(members: Array[ZipMember]) extends InputPartition

class ZipReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val zp = partition.asInstanceOf[ZipPartition]
    new ZipEntryReader(zp, fields)
  }
}

/** Executor-side: one row per member of the partition's group, emitted
  * from the captured directory records — zero archive I/O at read time.
  */
class ZipEntryReader(zp: ZipPartition, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private var i = -1

  // per-FIELD extractors resolved ONCE: the old per-row fields.toSeq.map
  // with string dispatch re-parsed zip_name's filesystem path and
  // re-allocated a Seq for every member — pure avoidable CPU in the emit
  // loop of a source whose point is ~free metadata rows at lake scale
  // (1 M members = 1 M path parses; r17 review)
  private val extractors: Array[ZipMember => Any] = fields.map {
    case "zip_path" => (m: ZipMember) => UTF8String.fromString(m.zipPath)
    case "zip_name" =>
      // memoized per archive: a group's members arrive consecutively per
      // zip, so the path parse runs once per archive, not once per member
      var lastPath: String = null
      var lastName: UTF8String = null
      (m: ZipMember) => {
        if (m.zipPath ne lastPath) {
          lastPath = m.zipPath
          lastName =
            UTF8String.fromString(Paths.get(m.zipPath).getFileName.toString)
        }
        lastName
      }
    case "entry_name" => (m: ZipMember) => UTF8String.fromString(m.entryName)
    case "size" => (m: ZipMember) => m.size
    case "compressed_size" => (m: ZipMember) => m.compressedSize
  }

  override def next(): Boolean = { i += 1; i < zp.members.length }

  override def get(): InternalRow = {
    val m = zp.members(i)
    val values = new Array[Any](extractors.length)
    var j = 0
    while (j < extractors.length) { values(j) = extractors(j)(m); j += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  override def close(): Unit = ()
}
