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
  * Scale shape: the driver only LISTS the zip files (metadata, like a
  * parquet file index); one input partition per archive, and each
  * executor-side reader opens its own archive and streams the central
  * directory — archive bytes never visit the driver. Column pruning is
  * pushed down ([[ZipScan.pruneColumns]]); a member-name filter pushdown
  * would follow the same pattern via `SupportsPushDownFilters`.
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
  * three roles share the pruned-schema state.
  */
class ZipScan(path: String, var required: StructType)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns {

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // driver-side: LIST archives only (never open them here). The walk is
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
    zips.map(z => ZipPartition(z): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZipReaderFactory(required.fieldNames)
}

case class ZipPartition(zipPath: String) extends InputPartition

class ZipReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZipEntryReader(partition.asInstanceOf[ZipPartition].zipPath, fields)
}

/** Executor-side: stream one archive's central directory. */
class ZipEntryReader(zipPath: String, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val zf = new ZipFile(zipPath)
  private val zipName =
    UTF8String.fromString(Paths.get(zipPath).getFileName.toString)
  private val it = zf.entries().asScala.filterNot(_.isDirectory)
  private var cur: java.util.zip.ZipEntry = _

  override def next(): Boolean = { val has = it.hasNext; if (has) cur = it.next(); has }

  override def get(): InternalRow =
    InternalRow.fromSeq(fields.toSeq.map {
      case "zip_name" => zipName
      case "entry_name" => UTF8String.fromString(cur.getName)
      case "size" => cur.getSize
      case "compressed_size" => cur.getCompressedSize
    })

  override def close(): Unit = zf.close()
}
