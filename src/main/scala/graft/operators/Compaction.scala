package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the lake-maintenance operator every long-lived
  * table needs: streaming/incremental loads leave thousands of KB-sized
  * part files, and at 100 TB the per-file open/footer cost (plus driver
  * listing memory) dominates scan time long before the bytes do.
  *
  * Strategy: size the output file count from the actual row count
  * (`ceil(rows / targetRowsPerFile)`), then either round-robin
  * `repartition(n)` (pure compaction) or `repartitionByRange(n, cols)`
  * (compaction + CLUSTERING: each output file covers a disjoint key range,
  * so min/max footer stats prune files for key-range predicates — poor
  * man's Z-ordering for the single-key case). `maxRecordsPerFile` caps
  * stragglers from range skew.
  *
  * The rewrite is atomic-by-directory: written to `outDir` (overwrite), so
  * readers of `inDir` are never exposed to a half-written table; a lake
  * deployment swaps the table location (or uses a format with a commit
  * protocol) after the write completes.
  */
object Compaction {
  final case class Report(
      filesBefore: Int, filesAfter: Int, rows: Long, outputFiles: Int)

  private def partFiles(spark: SparkSession, dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
          buf += f.getPath
      }
      buf.toSeq
    }
  }

  /** Rewrite the parquet table at `inDir` into `outDir` with
    * `targetRowsPerFile` rows per file; `clusterBy` keys optionally
    * range-cluster the output for footer-stats pruning.
    */
  def compact(
      spark: SparkSession, inDir: String, outDir: String,
      targetRowsPerFile: Long, clusterBy: Seq[String] = Seq.empty): Report = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val before = partFiles(spark, inDir).length
    val df = spark.read.parquet(inDir)
    // parquet row count comes from footer metadata — no data scan
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile)
    // repartition takes an Int: past this the .toInt below would wrap
    // NEGATIVE and crash after the count already ran (r10 review)
    require(nFiles <= Int.MaxValue,
      s"compaction would need $nFiles files; raise targetRowsPerFile")
    val shaped =
      if (clusterBy.nonEmpty)
        df.repartitionByRange(nFiles.toInt, clusterBy.map(col): _*)
      else df.repartition(nFiles.toInt)
    // the per-file cap guards against range-skew stragglers, not the ±1
    // rounding of balanced partitions — give it slack so a partition a few
    // rows over target is not split into a full file plus a sliver
    shaped.write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile + targetRowsPerFile / 5)
      .parquet(outDir)
    Report(before, partFiles(spark, outDir).length, rows, nFiles.toInt)
  }
}
