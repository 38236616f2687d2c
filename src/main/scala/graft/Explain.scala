package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of every declared query — the
  * plan-review loop: check that filters/projections reach the parquet scan
  * (PushedFilters/ReadSchema), small dims broadcast, and hot paths stay
  * inside WholeStageCodegen. Usage: runMain graft.Explain [sfDir] [outFile].
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    // streaming queries RUN the whole stream inside the query fn and return
    // a memory-sink table — there's no batch plan worth printing, so skip
    // them instead of paying the stream execution. The skip set is derived
    // from the streaming modules' own declarations, not a name prefix: a
    // future "stats01_*" batch query must not be silently omitted, and a
    // renamed streaming query must not sneak in.
    val streamingQueries = graft.streaming.EventsStream.queries.keySet ++
      graft.streaming.CorpusStream.queries.keySet
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!streamingQueries.contains(name)) {
        sb.append(s"\n=== $name ===\n")
        try sb.append(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
      }
    }
    Files.write(Paths.get(outFile), sb.toString.getBytes("UTF-8"))
    println(s"wrote $outFile")
    spark.stop()
  }
}
