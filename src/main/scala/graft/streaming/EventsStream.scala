package graft.streaming

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Structured Streaming over the `events` table (SURVEY §2.2 streaming row,
  * §7.1 M4). The reference's "vigilante" daily poll (`READme.md:7-9`) is a
  * slow stream of arrival events; this is the same shape at event rates.
  *
  * `st01_stream_hourly` runs a REAL streaming query — file source →
  * watermark → tumbling window agg → memory sink — driven to completion
  * synchronously, then returns the sink table. Because output mode is
  * `complete`, the result equals the batch group-by, which is exactly what
  * the DuckDB oracle checks: a streaming/batch consistency proof.
  *
  * Scale notes: at 100 TB/day the same plan runs with a real source
  * (Kafka/files) and checkpointed state; watermark bounds state size, and
  * the window agg is a standard partial-agg shuffle on (window, event_type).
  * Append-mode + late-data-drop semantics are exercised in the test suite.
  */
object EventsStream {
  type Q = (SparkSession, String) => DataFrame

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  def hourlyAgg(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))

  val queries: Map[String, Q] = ListMap(
    "st01_stream_hourly" -> ((s, dir) => {
      // Source schema must match the on-disk layout (ts may be LONG nanos);
      // normalization to a µs timestamp happens on the streaming frame.
      val rawSchema = Tables.rawEvents(s, dir).schema
      val sink = s"st01_mem_${nameCounter.incrementAndGet()}"
      // The file stream source requires a directory; point it at the sf dir
      // and glob-filter down to the events file(s).
      val stream = Tables.normalizeEvents(
        s.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir))
      // State-store cost scales with shuffle partitions (one checkpoint
      // file per partition per batch); the windowed state here is tiny, so
      // run the stateful stage narrow and restore the session conf after.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q =
        try hourlyAgg(stream)
          .writeStream.outputMode("complete")
          .format("memory").queryName(sink)
          .start()
        finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_bucket"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour_bucket", "event_type")
    }),
  )

  val oracle: Map[String, String] = ListMap(
    // Streaming complete-mode result == batch hourly aggregation.
    "st01_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
