package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness testdata tables (TESTDATA.md).
  *
  * All tables are single parquet files under `sfDir`. At 100 TB these would be
  * partitioned directories; nothing here assumes a single file — `spark.read
  * .parquet(path)` takes files or directories alike, and every downstream
  * operator relies on Catalyst pushdown (filters/column pruning reach the
  * scan) rather than on data being small.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extension: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extension

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` carries a nanosecond-precision timestamp (INT64
    * TIMESTAMP(NANOS)), which Parquet readers expose inconsistently. If Spark
    * surfaces it as a plain LONG (legacy nanosAsLong mode), convert to a
    * microsecond timestamp so downstream date functions behave identically to
    * the DuckDB oracle (which also works at µs resolution).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEvents(rawEvents(spark, sfDir))

  /** Raw events read; ts may surface as LONG nanos (legacy mode). The
    * legacy conf is SCOPED to this read — the schema is resolved eagerly
    * inside `spark.read.parquet`, so restoring the prior value afterwards
    * keeps nanos-as-long semantics from leaking to every later parquet
    * read in the caller's session (r10 review; the CorpusStream
    * convention).
    */
  def rawEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = try Some(spark.conf.get(key)) catch { case _: Throwable => None }
    try {
      try spark.conf.set(key, "true") catch { case _: Throwable => () }
      spark.read.parquet(s"$sfDir/events.parquet")
    } finally {
      try prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      catch { case _: Throwable => () }
    }
  }

  /** Normalize a raw events frame: LONG-nanos or TIMESTAMP_NTZ ts → µs
    * timestamp. The fixture has carried `ts` as INT64 nanos (legacy mode →
    * LONG) and as `timestamp[us]` without timezone (Spark 4 → TIMESTAMP_NTZ);
    * both normalize to TimestampType. The session timezone is pinned UTC
    * (build.sbt), so the NTZ→timestamp cast is wall-clock-preserving and
    * keeps the oracle-verified semantics identical across fixture vintages.
    * Watermarks (`withWatermark`) require TimestampType — NTZ is rejected.
    */
  def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
}
