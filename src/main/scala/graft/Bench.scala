package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every declared query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  */
object Bench {
  type Q = (SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Times each query against the materializing noop sink. A query that
    * throws lands in the second map (error text) and NEVER as a timing —
    * a crash must not masquerade as a fast run in BENCH_rN deltas.
    */
  def run(spark: SparkSession, sfDir: String, queries: Map[String, Q])
      : (Map[String, Double], Map[String, String]) = {
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case t: Throwable => Some(t.toString) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    (results.collect { case (k, v, None) => (k, v) }.toMap,
      results.collect { case (k, _, Some(e)) => (k, e) }.toMap)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement: one UNTIMED pass of the full query surface
    // first. A parquet count() warms nothing real (it answers from footer
    // metadata), so the old per-table touch left the first measured queries
    // paying JIT + codegen-compile + page-cache misses that no later query
    // pays — cross-round deltas then mixed methodology noise with real
    // regressions. The warmup pass runs the same noop-materializing sink,
    // so every scan, codegen unit, and shuffle path is hot before timing.
    // SPARK_GRAFT_WARMUP=0 skips it (cold-start numbers).
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0")
      run(spark, sfDir, SparkEntry.queries)
    // noop sink: materializes every row of the final plan (unlike count(),
    // under which Catalyst elides top-level ORDER BY + output projection).
    val (ok, errMap) = run(spark, sfDir, SparkEntry.queries)
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // SparkEntry.queries order for stable output
    val qs = SparkEntry.queries.keys.toSeq.filter(ok.contains)
      .map(k => jstr(k) + ":" + ok(k)).mkString("{", ",", "}")
    val errs = errMap.toSeq.map { case (k, e) =>
      jstr(k) + ":" + jstr(e.take(300))
    }.mkString("{", ",", "}")
    val total = ok.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    operators.MinHashDedup.clearScratch() // all consuming actions are done
    spark.stop()
  }
}
