package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming runners shrink `spark.sql.shuffle.partitions` for their
  * tiny state, but that override must be scoped to the streaming query
  * (cloned session) — a concurrent query planned on the caller's session
  * during the stream's lifetime must never observe it.
  */
class StreamConfScopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("st01 never mutates the caller session's shuffle partitions") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "7") // sentinel distinct from the stream's 4
    try {
      @volatile var stop = false
      @volatile var seen = Set.empty[String]
      val poller = new Thread(() => {
        while (!stop) { seen += spark.conf.get(key); Thread.sleep(1) }
      })
      poller.start()
      val out = EventsStream.queries("st01_stream_hourly")(spark, TestSpark.sf0001)
      try assert(out.collect().nonEmpty)
      finally { stop = true; poller.join() }
      assert(seen === Set("7"),
        "a concurrent reader observed the stream's partition override " +
          "on the caller's session")
      assert(spark.conf.get(key) === "7")
    } finally spark.conf.set(key, prev)
  }
}
