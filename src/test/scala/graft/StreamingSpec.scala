package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Events
import graft.streaming.StreamOps

/** Streaming/batch parity on the finite events feed. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming tumbling counts == batch tumbling counts") {
    val streamed = StreamOps.tumblingCounts(spark, TestSpark.Sf)
      .as[(String, String, Long)].collect().toSet
    val batch = Events.qTumbling.fn(spark, TestSpark.Sf)
      .select("window_start", "event_type", "n_events")
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup-within-watermark preserves unique event counts") {
    val got = StreamOps.streamingDedupCount(spark, TestSpark.Sf)
      .as[(String, Long)].collect().toMap
    val batch = Events.load(spark, TestSpark.Sf)
      .groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(got == batch)
  }
}
