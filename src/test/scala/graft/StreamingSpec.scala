package graft

import graft.streaming.EventStream
import org.apache.spark.sql.DataFrame

/** Streaming/batch parity: the Structured Streaming formulations must
  * produce exactly the batch answers on bounded input (AvailableNow
  * drains the source, watermark never drops data that is in-order
  * within one file batch).
  */
class StreamingSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("streaming hourly windows == batch hourly aggregation") {
    val streamed = EventStream.hourly(spark, sf("sf0.001"))
    val batch = SparkEntry.queries("q36_event_hourly")(spark, sf("sf0.001"))
    assert(canon(streamed) == canon(batch))
  }

  test("streaming session windows == batch gap-sessionization") {
    val streamed = EventStream.sessions(spark, sf("sf0.001"))
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
    val batch = SparkEntry.queries("q37_sessionize")(spark, sf("sf0.001"))
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
    assert(canon(streamed) == canon(batch))
  }
}
