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

  test("stream-stream join == batch interval self-join") {
    import org.apache.spark.sql.functions._
    val streamed = EventStream.clickAttribution(spark, sf("sf0.001"))
    val ev = Tables.events(spark, sf("sf0.001"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val batch = p.join(
        c,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("click_ts") <= col("p_ts"))
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(count(lit(1)).as("n_clicks"))
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0, "fixture must exercise the join")
  }
}
