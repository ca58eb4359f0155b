package graft

import graft.streaming.EventStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** events.ts ingestion must be schema-adaptive: the testdata has
  * shipped both as parquet TIMESTAMP(NANOS) (scans as int64 under the
  * legacy conf) and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (scans
  * as TIMESTAMP_NTZ). Batch ([[Tables.events]]) and streaming
  * ([[EventStream.readEvents]]) must produce identical results on
  * either vintage, and a genuinely mistyped file must fail loudly
  * instead of emitting silently wrong timestamps.
  */
class EventIngestionSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  // one logical dataset: (event_id, user_id, event_type, micros, value, props)
  private val base = Seq(
    (1L, 10L, "click", 1700000000000000L, 1.5, "a"),
    (2L, 10L, "purchase", 1700000003600000L, 2.5, "b"),
    (3L, 11L, "click", 1700000007200000L, 3.5, "c"),
    (4L, 11L, "click", 1700003600000000L, 4.5, "d"),
    (5L, 11L, "purchase", 1700007200000000L, 5.5, "e"))

  /** Writes df as a SINGLE file named events.parquet (the testdata
    * layout — the stream glob matches leaf file names, so a directory
    * of part files would not be found).
    */
  private def writeSingle(df: DataFrame, tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    val build = d.resolve("build")
    df.coalesce(1).write.parquet(build.toString)
    val part = java.nio.file.Files.list(build).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, d.resolve("events.parquet"))
    d.toString
  }

  /** Writes the dataset with ts as int64 nanos (the legacy vintage). */
  private def nanosDir(): String = {
    import spark.implicits._
    writeSingle(
      base.map { case (e, u, t, us, v, p) => (e, u, t, us * 1000L, v, p) }
        .toDF("event_id", "user_id", "event_type", "ts", "value", "props"),
      "graft_ev_nanos")
  }

  /** Writes the dataset with ts as TIMESTAMP_NTZ micros (the current
    * vintage — matches the regenerated testdata's physical type).
    */
  private def microsDir(): String = {
    import spark.implicits._
    writeSingle(
      base.toDF("event_id", "user_id", "event_type", "ts_us", "value", "props")
        .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
        .select("event_id", "user_id", "event_type", "ts", "value", "props"),
      "graft_ev_micros")
  }

  test("batch Tables.events reads nanos-int64 and micros-ntz vintages identically") {
    val fromNanos = Tables.events(spark, nanosDir())
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val fromMicros = Tables.events(spark, microsDir())
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    assert(fromNanos.schema("ts_us") == fromMicros.schema("ts_us"))
    assert(canon(fromNanos) == canon(fromMicros))
    // and the values are the literal micros we wrote, not 1000x off
    assert(fromNanos.filter(col("event_id") === 1L).head().getLong(1) == 1700000000000000L)
  }

  test("streaming readEvents adapts to both vintages and equals the batch read") {
    for (d <- Seq(nanosDir(), microsDir())) {
      val streamed = EventStream.hourly(spark, d)
      assert(streamed.count() > 0)
      // batch twin of the streaming hourly aggregation
      val batch = Tables.events(spark, d)
        .groupBy(
          date_format(window(col("ts"), "1 hour").getField("start"),
            "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      assert(canon(streamed) == canon(batch))
    }
  }

  test("a mistyped ts column fails loudly, never silently misreads") {
    import spark.implicits._
    val d = writeSingle(
      base.map { case (e, u, t, us, v, p) => (e, u, t, us.toString, v, p) }
        .toDF("event_id", "user_id", "event_type", "ts", "value", "props"),
      "graft_ev_bad")
    intercept[IllegalArgumentException] { Tables.events(spark, d) }
    intercept[IllegalArgumentException] { EventStream.hourly(spark, d) }
  }
}
