package graft

import graft.operators.AsOf
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the backward as-of semantics (SURVEY.md §2.3 J4/J5): latest
  * right row with rightTime <= leftTime per key; equality matches;
  * lefts before any right get null payload. Both formulations
  * (sort-merge and broadcast-range) must agree.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:00:00"), "t1"),
    (1L, ts("2024-01-01 10:05:00"), "t2"),
    (1L, ts("2024-01-01 09:00:00"), "t0"), // before any quote
    (2L, ts("2024-01-01 10:00:00"), "t3")
  ).toDF("key", "t", "trade")

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 09:30:00"), 100.0),
    (1L, ts("2024-01-01 10:00:00"), 101.0), // equality boundary
    (1L, ts("2024-01-01 10:04:00"), 102.0),
    (2L, ts("2024-01-01 09:59:59"), 200.0)
  ).toDF("key", "qt", "px")

  private def expected = Map("t0" -> null, "t1" -> 101.0, "t2" -> 102.0, "t3" -> 200.0)

  test("sort-merge backward as-of matches semantics incl. boundary equality") {
    val out = AsOf.backward(trades, quotes, "t", "qt", Seq("key"), Seq("px"))
      .select("trade", "px").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out == expected)
  }

  test("broadcast range as-of agrees with sort-merge formulation") {
    val out = AsOf.backwardBroadcast(trades, quotes, "t", "qt", Seq("key"), Seq("px"))
      .select("trade", "px").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out == expected)
  }

  test("as-of with no by-keys uses the global timeline") {
    val l = Seq((ts("2024-01-01 12:00:00"), "a")).toDF("t", "tag")
    val r = Seq((ts("2024-01-01 11:00:00"), 1), (ts("2024-01-01 13:00:00"), 2)).toDF("qt", "v")
    val out = AsOf.backwardBroadcast(l, r, "t", "qt", Seq.empty, Seq("v")).select("v").head()
    assert(out.getInt(0) == 1)
  }
}
