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

  test("forward as-of: earliest quote at-or-after, equality matches, none-after is null") {
    // t0 09:00 -> 09:30 quote (100); t1 10:00 -> equality boundary
    // (101); t2 10:05 -> nothing after -> null; t3 10:00 -> nothing
    // at-or-after for key 2 -> null
    val out = AsOf.forward(trades, quotes, "t", "qt", Seq("key"), Seq("px"))
      .select("trade", "px").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out == Map("t0" -> 100.0, "t1" -> 101.0, "t2" -> null, "t3" -> null))
  }

  test("nearest as-of: closer side wins, ties go backward, one-sided falls through") {
    // t0 09:00: backward none, forward 09:30 -> 100 (one-sided forward)
    // t1 10:00: backward 10:00 (dist 0) vs forward 10:00 same row -> 101
    // t2 10:05: backward 10:04 (60s), forward none -> 102
    // t3 10:00: backward 09:59:59 (1s), forward none -> 200
    val out = AsOf.nearest(trades, quotes, "t", "qt",
        by = Seq("key"), leftKey = Seq("trade"), rightPayload = Seq("px", "qt"))
      .select("trade", "px").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out == Map("t0" -> 100.0, "t1" -> 101.0, "t2" -> 102.0, "t3" -> 200.0))
  }

  test("q115 leaves the broadcast-threshold conf as it found it; auto still dispatches after") {
    // the dispatch query flips the threshold to force each arm and must
    // restore the session exactly: get() on an UNSET key renders the
    // default with a byte-unit suffix ("10485760b"), and writing that
    // back would both pin the conf and (before auto used the typed
    // getter) crash any later auto() caller on the Long parse
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.getOption(key)
    SparkEntry.queries("q115_asof_auto_dispatch")(spark, sf("sf0.001")).collect()
    assert(spark.conf.getOption(key) == before,
      s"q115 must not leave the threshold conf changed: ${spark.conf.getOption(key)}")
    val out = AsOf.auto(trades, quotes, "t", "qt", Seq("key"), Seq("px"))
      .select("trade", "px").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out == expected, "auto after q115 must still dispatch and parse the conf")
  }

  test("nearest as-of tie between distinct quotes resolves toward backward") {
    val l = Seq((1L, ts("2024-01-01 12:00:00"), "x")).toDF("key", "t", "trade")
    val r = Seq(
      (1L, ts("2024-01-01 11:00:00"), 1.0), // 60 min before
      (1L, ts("2024-01-01 13:00:00"), 2.0) // 60 min after
    ).toDF("key", "qt", "px")
    val out = AsOf.nearest(l, r, "t", "qt",
        by = Seq("key"), leftKey = Seq("trade"), rightPayload = Seq("px", "qt"))
      .select("px").head()
    assert(out.getDouble(0) == 1.0, "equal distance must pick the backward match")
  }
}
