package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Event-log operators: tumbling time windows, gap-based sessionization,
  * per-key as-of joins (the scalable sort-merge formulation), and JSON
  * attribute extraction. These are the batch-parity versions; the same
  * aggregations run incrementally in [[graft.streaming.EventStream]].
  */
object Events {
  import Det._

  val all: Seq[Q] = Seq(
    // tumbling 1h window aggregate (batch parity of the streaming agg)
    Q(
      "q36_event_hourly",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
            col("event_type")
          )
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("hour_start"), col("event_type")),
      Some("""
        SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")
    ),

    // gap-based sessionization (30 min inactivity closes a session)
    Q(
      "q37_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
          .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
          .withColumn(
            "new_session",
            when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(runSum).cast(IntegerType))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts_us")).as("start_us"),
            max(col("ts_us")).as("end_us"),
            dsum(col("value")).as("sum_value")
          )
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
          FROM events
        ), flagged AS (
          SELECT *,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                        OR ts_us - lag(ts_us) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        ), sessions AS (
          SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
          FROM flagged
        )
        SELECT user_id, session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               min(ts_us) AS start_us,
               max(ts_us) AS end_us,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id""")
    ),

    // per-key backward as-of join at scale: each purchase ← latest prior click
    Q(
      "q38_asof_click_purchase",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_event_id"))
        AsOf
          .backward(purchases, clicks, "ts", "click_ts", Seq("user_id"), Seq("click_event_id", "click_ts"))
          .select(
            col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"),
            col("click_event_id"),
            unix_micros(col("click_ts")).as("click_ts_us")
          )
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT p.user_id, p.event_id,
               epoch_us(CAST(p.ts AS TIMESTAMP)) AS ts_us,
               c.event_id AS click_event_id,
               epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        ORDER BY p.user_id, p.event_id""")
    ),

    // JSON attribute extraction from the props payload. from_json with
    // an explicit schema parses each payload once into a typed struct
    // (a per-field get_json_object re-parses the string for every field
    // extracted — N parses per row at N fields).
    Q(
      "q39_json_extract",
      (s, d) =>
        Tables.events(s, d)
          .select(
            col("event_type"),
            from_json(col("props"), org.apache.spark.sql.types.StructType(
              Seq(org.apache.spark.sql.types.StructField("k", IntegerType))))
              .getField("k").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"), max(col("k")).cast(IntegerType).as("max_k"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               CAST(COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS n_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type""")
    ),

    // skew-resistant two-phase (salted) aggregation: partial sums on
    // (key, salt) spread a hot key over 8 reducers, the final pass
    // merges the 8 partials per key. Decimal partials are exactly
    // associative, so the result is identical to the direct groupBy
    // (and the oracle IS the direct groupBy).
    Q(
      "q69_salted_agg",
      (s, d) => {
        val salted = Tables.events(s, d)
          .withColumn("salt", pmod(col("event_id"), lit(8)))
          .groupBy(col("user_id"), col("salt"))
          .agg(
            count(lit(1)).as("pn"),
            sum(col("value").cast(Det.Money)).as("psum"))
        salted
          .groupBy(col("user_id"))
          .agg(
            sum(col("pn")).as("n"),
            sum(col("psum")).cast("double").as("sum_value"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY user_id ORDER BY user_id""")
    )
  )
}
