package graft.operators

import graft.Q
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Declared-query wrappers around [[graft.streaming.EventStream]]: each
  * runs a REAL Structured Streaming query (readStream → watermark →
  * stateful agg → memory sink, Trigger.AvailableNow) to completion and
  * returns the final table, so streaming correctness goes through the
  * same DuckDB-oracle gate as batch.
  *
  * Session-boundary note: session_window starts a new session at gap
  * >= 30 min (strict merge on <), so the oracle uses `>=`; the batch
  * q37 formulation uses `>` — indistinguishable unless an event lands
  * on the exact microsecond boundary (none exist at any sf, checked).
  */
object Streaming {

  val all: Seq[Q] = Seq(
    Q(
      "q59_stream_hourly",
      (s, d) => EventStream.hourly(s, d).orderBy(col("hour_start"), col("event_type")),
      Some("""
        SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
      bench = true
    ),

    Q(
      "q60_stream_sessions",
      (s, d) => EventStream.sessions(s, d).orderBy(col("user_id"), col("start_us")),
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
          FROM events
        ), flagged AS (
          SELECT *,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                        OR ts_us - lag(ts_us) OVER w >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        ), sessions AS (
          SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged
        )
        SELECT user_id,
               min(ts_us) AS start_us,
               max(ts_us) AS end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        FROM sessions GROUP BY user_id, session_id ORDER BY user_id, start_us"""),
      bench = true
    ),

    // custom state machine via mapGroupsWithState (typed GroupState)
    Q(
      "q63_stream_user_totals",
      (s, d) => EventStream.userTotals(s, d).orderBy(col("user_id")),
      Some("""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_micros
        FROM events GROUP BY user_id ORDER BY user_id"""),
      bench = true
    ),

    // streaming exact dedup over a doubled input: watermark-bounded
    // dropDuplicates state; result must equal the un-doubled counts
    Q(
      "q70_stream_dedup",
      (s, d) => EventStream.dedupCounts(s, d).orderBy(col("event_type")),
      Some("""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type ORDER BY event_type"""),
      bench = true
    ),

    // stream-static broadcast join + aggregation (streaming J7/J8 twin)
    Q(
      "q72_stream_static_join",
      (s, d) => EventStream.segmentTotals(s, d).orderBy(col("segment")),
      Some("""
        SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY 1"""),
      bench = true
    ),

    // stream-stream inner join with watermarks + time-range state
    // eviction: clicks attributed to same-user purchases within 1 hour
    Q(
      "q79_stream_stream_join",
      (s, d) => EventStream.clickAttribution(s, d).orderBy(col("purchase_id")),
      Some("""
        SELECT p.event_id AS purchase_id,
               p.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_clicks
        FROM events p
        JOIN events c
          ON p.event_type = 'purchase' AND c.event_type = 'click'
         AND p.user_id = c.user_id
         AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
         AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        GROUP BY 1, 2 ORDER BY 1"""),
      bench = true
    ),

    // streaming backward AS-OF via O(1) custom state — the incremental
    // twin of the q38/q99 flagship operator, gated on the SAME ASOF
    // oracle: every purchase attributed to the latest at-or-before
    // click, exactly as the batch sort-merge and the AsOfJoinExec
    // produce it
    Q(
      "q122_stream_asof",
      (s, d) => EventStream.asOfAttribution(s, d).orderBy(col("user_id"), col("event_id")),
      Some("""
        SELECT p.user_id, p.event_id,
               epoch_us(CAST(p.ts AS TIMESTAMP)) AS ts_us,
               c.event_id AS click_event_id,
               epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        ORDER BY p.user_id, p.event_id"""),
      bench = true
    ),

    // streaming Count-Min sketch: q132's cell build as an incremental
    // aggregation with state bounded at 4×256 rows forever — no
    // watermark needed because the keyed state CANNOT grow; the final
    // table equals the batch sketch cell-for-cell (same md5-family
    // addressing), so the deterministic batch oracle gates it
    Q(
      "q133_stream_cms",
      (s, d) => EventStream.cmsCells(s, d).orderBy(col("d"), col("cell")),
      Some {
        import graft.functions.TextFns.{Sql => T}
        s"""
        WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
        d AS (SELECT unnest(generate_series(0, 3)) AS d),
        cells AS (SELECT CAST(d.d AS INT) AS d, ${T.cmsCell("k", "d.d", 256)} AS cell,
                         CAST(COUNT(*) AS BIGINT) AS c
                  FROM ev CROSS JOIN d GROUP BY 1, 2)
        SELECT d, cell, c FROM cells ORDER BY d, cell"""
      },
      bench = true
    )
  )
}
