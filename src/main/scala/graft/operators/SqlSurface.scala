package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Q, Tables}

/** SQL entry surface for the DSS layer: the reference's UI issues raw
  * SQL strings against the warehouse
  * (/root/reference/Clustering_Analysis.py:84-100 builds
  * `SELECT … FROM …` text and hands it to the connection), while the
  * graft operator inventory is DataFrame-API-first. This module closes
  * that gap: [[registerViews]] exposes every warehouse table as a temp
  * view, and a `spark.sql`-driven TWIN of an inventory query is gated
  * on the SAME oracle — so a SQL-speaking client can drive the engine
  * and gets the IDENTICAL Catalyst plan the DataFrame API produces
  * (both surfaces meet in the same logical plan; pinned by
  * PlanSpec's sameResult check, q188 ≡ q27).
  */
object SqlSurface {

  /** Expose the scale-factor dir's tables as session temp views.
    * Idempotent and metadata-only (createOrReplaceTempView registers
    * the logical plan; no scan happens until a query runs), so
    * re-registering per query execution is free. `events` goes through
    * [[Tables.events]] for the ts-vintage normalization every other
    * consumer gets.
    */
  def registerViews(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
    Tables.events(s, d).createOrReplaceTempView("events")
  }

  /** Run a SQL statement against the registered warehouse views. */
  def sql(s: SparkSession, d: String, statement: String): DataFrame = {
    registerViews(s, d)
    s.sql(statement)
  }

  /** Spark-dialect text of the q27 twin. Written to optimize to the
    * exact plan of q27's DataFrame build: the same decimal-exact sum
    * (Det.dsum ≡ CAST(SUM(CAST(… AS DECIMAL(38,6))) AS DOUBLE)), the
    * same COALESCE defaults, the same pre-join filter (Catalyst pushes
    * it below the join either way).
    */
  val Q27TwinSql: String = """
    SELECT p.p_partkey,
           COALESCE(CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE),
                    CAST(0 AS DOUBLE)) AS qty,
           COALESCE(COUNT(DISTINCT l.l_orderkey), CAST(0 AS BIGINT)) AS n_orders
    FROM part p
    LEFT JOIN (SELECT * FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '2001-06-01') l
           ON p.p_partkey = l.l_partkey
    GROUP BY p.p_partkey
    ORDER BY p.p_partkey"""

  /** Spark-dialect twin of q06 (J8 snowflake resolution). The BROADCAST
    * hints mirror the DataFrame build's `broadcast(n)`/`broadcast(r)`
    * wrappers so both surfaces optimize to the identical plan
    * (PlanSpec sameResult pin) — at 100 TB the fact-side scan must
    * never shuffle for the two tiny dimensions either way a client
    * phrases the query.
    */
  val Q06TwinSql: String = """
    SELECT /*+ BROADCAST(n), BROADCAST(r) */
           r.r_name, n.n_name,
           COUNT(1) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name"""

  /** Spark-dialect twin of q16 (A10 pivot/crosstab) via native PIVOT
    * syntax — the UI's contingency table as a SQL client would write
    * it. The COALESCEs reproduce the DataFrame twin's `.na.fill(0)`.
    */
  val Q16TwinSql: String = """
    SELECT o_orderpriority,
           COALESCE(F, CAST(0 AS BIGINT)) AS F,
           COALESCE(O, CAST(0 AS BIGINT)) AS O,
           COALESCE(P, CAST(0 AS BIGINT)) AS P
    FROM (SELECT o_orderstatus, o_orderpriority FROM orders)
    PIVOT (COUNT(1) FOR o_orderstatus IN ('F' AS F, 'O' AS O, 'P' AS P))
    ORDER BY o_orderpriority"""

  /** Spark-dialect twin of q10 (W3 top-1-per-group): the
    * `ROW_NUMBER() OVER (...) = 1` idiom exactly as a SQL client
    * writes it. The point of this twin is plan-shape, not just rows:
    * [[graft.plans.TopKRewrite]] is pattern-sensitive (it matches the
    * Filter-over-Window logical shape), so the SQL spelling must reach
    * the SAME native bounded top-k aggregate the DataFrame build gets
    * — a window sort here would full-sort every group of a 100 TB
    * fact. PlanSpec pins ObjectHashAggregate-and-no-Window on this
    * query's physical plan.
    */
  val Q10TwinSql: String = """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    ORDER BY o_custkey"""

  /** Spark-dialect twin of q64 (cosine top-k ANN) — the similarity
    * verb as an analyst at the warehouse would type it: the registered
    * codegen'd `graft_dot` kernel plus the q200-proven
    * `ROW_NUMBER() ... <= k` spelling. Written to optimize to the
    * exact plan of [[Similarity.nativeTopk]]'s DataFrame build (the
    * BROADCAST hint mirrors `broadcast(q)`; the 6-dp ROUND before
    * ranking mirrors the tie-break contract), so a SQL client pays
    * nothing for being SQL: TopKRewrite turns the window spelling into
    * the native bounded top-k aggregate (PlanSpec sameResult pin).
    */
  val Q64TwinSql: String = """
    WITH e0 AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
    e AS (SELECT vec_id, v, sqrt(graft_dot(v, v)) AS norm FROM e0),
    q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM e WHERE vec_id < 8)
    SELECT query_id, cand_id, cos, rnk FROM (
      SELECT query_id, cand_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, cand_id) AS INT) AS rnk
      FROM (SELECT /*+ BROADCAST(q) */
                   q.query_id, e.vec_id AS cand_id,
                   ROUND(graft_dot(e.v, q.qv) / (e.norm * q.qn), 6) AS cos
            FROM e JOIN q ON e.vec_id != q.query_id))
    WHERE rnk <= 10
    ORDER BY query_id, rnk"""

  def all: Seq[Q] = Seq(
    // the SQL-string twin of q27 (A7 coalesce-left-join-agg), gated on
    // q27's own oracle: a SQL client and a DataFrame client must get
    // the same rows AND the same physical plan from this engine
    Q(
      "q188_sql_entry",
      (s, d) => sql(s, d, Q27TwinSql),
      Some("""
        SELECT p.p_partkey,
               COALESCE(CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE), CAST(0 AS DOUBLE)) AS qty,
               COALESCE(CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT), 0) AS n_orders
        FROM part p
        LEFT JOIN (SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-06-01') l
               ON p.p_partkey = l.l_partkey
        GROUP BY p.p_partkey
        ORDER BY p.p_partkey""")
    ),

    // SQL twin of the snowflake join (q06 shape — the UI's category
    // rollup, /root/reference/pages/1_Product_Categories.py:44-53),
    // gated on q06's own oracle
    Q(
      "q197_sql_snowflake",
      (s, d) => sql(s, d, Q06TwinSql),
      Some("""
        SELECT r.r_name, n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
        ORDER BY r.r_name, n.n_name""")
    ),

    // SQL twin of the pivot/crosstab (q16 shape — the UI's contingency
    // table), native PIVOT syntax, gated on q16's own oracle
    Q(
      "q198_sql_pivot",
      (s, d) => sql(s, d, Q16TwinSql),
      Some("""
        SELECT o_orderpriority,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    ),

    // SQL twin of the top-1-per-group window (q10 shape — the
    // reference's "latest record" idiom,
    // /root/reference/Clustering_Analysis.py:29-34), gated
    // on q10's own oracle; TopKRewrite must fire on the SQL spelling
    // too (PlanSpec pin)
    Q(
      "q200_sql_window",
      (s, d) => sql(s, d, Q10TwinSql),
      Some("""
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1
        ORDER BY o_custkey""")
    ),

    // SQL twin of the similarity verb (q64 shape — cosine top-k over
    // the embedding column via the registered graft_dot expression),
    // gated on q51/q64's shared decimal-exact oracle; TopKRewrite must
    // fire on the ROW_NUMBER() <= 10 spelling and the optimized plan
    // must be the DataFrame build's (PlanSpec sameResult pin)
    Q(
      "q203_sql_ann_topk",
      (s, d) => {
        graft.functions.ArrayDot.register(s)
        sql(s, d, Q64TwinSql)
      },
      Some(Similarity.topkOracleSql)
    )
  )
}
