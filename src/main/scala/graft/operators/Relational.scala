package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Core relational operator coverage (SURVEY.md §2.2-§2.6), mapped onto
  * the TPC-H-ish test tables. Each query pairs a DataFrame plan with an
  * ANSI-SQL DuckDB oracle; float aggregates go through [[Det]] so both
  * engines produce bitwise-identical doubles.
  */
object Relational {
  import Det._

  private val Cutoff = "2000-01-01" // inside the 1995..2001 o_orderdate range

  /** Two-phase distributed GLOBAL cumsum over a decimal `valueCol` (see
    * q116's design comment): range-repartition on `sortCols` (must be a
    * TOTAL order — equal keys could otherwise split across a range
    * boundary and make per-row prefixes ambiguous), prefix-sum within
    * each partition, then cumsum the per-partition totals (one row per
    * partition — the bounded-domain window waiver) and broadcast them
    * back as offsets. Adds `running_total`; exact decimal arithmetic
    * makes the result independent of where range boundaries land.
    * Agreement with the single-window formulation on arbitrary data is
    * pinned in PropertySpec.
    */
  def globalCumsum(
      df: org.apache.spark.sql.DataFrame,
      sortCols: Seq[String],
      valueCol: String,
      nParts: Int): org.apache.spark.sql.DataFrame = {
    // Both consumers (offset table + final join) must observe ONE
    // materialization of the partition ids. localCheckpoint, not
    // cache(): cached plans live in the session CacheManager until an
    // explicit unpersist, so a lazy library function would leak storage
    // per call; checkpoint blocks belong to the RDD and the
    // ContextCleaner frees them once the caller drops the frame.
    // Tradeoff, stated honestly: localCheckpoint data is not
    // recomputable after executor loss — on a long multi-tenant cluster
    // run swap in reliable checkpoint(); on this single-JVM target and
    // for a two-stage window the eager local copy is the right cost.
    val ranged = df
      .repartitionByRange(nParts, sortCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val within = Window
      .partitionBy(col("__pid"))
      .orderBy(sortCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__part_sum"))
      .withColumn(
        "__offset",
        coalesce(sum(col("__part_sum")).over(offW), lit(0).cast(Det.Money)))
      .select(col("__pid"), col("__offset"))
    ranged
      .withColumn("__within", sum(col(valueCol)).over(within))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("running_total", col("__within") + col("__offset"))
      .drop("__pid", "__within", "__offset")
  }

  val all: Seq[Q] = Seq(
    // A1/A7-style multi-function hash aggregate with exact distinct
    Q(
      "q01_pricing_summary",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            count(lit(1)).as("count_order"),
            countDistinct(col("l_orderkey")).as("n_orders")
          )
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
               CAST(COUNT(*) AS BIGINT) AS count_order,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    ),

    // P1+P3+P5: projection + equality + time-range filter (pushed to scan)
    Q(
      "q02_filter_project",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit(Cutoff).cast("timestamp") && col("l_returnflag") === "R")
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            col("l_quantity"),
            to_date(col("l_shipdate")).as("ship_date")
          )
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some(s"""
        SELECT l_orderkey, l_linenumber, l_quantity, CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '$Cutoff' AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber""")
    ),

    // P4 as a left-semi join (never a collected isin list)
    Q(
      "q03_semi_join",
      (s, d) => {
        val part = Tables.part(s, d)
        val li = Tables.lineitem(s, d).filter(col("l_shipdate") >= lit(Cutoff).cast("timestamp"))
        part
          .join(li, part("p_partkey") === li("l_partkey"), "left_semi")
          .select(col("p_partkey"), col("p_name"), col("p_brand"))
          .orderBy(col("p_partkey"))
      },
      Some(s"""
        SELECT p_partkey, p_name, p_brand
        FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_shipdate >= TIMESTAMP '$Cutoff')
        ORDER BY p_partkey""")
    ),

    // anti join (NOT EXISTS)
    Q(
      "q04_anti_join",
      (s, d) => {
        val part = Tables.part(s, d)
        val li = Tables.lineitem(s, d)
        part
          .join(li, part("p_partkey") === li("l_partkey"), "left_anti")
          .select(col("p_partkey"), col("p_name"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey, p_name
        FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        ORDER BY p_partkey""")
    ),

    // J2: detail ⟕ header, then per-order aggregate. Aggregate BEFORE
    // the join: o_custkey/o_orderdate are functionally dependent on the
    // join key, so grouping lineitem down to one row per order first
    // and joining headers after is equivalent — and the join then
    // processes |orders| rows instead of |lineitem| (~4× fewer, and the
    // gap widens with line-items-per-order at scale). The distinct is
    // the exact two-level form (per-(order, part) partials, then
    // per-order counts) — decimal partial sums are exactly associative,
    // so hash parity with the one-level oracle is preserved. Both
    // levels and the join reuse ONE hash partitioning on l_orderkey
    // (pinned in PlanSpec): grouping by (l_orderkey, l_partkey) only
    // needs same-key co-location, which partitioning by the order key
    // already provides.
    Q(
      "q05_order_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val perPart = li
          .repartition(col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("l_partkey"))
          .agg(
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(Det.Money))
              .as("rev_part"),
            count(lit(1)).as("n_rows"))
        val perOrder = perPart
          .groupBy(col("l_orderkey"))
          .agg(
            sum(col("rev_part")).cast("double").as("revenue"),
            sum(col("n_rows")).as("n_items"),
            count(lit(1)).as("n_parts"))
        perOrder.join(o, perOrder("l_orderkey") === o("o_orderkey"), "left")
          .select(
            col("l_orderkey"),
            col("o_custkey"),
            to_date(col("o_orderdate")).as("order_date"),
            col("revenue"), col("n_items"), col("n_parts"))
          .orderBy(col("l_orderkey"))
      },
      Some("""
        SELECT l.l_orderkey,
               o.o_custkey,
               CAST(o.o_orderdate AS DATE) AS order_date,
               CAST(SUM(CAST(l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_parts
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3
        ORDER BY 1""")
    ),

    // J8: snowflake dimension resolution (two broadcast joins) + rollup agg
    Q(
      "q06_snowflake_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_customers"),
            dsum(col("c_acctbal")).as("sum_acctbal")
          )
          .orderBy(col("r_name"), col("n_name"))
      },
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

    // D1+F17: dedup to a value domain + deterministic surrogate key
    Q(
      "q07_interval_dim",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            year(col("o_orderdate")).cast(IntegerType).as("y"),
            month(col("o_orderdate")).cast(IntegerType).as("m")
          )
          .distinct()
          .withColumn("interval_id", row_number().over(Window.orderBy(col("y"), col("m"))).cast(IntegerType))
          .select(col("interval_id"), col("y"), col("m"))
          .orderBy(col("y"), col("m")),
      Some("""
        WITH d AS (SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS y,
                                   CAST(month(o_orderdate) AS INT) AS m
                   FROM orders)
        SELECT CAST(row_number() OVER (ORDER BY y, m) AS INT) AS interval_id, y, m
        FROM d
        ORDER BY y, m""")
    ),

    // J4/J5: as-of interval assignment (broadcast variant; dim = month starts)
    Q(
      "q08_asof_interval",
      (s, d) => {
        val o = Tables.orders(s, d)
        val dim = o
          .select(date_trunc("month", col("o_orderdate")).as("interval_start"))
          .distinct()
        AsOf
          .backwardBroadcast(o, dim, "o_orderdate", "interval_start", Seq.empty, Seq("interval_start"))
          .groupBy(to_date(col("interval_start")).as("interval_start"))
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_total")
          )
          .orderBy(col("interval_start"))
      },
      Some("""
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS interval_start,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_total
        FROM orders
        GROUP BY 1
        ORDER BY 1""")
    ),

    // W3: per-group top-1 by timestamp via row_number
    Q(
      "q10_latest_order_per_customer",
      (s, d) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date"),
            col("o_totalprice")
          )
          .orderBy(col("o_custkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1
        ORDER BY o_custkey""")
    ),

    // running total (frame window, exact decimal accumulation)
    Q(
      "q11_running_total",
      (s, d) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date"),
            sum(col("o_totalprice").cast(Det.Money)).over(w).cast("double").as("running_total")
          )
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM orders
        ORDER BY o_custkey, o_orderkey""")
    ),

    // GLOBAL running total — the two-phase distributed cumsum. A
    // global `SUM() OVER (ORDER BY ...)` is the one window Spark can
    // only plan as a single-partition sort (the whole fact on one
    // task); the scale formulation splits it:
    //
    //   phase 1: range-repartition on the (unique) sort key, prefix-sum
    //            WITHIN each partition (Window.partitionBy(pid) — rows
    //            stay distributed);
    //   phase 2: per-partition totals (one row per partition) get their
    //            own exclusive cumsum — a bounded-domain global window
    //            over ≤ shuffle.partitions rows — and broadcast back as
    //            offsets; running_total = within + offset.
    //
    // Cost: the range exchange plus one hash exchange on pid for the
    // within-window — two distributed shuffles in place of a
    // single-task global sort. The frame is cached because offsets and
    // the per-row pass both consume it (partition ids must come from
    // ONE evaluation of the range shuffle). Decimal-exact sums make
    // the result independent of where the range boundaries land.
    Q(
      "q116_global_running_total",
      (s, d) => {
        val nParts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
        val o = Tables.orders(s, d).select(
          col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date"),
          col("o_totalprice").cast(Det.Money).as("price"))
        globalCumsum(o, Seq("order_date", "o_orderkey"), "price", nParts)
          .select(
            col("o_orderkey"), col("order_date"),
            col("running_total").cast("double").as("running_total"))
          .orderBy(col("order_date"), col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                    OVER (ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM orders
        ORDER BY order_date, o_orderkey""")
    ),

    // lead/lag: days between consecutive orders of a customer
    Q(
      "q12_order_gaps",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            datediff(to_date(col("o_orderdate")), to_date(lag(col("o_orderdate"), 1).over(w)))
              .cast(IntegerType)
              .as("gap_days")
          )
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day',
                              CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS DATE),
                              CAST(o_orderdate AS DATE)) AS INT) AS gap_days
        FROM orders
        ORDER BY o_custkey, o_orderkey""")
    ),

    // W3 at scale: per-group top-k via the native TypedImperativeAggregate
    // (map-side partials — at most k rows per group per partition cross
    // the shuffle, vs the full-group sort a row_number window needs).
    // Ascending struct ordering encodes (price DESC, orderkey ASC) by
    // negating the price in the packed sort key.
    Q(
      "q92_topk_native",
      (s, d) => {
        graft.functions.TopKAgg.register(s)
        Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(expr(
            "graft_top_k(struct(-o_totalprice AS np, o_orderkey AS ok, CAST(o_orderdate AS DATE) AS od), 3)")
            .as("top"))
          .select(col("o_custkey"), posexplode(col("top")))
          .select(
            col("o_custkey"),
            (col("pos") + 1).cast(IntegerType).as("rank"),
            col("col.ok").as("o_orderkey"),
            col("col.od").as("order_date"),
            (-col("col.np")).as("o_totalprice"))
          .orderBy(col("o_custkey"), col("rank"))
      },
      Some("""
        SELECT o_custkey, CAST(rn AS INT) AS rank, o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rank""")
    ),

    // time-RANGE window frame: per-customer trailing-7-day spend. The
    // frame is over integer epoch days (RANGE 6 PRECEDING), so same-day
    // orders aggregate identically regardless of intra-day tie order.
    Q(
      "q100_rolling_7d",
      (s, d) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(expr("unix_date(CAST(o_orderdate AS DATE))"))
          .rangeBetween(-6, Window.currentRow)
        Tables.orders(s, d)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            to_date(col("o_orderdate")).as("od"),
            sum(col("o_totalprice").cast(Det.Money)).over(w).cast("double").as("sum_7d"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_7d
        FROM orders
        ORDER BY o_custkey, o_orderkey""")
    ),

    // rank-family windows: quartile bucket, percent_rank, cume_dist per
    // customer under a total (price, orderkey) order
    Q(
      "q102_rank_family",
      (s, d) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            ntile(4).over(w).cast(IntegerType).as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_orderkey""")
    ),

    // The canonical warehouse star join (TPC-H Q5 semantics): six
    // tables, revenue by supplier nation for one region and year,
    // where the customer and supplier nations must MATCH — the join
    // graph is a cycle, not a tree, so join ORDER matters. Declared
    // flat and left to Catalyst: region/nation broadcast into the
    // probe side, customer joins orders before the fact, and the
    // c_nationkey = s_nationkey equality closes the cycle as a cheap
    // post-join filter on already-co-located rows. One lineitem scan,
    // no cartesian anywhere — pinned in PlanSpec.
    Q(
      "q136_regional_supply",
      (s, d) => {
        val nations = Tables.nation(s, d)
          .join(
            broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val cust = Tables.customer(s, d)
          .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
        val ord = Tables.orders(s, d)
          .filter(
            col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
              && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val supp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        cust
          .join(ord, col("c_custkey") === col("o_custkey"))
          .join(
            Tables.lineitem(s, d)
              .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount")),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1995-01-01'
          AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1996-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")
    )
  )
}
