package graft

import graft.sources.{JdbcCatalog, ParquetCatalog}
import org.apache.spark.sql.functions._

/** The JDBC catalog against a SECOND live engine, this one from the
  * PostgreSQL dialect family: DuckDB over JDBC — the same engine and
  * version the correctness oracle runs. Derby (JdbcSpec) exercises an
  * uppercase-folding, strict-DDL RDBMS; DuckDB exercises the PG-style
  * lowercase-folding, TEXT-typed family the reference warehouse
  * actually is. A real PostgreSQL server is unreachable in the
  * zero-egress container, so this is the closest EXECUTABLE
  * approximation of the replace / pushdown / striped-read / append
  * conversation — the PG SQL-text boundary itself stays pinned in
  * PostgresDialectSpec. The driver jar is discovered from the image's
  * local artifact cache (build.sbt glob); when absent these tests
  * cancel rather than fail.
  */
class DuckDbJdbcSpec extends SparkSpec {

  private val driverAvailable =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: Throwable => false }

  private lazy val cat: JdbcCatalog = {
    val db = java.nio.file.Files.createTempDirectory("graft_duck").resolve("wh.db")
    new JdbcCatalog(s"jdbc:duckdb:$db", "org.duckdb.DuckDBDriver")
  }
  private lazy val pq = new ParquetCatalog(sf("sf0.001"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("replace-mode sink + dbtable read round-trips the nation dim (DuckDB)") {
    assume(driverAvailable, "duckdb jdbc driver not in the local cache")
    // single writer partition: DuckDB serializes same-table writers via
    // optimistic concurrency, so a dim-sized replace ships as one batch
    val nation = pq.table(spark, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1)
    cat.replace(nation, "nation")
    cat.replace(nation, "nation") // idempotent: truncate, not duplicate
    assert(canon(cat.table(spark, "nation")) == canon(nation),
      "JDBC round trip must preserve all rows")
  }

  test("query pushdown aggregates inside DuckDB") {
    assume(driverAvailable, "duckdb jdbc driver not in the local cache")
    val nation = pq.table(spark, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1)
    cat.replace(nation, "nation")
    val agg = cat.query(spark,
      """SELECT "n_regionkey", COUNT(*) AS "n" FROM nation GROUP BY "n_regionkey"""")
    val expect = pq.table(spark, "nation")
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    assert(canon(agg) == canon(expect))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"agg must run inside DuckDB:\n$plan")
  }

  test("partitioned read stripes across parallel DuckDB connections") {
    assume(driverAvailable, "duckdb jdbc driver not in the local cache")
    val cust = pq.table(spark, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .coalesce(1)
    cat.replace(cust, "customer")
    val part = cat.tablePartitioned(spark, "customer", "c_custkey",
      lowerBound = 0L, upperBound = 200L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4,
      "fact-shaped JDBC reads must stripe across parallel connections")
    assert(canon(part) == canon(cust), "striding must not lose or duplicate rows")
  }

  test("V2 catalog pushes LIMIT and partial aggregates into the remote query (DuckDB)") {
    assume(driverAvailable, "duckdb jdbc driver not in the local cache")
    val nation = pq.table(spark, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1)
    cat.replace(nation, "nation")
    cat.registerV2(spark, "duckwh")

    // LIMIT pushdown: 5 rows cross the wire, not the table
    val lim = spark.sql("SELECT n_name FROM duckwh.main.nation LIMIT 5")
    val planL = lim.queryExecution.executedPlan.toString
    assert(planL.contains("PushedLimit: LIMIT 5"),
      s"LIMIT must reach the remote query:\n$planL")
    assert(lim.collect().length == 5)

    // partial-aggregate pushdown: the remote query carries the agg +
    // group-by, Spark only merges the returned group rows
    val agg = spark.sql(
      """SELECT n_regionkey, COUNT(*) AS n, MAX(n_nationkey) AS mx
        |FROM duckwh.main.nation GROUP BY n_regionkey""".stripMargin)
    val planA = agg.queryExecution.executedPlan.toString
    assert(planA.contains("PushedAggregates"),
      s"aggregates must reach the remote query:\n$planA")
    assert(planA.contains("COUNT(") && planA.contains("MAX("),
      s"pushed aggregate list must carry COUNT and MAX:\n$planA")
    assert(planA.contains("PushedGroupByExpressions"),
      s"group-by must push with the aggregates:\n$planA")
    val expect = pq.table(spark, "nation")
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), max(col("n_nationkey")).as("mx"))
    assert(canon(agg) == canon(expect), "pushed aggregation must match the local plan")
  }

  test("append-only ledger accumulates runs in order (DuckDB)") {
    assume(driverAvailable, "duckdb jdbc driver not in the local cache")
    import spark.implicits._
    val run1 = Seq((1, "etl", "ok")).toDF("run_id", "job", "status").coalesce(1)
    val run2 = Seq((2, "etl", "ok")).toDF("run_id", "job", "status").coalesce(1)
    cat.replace(run1, "ledger")
    cat.append(run2, "ledger")
    val latest = cat.table(spark, "ledger").orderBy(col("run_id").desc).limit(1)
    // DuckDB reports INTEGER columns back as BIGINT through JDBC
    // metadata — read numerically rather than pinning the boxed type
    assert(latest.collect().head.getAs[Number](0).intValue == 2)
    assert(cat.table(spark, "ledger").count() == 2)
  }

  test("dialect classifies only missing-object errors as not-found, not every Catalog Error") {
    import graft.sources.DuckDbDialect
    def sql(msg: String) = new java.sql.SQLException(msg)
    assert(DuckDbDialect.isObjectNotFoundException(
      sql("""Catalog Error: Table with name "t" does not exist!""")))
    assert(DuckDbDialect.isObjectNotFoundException(
      sql("Catalog Error: Schema with name s does not exist!")))
    // a genuinely different catalog failure must NOT be treated as
    // "table missing, create it" — that would mask the real error
    assert(!DuckDbDialect.isObjectNotFoundException(
      sql("""Catalog Error: ambiguous reference to catalog or schema "x" """)))
    assert(!DuckDbDialect.isObjectNotFoundException(sql(null)))
  }
}
