package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse catalog abstraction (SURVEY.md §2.1 S1/S2/S5). The
  * reference reads whole tables from SQL Server / PostgreSQL over JDBC
  * (`/root/reference/src/config/database_connection.py:13-27`,
  * `src/pipelines/etl.py:19-24`) and writes results back with a
  * replace-then-insert. Here the same surface is a trait with two
  * interchangeable implementations: the columnar parquet warehouse
  * (the performance path — scans prune and push down) and a real JDBC
  * catalog for integrating with an RDBMS.
  */
trait Catalog {
  def table(s: SparkSession, name: String): DataFrame
}

/** Parquet-backed catalog over a scale-factor directory — delegates to
  * [[graft.Tables]], the path every declared query runs on.
  */
final class ParquetCatalog(dir: String) extends Catalog {
  def table(s: SparkSession, name: String): DataFrame = Tables(s, dir, name)
}

/** JDBC-backed catalog. Two read shapes:
  *
  *  - [[table]]: pushes `query` (arbitrary SQL, so projections/filters
  *    run inside the RDBMS) over a SINGLE connection — correct for
  *    dimension-sized tables, a bottleneck for facts;
  *  - [[tablePartitioned]]: the scale path — N executors open N
  *    parallel connections, each reading one stride of
  *    `partitionColumn` (Spark's predicate-ranged JDBC scan). At 100 TB
  *    the fact table must come through this path (or better, a one-time
  *    parquet export): a single JDBC cursor cannot feed a cluster.
  *
  * Writes go through [[replace]] (S5: the reference's delete-then-insert
  * becomes mode=Overwrite with truncate) and [[append]] (S7 ledger).
  */
final class JdbcCatalog(url: String, driver: String) extends Catalog {

  // DuckDB needs its (tiny) dialect registered or Spark misreads the
  // existence-probe failure on first write — see DuckDbDialect
  if (DuckDbDialect.canHandle(url) &&
    !(org.apache.spark.sql.jdbc.JdbcDialects.get(url) eq DuckDbDialect))
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DuckDbDialect)

  private def base(s: SparkSession) =
    s.read.format("jdbc").option("url", url).option("driver", driver)

  def table(s: SparkSession, name: String): DataFrame =
    base(s).option("dbtable", name).load()

  /** Arbitrary pushed-down SQL (S3 over JDBC: the RDBMS aggregates,
    * Spark receives the result rows).
    */
  def query(s: SparkSession, sql: String): DataFrame =
    base(s).option("query", sql).load()

  def tablePartitioned(
      s: SparkSession,
      name: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    base(s)
      .option("dbtable", name)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** S5 replace-mode sink. `truncate` keeps the RDBMS-side DDL (and any
    * grants/indexes) instead of drop-and-recreate when overwriting.
    */
  def replace(df: DataFrame, name: String): Unit =
    df.write.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", name)
      .option("truncate", "true")
      .mode(SaveMode.Overwrite)
      .save()

  /** S7 append-only sink (run ledger shape). */
  def append(df: DataFrame, name: String): Unit =
    df.write.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", name)
      .mode(SaveMode.Append)
      .save()

  /** Register this warehouse as a Spark DataSource **V2** catalog
    * (queryable as `name.<schema>.<table>`), unlocking the pushdown
    * surface the V1 `spark.read.jdbc` path lacks: LIMIT, ORDER BY +
    * LIMIT (top-N), sample, and partial aggregates
    * (COUNT/SUM/MIN/MAX/AVG with GROUP BY) are compiled by the dialect
    * into the REMOTE query, so a dimension `LIMIT 5` ships 5 rows over
    * the wire and a fact-side `GROUP BY` returns group rows instead of
    * the table. The pushdown flags are on by default in Spark 4; set
    * explicitly here so the capability is part of the declared
    * contract, not an upstream default.
    */
  def registerV2(s: SparkSession, name: String): Unit = {
    s.conf.set(
      s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    s.conf.set(s"spark.sql.catalog.$name.url", url)
    s.conf.set(s"spark.sql.catalog.$name.driver", driver)
    s.conf.set(s"spark.sql.catalog.$name.pushDownLimit", "true")
    s.conf.set(s"spark.sql.catalog.$name.pushDownAggregate", "true")
  }
}
