package graft

import graft.sources.{JdbcCatalog, ParquetCatalog}
import org.apache.spark.sql.functions._

/** S1/S2/S5 against a real RDBMS: embedded Derby (on the Spark
  * classpath) stands in for the reference's SQL Server / PostgreSQL.
  * Round-trips the replace-mode sink, the single-connection query
  * pushdown, the partitioned parallel scan (the 100 TB-relevant read
  * shape), and the append-only ledger.
  */
class JdbcSpec extends SparkSpec {

  private lazy val cat: JdbcCatalog = {
    val db = java.nio.file.Files.createTempDirectory("graft_derby").resolve("wh")
    new JdbcCatalog(s"jdbc:derby:$db;create=true", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
  }
  private lazy val pq = new ParquetCatalog(sf("sf0.001"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("replace-mode sink + dbtable read round-trips the nation dim") {
    val nation = pq.table(spark, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    cat.replace(nation, "NATION")
    cat.replace(nation, "NATION") // idempotent: second replace truncates, not duplicates
    val back = cat.table(spark, "NATION")
    assert(canon(back) == canon(nation), "JDBC round trip must preserve all rows")
  }

  test("query pushdown aggregates inside the RDBMS") {
    // Spark writes quoted (case-exact) column names; Derby folds
    // unquoted identifiers to uppercase, so the pushdown SQL quotes them
    val agg = cat.query(spark,
      """SELECT "n_regionkey", COUNT(*) AS "n" FROM NATION GROUP BY "n_regionkey"""")
    val expect = pq.table(spark, "nation")
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    assert(canon(agg) == canon(expect))
    // the aggregation ran remotely: Spark's plan sees a single scan
    // relation, no Aggregate node of its own
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"agg must be pushed to the RDBMS:\n$plan")
  }

  test("partitioned read opens parallel per-stride scans") {
    val cust = pq.table(spark, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    cat.replace(cust, "CUSTOMER")
    val part = cat.tablePartitioned(spark, "CUSTOMER", "C_CUSTKEY",
      lowerBound = 0L, upperBound = 200L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4,
      "fact-shaped JDBC reads must stripe across parallel connections")
    assert(canon(part) == canon(cust), "striding must not lose or duplicate rows")
  }

  test("append-only ledger accumulates runs in order") {
    import spark.implicits._
    val run1 = Seq((1, "etl", "ok")).toDF("run_id", "job", "status")
    val run2 = Seq((2, "etl", "ok")).toDF("run_id", "job", "status")
    cat.replace(run1, "LEDGER")
    cat.append(run2, "LEDGER")
    val latest = cat.table(spark, "LEDGER").orderBy(col("run_id").desc).limit(1)
    assert(latest.collect().head.getInt(0) == 2)
    assert(cat.table(spark, "LEDGER").count() == 2)
  }
}
