package graft

import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** PostgreSQL dialect coverage for the JDBC catalog (SURVEY §2.1 S1/S2;
  * the reference warehouse IS Postgres —
  * `/root/reference/src/config/warehouse_connection.py:14-16`).
  *
  * The container has no Postgres server and no egress (Derby is the
  * only embedded RDBMS on the classpath, and it has no PG-wire mode),
  * so what this spec pins is the DIALECT BOUNDARY: the exact SQL and
  * type DDL Spark generates for a `jdbc:postgresql:` URL — which is
  * everything `JdbcCatalog` contributes to a Postgres conversation.
  * The wire protocol below that boundary is the Postgres JDBC
  * driver's, not ours; the server-interaction shapes themselves
  * (replace/append/pushdown/striding) are round-tripped against the
  * live embedded RDBMS in JdbcSpec.
  */
class PostgresDialectSpec extends SparkSpec {

  private val pg = JdbcDialects.get("jdbc:postgresql://wh:5432/dw")

  test("postgresql:// URLs resolve to the Postgres dialect, not the default") {
    assert(pg.getClass.getName.contains("PostgresDialect"), pg.getClass.getName)
    assert(pg.canHandle("jdbc:postgresql://wh:5432/dw"))
  }

  test("identifier quoting is double-quoted (case-exact round trip)") {
    // Spark writes case-exact quoted identifiers; Postgres folds
    // UNQUOTED identifiers to lowercase — quoting is what makes the
    // JdbcCatalog.replace -> table round trip schema-stable
    assert(pg.quoteIdentifier("n_name") == "\"n_name\"")
    assert(pg.quoteIdentifier("OrderQty") == "\"OrderQty\"")
  }

  test("replace-mode truncate compiles to Postgres TRUNCATE TABLE ONLY") {
    // JdbcCatalog.replace sets truncate=true; on Postgres that must be
    // TRUNCATE TABLE ONLY (never cascade into inheriting tables) and
    // the dialect must declare truncation non-cascading, or Spark
    // falls back to drop-and-recreate and loses grants/indexes
    assert(pg.getTruncateQuery("dim_product") == "TRUNCATE TABLE ONLY dim_product")
    assert(pg.isCascadingTruncateTable().contains(false))
  }

  test("warehouse schema types map to the Postgres DDL types") {
    def ddl(t: DataType): String =
      pg.getJDBCType(t).map(_.databaseTypeDefinition)
        .getOrElse(fail(s"no Postgres mapping for $t"))
    assert(ddl(StringType) == "TEXT")     // not VARCHAR(255) — no silent truncation
    assert(ddl(DoubleType) == "FLOAT8")
    assert(ddl(FloatType) == "FLOAT4")
    assert(ddl(ByteType) == "SMALLINT")   // PG has no TINYINT
    assert(ddl(BinaryType) == "BYTEA")    // the multimodal opaque-bytes column
    assert(ddl(BooleanType) == "BOOLEAN")
  }

  test("pushdown predicates compile to Postgres SQL") {
    // the filter JdbcCatalog's striped scan would push into each
    // per-partition query: quoted column, inline literal
    val gt = new Predicate(">",
      Array(Expressions.column("c_acctbal"), Expressions.literal(100.5)))
    val sql = pg.compileExpression(gt)
      .getOrElse(fail("Postgres dialect must compile a simple > predicate"))
    assert(sql.contains("\"c_acctbal\"") && sql.contains("100.5"), sql)
  }
}
