package graft.sources

import java.sql.SQLException

import org.apache.spark.sql.jdbc.JdbcDialect

/** Minimal DuckDB dialect for Spark's JDBC source — the same extension
  * point the built-in PostgresDialect implements.
  *
  * Why it must exist at all: Spark 4 decides "table missing, create
  * it" vs "real failure, abort the write" by asking the dialect
  * [[isObjectNotFoundException]] about the probe query's SQLException.
  * The default implementation matches on SQLState / vendor codes, and
  * DuckDB's JDBC driver populates NEITHER — so without a dialect,
  * every first write to a DuckDB catalog dies on its own existence
  * probe instead of creating the table. Everything else (double-quoted
  * case-exact identifiers, TEXT/DOUBLE DDL, `TRUNCATE TABLE`) DuckDB
  * shares with the generic dialect's PG-flavored SQL, so only the
  * classification gap is overridden.
  *
  * Registered idempotently by [[JdbcCatalog]] when it sees a
  * `jdbc:duckdb:` URL (`JdbcDialects.registerDialect` prepends; double
  * registration is harmless but avoided anyway).
  */
object DuckDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb:")

  // "does not exist" is the stable tail of DuckDB's missing-object
  // errors ("Catalog Error: Table with name t does not exist!"); a bare
  // "Catalog Error" match would also swallow genuinely different
  // catalog failures (ambiguous references, type errors in DDL) and
  // misroute them into CREATE TABLE instead of aborting
  override def isObjectNotFoundException(e: SQLException): Boolean =
    e.getMessage != null && e.getMessage.contains("does not exist")

  // DuckDB speaks PostgreSQL's LIMIT/OFFSET syntax, which is exactly
  // what the generic dialect's getLimitClause/getOffsetClause emit —
  // advertising support lets the V2 scan push LIMIT / top-N /
  // pagination into the remote query instead of shipping the table
  override def supportsLimit: Boolean = true
  override def supportsOffset: Boolean = true

  // the base dialect refuses to compile EVERY function (so aggregate
  // pushdown silently no-ops); DuckDB accepts the ANSI spellings the
  // V2 SQL builder emits for these — the aggregate set is what makes
  // GROUP BY queries run remotely, the scalar set covers the common
  // pushed filter/projection shapes. Names not listed fall back to
  // Spark-side execution, never to wrong SQL.
  private val supportedFunctions: Set[String] = Set(
    "MIN", "MAX", "SUM", "COUNT", "AVG",
    "ABS", "CEIL", "FLOOR", "SQRT", "EXP", "LN", "POWER", "ROUND",
    "COALESCE", "GREATEST", "LEAST",
    "LOWER", "UPPER", "TRIM", "SUBSTRING", "CONCAT")
  override def isSupportedFunction(funcName: String): Boolean =
    supportedFunctions.contains(funcName)
}
