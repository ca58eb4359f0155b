package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle statement over
  * the same parquet tables. Column names/aliases MUST match between the
  * two — the driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Included in the per-round bench headline set. */
    bench: Boolean = true
)
