package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for the DuckDB-oracle hash-match gate.
  *
  * Double summation is order-dependent: Spark's partial aggregation
  * order differs run-to-run and from DuckDB's, so `sum(double)` can
  * drift in the last ulps and break value-hash comparison. We instead
  * sum EXACT decimals (each input double is rounded once, identically
  * in both engines, to 6 decimal places) and cast the exact total back
  * to double — bitwise identical regardless of aggregation order.
  *
  * Division uses `nullif`-style zero guards so Spark and DuckDB agree
  * on NULL (instead of Inf/NaN) for empty denominators.
  */
object Det {
  val Money: DecimalType = DecimalType(38, 6)

  /** Order-independent exact sum of a double column, as double.
    * Oracle SQL equivalent: CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
    */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** dsum over only the rows matching `cond` (conditional aggregation —
    * the single-pass replacement for the reference's double fact scan,
    * see /root/reference/src/pipelines/clustering.py:92 vs :115).
    * Oracle: CAST(SUM(CASE WHEN cond THEN CAST(x AS DECIMAL(38,6)) END) AS DOUBLE)
    */
  def dsumIf(cond: Column, c: Column): Column =
    sum(when(cond, c.cast(Money))).cast(DoubleType)

  /** n / d with NULL on zero/NULL denominator (matches `n / NULLIF(d, 0)`). */
  def ratio(n: Column, d: Column): Column = n / when(d =!= lit(0), d)
}
