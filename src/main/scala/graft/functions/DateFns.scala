package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Calendar-quarter arithmetic (SURVEY.md §2 F9). The reference defines
  * quarter subtraction as whole quarters:
  * `(y1 - y2) * 4 + (q1 - q2)` (`/root/reference/src/utils/
  * quarter_format.py:19`). Its LSTM notebook re-derives the same
  * difference with a ×3 (months-per-quarter) factor
  * (`notebooks/LSTM_features_learning.ipynb` cell 6, L163) — an internal
  * inconsistency of the reference; per SURVEY §7.4.7 the ×4
  * quarters-per-year version is the adopted semantics, and this helper
  * exists so no caller re-derives it with the notebook's bug.
  */
object DateFns {

  /** Signed whole-quarter difference `a - b` between two date columns. */
  def quarterDiff(a: Column, b: Column): Column =
    ((year(a) - year(b)) * 4 + (quarter(a) - quarter(b))).cast(IntegerType)

  /** DuckDB oracle fragment mirroring [[quarterDiff]]. */
  object Sql {
    def quarterDiff(a: String, b: String): String =
      s"CAST((year($a) - year($b)) * 4 + (quarter($a) - quarter($b)) AS INT)"
  }
}
