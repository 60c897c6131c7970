package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism discipline shared by every oracle-checked query
  * (SURVEY.md §2.C, FIXTURES.md §3):
  *
  *   - SUM/AVG over DOUBLE goes through DECIMAL(18,4): decimal addition is
  *     exact and therefore immune to float summation order, which differs
  *     between Spark's partial/final aggregation tree and DuckDB's. The
  *     final value is cast back to DOUBLE so both engines expose the same
  *     column type.
  *   - double→decimal rounding ties cannot occur (a binary double can never
  *     be exactly x.xxxx5 in decimal), so HALF_UP (Spark) vs round-half-away
  *     (DuckDB) never diverge.
  */
object Determinism {
  val Dec: DecimalType = DecimalType(18, 4)

  /** Exact-summable image of a double column. */
  def dec(c: Column): Column = c.cast(Dec)

  /** Order-independent SUM over a double column, exposed as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Order-independent AVG over a double column, exposed as DOUBLE
    * (single double division at the end — deterministic). */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)
}
