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

  /** Hash-safe PRESENTATION type for decimal output columns. Narrow
    * (precision ≤ 18) decimals are int64-backed in both engines but
    * serialize differently through the driver's hasher (r8: the only 4
    * hash failures were exactly the DECIMAL(18,4)-output oracles, while
    * wide decimals — q02, Spark (30,4) vs DuckDB (38,4) — hash equal).
    * Arithmetic stays in [[Dec]]; only the column as EMITTED widens, so
    * values are bit-identical and the driver hash is type-stable. */
  val DecWide: DecimalType = DecimalType(38, 4)

  /** Exact-summable image of a double column. */
  def dec(c: Column): Column = c.cast(Dec)

  /** Presentation image of a decimal output column — same value, widened
    * to the hash-safe [[DecWide]]. Apply to every DECIMAL column that
    * reaches a query's OUTPUT schema (counts/sums exposed as BIGINT or
    * DOUBLE are already safe). */
  def decOut(c: Column): Column = c.cast(DecWide)

  /** Order-independent SUM over a double column, exposed as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Order-independent AVG over a double column, exposed as DOUBLE
    * (single double division at the end — deterministic). */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)
}
