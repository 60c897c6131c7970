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

  /** Hash-safe PRESENTATION image of a decimal output column: the
    * already-exact DECIMAL(18,4) value exposed as DOUBLE. Decimal
    * output columns of ANY precision hash differently through the
    * driver's cross-engine hasher (r8 proved p≤18 unsafe; r9 falsified
    * the "wide is safe" theory at p=38 with value-identical dumps), so
    * nothing we emit may be decimal-typed. A 4-decimal value converts
    * to double correctly-rounded and identically in both engines —
    * proven by dsum/davg and every green DOUBLE oracle column. The
    * decimal ARITHMETIC (exact, order-independent) is unchanged; only
    * the emitted type is. Apply to every decimal that reaches a query's
    * OUTPUT schema. */
  def decOut(c: Column): Column = c.cast(DoubleType)

  /** Order-independent SUM over a double column, exposed as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Order-independent AVG over a double column, exposed as DOUBLE
    * (single double division at the end — deterministic). */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)
}
