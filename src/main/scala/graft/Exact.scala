package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic helpers for oracle parity.
  *
  * The testdata money columns are doubles with 2 decimal digits (plus float
  * noise ≤ 1e-9). Summing raw doubles is accumulation-order dependent, so a
  * Spark result and a DuckDB oracle can differ in the last ulp. Converting
  * each value to integer "cents" BEFORE aggregating makes every aggregate
  * exact and bit-identical across engines:
  *   round(x * 100) is > 1e5 away from any .5 boundary at this precision,
  *   so Spark HALF_UP and DuckDB half-away-from-zero agree.
  */
object Exact {
  /** 2-dp money -> integer cents. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
  /** product of two 2-dp values -> integer 1e-4 units. */
  def cents4(c: Column): Column = round(c * 10000, 0).cast("long")
  /** product of three 2-dp values -> integer 1e-6 units. */
  def cents6(c: Column): Column = round(c * 1000000, 0).cast("long")

  /** DECIMAL(38,0) -> int64 that fails LOUDLY when the value does not
    * fit: a plain `.cast("long")` silently yields NULL on overflow in
    * non-ANSI Spark, while DuckDB's HUGEINT->BIGINT cast raises — the
    * two engines would diverge at exactly the scale the decimal
    * accumulator exists for. The range check makes both fail the same
    * way (query error, not a quiet NULL in one engine's output). */
  def toLongChecked(s: Column): Column =
    when(s.isNotNull && (s > lit(Long.MaxValue) || s < lit(Long.MinValue)),
      raise_error(concat(lit("graft.Exact: int64 overflow: "), s.cast("string"))))
      .otherwise(s.cast("long"))

  /** Overflow-proof exact sum of integer units: accumulate in
    * DECIMAL(38,0) and emit int64. A ~1e9-unit row term (cents4 of a
    * large money product) overflows a 64-bit sum near 1e10 rows —
    * inside 100 TB fact-table territory when a group holds most rows —
    * while the 38-digit accumulator does not. DuckDB needs no twin:
    * its SUM(BIGINT) already accumulates in HUGEINT (which is exactly
    * why sqlSum pins the result back to BIGINT — and raises if it
    * doesn't fit, which toLongChecked mirrors). */
  def sumExact(c: Column): Column =
    toLongChecked(sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 0))))

  /** DuckDB-side equivalents, for building oracle SQL strings. */
  def sqlCents(e: String): String  = s"CAST(round(($e)*100,0) AS BIGINT)"
  def sqlCents4(e: String): String = s"CAST(round(($e)*10000,0) AS BIGINT)"
  def sqlCents6(e: String): String = s"CAST(round(($e)*1000000,0) AS BIGINT)"
  /** DuckDB SUM(BIGINT) returns HUGEINT; pin the output schema back to int64. */
  def sqlSum(e: String): String = s"CAST(SUM($e) AS BIGINT)"
}
