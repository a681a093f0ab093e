package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine parity helpers (SURVEY.md §7.3 rulebook).
  *
  * Never hash a raw `sum(DOUBLE)` — partial-aggregation order differs
  * between Spark partitions and the DuckDB oracle. All summed measures are
  * cast to DECIMAL(18,6) *before* SUM on both sides (exact, order-free);
  * unavoidable doubles (averages, cosines) are rounded to 6 digits on both
  * sides. Every oracled query must end with an ORDER BY on a provably
  * unique key set.
  */
object parity {
  /** Decimal type used for all exact-sum measures, both engines. */
  val Dec: DecimalType = DecimalType(18, 6)

  /** Cast a measure for an order-insensitive exact SUM. */
  def dec(c: Column): Column = c.cast(Dec)

  /** Wide variant for higher-moment / huge-cardinality sums: DECIMAL(18,6)
    * caps the integer part at 1e12, which a fourth-power term (|x| ≥ 1000)
    * or a 1e12-row hash sum silently exceeds — Spark NULLs the overflow in
    * non-ANSI mode while DuckDB errors, a quiet divergence exactly at the
    * scale these ops advertise. 38,6 moves the bound to 1e32.
    */
  val Dec38: DecimalType = DecimalType(38, 6)
  def dec38(c: Column): Column = c.cast(Dec38)

  /** Round an unavoidable double for stable cross-engine comparison.
    *
    * The +1e-9 shift is load-bearing: exact rational quotients (decimal
    * sum / count) routinely terminate at exactly 7 decimals ending in 5
    * (e.g. 65.3103125) — a true rounding TIE, where Spark's round
    * (HALF_UP on the shortest decimal repr) goes up while DuckDB
    * (rounding the binary double, which sits just below the tie) goes
    * down. Shifting both engines by the same epsilon — far above double
    * noise (~1e-14), far below the rounding granularity (5e-7) — moves
    * every such tie strictly off the boundary, so identical input
    * doubles round identically. Every oracle ROUND() carries the same
    * shift.
    */
  def r6(c: Column): Column = round(c + lit(1e-9), 6)
}
