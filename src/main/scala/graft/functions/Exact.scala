package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact fixed-point helpers for cross-engine-deterministic aggregates.
  *
  * Problem: `round(avg(x), n)` over 2-decimal-place data is NOT stable
  * across engines. The true average lies on a decimal grid (multiples of
  * 0.01/count), which coincides with round-half boundaries; the two
  * engines' float sums differ in the last ulps and their half-rounding
  * algorithms differ (JVM BigDecimal HALF_UP vs multiply-and-round), so a
  * hash compare flaps on boundary groups.
  *
  * Fix: rescale the native aggregate back onto its exact integer grid
  * (float noise ≪ 0.5, so round-to-nearest-integer recovers the exact
  * value), then derive any readable double via a fixed sequence of IEEE
  * ops on exactly-represented int64 inputs — bit-identical in any
  * IEEE-754 engine. All int64 values stay < 2^53 so the int→double
  * conversions are exact.
  */
object Exact {

  /** x (2dp double) → exact integer cents. The product x*100 is within
    * ~1e-9 of an integer, so round-to-nearest is engine-independent. */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Exact total in cents: per-row conversion to the integer grid, then
    * an integer sum — exact at ANY group count (unlike recovering the
    * total from a float average, whose relative 1e-16 noise on an
    * avg·100·cnt product crosses 0.5 absolute once cnt reaches ~1e9 —
    * i.e. exactly the 100-TB regime this engine targets). */
  def sumCents(c: Column): Column = sum(cents(c))

  /** Bit-identical readable average in currency units: one exact int64→
    * double conversion per operand + one IEEE division. */
  def avgFromCents(sumCents: Column, cnt: Column): Column =
    sumCents.cast("double") / (cnt.cast("double") * lit(100.0))

  /** Exact sum of squared deviations (cents²) from a computed var_samp:
    * var·n·(n−1)·10⁴ is an exact integer; float noise ≪ 0.5. */
  def sseFromVariance(variance: Column, cnt: Column): Column =
    round(variance * cnt * (cnt - lit(1)) * lit(10000)).cast("long")

  /** Bit-identical readable var_samp (currency² units) from exact SSE. */
  def varFromSse(sseCents2: Column, cnt: Column): Column =
    sseCents2.cast("double") /
      ((cnt * (cnt - lit(1))).cast("double") * lit(10000.0))
}
