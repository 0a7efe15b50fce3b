package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic ("oracle-exact") aggregation helpers.
  *
  * Floating-point SUM/AVG are summation-order dependent, so two engines
  * (or two runs with different partitioning) can disagree in the last
  * bits. Routing the accumulation through a fixed-scale decimal makes
  * the aggregate exact and engine-independent; the final cast back to
  * double is a single deterministic conversion. This is how every
  * money/quantity aggregate in the engine stays hash-comparable with a
  * DuckDB oracle while remaining a plain map-side-combinable Spark
  * aggregate (partial sums of decimals are still decimals — no loss of
  * parallelism, no collect-to-driver).
  */
object Exact {
  private val Dec = DecimalType(28, 6)

  /** Exact SUM over a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact AVG (sum/count of non-nulls), returned as double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragment equivalents for the DuckDB oracle. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / COUNT($expr))"
}
