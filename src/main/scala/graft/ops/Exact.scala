package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine-exact numeric aggregation helpers.
  *
  * Summing IEEE doubles is order-dependent, and Spark's partial/final hash
  * aggregation visits rows in a partition-dependent order — so `sum(double)`
  * is not reproducible across engines (or even across runs with different
  * partitioning). The fixtures' monetary columns are exact 2-decimal values,
  * so we sum them as DECIMAL (exact, associative, order-independent) and
  * cast the final result back to DOUBLE (exact decimal → nearest double is
  * deterministic and identical in Spark and DuckDB).
  *
  * This matters at 100 TB just as much as for the oracle: decimal partial
  * aggregation is still map-side combinable and whole-stage-codegen'd, and
  * the result no longer depends on shuffle layout — reruns are bit-stable.
  */
object Exact {
  val Money: DecimalType = DecimalType(18, 2)
  val Rate: DecimalType = DecimalType(3, 2) // discounts/taxes in [0,1), 2dp

  /** Order-independent sum of an exact-2-decimal double column. */
  def moneySum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact average = exact decimal sum / count, both cast to double. */
  def moneyAvg(c: Column): Column =
    sum(c.cast(Money)).cast(DoubleType) / count(c).cast(DoubleType)

  /** TPC-H style discounted revenue: sum(price * (1 - discount)) computed
    * entirely in decimal (exact), surfaced as double. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(price.cast(Money) * (lit(BigDecimal("1.00")).cast(Rate) - discount.cast(Rate)))
      .cast(DoubleType)
}
