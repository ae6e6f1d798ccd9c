package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Shared query helpers.
  *
  * Determinism contract for money aggregates: double addition is
  * order-dependent and Spark's partial-aggregation order differs from
  * DuckDB's, so a double `sum()` hash-mismatches the oracle in the last
  * ulps. Casting inputs to DECIMAL(18,6) (and sums to DECIMAL(38,6))
  * makes the arithmetic exact and engine-independent; arbitrary doubles
  * never sit exactly on a decimal rounding tie, so the cast itself is
  * deterministic across engines. ONE definition here — keep both files'
  * oracles in lockstep with it.
  */
package object queries {
  private[queries] def dec(c: Column): Column = c.cast(DecimalType(18, 6))
  private[queries] def dec38(c: Column): Column = c.cast(DecimalType(38, 6))
}
