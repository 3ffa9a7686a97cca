package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic numeric helpers for oracle (hash-exact) parity.
  *
  * Summing raw doubles is order-dependent: Spark's partial aggregation adds
  * values in a partition-dependent order, so the last ulp of a
  * `sum(double)` differs run-to-run and engine-to-engine. The driver compares
  * results hash-for-hash against DuckDB (BASELINE.md), so every aggregate we
  * expose must be bit-reproducible:
  *
  *   - per-row scalar double arithmetic is IEEE-deterministic (same ops, same
  *     order → same bits in any engine), so row-level expressions stay double;
  *   - each row value is then cast to DECIMAL(30,10) — a correctly-rounded,
  *     deterministic conversion — and summed exactly (decimal addition is
  *     associative/commutative, so partial aggregation order is irrelevant);
  *   - the exact decimal total converts back to DOUBLE (again correctly
  *     rounded) for a stable, engine-neutral output type.
  *
  * DuckDB equivalent: `CAST(sum(CAST(x AS DECIMAL(30,10))) AS DOUBLE)`.
  *
  * This also scales: decimal sums use the same partial/final HashAggregate
  * (map-side combine) as double sums — no extra shuffle, no driver work.
  */
object Exact {
  private val Dec = DecimalType(30, 10)

  /** Order-independent exact sum of a double-valued expression, as DOUBLE.
    *
    * ONLY safe for raw stored columns whose doubles carry ≤2 decimal digits
    * and magnitude below ~1e5 (prices, quantities, rates in testdata): there
    * the DuckDB cast (which computes `x * 1e10` in double before rounding)
    * and Spark's exact-BigDecimal cast agree. For derived products or
    * re-aggregated doubles use [[scaledLong]] — the double→decimal paths
    * diverge by 1 ulp per row otherwise (observed empirically). */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Deterministic mean: exact sum divided by a count (double / long). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Exact scaled-integer view of a double with ≤`digits` decimal digits:
    * `round(x * 10^digits)` as LONG. `x * 10^digits` lands within a hair of
    * the true integer (exact for the testdata's 2-decimal money/rate values),
    * and round-half-up (Spark) vs round-half-away (DuckDB) agree for
    * positives, so both engines produce the identical integer. All downstream
    * arithmetic (products, window sums, re-aggregation) is then exact int64 —
    * fully order- and engine-independent. DuckDB equivalent:
    * `CAST(round(x * 10^digits) AS BIGINT)`. */
  def scaledLong(c: Column, digits: Int): Column =
    round(c * math.pow(10, digits), 0).cast("long")

  /** Money column (2 decimals) as exact integer cents. */
  def cents(c: Column): Column = scaledLong(c, 2)
}
