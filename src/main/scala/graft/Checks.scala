package graft

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality assertions — the dbt-style schema tests the reference
  * never configured (`/root/reference/dbt/` ships no `not_null`/`unique`
  * tests; SURVEY.md §6), done Spark-first.
  *
  * Two execution modes, both single-pass:
  *
  *  - [[audit]]: EAGER — one aggregation job computes every row-local
  *    rule's violation count. The nightly standalone quality gate.
  *  - [[observed]]: FREE — attaches the same rules to a frame via Spark's
  *    `Observation` API; the counts materialize as a side effect of
  *    whatever action the pipeline already runs (the write, the count) —
  *    zero extra scans, which at 100 TB is the difference between "we
  *    validate" and "we validate when someone remembers to pay for it".
  *
  * Row-local rule helpers return Columns (composable, codegen'd);
  * [[duplicateKeys]] covers the one common rule that is not row-local.
  */
object Checks {

  /** Rule: `c` must be non-null. */
  def notNull(c: Column): Column = c.isNotNull

  /** Rule: `c` must be one of `allowed` (NULLs fail — pair with a separate
    * [[notNull]] rule when NULL is acceptable). */
  def acceptedValues(c: Column, allowed: Seq[Any]): Column =
    coalesce(c.isin(allowed: _*), lit(false))

  /** Rule: `c` within [lo, hi] (NULLs fail). */
  def inRange(c: Column, lo: Column, hi: Column): Column =
    coalesce(c >= lo && c <= hi, lit(false))

  private def violationAggs(rules: Seq[(String, Column)]): Seq[Column] =
    rules.map { case (name, rule) =>
      sum(when(!coalesce(rule, lit(false)), 1L).otherwise(0L)).as(name)
    }

  /** Eager audit: violation count per rule, one aggregation pass. */
  def audit(df: DataFrame, rules: (String, Column)*): Map[String, Long] = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val aggs = violationAggs(rules)
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    rules.map { case (name, _) =>
      // empty frame → sum() is NULL → zero violations
      name -> (if (row.isNullAt(row.fieldIndex(name))) 0L
               else row.getLong(row.fieldIndex(name)))
    }.toMap
  }

  /** Piggyback audit: returns the frame with an [[Observation]] attached;
    * after the caller's NEXT action on the returned frame, `obs.get` holds
    * the per-rule violation counts (Long). No extra job. */
  def observed(df: DataFrame, name: String,
      rules: (String, Column)*): (DataFrame, Observation) = {
    require(rules.nonEmpty, "observed needs at least one rule")
    val obs = Observation(name)
    val aggs = violationAggs(rules)
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** The non-row-local staple: key tuples appearing more than once, with
    * their multiplicity — dbt's `unique` test as one groupBy. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Quarantine routing: split a frame into (passing, quarantined) by the
    * conjunction of row-local rules; quarantined rows carry a
    * `_failed_rules` column naming every rule they violate (comma-joined,
    * rule order) — the standard bad-records sink shape (Delta DLT
    * expectations, Beam dead-letter queues). Both frames are lazy views of
    * ONE scan each (the rules are codegen'd predicates, no join, no
    * shuffle); callers writing both typically persist the input first. */
  def quarantine(df: DataFrame, rules: (String, Column)*): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "quarantine needs at least one rule")
    val ok = rules.map { case (_, r) => coalesce(r, lit(false)) }.reduce(_ && _)
    val failed = array_join(filter(array(rules.map { case (name, r) =>
      when(!coalesce(r, lit(false)), lit(name))
    }: _*), _.isNotNull), ",")
    (df.filter(ok), df.filter(!ok).withColumn("_failed_rules", failed))
  }
}
