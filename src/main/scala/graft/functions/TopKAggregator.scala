package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (SURVEY.md §2.11 custom-agg row): bounded top-k by
  * score with a deterministic (score desc, key asc) order, as an
  * `Aggregator[IN, BUF, OUT]`.
  *
  * Why an Aggregator and not a window: `row_number().over(partitionBy(g))`
  * shuffles EVERY row to its group's reducer before ranking; this
  * aggregator's buffer is capped at k entries, so partial aggregation
  * (map-side combine) reduces each upstream partition to ≤ k rows per group
  * before the shuffle — at 100 TB that is the difference between shuffling
  * the corpus and shuffling |groups|·k rows. The merge is associative and
  * commutative (merge-sort of two ≤ k lists, re-truncated to k), so any
  * partial-aggregation tree produces the same result.
  *
  * The buffer is a sorted Vector (largest first) — for small fixed k the
  * O(k) insert beats heap constant factors and keeps the Encoder simple.
  */
case class ScoredKey(key: Long, score: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredKey, Seq[ScoredKey], Seq[Long]] {
  require(k > 0)

  private def lt(a: ScoredKey, b: ScoredKey): Boolean =
    a.score > b.score || (a.score == b.score && a.key < b.key)

  override def zero: Seq[ScoredKey] = Vector.empty

  override def reduce(buf: Seq[ScoredKey], in: ScoredKey): Seq[ScoredKey] = {
    if (buf.size == k && !lt(in, buf.last)) buf
    else ((buf :+ in).sortWith(lt)).take(k)
  }

  override def merge(a: Seq[ScoredKey], b: Seq[ScoredKey]): Seq[ScoredKey] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(buf: Seq[ScoredKey]): Seq[Long] = buf.map(_.key)

  override def bufferEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** [[TopKAggregator]] variant that keeps the (key, score) pairs in the
  * output instead of projecting to keys — the building block for replacing
  * low-cardinality-partition ranking windows (VERDICT r2 item 1): groupBy +
  * this aggregator reduces each map partition to ≤ k rows per group BEFORE
  * the shuffle, where `row_number().over(partitionBy(lowCardKey))` would
  * funnel the whole fact table through |distinct keys| sort tasks. Ordered
  * (score desc, key asc); negate the score for ascending extremes. */
class TopKPairsAggregator(k: Int)
    extends Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] {
  require(k > 0)

  private def lt(a: ScoredKey, b: ScoredKey): Boolean =
    a.score > b.score || (a.score == b.score && a.key < b.key)

  override def zero: Seq[ScoredKey] = Vector.empty

  override def reduce(buf: Seq[ScoredKey], in: ScoredKey): Seq[ScoredKey] = {
    if (buf.size == k && !lt(in, buf.last)) buf
    else ((buf :+ in).sortWith(lt)).take(k)
  }

  override def merge(a: Seq[ScoredKey], b: Seq[ScoredKey]): Seq[ScoredKey] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(buf: Seq[ScoredKey]): Seq[ScoredKey] = buf

  override def bufferEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
  override def outputEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
}
