package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (id, score) candidate flowing into the bounded top-k aggregate. */
case class ScoredItem(id: Long, score: Double)

/** Bounded top-k by (score desc, id asc) as a typed `Aggregator`.
  *
  * The scale-safe alternative to `row_number().over(Window.partitionBy(q))`
  * for per-group top-k: a window sorts and shuffles the ENTIRE scored
  * relation into |q| partitions, while this aggregator participates in
  * partial aggregation — each map task keeps at most k rows per group, so
  * the shuffle carries ≤ k·partitions rows per group and the stragglers a
  * giant window partition creates never form. Ordering ties break on id
  * ascending, matching `ORDER BY score DESC, id` row_number semantics.
  */
class TopKByScore(k: Int) extends Aggregator[ScoredItem, Seq[ScoredItem], Seq[ScoredItem]] {
  private def better(a: ScoredItem, b: ScoredItem): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
  private def trim(s: Seq[ScoredItem]): Seq[ScoredItem] = s.sortWith(better).take(k)

  override def zero: Seq[ScoredItem] = Seq.empty
  // k is tiny (single digits); append-and-resort beats heap bookkeeping.
  override def reduce(buf: Seq[ScoredItem], item: ScoredItem): Seq[ScoredItem] =
    trim(buf :+ item)
  override def merge(a: Seq[ScoredItem], b: Seq[ScoredItem]): Seq[ScoredItem] =
    trim(a ++ b)
  override def finish(r: Seq[ScoredItem]): Seq[ScoredItem] = r
  override def bufferEncoder: Encoder[Seq[ScoredItem]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredItem]] = ExpressionEncoder()
}
