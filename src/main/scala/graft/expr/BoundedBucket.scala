package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bucket accumulator: true member count + at most cap+1 retained ids. */
case class BucketAcc(n: Long, items: Seq[Long])

/** Bounded per-bucket member list for LSH/inverted-index candidate
  * generation — the aggregation-side form of a hot-bucket cap.
  *
  * Collects a bucket's member ids up to `cap`, tracking the TRUE count
  * separately; `finish` returns null for any bucket whose true count
  * exceeds the cap (dropped whole, deterministically — the retained
  * subset is order-dependent but only ever discarded). The buffer holds
  * at most cap+1 ids regardless of how hot the bucket is, so — unlike a
  * count().over(bucket) window, which buffers EVERY row of the hottest
  * bucket in one task, or a collect_list, which buffers the whole
  * bucket — memory per group is a constant. Participates in partial
  * aggregation: map-side buckets pre-shrink to cap+1 before the
  * shuffle, so a 100M-row boilerplate bucket ships ~cap ids per map
  * task, not 100M rows.
  *
  * Output is sorted ascending so downstream ordered-pair expansion
  * (graftshim.OrderedPairs) emits each unordered pair exactly once.
  */
class BoundedBucketList(cap: Int) extends Aggregator[Long, BucketAcc, Seq[Long]] {
  override def zero: BucketAcc = BucketAcc(0L, Vector.empty)
  override def reduce(b: BucketAcc, a: Long): BucketAcc =
    BucketAcc(b.n + 1, if (b.items.length <= cap) b.items :+ a else b.items)
  override def merge(x: BucketAcc, y: BucketAcc): BucketAcc =
    BucketAcc(x.n + y.n, (x.items ++ y.items).take(cap + 1))
  override def finish(b: BucketAcc): Seq[Long] =
    if (b.n > cap) null else b.items.sorted
  override def bufferEncoder: Encoder[BucketAcc] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
