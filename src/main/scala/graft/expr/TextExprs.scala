package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{NfcNormalize, SimHashBits}

/** Column wrappers for native text-signature expressions
  * (org.apache.spark.sql.graftshim). */
object TextFunctions {
  import graft.Cols

  /** 16-bit SimHash signature of a token array — one codegen'd map pass,
    * zero shuffles (vs the SQL explode-×16 + double-aggregate shape). */
  def simhash_bits(tokens: Column): Column =
    Cols.column(SimHashBits(Cols.expr(tokens)))

  /** Unicode NFC normalization (identity on ASCII / already-NFC text). */
  def nfc_normalize(text: Column): Column =
    Cols.column(NfcNormalize(Cols.expr(text)))

  /** Ordered candidate pairs from a sorted bucket-member array. */
  def ordered_pairs(members: Column, includeDiagonal: Boolean): Column =
    Cols.column(org.apache.spark.sql.graftshim.OrderedPairs(
      Cols.expr(members), includeDiagonal))

  /** Bounded bucket-member collection (≤ cap ids, over-cap → null). */
  def bounded_bucket(ids: Column, cap: Int): Column =
    Cols.column(org.apache.spark.sql.graftshim.BoundedBucketAgg(
      Cols.expr(ids), cap).toAggregateExpression())

  /** All n MinHash signatures of a shingle array in one map pass — no
    * explode, no per-doc aggregation, no shuffle (null on empty). */
  def minhash_sigs(shingles: Column, n: Int): Column =
    Cols.column(org.apache.spark.sql.graftshim.MinHashSigs(
      Cols.expr(shingles), n))

  /** Spark's runtime-filter Bloom aggregate over LONG inputs (feed it
    * xxhash64): the membership structure a 100 TB semi-join ships
    * instead of a broadcast hash set. */
  def bloom_filter_agg(hashed: Column, estimatedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    Cols.column(new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      Cols.expr(hashed), Literal(estimatedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Probabilistic membership probe against a bloom_filter_agg result;
    * false positives possible, false negatives not. */
  def might_contain(bloom: Column, hashed: Column): Column =
    Cols.column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      Cols.expr(bloom), Cols.expr(hashed)))
}
