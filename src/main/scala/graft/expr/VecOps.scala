package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{CosineSimilarity, DotProduct, LshSignBits}

/** Native vector math over `ARRAY<FLOAT>` embedding columns.
  *
  * The similarity-search operators need a dot product / cosine over the
  * 64-dim `embeddings.embedding` column at 100 TB scale. A SQL
  * `aggregate(zip_with(...))` composition works but materializes an
  * intermediate array per row and runs through interpreted higher-order
  * functions; these static methods do a tight primitive loop, accumulating
  * in double (index order, deterministic). The Catalyst expressions
  * wrapping them live in org.apache.spark.sql.graftshim and stay inside
  * whole-stage codegen via a static method call.
  */
object VecMath {
  /** Sequential (index-order) dot product, accumulated in double. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  /** cosine(a,b) = dot/(|a||b|); 0.0 for zero vectors (no NaN). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = norm(a) * norm(b)
    if (d == 0.0) 0.0 else dot(a, b) / d
  }
}

object VecFunctions {
  import graft.Cols
  def vec_dot(a: Column, b: Column): Column =
    Cols.column(DotProduct(Cols.expr(a), Cols.expr(b)))
  def vec_cosine(a: Column, b: Column): Column =
    Cols.column(CosineSimilarity(Cols.expr(a), Cols.expr(b)))
  def lsh_sign_bits(emb: Column, w: Array[Array[Long]]): Column =
    Cols.column(LshSignBits(Cols.expr(emb), w))
  /** round(x·1000) HALF_UP per element — integer-space quantization. */
  def quantize_vec(emb: Column): Column =
    Cols.column(org.apache.spark.sql.graftshim.QuantizeVec(Cols.expr(emb)))
  /** argmin (dist, cluster) over a broadcast centroid array column. */
  def nearest_centroid(q: Column, cents: Column): Column =
    Cols.column(org.apache.spark.sql.graftshim.NearestCentroid(Cols.expr(q), Cols.expr(cents)))
  /** PQ corpus encode: per-subspace argmin centroid ids. */
  def pq_encode(q: Column, cb: Column): Column =
    Cols.column(org.apache.spark.sql.graftshim.PqEncode(Cols.expr(q), Cols.expr(cb)))
  /** Per-query ADC lookup table over the broadcast codebook. */
  def pq_lut(qq: Column, cb: Column): Column =
    Cols.column(org.apache.spark.sql.graftshim.PqLut(Cols.expr(qq), Cols.expr(cb)))
  /** ADC score: sum of per-subspace LUT lookups by code. */
  def pq_adc(codes: Column, lut: Column): Column =
    Cols.column(org.apache.spark.sql.graftshim.PqAdc(Cols.expr(codes), Cols.expr(lut)))
  /** Exact long L2 between ARRAY<BIGINT> vectors. */
  def vec_l2_long(a: Column, b: Column): Column =
    Cols.column(org.apache.spark.sql.graftshim.L2DistanceLong(Cols.expr(a), Cols.expr(b)))
  /** Bounded top-k by (score desc, id asc) — row_number-identical. */
  def topk_by_score(id: Column, score: Column, k: Int): Column =
    Cols.column(org.apache.spark.sql.graftshim.TopKByScoreAgg(
      Cols.expr(id), Cols.expr(score), k).toAggregateExpression())
}
