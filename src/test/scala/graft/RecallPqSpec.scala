package graft

import org.apache.spark.sql.functions._

/** Search-quality contract for the PQ index (the RecallSpec discipline):
  * the oracle proves both PQ queries compute their declared plans
  * exactly, but nothing else stops a codebook/encoding change from
  * silently degrading what the search RETURNS. Ground truth is exact
  * integer L2 over the same ×1000-quantized vectors ADC approximates —
  * the metric PQ targets (the cosine-KNN op is a different metric and
  * not the right yardstick for quantization loss).
  *
  * Measured on the near-uniform synthetic corpus at sf0.001: raw ADC
  * recall@5 ≈ 0.22 (an 8×16 codebook on uniform data — the geometry
  * PQ compresses worst; real embedding corpora cluster and do far
  * better), rerank-of-50 recall@5 ≈ 0.77 (the FAISS refine pattern
  * recovering most of the quantization loss while exact-scoring only
  * R candidates per query). Floors sit under those with margin: they
  * catch breakage (wrong LUT indexing, codebook drift, shortlist not
  * feeding rerank), not noise. */
class RecallPqSpec extends SparkSpec {

  private def exactL2TopK(dir: String, k: Int) = {
    val qz = graft.ops.VectorSearch.quantized(spark, dir)
    val queries = qz.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("q").as("qq"))
    val scored = qz.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("l2", expr(
        "aggregate(zip_with(q, qq, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("l2"), col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("q_id", "vec_id")
  }

  private def recallOf(name: String): Double = {
    val truth = exactL2TopK(sfDir, 5)
    val got = SparkEntry.queries(name)(spark, sfDir).select("q_id", "vec_id")
    val total = truth.count().toDouble
    assert(total > 0, "ground truth must be non-empty")
    got.join(truth, Seq("q_id", "vec_id")).count().toDouble / total
  }

  test("pq+rerank recall ≥ 0.6 against exact L2 (rerank recovers quantization loss)") {
    val r = recallOf("ns_similarity_pq_rerank")
    assert(r >= 0.6, f"pq rerank recall $r%.3f fell below the 0.6 floor")
  }

  test("raw ADC recall sanity bound (≈0.22 is the uniform-corpus ceiling for 8×16 codes)") {
    val r = recallOf("ns_similarity_pq")
    assert(r >= 0.1, f"raw pq recall $r%.3f below the structural sanity bound")
  }
}
