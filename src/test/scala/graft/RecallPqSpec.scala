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

  test("pq recall on a corpus with genuine cluster structure (the geometry PQ is built for)") {
    import spark.implicits._
    // the RecallSpec planted corpus: 10 tight 64-dim clusters. Measured
    // behavior here is the TEXTBOOK PQ profile: the true top-5 are
    // within-cluster, cluster members collapse to near-identical codes
    // (the codebook puts a centroid at each cluster), so raw ADC
    // separates clusters but cannot RANK inside one (≈0.22) — while the
    // rerank shortlist contains the entire true top-5 and the exact
    // refine recovers recall 1.000. That split IS the contract: the
    // compressed scan's job is candidate containment, the refine's job
    // is order.
    val rnd = new java.util.Random(42)
    val dim = 64
    val centers = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 500).map { i =>
      val label = ((i % 10) + (i / 20)) % 10
      val v = centers(label).map(c => (c + 0.15 * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq, label)
    }
    val dir = java.nio.file.Files.createTempDirectory("recall-pq").toString
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val truth = exactL2TopK(dir, 5)
    def rec(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, dir).select("q_id", "vec_id")
      got.join(truth, Seq("q_id", "vec_id")).count().toDouble / truth.count()
    }
    val raw = rec("ns_similarity_pq")
    val rr = rec("ns_similarity_pq_rerank")
    // ivfpq on the planted corpus: the label IS the true cluster, so the
    // coarse probe contains each query's own cluster and the composed
    // index must not fall below raw full-scan ADC by more than the
    // cells it legitimately skips
    val ivfpq = rec("ns_similarity_ivfpq")
    info(f"planted-corpus recall: raw ADC $raw%.3f, rerank $rr%.3f, ivfpq $ivfpq%.3f")
    assert(raw >= 0.1, f"raw ADC recall $raw%.3f — even cluster separation is broken")
    assert(rr >= 0.9, f"rerank recall $rr%.3f on clustered data (measured 1.000) — shortlist lost true neighbors")
    assert(ivfpq >= 0.1, f"ivfpq recall $ivfpq%.3f — coarse probing lost the query's own cluster")
  }

  test("raw ADC recall sanity bound (≈0.22 is the uniform-corpus ceiling for 8×16 codes)") {
    val r = recallOf("ns_similarity_pq")
    assert(r >= 0.1, f"raw pq recall $r%.3f below the structural sanity bound")
    // the composed index can only lose what the unprobed cells held;
    // on this corpus the label partition is geometric (RecallSpec's
    // ivf ≥ 0.7), so ivfpq must stay within the same structural band
    val rc = recallOf("ns_similarity_ivfpq")
    info(f"uniform-corpus recall: raw ADC $r%.3f, ivfpq $rc%.3f")
    assert(rc >= 0.05, f"ivfpq recall $rc%.3f below the structural sanity bound")
  }
}
