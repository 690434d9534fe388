package graft

import org.apache.spark.sql.functions._

/** Search-quality contract for the IVF index: plan-shape locks
  * (PlanSpec) prove the probe is pruned, but nothing else stops an
  * index change (nProbe, centroid sampling, bucket layout, probe
  * assignment) from silently degrading what the search RETURNS. Recall
  * against ns_similarity_knn — exact by construction — is that guard.
  *
  * Two corpora, two floors:
  *  - a PLANTED clustered corpus (tight label-aligned clusters, the
  *    geometry a coarse quantizer is built for): the index must
  *    recover ≥ 0.7 of the true top-k while probing 2 of 10 buckets.
  *    This is the main contract — broken probe assignment, centroid
  *    construction, or bucket joins all crater it.
  *  - the REAL synthetic corpus, whose embeddings are near-uniform
  *    (measured: within-label mean cosine 0.02 vs 0.00 between; only
  *    ~9% of true top-5 neighbors share the query's label) — a
  *    structural ceiling of ~0.25 for ANY index probing 2/10 buckets,
  *    k-means or not. The floor there is a sanity bound documenting
  *    that ceiling, not a quality target.
  */
class RecallSpec extends SparkSpec {

  private def recall(dir: String): Double = {
    val knn = SparkEntry.queries("ns_similarity_knn")(spark, dir)
      .select("q_id", "vec_id")
    val ivf = SparkEntry.queries("ns_similarity_ivf")(spark, dir)
      .select("q_id", "vec_id")
    val total = knn.count().toDouble
    assert(total > 0, "ground truth must be non-empty")
    ivf.join(knn, Seq("q_id", "vec_id")).count().toDouble / total
  }

  test("ivf recall ≥ 0.7 on a corpus with genuine cluster structure (nProbe=2 of 10)") {
    import spark.implicits._
    // 10 tight clusters of 50 vectors in 64-dim: center per label from
    // a seeded RNG, members = center + small noise. label IS the
    // geometric cluster — the layout a built IVF index has after
    // k-means assignment. Queries (vec_id < 20) land 2 per cluster.
    val rnd = new java.util.Random(42)
    val dim = 64
    val centers = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 500).map { i =>
      // interleave labels so BOTH structural id rules cover every
      // cluster: the queries (vec_id < 20) hit each label twice, and
      // the centroid-build sample (vec_id % 20 == 0, centSample) draws
      // 2–3 vectors per label — i % 10 alone would put every sampled
      // id in label 0 and leave nine clusters centroid-less
      val label = ((i % 10) + (i / 20)) % 10
      val noise = 0.15
      val v = centers(label).map(c => (c + noise * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq, label)
    }
    val dir = java.nio.file.Files.createTempDirectory("recall-emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = recall(dir)
    assert(r >= 0.7, f"ivf recall $r%.3f fell below the 0.7 floor on clustered data")
  }

  test("ivf recall sanity bound on the real (near-uniform) corpus") {
    // ~0.25 measured; the bound catches catastrophic breakage (empty
    // probe, wrong bucket join), not quality — see class doc for why
    // 0.7 is unreachable for any 2-of-10-bucket probe on this corpus
    val r = recall(sfDir)
    assert(r >= 0.15, f"ivf recall $r%.3f below the structural sanity bound")
  }

  test("bbq 8x-oversampled rescore keeps recall@5 ≥ 0.5 on the real corpus") {
    // one sign bit per dimension (centered on the per-dim corpus mean)
    // keeps only direction octant information — on the near-uniform
    // corpus a 40-candidate hamming page still recovers over half the
    // true top-5 after exact rescoring; the floor catches packing or
    // rescore breakage (a random page scores ~0.04 here)
    val knn = SparkEntry.queries("ns_similarity_knn")(spark, sfDir)
      .select("q_id", "vec_id")
    val bbq = SparkEntry.queries("ns_similarity_bbq_rerank")(spark, sfDir)
      .select("q_id", "vec_id")
    val total = knn.count().toDouble
    assert(total > 0)
    val r = bbq.join(knn, Seq("q_id", "vec_id")).count().toDouble / total
    assert(r >= 0.5, f"bbq rerank recall $r%.3f fell below the 0.5 floor")
  }

  test("mrl truncated-dim shortlist + exact rerank keeps recall@5 ≥ 0.6") {
    // unlike ivf's bucket probe, the MRL shortlist scans everything at
    // 16/64 dims — on the near-uniform corpus a 50-candidate shortlist
    // still recovers most true neighbors, so a real floor applies
    val knn = SparkEntry.queries("ns_similarity_knn")(spark, sfDir)
      .select("q_id", "vec_id")
    val mrl = SparkEntry.queries("ns_similarity_mrl")(spark, sfDir)
      .select("q_id", "vec_id")
    val total = knn.count().toDouble
    assert(total > 0)
    val r = mrl.join(knn, Seq("q_id", "vec_id")).count().toDouble / total
    assert(r >= 0.6, f"mrl rerank recall $r%.3f fell below the 0.6 floor")
  }
}
