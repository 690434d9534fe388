package graft

import org.apache.spark.sql.functions._

/** Contracts for the learned k-means clustering and the SemDeDup-style
  * semantic dedup built on it (ops/VectorSearch). */
class KmeansSpec extends SparkSpec {

  test("kmeans contract: one row per vector, clusters in [0, k), Lloyd improves on the seed assignment") {
    val corpus = ops.VectorSearch.quantized(spark, sfDir)
    val n = corpus.count()

    val out = SparkEntry.queries("ns_cluster_kmeans")(spark, sfDir).cache()
    try {
      assert(out.count() == n, "every vector must receive exactly one cluster")
      val ids = out.agg(min("cluster"), max("cluster")).head()
      assert(ids.getInt(0) >= 0 && ids.getInt(1) <= 9, s"cluster ids out of range: $ids")

      // Lloyd monotonicity: total SSE under the learned centroids must
      // not exceed total SSE under the seed centroids (each assign and
      // each update step is non-increasing in SSE — if this fails, an
      // update or assignment step is wrong).
      val seeds = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").cast("int").as("cluster"), col("q").as("cq"))
      val seedSse = ops.VectorSearch.kmAssign(corpus, seeds)
        .agg(sum("dist")).head().getLong(0)
      val learnedSse = out.agg(sum("dist")).head().getLong(0)
      assert(learnedSse <= seedSse,
        s"learned SSE $learnedSse exceeds seed SSE $seedSse — Lloyd must not regress")
    } finally out.unpersist()
  }

  test("semantic dedup contract: min-id canonical, dups only within a cluster, cosine at threshold") {
    val out = SparkEntry.queries("ns_dedup_semantic")(spark, sfDir).cache()
    try {
      val bad = out.filter(col("dup_of").isNotNull && col("dup_of") >= col("vec_id")).count()
      assert(bad == 0, "dup_of must point at a strictly smaller id (min-id canonical)")
      assert(out.filter(col("is_kept") =!= col("dup_of").isNull).count() == 0,
        "is_kept must be exactly dup_of IS NULL")

      // every (vec, dup_of) pair really is same-cluster and >= threshold
      val assign = SparkEntry.queries("ns_cluster_kmeans")(spark, sfDir)
        .select(col("vec_id"), col("cluster"))
      val emb = Tables.embeddings(spark, sfDir)
      val pairs = out.filter(col("dup_of").isNotNull)
        .join(assign, "vec_id")
        .join(assign.select(col("vec_id").as("dup_of"), col("cluster").as("cluster_b")), "dup_of")
        .join(emb.select(col("vec_id"), col("embedding").as("ea")), "vec_id")
        .join(emb.select(col("vec_id").as("dup_of"), col("embedding").as("eb")), "dup_of")
      val crossCluster = pairs.filter(col("cluster") =!= col("cluster_b")).count()
      assert(crossCluster == 0, "a dup pair must share its learned cluster")
      val belowT = pairs.filter(
        round(graft.expr.VecFunctions.vec_cosine(col("ea"), col("eb")), 6) < 0.3).count()
      assert(belowT == 0, "a dup pair must meet the cosine threshold")
    } finally out.unpersist()
  }
}
