package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryDef, Tables}
import graft.expr.VecFunctions.vec_cosine

/** Similarity search and multimodal-column operators over `embeddings`
  * and `documents` (north-star extension, SURVEY.md §2.5).
  *
  * Scale design: the query set is small and explicitly `broadcast()`, so
  * brute-force scoring is a map-only pass over the corpus (no shuffle of
  * the big side); top-k per query is a window over the tiny scored
  * relation. The IVF variant prunes the scan to one centroid bucket —
  * the 100 TB path where brute force stops being viable. Scoring uses
  * the native CosineSimilarity Catalyst expression (expr/VecOps.scala),
  * which stays in whole-stage codegen.
  */
object VectorSearch {

  private val nQueries = 20
  private val topK = 5

  /** Brute-force cosine top-k: the exactness baseline. */
  val knnOp = QueryDef(
    "ns_similarity_knn", {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val scored = emb.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos_r").desc, col("vec_id"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= topK)
    },
    Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < $nQueries),
            |c AS (SELECT q_id, e.vec_id,
            |    round(list_cosine_similarity(e.embedding::DOUBLE[], q_emb), 6) AS cos_r
            |  FROM embeddings e, q WHERE e.vec_id <> q.q_id)
            |SELECT q_id, vec_id, cos_r, rank FROM (
            |  SELECT q_id, vec_id, cos_r,
            |    row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rank FROM c)
            |WHERE rank <= $topK""".stripMargin))

  /** IVF-style ANN: centroid per label partition (coarse quantizer),
    * assign each query to its nearest centroid, search only that bucket.
    * Centroids are rounded to 6 dp so both engines quantize identically. */
  val ivfOp = QueryDef(
    "ns_similarity_ivf", {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val cent = emb
          .select(col("label"), posexplode(col("embedding")))
          .groupBy(col("label"), col("pos"))
          .agg(round(avg(col("col").cast("double")), 6).as("cv"))
          .groupBy("label")
          .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("cvec"))
        val q = emb.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val cosC =
          "round(aggregate(zip_with(q_emb, cvec, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, x) -> a + x) " +
            "/ (sqrt(aggregate(q_emb, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) " +
            "* sqrt(aggregate(cvec, 0D, (a, x) -> a + x * x))), 6)"
        val assigned = q.crossJoin(broadcast(cent))
          .withColumn("cos_c", expr(cosC))
        val wq = Window.partitionBy(col("q_id")).orderBy(col("cos_c").desc, col("label"))
        val best = assigned.withColumn("r", row_number().over(wq)).filter(col("r") === 1)
          .select(col("q_id"), col("q_emb"), col("label").as("best_label"))
        val scored = Tables.embeddings(s, dir).join(broadcast(best),
            col("label") === col("best_label") && col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("best_label"), col("vec_id"),
            round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos_r").desc, col("vec_id"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= topK)
    },
    Some(s"""WITH flat AS (SELECT label, unnest(embedding::DOUBLE[]) AS v,
            |    unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
            |cent AS (SELECT label, i, round(avg(v), 6) AS cv FROM flat GROUP BY label, i),
            |cvecs AS (SELECT label, list(cv ORDER BY i) AS cvec FROM cent GROUP BY label),
            |qs AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < $nQueries),
            |ac AS (SELECT q_id, q_emb, label,
            |    round(list_cosine_similarity(q_emb, cvec), 6) AS cos_c FROM qs, cvecs),
            |best AS (SELECT q_id, q_emb, label AS best_label FROM (
            |    SELECT ac.*, row_number() OVER (PARTITION BY q_id ORDER BY cos_c DESC, label) AS r FROM ac)
            |  WHERE r = 1),
            |sr AS (SELECT q_id, best_label, e.vec_id,
            |    round(list_cosine_similarity(e.embedding::DOUBLE[], q_emb), 6) AS cos_r
            |  FROM best JOIN embeddings e ON e.label = best.best_label AND e.vec_id <> best.q_id)
            |SELECT q_id, best_label, vec_id, cos_r, rank FROM (
            |  SELECT sr.*, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rank FROM sr)
            |WHERE rank <= $topK""".stripMargin))

  /** Embedding-cosine near-dup pairs, blocked by label partition so the
    * candidate join is linear per bucket rather than corpus². */
  val dedupEmbeddingOp = QueryDef(
    "ns_dedup_embedding", {
      (s, dir) =>
        val e1 = Tables.embeddings(s, dir).as("a")
        val e2 = Tables.embeddings(s, dir).as("b")
        e1.join(e2, expr("a.label = b.label AND a.vec_id < b.vec_id"))
          .select(
            col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("a.label").as("label"),
            round(vec_cosine(col("a.embedding"), col("b.embedding")), 6).as("cos_r"))
          .filter(col("cos_r") >= 0.3)
    },
    Some("""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_r
           |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
           |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.3""".stripMargin))

  /** Multimodal column plumbing: treat content as opaque binary with
    * typed metadata (the 100 TB pattern for image/audio payloads). */
  val multimodalProjectOp = QueryDef(
    "ns_multimodal_project",
    (s, dir) => Tables.documents(s, dir)
      .withColumn("content", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("content")).cast("long").as("n_bytes"),
        upper(hex(substring(col("content"), 1, 8))).as("head_hex"),
        struct(col("lang"), col("source"), lit("text/plain").as("mime")).getField("mime").as("mime")),
    Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |  upper(substr(hex(encode(text)), 1, 16)) AS head_hex,
           |  'text/plain' AS mime FROM documents""".stripMargin))

  /** Decode/feature-extract stub over binary content via mapPartitions —
    * the real image/audio decoder is STUBBED with a deterministic
    * md5-derived fake (the container has no media libs; FIXTURES.md);
    * the Spark-side plumbing (binary in, typed features out, partition
    * batching) is real and oracle-checked. */
  val multimodalDecodeOp = QueryDef(
    "ns_multimodal_decode",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // One digest per partition (the "decoder handle"), reused per
          // record — the same shape a real codec/model handle would use.
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { case (id, bytes) =>
            md.reset()
            val h = md.digest(bytes).map("%02x".format(_)).mkString
            // ??? real decode goes here; deterministic fake below.
            val width = 64 + (Integer.parseInt(h.substring(0, 2), 16) % 8) * 32
            val height = 64 + (Integer.parseInt(h.substring(2, 4), 16) % 8) * 32
            val frames = Integer.parseInt(h.substring(4, 6), 16) % 10 + 1
            (id, width, height, frames)
          }
        }
        .toDF("doc_id", "width", "height", "n_frames")
    },
    Some("""SELECT doc_id,
           |  64 + (('0x' || substr(md5(text), 1, 2))::INT % 8) * 32 AS width,
           |  64 + (('0x' || substr(md5(text), 3, 2))::INT % 8) * 32 AS height,
           |  ('0x' || substr(md5(text), 5, 2))::INT % 10 + 1 AS n_frames
           |FROM documents""".stripMargin))

  def entries: Seq[QueryDef] = Seq(
    knnOp, ivfOp, dedupEmbeddingOp, multimodalProjectOp, multimodalDecodeOp)
}
