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
  * the big side); top-k per query is a bounded typed Aggregator
  * (expr/TopK.scala) whose partial aggregation ships ≤ k rows per group
  * per map task — never a full-relation window sort. The IVF variant
  * prunes the scan to one centroid bucket, and near-dup detection is
  * random-hyperplane LSH banding — the 100 TB paths where brute force
  * stops being viable. Scoring uses the native CosineSimilarity Catalyst
  * expression (expr/VecOps.scala), which stays in whole-stage codegen.
  */
object VectorSearch {

  /** embeddings spread across cores: the testdata is one small parquet
    * split (one scan partition), which would run the per-row vector math
    * — 1M+ cosines for knn, 16 hyperplane dot products per row for LSH —
    * single-threaded. Par.spread leaves wide (real) scans untouched. */
  private def embPar(s: SparkSession, dir: String): DataFrame =
    Par.spread(s, Tables.embeddings(s, dir), col("vec_id"))

  private val nQueries = 20
  private val topK = 5

  /** Bounded top-k: partial aggregation keeps ≤ k rows per (group, map
    * task), so no single-stage sort of the whole scored relation
    * (graftshim.TopKByScoreAgg — native TypedImperativeAggregate over
    * primitive arrays). Output matches row_number(ORDER BY cos DESC, id). */
  private def topkPerGroup(scored: DataFrame, groupCols: Seq[String]): DataFrame = {
    scored
      .groupBy(groupCols.map(col): _*)
      .agg(graft.expr.VecFunctions.topk_by_score(
        col("vec_id"), col("cos_r"), topK).as("top"))
      .select(groupCols.map(col) :+ posexplode(col("top")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("col.id").as("vec_id"),
        col("col.score").as("cos_r"),
        (col("pos") + 1).cast("long").as("rank")): _*)
  }

  /** Brute-force cosine top-k: the exactness baseline. */
  val knnOp = QueryDef(
    "ns_similarity_knn", {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val scored = embPar(s, dir).crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
        topkPerGroup(scored, Seq("q_id"))
    },
    Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < $nQueries),
            |c AS (SELECT q_id, e.vec_id,
            |    round(list_cosine_similarity(e.embedding::DOUBLE[], q_emb), 6) AS cos_r
            |  FROM embeddings e, q WHERE e.vec_id <> q.q_id)
            |SELECT q_id, vec_id, cos_r, rank FROM (
            |  SELECT q_id, vec_id, cos_r,
            |    row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rank FROM c)
            |WHERE rank <= $topK""".stripMargin))

  /** Filtered kNN — ES 8's `knn` with `filter`: the metadata predicate
    * applies BEFORE search (pre-filter), so the result is the exact
    * top-k of the FILTERED subset — never the post-filtered residue of
    * an unfiltered search (which under-fills k exactly when the filter
    * is selective, the failure mode ES documents). The at-scale win is
    * that the label predicate is a plain comparison on a stored column,
    * so it reaches PushedFilters and row-group stats skip
    * non-qualifying chunks BEFORE any vector math (PlanSpec-locked) —
    * at 100 TB a selective filter turns the scan itself into the index. */
  private val knnFilterMaxLabel = 8
  val knnFilteredOp = QueryDef(
    "ns_similarity_knn_filtered", {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val scored = embPar(s, dir)
          .filter(col("label") < knnFilterMaxLabel)
          .crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
        topkPerGroup(scored, Seq("q_id"))
    },
    Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < $nQueries),
            |c AS (SELECT q_id, e.vec_id,
            |    round(list_cosine_similarity(e.embedding::DOUBLE[], q_emb), 6) AS cos_r
            |  FROM embeddings e, q
            |  WHERE e.vec_id <> q.q_id AND e.label < $knnFilterMaxLabel)
            |SELECT q_id, vec_id, cos_r, rank FROM (
            |  SELECT q_id, vec_id, cos_r,
            |    row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rank FROM c)
            |WHERE rank <= $topK""".stripMargin))

  /** Matryoshka (MRL) truncated-dimension ANN — the third serving path
    * next to PQ and IVFPQ: modern embedding models are trained so a
    * PREFIX of the vector is itself a valid low-d embedding, so the
    * shortlist pass scores only the first `mrlDims` dims (a 4×-smaller
    * compressed-domain scan with zero index build) and the exact
    * full-dim cosine reranks only `mrlShortlist` candidates per query.
    * Same determinism discipline as knn: round(6) + vec_id tie-break
    * at both stages, so both engines rank identically; shortlist
    * cutoff through the bounded TopKByScoreAgg, rerank fetch joins
    * only the candidate ids. */
  private val mrlDims = 16
  private val mrlShortlist = 100
  val mrlOp = QueryDef(
    "ns_similarity_mrl", {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            slice(col("embedding"), 1, mrlDims).as("q_head"))
        val short = embPar(s, dir)
          .select(col("vec_id"), slice(col("embedding"), 1, mrlDims).as("head"))
          .crossJoin(broadcast(q.select(col("q_id"), col("q_head"))))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            round(vec_cosine(col("head"), col("q_head")), 6).as("cos_h"))
          .groupBy("q_id")
          .agg(graft.expr.VecFunctions.topk_by_score(
            col("vec_id"), col("cos_h"), mrlShortlist).as("top"))
          .select(col("q_id"), explode(col("top.id")).as("vec_id"))
        val rer = short
          .join(emb, "vec_id")
          .join(broadcast(q.select(col("q_id"), col("q_emb"))), "q_id")
          .select(col("q_id"), col("vec_id"),
            round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
        topkPerGroup(rer, Seq("q_id"))
    },
    Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb,
            |    (embedding::DOUBLE[])[1:$mrlDims] AS q_head
            |  FROM embeddings WHERE vec_id < $nQueries),
            |sh AS (SELECT q_id, e.vec_id,
            |    round(list_cosine_similarity((e.embedding::DOUBLE[])[1:$mrlDims], q_head), 6) AS cos_h
            |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
            |cand AS (SELECT q_id, vec_id FROM (
            |    SELECT q_id, vec_id,
            |      row_number() OVER (PARTITION BY q_id ORDER BY cos_h DESC, vec_id) AS rn
            |    FROM sh) WHERE rn <= $mrlShortlist),
            |r AS (SELECT c.q_id, c.vec_id,
            |    round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6) AS cos_r
            |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
            |  JOIN q ON q.q_id = c.q_id)
            |SELECT q_id, vec_id, cos_r, rank FROM (
            |  SELECT q_id, vec_id, cos_r,
            |    row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rank
            |  FROM r)
            |WHERE rank <= $topK""".stripMargin))

  /** IVF centroid-build sampling: 1-in-`centSample` of the corpus by a
    * deterministic id rule, so centroid construction never aggregates
    * the full corpus — the k-means-on-a-sample posture every production
    * IVF index uses (centroids are statistics; a 5% deterministic sample
    * estimates them with the same buckets both engines agree on). */
  private val centSample = 20
  private val nProbe = 2

  /** Build-once discipline (see ops/Artifacts.scala), keyed on the
    * embeddings source file's identity. */
  private def buildOnce(s: SparkSession, dir: String, artifact: String)
                       (build: String => Unit): DataFrame =
    Artifacts.buildOnce(s, s"$dir/embeddings.parquet", artifact)(build)

  /** Centroid dimension table, PERSISTED: built once per testdata dir
    * from the deterministic sample, a tiny parquet dim every probe plan
    * just SCANS — no centroid pass over the corpus at query time, the
    * 100 TB IVF shape (the index is built offline; queries read it). */
  private def centroidDim(s: SparkSession, dir: String): DataFrame =
    buildOnce(s, dir, "ivf_centroids") { path =>
      Tables.embeddings(s, dir)
        .filter(col("vec_id") % centSample === 0)
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("cv"))
        .groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("cvec"))
        .coalesce(1)  // dim-bounded: one row per label (centroid dim)
        .write.mode("overwrite").parquet(path)
    }

  /** The IVF posting lists, PERSISTED label-PARTITIONED (r8): the index
    * build writes the corpus once with `partitionBy(label)` so a probe
    * reading it joins on the PARTITION column — Dynamic Partition
    * Pruning then restricts the scan to the probed labels' directories
    * at runtime (PlanSpec asserts the dynamicpruning filter). Without
    * the partitioned layout the probe join scans the whole corpus and
    * discards (nLabels - nProbe)/nLabels of it after the fact; at
    * 100 TB that is the difference between reading nProbe buckets and
    * reading everything. Same build-once / file-identity key discipline
    * as the centroid dim. */
  private def ivfIndex(s: SparkSession, dir: String): DataFrame =
    buildOnce(s, dir, "ivf_index") { path =>
      Tables.embeddings(s, dir)
        .repartition(col("label"))
        .write.mode("overwrite").partitionBy("label").parquet(path)
    }

  /** IVF-style ANN: centroid per label partition (coarse quantizer) from
    * the persisted sample-built dim table; assign each query to its
    * nProbe nearest centroids and search only those buckets. Centroids
    * are rounded to 6 dp so both engines quantize identically; the
    * oracle rebuilds the same centroids from the same sample rule in a
    * CTE. */
  val ivfOp = QueryDef(
    "ns_similarity_ivf", {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val cent = centroidDim(s, dir)
        val q = emb.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val cosC =
          "round(aggregate(zip_with(q_emb, cvec, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, x) -> a + x) " +
            "/ (sqrt(aggregate(q_emb, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) " +
            "* sqrt(aggregate(cvec, 0D, (a, x) -> a + x * x))), 6)"
        val assigned = q.crossJoin(broadcast(cent))
          .withColumn("cos_c", expr(cosC))
        val wq = Window.partitionBy(col("q_id")).orderBy(col("cos_c").desc, col("label"))
        val probe = assigned.withColumn("r", row_number().over(wq)).filter(col("r") <= nProbe)
          .select(col("q_id"), col("q_emb"), col("label").as("probe_label"))
        // corpus side reads the label-PARTITIONED index: the broadcast
        // join on the partition column triggers Dynamic Partition
        // Pruning — only the probed labels' directories are scanned
        val scored = ivfIndex(s, dir).join(broadcast(probe),
            col("label") === col("probe_label") && col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
        topkPerGroup(scored, Seq("q_id"))
    },
    Some(s"""WITH flat AS (SELECT label, unnest(embedding::DOUBLE[]) AS v,
            |    unnest(generate_series(1, len(embedding))) AS i FROM embeddings
            |  WHERE vec_id % $centSample = 0),
            |cent AS (SELECT label, i, round(avg(v), 6) AS cv FROM flat GROUP BY label, i),
            |cvecs AS (SELECT label, list(cv ORDER BY i) AS cvec FROM cent GROUP BY label),
            |qs AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < $nQueries),
            |ac AS (SELECT q_id, q_emb, label,
            |    round(list_cosine_similarity(q_emb, cvec), 6) AS cos_c FROM qs, cvecs),
            |probe AS (SELECT q_id, q_emb, label AS probe_label FROM (
            |    SELECT ac.*, row_number() OVER (PARTITION BY q_id ORDER BY cos_c DESC, label) AS r FROM ac)
            |  WHERE r <= $nProbe),
            |sr AS (SELECT q_id, e.vec_id,
            |    round(list_cosine_similarity(e.embedding::DOUBLE[], q_emb), 6) AS cos_r
            |  FROM probe JOIN embeddings e ON e.label = probe.probe_label AND e.vec_id <> probe.q_id)
            |SELECT q_id, vec_id, cos_r, rank FROM (
            |  SELECT sr.*, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rank FROM sr)
            |WHERE rank <= $topK""".stripMargin))

  // ------------------------------------------------- hyperplane-LSH dedup
  // Random-hyperplane LSH over the embedding: nBits sign bits grouped into
  // bands; docs sharing any (band, signature) bucket become candidate
  // pairs via an equi-join — never an all-pairs join. Determinism across
  // engines: embeddings are quantized to integers (round(x*1000)) and the
  // hyperplanes are integer vectors derived from md5(k:i), so every dot
  // product is exact integer arithmetic — order-independent, no float
  // sign-flip at the 0 boundary.
  //
  // Test geometry is 16 bits = 4 bands × 4 (collision-dense at sf scale);
  // a 100 TB corpus wants ~8 bands × 16 bits so buckets stay bounded —
  // both are the same plan shape, only the literals change.
  private val lshBits = 16
  private val lshBandBits = 4
  private val lshBands = lshBits / lshBandBits
  private val embDim = 64
  // Bucket cap for the bounded aggregator (same role as minhash's
  // bandCap): a (band, sig) bucket of n docs emits C(n,2) pairs, so one
  // hot hyperplane cell can go quadratic at corpus scale; buckets over
  // the cap are dropped whole, identically on both engines. Locally the
  // max bucket is 51 (sf0.01) / 183 (sf0.1) < 400, so the cap is a pure
  // plan bound, not a result change.
  private val lshBucketCap = 400

  private def md5Hex(str: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Integer hyperplane matrix W[k][i] in [-1000, 1000], identical to the
    * oracle's ('0x'||substr(md5(k:i),1,8))::BIGINT % 2001 - 1000. */
  private lazy val lshW: Seq[Seq[Long]] =
    (0 until lshBits).map { k =>
      (0 until embDim).map { i =>
        java.lang.Long.parseLong(md5Hex(s"$k:$i").substring(0, 8), 16) % 2001 - 1000
      }
    }

  /** Candidate generation in the MapReduce-LSH shape (one scan, group by
    * (band, sig) bucket, emit each bucket's ordered pairs) — the same
    * `BoundedBucketAgg` + `OrderedPairs` plan minhash/ngram use
    * (TextOps). The self-join formulation this replaced replanned the
    * signature subtree once per join side (measured on minhash: 4 full
    * scans, neither ReuseExchange nor AQE deduplicates them); this is
    * ONE corpus scan, one shuffle on (band, sig), one shuffle of the
    * tiny pair set, with the cap enforced inside map-side partial
    * aggregation (≤ cap+1 longs per bucket, constant memory). */
  private[graft] def embeddingCandidates(s: SparkSession, dir: String): DataFrame = {
    // The 16×64 quantized hyperplane dot products run in the native
    // LshSignBits expression (graftshim) — a primitive loop inside
    // whole-stage codegen. The HOF formulation
    // (transform/zip_with/aggregate) is CodegenFallback and ran the
    // stage interpreted; flat literal expansion of 1024 terms
    // overflowed codegen method limits. Both measured slower.
    val sigExprs = (0 until lshBands).map { b =>
      s"named_struct('band', $b, 'sig', shiftright(bits, ${b * lshBandBits}) & ${(1 << lshBandBits) - 1})"
    }.mkString("array(", ", ", ")")
    val bands = embPar(s, dir)
      .withColumn("bits",
        graft.expr.VecFunctions.lsh_sign_bits(col("embedding"), lshW.map(_.toArray).toArray))
      .select(col("vec_id"), explode(expr(sigExprs)).as("bs"))
      .select(col("vec_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val buckets = bands.groupBy("band", "sig")
      .agg(graft.expr.TextFunctions.bounded_bucket(col("vec_id"), lshBucketCap).as("ds"))
      .filter(col("ds").isNotNull)
    buckets
      .select(explode(graft.expr.TextFunctions.ordered_pairs(col("ds"),
        includeDiagonal = false)).as("p"))
      .select(col("p.a").as("vec_a"), col("p.b").as("vec_b"))
      .distinct()
  }

  val dedupEmbeddingOp = QueryDef(
    "ns_dedup_embedding", {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        // Candidates are sparse → join back to fetch vectors only for
        // pairs, instead of shuffling the 256-byte embedding ×bands.
        embeddingCandidates(s, dir)
          .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), "vec_a")
          .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), "vec_b")
          .select(col("vec_a"), col("vec_b"),
            round(vec_cosine(col("emb_a"), col("emb_b")), 6).as("cos_r"))
          .filter(col("cos_r") >= 0.3)
    },
    Some(s"""WITH hp AS (SELECT k, i,
           |    ('0x' || substr(md5(concat(k, ':', i)), 1, 8))::BIGINT % 2001 - 1000 AS w
           |  FROM (SELECT unnest(generate_series(0, ${lshBits - 1})) AS k),
           |       (SELECT unnest(generate_series(0, ${embDim - 1})) AS i)),
           |eq AS (SELECT vec_id, i, CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000, 0) AS BIGINT) AS q
           |  FROM embeddings, (SELECT unnest(generate_series(0, ${embDim - 1})) AS i)),
           |dots AS (SELECT vec_id, k, sum(q * w) AS d
           |  FROM eq JOIN hp USING (i) GROUP BY vec_id, k),
           |sigs AS (SELECT vec_id, k // $lshBandBits AS band,
           |    CAST(sum(CASE WHEN d >= 0 THEN 1 ELSE 0 END * (1 << (k % $lshBandBits))) AS BIGINT) AS sig
           |  FROM dots GROUP BY vec_id, k // $lshBandBits),
           |capped AS (SELECT * FROM sigs
           |  QUALIFY count(*) OVER (PARTITION BY band, sig) <= $lshBucketCap),
           |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
           |  FROM capped a JOIN capped b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id)
           |SELECT vec_a, vec_b,
           |  round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS cos_r
           |FROM cand JOIN embeddings ea ON ea.vec_id = vec_a
           |          JOIN embeddings eb ON eb.vec_id = vec_b
           |WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) >= 0.3""".stripMargin))

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

  /** Byte-TRUE media decode over binary content: each doc's payload is
    * wrapped in a REAL BMP header (BmpWrap — `BM` magic, LE32
    * width/height at DIB offsets 18/22) and the decoder (BmpDims) reads
    * the dimensions back out of the BYTES, one codegen call per row —
    * not a metadata fake. Every 10th doc carries non-BMP content and
    * must decode to null (the quarantine route for undecodable blobs).
    * The oracle recomputes ground truth from the construction rule (the
    * detect_gzip pattern), so a hash match proves the byte round-trip:
    * header written at offset X == header parsed at offset X. A real
    * image library slots in behind the same decode-to-struct expression
    * shape; resize/frames below still derive metadata arithmetically
    * (md5 stub) — this op is the byte-level proof of the swap-in point. */
  val multimodalDecodeOp = QueryDef(
    "ns_multimodal_decode",
    (s, dir) => {
      import graft.expr.MediaFunctions.{bmp_dims, bmp_wrap}
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 10 =!= 0,
            bmp_wrap(col("text").cast("binary"),
              (lit(64) + col("doc_id") % 8 * 32).cast("int"),
              (lit(64) + col("doc_id") % 5 * 32).cast("int")))
            // 'x' prefix: provably never the BMP magic
            .otherwise(concat(lit("x").cast("binary"), col("text").cast("binary")))
            .as("content"))
        .select(col("doc_id"), bmp_dims(col("content")).as("d"),
          length(col("content")).cast("long").as("n_bytes"))
        .select(col("doc_id"),
          col("d.width").as("width"), col("d.height").as("height"),
          col("d").isNotNull.as("is_bmp"), col("n_bytes"))
    },
    Some("""SELECT doc_id,
           |  CASE WHEN doc_id % 10 <> 0 THEN CAST(64 + (doc_id % 8) * 32 AS INT) END AS width,
           |  CASE WHEN doc_id % 10 <> 0 THEN CAST(64 + (doc_id % 5) * 32 AS INT) END AS height,
           |  doc_id % 10 <> 0 AS is_bmp,
           |  CAST(octet_length(encode(text)) + CASE WHEN doc_id % 10 <> 0 THEN 54 ELSE 1 END AS BIGINT) AS n_bytes
           |FROM documents""".stripMargin))

  /** Resize planning over BYTE-TRUE decoded media: content is a real BMP
    * (bmp_wrap fixtures, same construction rule as multimodalDecodeOp)
    * and width/height come out of `bmp_dims(content)` parsing the bytes —
    * not metadata stubs. Fit each image inside a 64×64 box preserving
    * aspect ratio (integer floor math, identical across engines); the
    * oracle recomputes ground truth from the construction rule, so a
    * hash match proves decode(encode(w,h)) == (w,h) feeding real resize
    * arithmetic. Only the pixel transform itself remains behind the
    * decoder swap-in point. */
  val multimodalResizeOp = QueryDef(
    "ns_multimodal_resize",
    (s, dir) => {
      import graft.expr.MediaFunctions.{bmp_dims, bmp_wrap}
      Tables.documents(s, dir)
        .select(col("doc_id"),
          bmp_wrap(col("text").cast("binary"),
            (lit(64) + col("doc_id") % 8 * 32).cast("int"),
            (lit(64) + col("doc_id") % 5 * 32).cast("int")).as("content"))
        .select(col("doc_id"), bmp_dims(col("content")).as("d"))
        .select(col("doc_id"),
          col("d.width").as("width"), col("d.height").as("height"))
        .select(
          col("doc_id"), col("width"), col("height"),
          expr("CAST(width * 64 / greatest(width, height) AS INT)").as("out_w"),
          expr("CAST(height * 64 / greatest(width, height) AS INT)").as("out_h"))
    },
    Some("""WITH d AS (SELECT doc_id,
           |    CAST(64 + (doc_id % 8) * 32 AS INT) AS width,
           |    CAST(64 + (doc_id % 5) * 32 AS INT) AS height
           |  FROM documents)
           |SELECT doc_id, width, height,
           |  CAST(trunc(width * 64.0 / greatest(width, height)) AS INT) AS out_w,
           |  CAST(trunc(height * 64.0 / greatest(width, height)) AS INT) AS out_h
           |FROM d""".stripMargin))

  /** Frame sampling over BYTE-TRUE decoded media: n_frames derives from
    * `bmp_dims(content)` re-parsing the bmp_wrap bytes (height/32, so
    * 2..6 frames per doc) — every 3rd frame index and its byte offset
    * into the content, one output row per sampled frame via a codegen'd
    * `sequence` explode; the plumbing a frame-extract batch UDF
    * consumes. Oracle recomputes from the construction rule. */
  val multimodalFramesOp = QueryDef(
    "ns_multimodal_frames",
    (s, dir) => {
      import graft.expr.MediaFunctions.{bmp_dims, bmp_wrap}
      Tables.documents(s, dir)
        .select(col("doc_id"),
          bmp_wrap(col("text").cast("binary"),
            (lit(64) + col("doc_id") % 8 * 32).cast("int"),
            (lit(64) + col("doc_id") % 5 * 32).cast("int")).as("content"))
        .select(col("doc_id"), bmp_dims(col("content")).as("d"),
          length(col("content")).as("n_bytes"))
        .select(col("doc_id"),
          (col("d.height") / 32).cast("int").as("n_frames"),
          col("n_bytes"))
        .select(col("doc_id"), col("n_frames"),
          explode(expr("sequence(0, n_frames - 1, 3)")).as("frame_idx"),
          expr("CAST(n_bytes / n_frames AS INT)").as("frame_bytes"))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          (col("frame_idx") * col("frame_bytes")).as("byte_off"))
    },
    Some("""WITH d AS (SELECT doc_id,
           |    CAST(2 + doc_id % 5 AS INT) AS n_frames,
           |    octet_length(encode(text)) + 54 AS n_bytes
           |  FROM documents)
           |SELECT doc_id, n_frames, unnest(range(0, n_frames, 3)) AS frame_idx,
           |  unnest(range(0, n_frames, 3)) * CAST(trunc(n_bytes / n_frames) AS INT) AS byte_off
           |FROM d""".stripMargin))

  /** Audio windowing over BYTE-TRUE decoded media — the audio twin of
    * ns_multimodal_frames, completing the image/audio/video
    * opaque-binary posture: each document's text bytes wrapped in a
    * REAL 16-bit PCM WAV header (WavWrap — RIFF size, fmt chunk,
    * data length) and decoded back by PARSING the little-endian bytes
    * (WavMeta → sample_rate/channels/per-channel samples), then fixed
    * 16-sample analysis windows at stride 2 with their absolute byte
    * offsets — the slicing a feature extractor hands to a DSP library
    * (the decode itself is stubbed per the brief: no audio codecs in
    * the container; the schema, the codegen expressions, and the
    * window arithmetic are real and oracle-checked). Pure per-row
    * projection + explode, no shuffle at any corpus size; documents
    * shorter than one window emit no rows (the generate-then-filter
    * guard referencing the exploded output, the ns_text_chunk rule). */
  val multimodalAudioOp = QueryDef(
    "ns_multimodal_audio",
    (s, dir) => {
      import graft.expr.MediaFunctions.{wav_meta, wav_wrap}
      Tables.documents(s, dir)
        .select(col("doc_id"),
          wav_wrap(col("text").cast("binary"),
            (lit(8000) + col("doc_id") % 3 * 4000).cast("int"),
            (lit(1) + col("doc_id") % 2).cast("int")).as("content"))
        .select(col("doc_id"), wav_meta(col("content")).as("m"))
        .select(col("doc_id"), col("m.sample_rate").as("sample_rate"),
          col("m.channels").as("channels"), col("m.n_samples").as("n_samples"))
        .withColumn("n_windows", expr("CAST(n_samples div 16 AS INT)"))
        .select(col("doc_id"), col("sample_rate"), col("channels"), col("n_samples"),
          explode(expr("sequence(0, greatest(n_windows - 1, 0), 2)")).as("win_idx"),
          col("n_windows"))
        .filter(col("win_idx") < col("n_windows"))
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("win_idx"),
          (lit(44) + col("win_idx") * 16 * col("channels") * 2).as("byte_off"))
    },
    Some("""WITH d AS (SELECT doc_id,
           |    CAST(8000 + doc_id % 3 * 4000 AS INT) AS sample_rate,
           |    CAST(1 + doc_id % 2 AS INT) AS channels,
           |    CAST(octet_length(encode(text)) // (2 * (1 + doc_id % 2)) AS INT) AS n_samples
           |  FROM documents),
           |w AS (SELECT *, n_samples // 16 AS n_windows FROM d)
           |SELECT doc_id, sample_rate, channels, n_samples,
           |  unnest(range(0, n_windows, 2)) AS win_idx,
           |  44 + unnest(range(0, n_windows, 2)) * 16 * channels * 2 AS byte_off
           |FROM w""".stripMargin))

  /** Symmetric int8 embedding quantization — the storage answer at
    * 100 TB: a float32 corpus stores 4× smaller as (int8 codes, one
    * f32 scale per vector) with bounded reconstruction error (≤ scale/2
    * per element, PercentileSpec asserts it). Per-vector scale =
    * max|x|/127, codes = round(x/scale) ∈ [-127, 127] by construction.
    * The query reports the scale and the reconstruction MAE per vector,
    * all math in double so both engines agree to 6 dp. Array HOFs here
    * are the natural Spark API for per-element math (a linear
    * projection, partition-parallel — not a shuffle-bearing hot path,
    * so the interpreted HOF eval is acceptable where it wasn't for the
    * dedup signature pipelines). */
  /** Perceptual average-hash (aHash) over the media payload bytes —
    * the image near-dup fingerprint (dHash/pHash's simplest sibling):
    * split the payload into 16 equal spans, set bit i when span i's
    * mean byte exceeds the whole-payload mean. The payload is the
    * bmp_wrap pixel buffer (= the doc's bytes, multimodalDecodeOp's
    * construction rule), so the oracle recomputes from the text's
    * codepoints.
    *
    * Determinism: every mean comparison is the integer cross-multiply
    * sum_i·c_tot > s_tot·cnt_i — no division anywhere — and the hash
    * assembles as an exact Σ bit·2^i. Scale shape: one posexplode pass
    * collapsing immediately into ≤ 16 chunk rows per doc (map-side
    * partials), totals re-aggregated from the chunk table (never a
    * second corpus pass), hash-equal docs are the dup candidates. */
  val multimodalAhashOp = QueryDef(
    "ns_multimodal_ahash",
    (s, dir) => {
      // Par.spread (r21, guide §2.5): the per-CHARACTER posexplode
      // (|corpus| × doc length rows) plus its partial aggregation ran
      // in the single scan task (ProfileBench: 572 ms exec on 5
      // tasks); passthrough on wide scans at scale.
      val chunks = Par.spread(s, Tables.documents(s, dir), col("doc_id"))
        .select(col("doc_id"), length(col("text")).cast("long").as("len"),
          posexplode(split(col("text"), "")))
        .filter(col("col") =!= "")
        .select(col("doc_id"),
          expr("CAST(pos AS BIGINT) * 16 div len").as("chunk"),
          ascii(col("col")).cast("long").as("b"))
        .groupBy("doc_id", "chunk")
        .agg(sum(col("b")).as("s_i"), count(lit(1)).as("c_i"))
      val totals = chunks.groupBy("doc_id")
        .agg(sum(col("s_i")).as("s_tot"), sum(col("c_i")).as("c_tot"))
      chunks.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(sum(when(col("s_i") * col("c_tot") > col("s_tot") * col("c_i"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(chunk AS INT))")).otherwise(0L)).as("ahash"),
          min(col("c_tot")).as("n_bytes"))
    },
    Some("""WITH ch AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
      |    unnest(string_split(text, '')) AS c,
      |    unnest(range(CAST(length(text) AS BIGINT))) AS pos
      |  FROM documents),
      |ck AS (SELECT doc_id, (pos * 16) // len AS chunk,
      |    CAST(sum(unicode(c)) AS BIGINT) AS s_i, count(*) AS c_i
      |  FROM ch GROUP BY 1, 2),
      |t AS (SELECT doc_id, CAST(sum(s_i) AS BIGINT) AS s_tot,
      |    CAST(sum(c_i) AS BIGINT) AS c_tot FROM ck GROUP BY 1)
      |SELECT ck.doc_id,
      |  CAST(sum(CASE WHEN s_i * c_tot > s_tot * c_i
      |    THEN CAST(1 AS BIGINT) << CAST(chunk AS INT) ELSE 0 END) AS BIGINT) AS ahash,
      |  min(c_tot) AS n_bytes
      |FROM ck JOIN t ON ck.doc_id = t.doc_id
      |GROUP BY 1""".stripMargin))

  /** Audio energy fingerprint — the chromaprint-lite near-dup signature
    * for audio payloads: decode the payload as 16-bit little-endian PCM
    * (the wav_wrap sample format: byte pair → signed sample, the REAL
    * LE decode), split the sample stream into 16 windows, set bit i
    * when window i's mean |amplitude| exceeds the track mean. Same
    * exact integer cross-multiply discipline as the image aHash — no
    * division, no floats. The Spark side is the NATIVE
    * `Pcm16Fingerprint` expression (graftshim): one codegen pass, zero
    * shuffles — where the declared explode-per-sample formulation (the
    * oracle's form, and ExprSpec's semantic twin) amplifies each doc
    * into bytes/2 rows THROUGH a (doc, window)-keyed shuffle. At
    * 100 TB of audio that explode volume is the job; the expression
    * computes the fingerprint where the row already is. */
  val multimodalAudioFpOp = QueryDef(
    "ns_multimodal_audio_fp",
    (s, dir) => Tables.documents(s, dir)
      .select(col("doc_id"), graft.expr.MediaFunctions.pcm16_fp(col("text")).as("f"))
      .filter(col("f").isNotNull)
      .select(col("doc_id"), col("f.audio_fp").as("audio_fp"),
        col("f.n_samples").as("n_samples")),
    Some("""WITH s AS (
      |  SELECT doc_id, text, CAST(length(text) // 2 AS BIGINT) AS nsamp,
      |    unnest(range(CAST(length(text) // 2 AS BIGINT))) AS j
      |  FROM documents WHERE length(text) >= 2),
      |a AS (SELECT doc_id, (j * 16) // nsamp AS w,
      |    abs(CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END) AS amp
      |  FROM (SELECT doc_id, nsamp, j,
      |      unicode(substr(text, CAST(2*j+1 AS INT), 1))
      |        + 256 * unicode(substr(text, CAST(2*j+2 AS INT), 1)) AS raw
      |    FROM s)),
      |ck AS (SELECT doc_id, w, CAST(sum(amp) AS BIGINT) AS s_i, count(*) AS c_i
      |  FROM a GROUP BY 1, 2),
      |t AS (SELECT doc_id, CAST(sum(s_i) AS BIGINT) AS s_tot,
      |    CAST(sum(c_i) AS BIGINT) AS c_tot FROM ck GROUP BY 1)
      |SELECT ck.doc_id,
      |  CAST(sum(CASE WHEN s_i * c_tot > s_tot * c_i
      |    THEN CAST(1 AS BIGINT) << CAST(w AS INT) ELSE 0 END) AS BIGINT) AS audio_fp,
      |  min(c_tot) AS n_samples
      |FROM ck JOIN t ON ck.doc_id = t.doc_id
      |GROUP BY 1""".stripMargin))

  val quantizeOp = QueryDef(
    "ns_embedding_quantize",
    (s, dir) => Tables.embeddings(s, dir)
      .select(col("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("emb"))
      .withColumn("scale", expr(
        "greatest(aggregate(emb, 0D, (a, x) -> greatest(a, abs(x))) / 127.0D, 1e-12D)"))
      .select(col("vec_id"),
        round(col("scale"), 6).as("scale_r"),
        expr("round(aggregate(emb, 0D, (a, x) -> a + abs(x - round(x / scale) * scale)) " +
          "/ size(emb), 6)").as("mae_r")),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
           |s AS (SELECT vec_id, emb,
           |    greatest(list_aggregate(list_transform(emb, x -> abs(x)), 'max') / 127.0, 1e-12) AS scale
           |  FROM e)
           |SELECT vec_id, round(scale, 6) AS scale_r,
           |  round(list_sum(list_transform(emb, x -> abs(x - round(x / scale) * scale)))
           |        / len(emb), 6) AS mae_r
           |FROM s""".stripMargin))

  // ----- learned clustering (Lloyd k-means) + semantic dedup ---------

  /** k-means configuration: k clusters, `kmIters` Lloyd update rounds
    * from deterministic seeds (the k lowest vec_ids). All k-means
    * arithmetic runs in INTEGER space over ×1000-quantized components
    * (the ns_dedup_embedding quantization whose cross-engine parity is
    * already established): distances are exact long sums — order-
    * independent, so partial aggregation cannot introduce float drift —
    * and centroid components are floor(sum/count), one correctly-
    * rounded double division + floor both engines compute identically.
    * A float k-means would make assignment ties engine-dependent; the
    * integer form is bit-reproducible everywhere. */
  private val kmK = 10
  private val kmIters = 2

  /** Quantized corpus: (vec_id, q ARRAY<BIGINT>) via the native
    * QuantizeVec expression — the first step of every integer-space
    * corpus pass stays inside whole-stage codegen (the `transform` HOF
    * it replaces is CodegenFallback and dropped the stage interpreted;
    * LshSignBits precedent, GraftShim). */
  private[graft] def quantized(s: SparkSession, dir: String): DataFrame =
    embPar(s, dir).select(col("vec_id"),
      graft.expr.VecFunctions.quantize_vec(col("embedding")).as("q"))

  /** Nearest-centroid assignment as ONE map pass: the centroid dim
    * (k rows) collapses to a single array row, broadcasts, and each
    * corpus row takes the native NearestCentroid argmin — (dist ASC,
    * cluster ASC) tie-break, identical to the oracle's row_number and
    * to the array_min-over-struct HOF it replaces, but codegen'd. No
    * shuffle of the corpus, no driver collect: the canonical
    * broadcast-assign k-means step. */
  private[graft] def kmAssign(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val centArr = cents.agg(collect_list(struct(col("cluster"), col("cq"))).as("cents"))
    corpus.crossJoin(broadcast(centArr))
      .withColumn("m", graft.expr.VecFunctions.nearest_centroid(col("q"), col("cents")))
      .select(col("vec_id"), col("q"),
        col("m.cluster").as("cluster"), col("m.dist").as("dist"))
  }

  /** One Lloyd update: per-dimension long sums + counts, map-side
    * combined to k×dim groups (tiny at any corpus size), re-assembled
    * into centroid vectors by the centroidDim sort-struct idiom. */
  private def kmUpdate(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster"), posexplode(col("q")))
      .groupBy("cluster", "pos")
      .agg(sum("col").as("sv"), count(lit(1)).as("cnt"))
      .groupBy("cluster")
      .agg(expr("transform(array_sort(collect_list(named_struct('pos', pos, " +
        "'cq', CAST(floor(CAST(sv AS DOUBLE) / cnt) AS BIGINT)))), x -> x.cq)").as("cq"))

  /** Final centroids, PERSISTED (Artifacts build-once keyed on the
    * corpus file): Lloyd learning — seed, assign, update ×kmIters —
    * runs OFFLINE exactly once; every query against the clustering
    * just scans the k-row dim. At 100 TB each learning round is one
    * corpus map pass plus a k×dim-group aggregate; the query-time cost
    * is a single map pass. */
  private[graft] def kmeansCentroids(s: SparkSession, dir: String): DataFrame =
    buildOnce(s, dir, "kmeans_centroids") { path =>
      val corpus = quantized(s, dir)
      val seeds = corpus.filter(col("vec_id") < kmK)
        .select(col("vec_id").cast("int").as("cluster"), col("q").as("cq"))
      val finalCents = (1 to kmIters).foldLeft(seeds) { (cents, _) =>
        kmUpdate(kmAssign(corpus, cents))
      }
      finalCents.coalesce(1).write.mode("overwrite").parquet(path)  // dim-bounded: k-row centroid table
    }

  /** The shared oracle CTE chain: quantize → seed → kmIters unrolled
    * (assign, update) rounds — long-format SQL (exact integer math is
    * aggregation-order-independent, so the long format is safe in the
    * oracle where float sums would not be). */
  private def kmeansSqlChain: String = {
    val eq =
      s"""eq AS (SELECT vec_id, i, CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000, 0) AS BIGINT) AS q
         |  FROM embeddings, (SELECT unnest(generate_series(0, ${embDim - 1})) AS i)),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cluster, i, q AS cq FROM eq WHERE vec_id < $kmK)""".stripMargin
    val rounds = (1 to kmIters).map { r =>
      s"""d$r AS (SELECT e.vec_id, c.cluster, CAST(sum((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS dist
         |  FROM eq e JOIN c${r - 1} c USING (i) GROUP BY 1, 2),
         |a$r AS (SELECT vec_id, cluster FROM (SELECT vec_id, cluster,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rk FROM d$r) WHERE rk = 1),
         |c$r AS (SELECT cluster, i, CAST(floor(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT) AS cq
         |  FROM eq JOIN a$r USING (vec_id) GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val fin =
      s"""df AS (SELECT e.vec_id, c.cluster, CAST(sum((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS dist
         |  FROM eq e JOIN c$kmIters c USING (i) GROUP BY 1, 2),
         |af AS (SELECT vec_id, cluster, dist FROM (SELECT vec_id, cluster, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rk FROM df) WHERE rk = 1)""".stripMargin
    s"$eq,\n$rounds,\n$fin"
  }

  /** Learned clustering over the embedding corpus — distributed Lloyd
    * k-means (the centroid learning every IVF/semantic-dedup index
    * needs; centroidDim above AVERAGES given labels, this LEARNS the
    * partition from seeds). Output: each vector's learned cluster and
    * its exact integer distance to the centroid. */
  val kmeansOp = QueryDef(
    "ns_cluster_kmeans",
    (s, dir) =>
      kmAssign(quantized(s, dir), kmeansCentroids(s, dir))
        .select(col("vec_id"), col("cluster"), col("dist")),
    Some(s"""WITH $kmeansSqlChain
           |SELECT vec_id, cluster, dist FROM af""".stripMargin))

  // ----------------- product quantization (PQ) ANN ------------------

  /** PQ geometry: the 64-dim embedding splits into `pqM` = 8 subspaces
    * of `pqDsub` = 8 dims; each subspace learns `pqKsub` = 16 centroids
    * (one Lloyd round from deterministic seeds, same integer-space
    * algebra as ns_cluster_kmeans), so a vector compresses to 8 codes —
    * 8 bytes standing in for 256 bytes of floats, the 32× memory
    * reduction that lets a 100 TB corpus's index fit cluster RAM
    * (Jégou, Douze, Schmid 2011, "Product quantization for nearest
    * neighbor search"). */
  private val pqM = 8
  private val pqDsub = 8
  private val pqKsub = 16

  /** The PQ codebook, PERSISTED (build-once, corpus-file keyed): per
    * (sub, cid) an 8-dim integer centroid. Training is one Lloyd round
    * over the quantized corpus — seed with the sub-vectors of the 16
    * lowest vec_ids, assign every (vector, subspace) to its nearest
    * seed by exact long L2 (ties → lower cid), re-average per
    * dimension with floor(sum/count) — every step bit-reproducible,
    * so the DuckDB oracle rebuilds the identical codebook. */
  private def pqCodebook(s: SparkSession, dir: String): DataFrame =
    buildOnce(s, dir, "pq_codebook") { path =>
      val flat = quantized(s, dir)
        .select(col("vec_id"), posexplode(col("q")))
        .select(col("vec_id"), expr(s"pos div $pqDsub").cast("int").as("sub"),
          expr(s"pos % $pqDsub").as("j"), col("col").as("q"))
      val seeds = flat.filter(col("vec_id") < pqKsub)
        .select(col("vec_id").cast("int").as("cid"), col("sub"), col("j"),
          col("q").as("cq"))
      val d = flat.join(seeds, Seq("sub", "j"))
        .groupBy(col("vec_id"), col("sub"), col("cid"))
        .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("dist"))
      val w = Window.partitionBy("vec_id", "sub").orderBy(col("dist"), col("cid"))
      val a = d.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select("vec_id", "sub", "cid")
      flat.join(a, Seq("vec_id", "sub"))
        .groupBy("sub", "cid", "j")
        .agg(floor(sum(col("q")).cast("double") / count(lit(1))).cast("long").as("cq"))
        .groupBy("sub", "cid")
        .agg(expr("transform(array_sort(collect_list(named_struct('j', j, 'cq', cq))), x -> x.cq)")
          .as("cq"))
        .coalesce(1).write.mode("overwrite").parquet(path)  // dim-bounded: sub x cid codebook
    }

  /** PQ ANN with asymmetric distance computation (ADC): encode the
    * corpus as 8 codebook codes, precompute per-query lookup tables of
    * exact subspace distances to every centroid, and score each corpus
    * vector as the SUM of 8 table lookups — the query never touches
    * the original vectors.
    *
    * Scale shape: the codebook (128 rows) collapses to ONE broadcast
    * array row; encoding is a single map pass over the corpus (argmin
    * via the kmAssign array_min struct idiom — no shuffle, no join
    * explosion); the per-query LUTs (20 × 128 longs) broadcast; ADC
    * scoring is a map pass of 8 array lookups per (vector, query); the
    * cutoff is the bounded top-k aggregate (≤ k rows per query per map
    * task). At 100 TB the scored relation is codes-only — 8 bytes a
    * row riding the scan, the whole point of PQ. All arithmetic is
    * exact long sums — order-independent, so the DuckDB oracle matches
    * bit-for-bit. RecallPqSpec pins recall@k against brute-force KNN. */
  /** The shared ADC scoring chain: (q_id, vec_id, adc) for every
    * (query, corpus vector) pair, all lookups against broadcast
    * structures, no shuffle before the consumer's cutoff. */
  /** Codebook as ONE broadcast row: cb[sub] = centroids sorted by cid.
    * The HOF assembly here runs over the 128-row persisted artifact —
    * one output row — never the corpus; the corpus-side stages below
    * are all native expressions (PlanSpec locks them in codegen). */
  private def pqCbRow(s: SparkSession, dir: String): DataFrame =
    pqCodebook(s, dir)
      .groupBy("sub")
      .agg(expr("transform(array_sort(collect_list(named_struct('cid', cid, 'cq', cq))), x -> x)")
        .as("cents"))
      .agg(expr("transform(array_sort(collect_list(named_struct('sub', sub, 'cents', cents))), x -> x.cents)")
        .as("cb"))

  /** The corpus code stream: one map pass, 8 native argmins per vector
    * against the broadcast codebook (PqEncode — the transform/array_min/
    * slice HOF chain it replaces was CodegenFallback and ran the encode
    * interpreted; at 100 TB this pass rides every index build). */
  private def pqCodes(s: SparkSession, dir: String): DataFrame =
    quantized(s, dir).crossJoin(broadcast(pqCbRow(s, dir)))
      .select(col("vec_id"),
        graft.expr.VecFunctions.pq_encode(col("q"), col("cb")).as("codes"))

  private def pqScored(s: SparkSession, dir: String): DataFrame = {
    // per-query LUT: per subspace, cid-keyed exact subspace distances
    // (cid-keyed, not positional — robust to a centroid emptying out in
    // the Lloyd round); 20 tiny rows, broadcast
    val luts = quantized(s, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"))
      .crossJoin(broadcast(pqCbRow(s, dir)))
      .select(col("q_id"),
        graft.expr.VecFunctions.pq_lut(col("qq"), col("cb")).as("lut"))
    // the compressed-domain scan: 8 native table lookups per
    // (vector, query) — PqAdc keeps the whole scoring stage in
    // whole-stage codegen (the interpreted HOF chain forfeited exactly
    // the constant factor PQ exists to win)
    pqCodes(s, dir).crossJoin(broadcast(luts))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.expr.VecFunctions.pq_adc(col("codes"), col("lut")).as("adc"))
  }

  /** Bounded top-k of a (q_id, vec_id, score-to-MINIMIZE) relation. */
  private def pqCut(scored: DataFrame, distCol: String, k: Int): DataFrame =
    scored.groupBy("q_id")
      .agg(graft.expr.VecFunctions.topk_by_score(
        col("vec_id"), -col(distCol).cast("double"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"),
        col("col.id").as("vec_id"),
        (-col("col.score")).cast("long").as(distCol),
        (col("pos") + 1).cast("long").as("rank"))

  val pqOp = QueryDef(
    "ns_similarity_pq",
    (s, dir) => pqCut(pqScored(s, dir), "adc", topK),
    Some(s"""WITH eq AS (SELECT vec_id, i // $pqDsub AS sub, i % $pqDsub AS j,
           |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000, 0) AS BIGINT) AS q
           |  FROM embeddings, (SELECT unnest(generate_series(0, ${embDim - 1})) AS i)),
           |s0 AS (SELECT CAST(vec_id AS INT) AS cid, sub, j, q AS cq FROM eq WHERE vec_id < $pqKsub),
           |d1 AS (SELECT e.vec_id, e.sub, c.cid, CAST(sum((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS dist
           |  FROM eq e JOIN s0 c ON c.sub = e.sub AND c.j = e.j GROUP BY 1, 2, 3),
           |a1 AS (SELECT vec_id, sub, cid FROM (SELECT vec_id, sub, cid,
           |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rk FROM d1) WHERE rk = 1),
           |c1 AS (SELECT e.sub, a.cid, e.j,
           |    CAST(floor(CAST(sum(e.q) AS DOUBLE) / count(*)) AS BIGINT) AS cq
           |  FROM eq e JOIN a1 a ON a.vec_id = e.vec_id AND a.sub = e.sub GROUP BY 1, 2, 3),
           |d2 AS (SELECT e.vec_id, e.sub, c.cid, CAST(sum((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS dist
           |  FROM eq e JOIN c1 c ON c.sub = e.sub AND c.j = e.j GROUP BY 1, 2, 3),
           |codes AS (SELECT vec_id, sub, cid AS code FROM (SELECT vec_id, sub, cid,
           |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rk FROM d2) WHERE rk = 1),
           |lut AS (SELECT q.vec_id AS q_id, c.sub, c.cid,
           |    CAST(sum((q.q - c.cq) * (q.q - c.cq)) AS BIGINT) AS d
           |  FROM eq q JOIN c1 c ON c.sub = q.sub AND c.j = q.j
           |  WHERE q.vec_id < $nQueries GROUP BY 1, 2, 3),
           |adc AS (SELECT l.q_id, co.vec_id, CAST(sum(l.d) AS BIGINT) AS adc
           |  FROM codes co JOIN lut l ON l.sub = co.sub AND l.cid = co.code
           |  WHERE co.vec_id <> l.q_id GROUP BY 1, 2)
           |SELECT q_id, vec_id, adc, rank FROM (
           |  SELECT q_id, vec_id, adc,
           |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank FROM adc)
           |WHERE rank <= $topK""".stripMargin))

  /** PQ + exact rerank — the production ANN serving shape (the FAISS
    * IVFPQ + refine pattern): the compressed-domain ADC scan SHORTLISTS
    * `pqShortR` candidates per query, then only those candidates'
    * TRUE vectors are fetched and exactly re-scored for the final
    * top-k. Quantization error caps raw-PQ recall (RecallPqSpec
    * measures it on this corpus); reranking 50 candidates recovers
    * most of it while still never exact-scoring more than R rows per
    * query — at 100 TB that is R·|queries| vector fetches instead of
    * |corpus|·|queries|, with the full-corpus pass staying in the
    * 8-byte code domain.
    *
    * Plan shape: shortlist via the bounded top-k aggregate (≤ R rows
    * per query per map task); the candidate fetch is an equi-join of
    * the R·|queries|-row shortlist against the quantized corpus (AQE
    * broadcasts the shortlist side); exact L2 in long arithmetic;
    * final cutoff bounded top-k again. */
  private val pqShortR = 50
  val pqRerankOp = QueryDef(
    "ns_similarity_pq_rerank", {
      (s, dir) =>
        val shortlist = pqCut(pqScored(s, dir), "adc", pqShortR)
          .select(col("q_id"), col("vec_id"))
        val qq = quantized(s, dir).filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("q").as("qq"))
        val exact = shortlist
          .join(quantized(s, dir), "vec_id")
          .join(broadcast(qq), "q_id")
          .select(col("q_id"), col("vec_id"),
            graft.expr.VecFunctions.vec_l2_long(col("q"), col("qq")).as("l2"))
        pqCut(exact, "l2", topK)
    },
    Some(s"""WITH eq AS (SELECT vec_id, i // $pqDsub AS sub, i % $pqDsub AS j,
           |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000, 0) AS BIGINT) AS q
           |  FROM embeddings, (SELECT unnest(generate_series(0, ${embDim - 1})) AS i)),
           |s0 AS (SELECT CAST(vec_id AS INT) AS cid, sub, j, q AS cq FROM eq WHERE vec_id < $pqKsub),
           |d1 AS (SELECT e.vec_id, e.sub, c.cid, CAST(sum((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS dist
           |  FROM eq e JOIN s0 c ON c.sub = e.sub AND c.j = e.j GROUP BY 1, 2, 3),
           |a1 AS (SELECT vec_id, sub, cid FROM (SELECT vec_id, sub, cid,
           |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rk FROM d1) WHERE rk = 1),
           |c1 AS (SELECT e.sub, a.cid, e.j,
           |    CAST(floor(CAST(sum(e.q) AS DOUBLE) / count(*)) AS BIGINT) AS cq
           |  FROM eq e JOIN a1 a ON a.vec_id = e.vec_id AND a.sub = e.sub GROUP BY 1, 2, 3),
           |d2 AS (SELECT e.vec_id, e.sub, c.cid, CAST(sum((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS dist
           |  FROM eq e JOIN c1 c ON c.sub = e.sub AND c.j = e.j GROUP BY 1, 2, 3),
           |codes AS (SELECT vec_id, sub, cid AS code FROM (SELECT vec_id, sub, cid,
           |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rk FROM d2) WHERE rk = 1),
           |lut AS (SELECT q.vec_id AS q_id, c.sub, c.cid,
           |    CAST(sum((q.q - c.cq) * (q.q - c.cq)) AS BIGINT) AS d
           |  FROM eq q JOIN c1 c ON c.sub = q.sub AND c.j = q.j
           |  WHERE q.vec_id < $nQueries GROUP BY 1, 2, 3),
           |adc AS (SELECT l.q_id, co.vec_id, CAST(sum(l.d) AS BIGINT) AS adc
           |  FROM codes co JOIN lut l ON l.sub = co.sub AND l.cid = co.code
           |  WHERE co.vec_id <> l.q_id GROUP BY 1, 2),
           |short AS (SELECT q_id, vec_id FROM (
           |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
           |  FROM adc) WHERE rank <= $pqShortR),
           |rr AS (SELECT s.q_id, s.vec_id, CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS l2
           |  FROM short s JOIN eq a ON a.vec_id = s.q_id
           |  JOIN eq b ON b.vec_id = s.vec_id AND a.sub = b.sub AND a.j = b.j
           |  GROUP BY 1, 2)
           |SELECT q_id, vec_id, l2, rank FROM (
           |  SELECT q_id, vec_id, l2,
           |    row_number() OVER (PARTITION BY q_id ORDER BY l2, vec_id) AS rank FROM rr)
           |WHERE rank <= $topK""".stripMargin))

  /** The IVFPQ index: PQ codes PERSISTED label-PARTITIONED (the actual
    * FAISS IVFPQ memory layout — inverted lists of compressed codes per
    * coarse cell). The build encodes the corpus ONCE against the
    * persisted codebook and writes 8-byte codes under partitionBy(label),
    * so a probe reading it joins on the PARTITION column and Dynamic
    * Partition Pruning restricts the scan to the probed cells'
    * directories — raw PQ's one structural weakness (ADC still scans
    * ALL codes) resolved by the coarse quantizer: at 100 TB the ADC pass
    * reads nProbe/nLabels of the code domain instead of all of it. */
  private def ivfpqCodes(s: SparkSession, dir: String): DataFrame =
    buildOnce(s, dir, "ivfpq_codes") { path =>
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          graft.expr.VecFunctions.quantize_vec(col("embedding")).as("q"))
        .crossJoin(broadcast(pqCbRow(s, dir)))
        .select(col("vec_id"), col("label"),
          graft.expr.VecFunctions.pq_encode(col("q"), col("cb")).as("codes"))
        .repartition(col("label"))
        .write.mode("overwrite").partitionBy("label").parquet(path)
    }

  /** IVF × PQ — the composed FAISS IVFPQ shape: route each query to its
    * nProbe nearest coarse centroids (the persisted IVF centroid dim,
    * ranked exactly as ns_similarity_ivf) and run the ADC compressed-
    * domain scan ONLY over those cells' persisted codes. The probe join
    * keys on the partition column, so DPP prunes the code scan to the
    * probed directories (PlanSpec-locked); scoring is the native PqAdc
    * 8-lookup sum against the broadcast per-query LUTs; the cutoff is
    * the bounded top-k aggregate. All arithmetic exact long sums — the
    * DuckDB oracle rebuilds the identical codebook, codes, LUTs, and
    * probe set, so the hash match covers the full composition. */
  /** The probed-cell ADC stream shared by ivfpq and its rerank twin:
    * probe ranking over the broadcast q×centroid frame, per-query LUTs,
    * then the DPP-pruned code scan scored by the native PqAdc. */
  private def ivfpqScored(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val cent = centroidDim(s, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cosC =
      "round(aggregate(zip_with(q_emb, cvec, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, x) -> a + x) " +
        "/ (sqrt(aggregate(q_emb, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) " +
        "* sqrt(aggregate(cvec, 0D, (a, x) -> a + x * x))), 6)"
    val assigned = q.crossJoin(broadcast(cent))
      .withColumn("cos_c", expr(cosC))
    val wq = Window.partitionBy(col("q_id")).orderBy(col("cos_c").desc, col("label"))
    val probe = assigned.withColumn("r", row_number().over(wq)).filter(col("r") <= nProbe)
      .select(col("q_id"), col("label").as("probe_label"))
    val luts = quantized(s, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"))
      .crossJoin(broadcast(pqCbRow(s, dir)))
      .select(col("q_id"),
        graft.expr.VecFunctions.pq_lut(col("qq"), col("cb")).as("lut"))
    // the probed-cell ADC scan: DPP prunes the partitioned code read
    ivfpqCodes(s, dir)
      .join(broadcast(probe.join(luts, "q_id")),
        col("label") === col("probe_label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.expr.VecFunctions.pq_adc(col("codes"), col("lut")).as("adc"))
  }

  /** The shared oracle CTE chain for the IVFPQ composition: the IVF
    * probe CTEs (flat/cent/cvecs/qs/ac/probe) + the PQ codebook/codes/
    * lut CTEs + the probed-cell `adc` scores — everything up to the
    * final cutoff, shared by ivfpq and its rerank twin. */
  private def ivfpqSqlChain: String =
    s"""flat AS (SELECT label, unnest(embedding::DOUBLE[]) AS v,
       |    unnest(generate_series(1, len(embedding))) AS i FROM embeddings
       |  WHERE vec_id % $centSample = 0),
       |cent AS (SELECT label, i, round(avg(v), 6) AS cv FROM flat GROUP BY label, i),
       |cvecs AS (SELECT label, list(cv ORDER BY i) AS cvec FROM cent GROUP BY label),
       |qs AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < $nQueries),
       |ac AS (SELECT q_id, label,
       |    round(list_cosine_similarity(q_emb, cvec), 6) AS cos_c FROM qs, cvecs),
       |probe AS (SELECT q_id, label AS probe_label FROM (
       |    SELECT ac.*, row_number() OVER (PARTITION BY q_id ORDER BY cos_c DESC, label) AS r FROM ac)
       |  WHERE r <= $nProbe),
       |eq AS (SELECT vec_id, i // $pqDsub AS sub, i % $pqDsub AS j,
       |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000, 0) AS BIGINT) AS q
       |  FROM embeddings, (SELECT unnest(generate_series(0, ${embDim - 1})) AS i)),
       |s0 AS (SELECT CAST(vec_id AS INT) AS cid, sub, j, q AS cq FROM eq WHERE vec_id < $pqKsub),
       |d1 AS (SELECT e.vec_id, e.sub, c.cid, CAST(sum((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS dist
       |  FROM eq e JOIN s0 c ON c.sub = e.sub AND c.j = e.j GROUP BY 1, 2, 3),
       |a1 AS (SELECT vec_id, sub, cid FROM (SELECT vec_id, sub, cid,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rk FROM d1) WHERE rk = 1),
       |c1 AS (SELECT e.sub, a.cid, e.j,
       |    CAST(floor(CAST(sum(e.q) AS DOUBLE) / count(*)) AS BIGINT) AS cq
       |  FROM eq e JOIN a1 a ON a.vec_id = e.vec_id AND a.sub = e.sub GROUP BY 1, 2, 3),
       |d2 AS (SELECT e.vec_id, e.sub, c.cid, CAST(sum((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS dist
       |  FROM eq e JOIN c1 c ON c.sub = e.sub AND c.j = e.j GROUP BY 1, 2, 3),
       |codes AS (SELECT vec_id, sub, cid AS code FROM (SELECT vec_id, sub, cid,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rk FROM d2) WHERE rk = 1),
       |lut AS (SELECT q.vec_id AS q_id, c.sub, c.cid,
       |    CAST(sum((q.q - c.cq) * (q.q - c.cq)) AS BIGINT) AS d
       |  FROM eq q JOIN c1 c ON c.sub = q.sub AND c.j = q.j
       |  WHERE q.vec_id < $nQueries GROUP BY 1, 2, 3),
       |adc AS (SELECT l.q_id, co.vec_id, CAST(sum(l.d) AS BIGINT) AS adc
       |  FROM codes co
       |  JOIN embeddings e ON e.vec_id = co.vec_id
       |  JOIN probe p ON p.probe_label = e.label
       |  JOIN lut l ON l.q_id = p.q_id AND l.sub = co.sub AND l.cid = co.code
       |  WHERE co.vec_id <> l.q_id GROUP BY 1, 2)""".stripMargin

  val ivfpqOp = QueryDef(
    "ns_similarity_ivfpq",
    (s, dir) => pqCut(ivfpqScored(s, dir), "adc", topK),
    Some(s"""WITH $ivfpqSqlChain
           |SELECT q_id, vec_id, adc, rank FROM (
           |  SELECT q_id, vec_id, adc,
           |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank FROM adc)
           |WHERE rank <= $topK""".stripMargin))

  /** The full FAISS IVFPQ + refine: the probed-cell compressed-domain
    * scan SHORTLISTS R candidates per query, then only those
    * candidates' true (quantized) vectors are fetched for the exact
    * integer L2 rerank — at 100 TB, nProbe/nLabels of the 8-byte code
    * domain scanned, R·|queries| full vectors touched, the serving
    * shape production ANN actually deploys. Reuses the verified
    * ivfpqScored stream and the PQ rerank machinery unchanged. */
  val ivfpqRerankOp = QueryDef(
    "ns_similarity_ivfpq_rerank", {
      (s, dir) =>
        val shortlist = pqCut(ivfpqScored(s, dir), "adc", pqShortR)
          .select(col("q_id"), col("vec_id"))
        val qq = quantized(s, dir).filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("q").as("qq"))
        val exact = shortlist
          .join(quantized(s, dir), "vec_id")
          .join(broadcast(qq), "q_id")
          .select(col("q_id"), col("vec_id"),
            graft.expr.VecFunctions.vec_l2_long(col("q"), col("qq")).as("l2"))
        pqCut(exact, "l2", topK)
    },
    Some(s"""WITH $ivfpqSqlChain,
           |short AS (SELECT q_id, vec_id FROM (
           |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
           |  FROM adc) WHERE rank <= $pqShortR),
           |rr AS (SELECT s.q_id, s.vec_id, CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS l2
           |  FROM short s JOIN eq a ON a.vec_id = s.q_id
           |  JOIN eq b ON b.vec_id = s.vec_id AND a.sub = b.sub AND a.j = b.j
           |  GROUP BY 1, 2)
           |SELECT q_id, vec_id, l2, rank FROM (
           |  SELECT q_id, vec_id, l2,
           |    row_number() OVER (PARTITION BY q_id ORDER BY l2, vec_id) AS rank FROM rr)
           |WHERE rank <= $topK""".stripMargin))

  /** Semantic dedup (the SemDeDup shape, Abbas et al. 2023): documents
    * whose EMBEDDINGS nearly coincide are duplicates even when their
    * text differs — cluster the corpus (the learned k-means partition
    * above), compare pairs only WITHIN a cluster, and keep the lowest
    * id of each matched pair-set. Complements ns_dedup_embedding
    * (LSH over raw vectors): clustering-scoped comparison is what
    * scales the cosine check — candidate pairs are bounded per cluster
    * (BoundedBucketAgg cap inside map-side partial aggregation), never
    * corpus². An over-cap cluster drops whole (the LSH-bucket rule);
    * the production answer at that size is recursive sub-clustering,
    * same plan shape. The cosine threshold is calibrated to the
    * near-uniform synthetic corpus (the RecallSpec discipline);
    * vectors join back per-pair so the 256-byte embeddings never ride
    * the pair shuffle. */
  private val semT = 0.3
  private val semClusterCap = 2000
  val semanticDedupOp = QueryDef(
    "ns_dedup_semantic", {
      (s, dir) =>
        val assigned = kmAssign(quantized(s, dir), kmeansCentroids(s, dir))
        val cand = assigned.groupBy("cluster")
          .agg(graft.expr.TextFunctions.bounded_bucket(col("vec_id"), semClusterCap).as("ds"))
          .filter(col("ds").isNotNull)
          .select(explode(graft.expr.TextFunctions.ordered_pairs(col("ds"),
            includeDiagonal = false)).as("p"))
          .select(col("p.a").as("vec_a"), col("p.b").as("vec_b"))
        val emb = Tables.embeddings(s, dir)
        val dups = cand
          .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), "vec_a")
          .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), "vec_b")
          .filter(round(vec_cosine(col("emb_a"), col("emb_b")), 6) >= semT)
          .groupBy("vec_b").agg(min(col("vec_a")).as("dup_of"))
          .withColumnRenamed("vec_b", "vec_id")
        emb.select("vec_id").join(dups, Seq("vec_id"), "left")
          .select(col("vec_id"), col("dup_of"), col("dup_of").isNull.as("is_kept"))
    },
    Some(s"""WITH $kmeansSqlChain,
           |cc AS (SELECT * FROM af QUALIFY count(*) OVER (PARTITION BY cluster) <= $semClusterCap),
           |p AS (SELECT x.vec_id AS va, y.vec_id AS vb FROM cc x
           |  JOIN cc y ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
           |m AS (SELECT vb AS vec_id, min(va) AS dup_of FROM p
           |  JOIN embeddings ea ON ea.vec_id = va
           |  JOIN embeddings eb ON eb.vec_id = vb
           |  WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) >= $semT
           |  GROUP BY 1)
           |SELECT e.vec_id, m.dup_of, m.dup_of IS NULL AS is_kept
           |FROM embeddings e LEFT JOIN m USING (vec_id)""".stripMargin))

  // ---------------------------------------------------------- knn threshold
  /** The `knn` query's `similarity` parameter — ES 8's radius cut: only
    * neighbors at cosine ≥ τ may fill the k slots ("no neighbor is
    * better than a bad neighbor", the RAG-context guard). Score is
    * monotone in the top-k order, so threshold-then-top-k ≡ top-k-then-
    * filter — the bounded aggregate runs unchanged and the cut is a
    * post-heap filter on ≤ k rows per query; under-filled queries are
    * the CORRECT output (rank stays the pre-filter rank). */
  private val knnSimThreshold = 0.35
  val knnThresholdOp = QueryDef(
    "ns_similarity_knn_threshold", {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val scored = embPar(s, dir).crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
        topkPerGroup(scored, Seq("q_id"))
          .filter(col("cos_r") >= knnSimThreshold)
    },
    Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < $nQueries),
            |c AS (SELECT q_id, e.vec_id,
            |    round(list_cosine_similarity(e.embedding::DOUBLE[], q_emb), 6) AS cos_r
            |  FROM embeddings e, q WHERE e.vec_id <> q.q_id)
            |SELECT q_id, vec_id, cos_r, rank FROM (
            |  SELECT q_id, vec_id, cos_r,
            |    row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rank FROM c)
            |WHERE rank <= $topK AND cos_r >= $knnSimThreshold""".stripMargin))

  // --------------------------------------------------------------------- rrf
  /** Hybrid retrieval with Reciprocal Rank Fusion — ES 8.14's `rrf`
    * retriever: a lexical ranking and a vector ranking over the SAME
    * corpus (doc_id ≡ vec_id), fused by Σ 1/(k + rank) so neither
    * leg's score scale matters. Each leg is its own bounded top-window
    * (the rank-window constant, 50): the vector leg is the knn shape
    * (broadcast query, bounded TopKByScoreAgg — its contract IS
    * row_number(cos DESC, id)), the lexical leg a TakeOrderedAndProject
    * over one codegen tf pass. Fusion then full-outer-joins two ≤50-row
    * frames — driver-sized at any SF. Ranks are exact longs, the RRF
    * sum two reciprocal doubles from one shared formula — identical in
    * both engines; ties break on id. */
  private val rrfK = 60
  private val rrfWindow = 50
  private val rrfQid = 7L
  private val rrfTerm = "spark"
  val rrfOp = QueryDef(
    "ns_search_rrf", {
      (s, dir) =>
        val qv = Tables.embeddings(s, dir)
          .filter(col("vec_id") === rrfQid).select(col("embedding").as("q_emb"))
        val vecTop = embPar(s, dir).crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= rrfQid)
          .select(col("vec_id"),
            round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
          .agg(graft.expr.VecFunctions.topk_by_score(
            col("vec_id"), col("cos_r"), rrfWindow).as("top"))
          .select(posexplode(col("top")))
          .select(col("col.id").as("id"), (col("pos") + 1).cast("long").as("vec_rank"))
        val toksD = split(trim(col("text")), " ")
        val textTop = Tables.documents(s, dir)
          .withColumn("tf", size(filter(toksD, t => t === rrfTerm)).cast("long"))
          .filter(col("tf") > 0 && col("doc_id") =!= rrfQid)
          .orderBy(col("tf").desc, col("doc_id"))
          .limit(rrfWindow)
          // rank over the already-cut 50-row frame: bounded by construction
          .withColumn("text_rank",
            row_number().over(Window.orderBy(col("tf").desc, col("doc_id"))).cast("long"))
          .select(col("doc_id").as("id"), col("text_rank"))
        textTop.join(vecTop, Seq("id"), "full_outer")
          .withColumn("rrf_score",
            coalesce(lit(1.0) / (lit(rrfK) + col("text_rank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0)))
          .orderBy(col("rrf_score").desc, col("id"))
          .limit(10)
          .select(col("id"), col("text_rank"), col("vec_rank"),
            round(col("rrf_score"), 6).as("rrf_score"))
    },
    Some(s"""WITH q AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = $rrfQid),
            |vs AS (SELECT e.vec_id AS id,
            |    round(list_cosine_similarity(e.embedding::DOUBLE[], q_emb), 6) AS cos_r
            |  FROM embeddings e, q WHERE e.vec_id <> $rrfQid),
            |vr AS (SELECT id, vec_rank FROM (
            |    SELECT id, row_number() OVER (ORDER BY cos_r DESC, id) AS vec_rank FROM vs)
            |  WHERE vec_rank <= $rrfWindow),
            |tf AS (SELECT doc_id AS id,
            |    len(list_filter(string_split(trim(text), ' '), x -> x = '$rrfTerm')) AS tf
            |  FROM documents WHERE doc_id <> $rrfQid),
            |tr AS (SELECT id, text_rank FROM (
            |    SELECT id, row_number() OVER (ORDER BY tf DESC, id) AS text_rank
            |    FROM tf WHERE tf > 0)
            |  WHERE text_rank <= $rrfWindow),
            |f AS (SELECT coalesce(tr.id, vr.id) AS id, tr.text_rank, vr.vec_rank,
            |    coalesce(CAST(1 AS DOUBLE) / ($rrfK + tr.text_rank), 0)
            |      + coalesce(CAST(1 AS DOUBLE) / ($rrfK + vr.vec_rank), 0) AS rrf_score
            |  FROM tr FULL OUTER JOIN vr ON tr.id = vr.id)
            |SELECT id, text_rank, vec_rank, round(rrf_score, 6) AS rrf_score
            |FROM f ORDER BY rrf_score DESC, id LIMIT 10""".stripMargin))

  /** Score-based hybrid retrieval — the OTHER fusion mode next to RRF
    * (OpenSearch's `hybrid` query with min_max normalization; ES's
    * `linear` retriever): each leg's scores are min-max normalized
    * OVER ITS OWN RETRIEVED WINDOW (exactly the OpenSearch
    * normalization-processor contract — normalization never sees the
    * corpus, only the candidate page), then combined as a weighted
    * sum, missing legs contributing zero. Determinism: leg inputs are
    * exact (tf longs; cosine rounded 6), min/max over a 50-row window
    * are exact selections, and the normalize+combine formula is one
    * shared derivation both engines evaluate identically; degenerate
    * windows (max = min) normalize to 1.0 by the same guard in both.
    * Plan shape is rrf's: two bounded top-k legs, a full-outer join of
    * two ≤50-row frames, driver-sized at any SF. */
  private val hybridLexW = 0.7
  private val hybridVecW = 0.3
  val hybridOp = QueryDef(
    "ns_search_hybrid", {
      (s, dir) =>
        val qv = Tables.embeddings(s, dir)
          .filter(col("vec_id") === rrfQid).select(col("embedding").as("q_emb"))
        val vecTopRaw = embPar(s, dir).crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= rrfQid)
          .select(col("vec_id"),
            round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
          .agg(graft.expr.VecFunctions.topk_by_score(
            col("vec_id"), col("cos_r"), rrfWindow).as("top"))
          .select(explode(col("top")).as("c"))
          .select(col("c.id").as("id"), col("c.score").as("cos_r"))
        val vecStats = vecTopRaw.agg(min("cos_r").as("v_min"), max("cos_r").as("v_max"))
        val vecTop = vecTopRaw.crossJoin(broadcast(vecStats))
          .select(col("id"), when(col("v_max") > col("v_min"),
            (col("cos_r") - col("v_min")) / (col("v_max") - col("v_min")))
            .otherwise(lit(1.0)).as("vec_norm"))
        val toksD = split(trim(col("text")), " ")
        val textTopRaw = Tables.documents(s, dir)
          .withColumn("tf", size(filter(toksD, t => t === rrfTerm)).cast("long"))
          .filter(col("tf") > 0 && col("doc_id") =!= rrfQid)
          .orderBy(col("tf").desc, col("doc_id"))
          .limit(rrfWindow)
          .select(col("doc_id").as("id"), col("tf"))
        val lexStats = textTopRaw.agg(min("tf").as("l_min"), max("tf").as("l_max"))
        val textTop = textTopRaw.crossJoin(broadcast(lexStats))
          .select(col("id"), when(col("l_max") > col("l_min"),
            (col("tf") - col("l_min")).cast("double") / (col("l_max") - col("l_min")))
            .otherwise(lit(1.0)).as("lex_norm"))
        textTop.join(vecTop, Seq("id"), "full_outer")
          .withColumn("hybrid_score",
            coalesce(col("lex_norm"), lit(0.0)) * hybridLexW +
              coalesce(col("vec_norm"), lit(0.0)) * hybridVecW)
          .orderBy(col("hybrid_score").desc, col("id"))
          .limit(10)
          .select(col("id"),
            round(coalesce(col("lex_norm"), lit(0.0)), 6).as("lex_norm"),
            round(coalesce(col("vec_norm"), lit(0.0)), 6).as("vec_norm"),
            round(col("hybrid_score"), 6).as("hybrid_score"))
    },
    Some(s"""WITH q AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = $rrfQid),
            |vs AS (SELECT e.vec_id AS id,
            |    round(list_cosine_similarity(e.embedding::DOUBLE[], q_emb), 6) AS cos_r
            |  FROM embeddings e, q WHERE e.vec_id <> $rrfQid),
            |vtop AS (SELECT id, cos_r FROM (
            |    SELECT id, cos_r, row_number() OVER (ORDER BY cos_r DESC, id) AS rk FROM vs)
            |  WHERE rk <= $rrfWindow),
            |vn AS (SELECT id, CASE WHEN max(cos_r) OVER () > min(cos_r) OVER ()
            |    THEN (cos_r - min(cos_r) OVER ()) / (max(cos_r) OVER () - min(cos_r) OVER ())
            |    ELSE 1.0 END AS vec_norm FROM vtop),
            |tf AS (SELECT doc_id AS id,
            |    len(list_filter(string_split(trim(text), ' '), x -> x = '$rrfTerm')) AS tf
            |  FROM documents WHERE doc_id <> $rrfQid),
            |ttop AS (SELECT id, tf FROM (
            |    SELECT id, tf, row_number() OVER (ORDER BY tf DESC, id) AS rk
            |    FROM tf WHERE tf > 0)
            |  WHERE rk <= $rrfWindow),
            |tn AS (SELECT id, CASE WHEN max(tf) OVER () > min(tf) OVER ()
            |    THEN CAST(tf - min(tf) OVER () AS DOUBLE) / (max(tf) OVER () - min(tf) OVER ())
            |    ELSE 1.0 END AS lex_norm FROM ttop),
            |f AS (SELECT coalesce(tn.id, vn.id) AS id,
            |    coalesce(tn.lex_norm, 0) AS lex_norm, coalesce(vn.vec_norm, 0) AS vec_norm,
            |    coalesce(tn.lex_norm, 0) * $hybridLexW + coalesce(vn.vec_norm, 0) * $hybridVecW AS hybrid_score
            |  FROM tn FULL OUTER JOIN vn ON tn.id = vn.id)
            |SELECT id, round(lex_norm, 6) AS lex_norm, round(vec_norm, 6) AS vec_norm,
            |  round(hybrid_score, 6) AS hybrid_score
            |FROM f ORDER BY hybrid_score DESC, id LIMIT 10""".stripMargin))

  // ------------------------------------------------------------------- BBQ
  /** Binary quantization (ES 9's BBQ — the new dense-vector DEFAULT):
    * each 64-dim float vector collapses to ONE 64-bit long — a sign bit
    * per dimension around the per-dimension corpus mean (BBQ's
    * centered quantization), 32× smaller than the floats — and
    * similarity becomes a popcount over XOR (one fused instruction per
    * comparison instead of 64 FMAs). Exactness discipline: the
    * per-dim means are integer-quantized moments (the embedding_whiten
    * rule) and the threshold test is `micros(v) · n > Σ micros` — pure
    * long comparisons, so both engines pack bit-identical words; bit
    * 63 is the sign-bit literal so packing is plain long addition.
    *
    * Scale shape: the 64-entry moment array broadcasts back (the
    * corpus never shuffles wide), packing is one unrolled codegen
    * pass, queries broadcast, and top-k is the bounded aggregate.
    * At 100 TB the packed column is the index: 8 bytes/vector scans
    * at memory bandwidth. */
  private def pow2(d: Int): Long = if (d == 63) Long.MinValue else 1L << d
  /** The packed BBQ index is a buildOnce ARTIFACT, like the IVF
    * postings and the term dictionaries: ES builds its quantized index
    * at write time, so query time only scans the 8-byte words. The
    * build pass (per corpus snapshot) computes the integer moments,
    * broadcasts the 64-entry array back, and packs in one unrolled
    * codegen expression. */
  private def packedEmb(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/embeddings.parquet", "bbq_packed") { path =>
      val dims = 64
      val moments = Tables.embeddings(s, dir)
        .select(posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy("d")
        .agg(sum(round(col("v") * 1e6, 0).cast("long")).as("sm"),
          count(lit(1)).as("cnt"))
      val momentsRow = moments
        .agg(sort_array(collect_list(struct(col("d"), col("sm")))).as("ds"),
          max(col("cnt")).as("n"))
        .select(expr("transform(ds, x -> x.sm)").as("sums"), col("n"))
      val packed = (0 until dims).map { d =>
        val bit = round(element_at(col("embedding"), d + 1) * 1e6, 0).cast("long") *
          col("n") > element_at(col("sums"), d + 1)
        when(bit, lit(pow2(d))).otherwise(lit(0L))
      }.reduce(_ + _)
      // Corpus-cardinality artifact (one row per vector): write with the
      // scan's natural parallelism, like ivfIndex's partitioned build —
      // never a single-task funnel. Only vocabulary/codebook-bounded
      // artifacts (centroids, dictionaries) may coalesce(1).
      embPar(s, dir).crossJoin(broadcast(momentsRow))
        .select(col("vec_id"), packed.as("packed"))
        .write.mode("overwrite").parquet(path)
    }
  private val bbqOracleCtes: String =
    s"""WITH e AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
       |    generate_subscripts(embedding, 1) AS d FROM embeddings),
       |m AS (SELECT d, CAST(sum(CAST(round(v*1000000, 0) AS BIGINT)) AS BIGINT) AS sm,
       |    count(*) AS n FROM e GROUP BY 1),
       |pw(d, pw) AS (VALUES ${(0 until 64).map(d => s"(${d + 1}, CAST(${pow2(d)} AS BIGINT))").mkString(", ")}),
       |p AS (SELECT vec_id, CAST(sum(CASE WHEN CAST(round(v*1000000, 0) AS BIGINT) * n > sm
       |      THEN pw ELSE 0 END) AS BIGINT) AS packed
       |  FROM e JOIN m USING (d) JOIN pw USING (d) GROUP BY 1)""".stripMargin
  val bbqOp = QueryDef(
    "ns_similarity_bbq", {
      (s, dir) =>
        val p = packedEmb(s, dir)
        val q = p.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("packed").as("q_packed"))
        val scored = p.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            (lit(64) - bit_count(col("packed").bitwiseXOR(col("q_packed"))))
              .cast("double").as("cos_r"))
        topkPerGroup(scored, Seq("q_id"))
          .select(col("q_id"), col("vec_id"),
            col("cos_r").cast("long").as("matching_bits"), col("rank"))
    },
    Some(s"""$bbqOracleCtes,
            |q AS (SELECT vec_id AS q_id, packed AS q_packed FROM p WHERE vec_id < $nQueries),
            |c AS (SELECT q_id, p.vec_id,
            |    64 - bit_count(xor(p.packed, q_packed)) AS matching_bits
            |  FROM p, q WHERE p.vec_id <> q.q_id)
            |SELECT q_id, vec_id, CAST(matching_bits AS BIGINT) AS matching_bits, rank FROM (
            |  SELECT q_id, vec_id, matching_bits,
            |    row_number() OVER (PARTITION BY q_id ORDER BY matching_bits DESC, vec_id) AS rank
            |  FROM c)
            |WHERE rank <= $topK""".stripMargin))

  /** BBQ + rescore — how ES actually serves BBQ: the binary index
    * OVERSAMPLES (8× here), then the float vectors rerank the short
    * candidate page exactly. The exact pass touches only |queries|×4k
    * candidate pairs — the floats are fetched for the page, never
    * scanned — which is the rescore_vector contract ES documents. */
  // the recall knob: hamming keeps only octant information, so the
  // exact rescore needs a deeper page on weakly-clustered corpora
  // (RecallSpec pins the floor; 4× measured 0.44 there, 8× clears 0.5)
  private val bbqOversample = 8
  val bbqRerankOp = QueryDef(
    "ns_similarity_bbq_rerank", {
      (s, dir) =>
        val p = packedEmb(s, dir)
        val q = p.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("packed").as("q_packed"))
        val page = p.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            (lit(64) - bit_count(col("packed").bitwiseXOR(col("q_packed"))))
              .cast("double").as("cos_r"))
        val candidates = page
          .groupBy("q_id")
          .agg(graft.expr.VecFunctions.topk_by_score(
            col("vec_id"), col("cos_r"), topK * bbqOversample).as("top"))
          .select(col("q_id"), explode(col("top")).as("c"))
          .select(col("q_id"), col("c.id").as("vec_id"))
        val emb = Tables.embeddings(s, dir)
        val qv = emb.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val rescored = candidates
          .join(broadcast(qv), "q_id")
          .join(emb, "vec_id")
          .select(col("q_id"), col("vec_id"),
            round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
        topkPerGroup(rescored, Seq("q_id"))
    },
    Some(s"""$bbqOracleCtes,
            |q AS (SELECT vec_id AS q_id, packed AS q_packed FROM p WHERE vec_id < $nQueries),
            |c AS (SELECT q_id, p.vec_id,
            |    64 - bit_count(xor(p.packed, q_packed)) AS mb
            |  FROM p, q WHERE p.vec_id <> q.q_id),
            |page AS (SELECT q_id, vec_id FROM (
            |  SELECT q_id, vec_id,
            |    row_number() OVER (PARTITION BY q_id ORDER BY mb DESC, vec_id) AS rk
            |  FROM c) WHERE rk <= ${topK * bbqOversample}),
            |qv AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings
            |  WHERE vec_id < $nQueries),
            |r AS (SELECT page.q_id, page.vec_id,
            |    round(list_cosine_similarity(e.embedding::DOUBLE[], q_emb), 6) AS cos_r
            |  FROM page JOIN qv USING (q_id) JOIN embeddings e ON e.vec_id = page.vec_id)
            |SELECT q_id, vec_id, cos_r, rank FROM (
            |  SELECT q_id, vec_id, cos_r,
            |    row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rank
            |  FROM r)
            |WHERE rank <= $topK""".stripMargin))

  def entries: Seq[QueryDef] = Seq(
    knnOp, knnFilteredOp, knnThresholdOp, ivfOp, pqOp, pqRerankOp, ivfpqOp,
    bbqOp, bbqRerankOp,
    ivfpqRerankOp, mrlOp, rrfOp, hybridOp,
    dedupEmbeddingOp,
    multimodalProjectOp, multimodalDecodeOp,
    multimodalResizeOp, multimodalFramesOp, multimodalAudioOp,
    multimodalAhashOp, multimodalAudioFpOp, quantizeOp,
    kmeansOp, semanticDedupOp)
}
