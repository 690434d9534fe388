package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryDef, Tables}
import graft.expr.VecFunctions.{topk_by_score, vec_cosine}

/** The ES 8.16+ `retriever` tree — the request syntax Kibana now sends
  * for hybrid search: a COMPOSED tree of retrievers instead of a flat
  * query. Leaf retrievers (`standard`, `knn`) produce a ranked page;
  * compound retrievers (`rrf`, `text_similarity_reranker`, `rule`)
  * consume their children's pages and re-rank. This module is the tree
  * COMPILER over the engine's existing leaf disciplines (the rrf legs,
  * the bounded TopKByScoreAgg, the lexical cross-scorer, pinned ids) —
  * each node compiles to a DataFrame of (id, _score) bounded to its own
  * `rank_window_size`, so every stage above a leaf operates on
  * page-sized frames only.
  *
  * Scale shape: the `standard` leaf is one codegen tf pass + a top-k
  * heap (TakeOrderedAndProject); the `knn` leaf is the broadcast-query
  * + bounded-partial-aggregate knn shape; `rrf` full-outer-joins
  * page-sized frames (≤ window rows each — driver-sized at any SF);
  * `text_similarity_reranker` re-fetches ONLY the page (a broadcast
  * probe into one corpus fetch pass — ES's fetch phase) and scores with
  * the exact capped-tf cross-scorer; `rule` unions a pinned local
  * relation. The only windows rank already-cut pages, never a corpus.
  */
object RetrieverTree {

  /** One node of the retriever tree. Every node carries its own
    * `window` (ES `rank_window_size`): the page size it returns. */
  sealed trait Retriever { def window: Int }
  /** `standard`: a lexical term query scored by raw tf. */
  final case class RStandard(term: String, window: Int) extends Retriever
  /** `knn`: cosine top-k against a stored query vector. */
  final case class RKnn(qid: Long, window: Int) extends Retriever
  /** `rrf`: reciprocal-rank fusion of the children's pages. */
  final case class RRrf(children: Seq[Retriever], window: Int,
                        rankConstant: Int = 60) extends Retriever
  /** `text_similarity_reranker`: re-score the child's page with the
    * engine's exact lexical cross-scorer (the RERANK seam). */
  final case class RRerank(child: Retriever, queryText: String,
                           window: Int) extends Retriever
  /** `rule`: pinned ids promoted ahead of the child's page, in the
    * order given (ES query-rules' pinned action). */
  final case class RRule(pinned: Seq[Long], child: Retriever,
                         window: Int) extends Retriever
  /** `rescorer`: re-score the child's page with a secondary query —
    * final score = query_weight × child score + rescore_weight ×
    * tf(term) over the page's fetched text (ES 8.18+'s rescorer
    * retriever, the `rescore` clause as a composable node; the fetch
    * is the text_similarity_reranker's broadcast-probe discipline —
    * the secondary pass touches exactly the page). */
  final case class RRescorer(child: Retriever, term: String,
                             queryWeight: Double, rescoreWeight: Double,
                             window: Int) extends Retriever
  /** `linear`: weighted sum of the children's min-max-normalized page
    * scores (ES 8.18+'s linear retriever — the score-based fusion mode
    * next to rrf, as a composable tree node). Each child's scores
    * normalize over ITS OWN retrieved page only (the OpenSearch
    * normalization-processor contract — normalization never sees the
    * corpus); degenerate pages (max = min) normalize to 1.0; a leg
    * that missed a document contributes zero. */
  final case class RLinear(children: Seq[(Retriever, Double)],
                           window: Int) extends Retriever

  /** Exact term frequency via the shared bar-encoding helper — ONE
    * implementation with the RERANK scorer (EsqlParser.barTf), so the
    * standard leaf and the reranker can never drift in tokenization. */
  private def tfOf(term: String, field: Column): Column =
    EsqlParser.barTf(term, field)

  /** Rank a page frame (already ≤ window rows) by (_score DESC, id) —
    * page-bounded by construction, the rrf-leg discipline. */
  private def pageRank(page: DataFrame, as: String): DataFrame =
    page.withColumn(as,
      row_number().over(Window.orderBy(col("_score").desc, col("id"))).cast("long"))

  /** Compile a retriever node to its (id, _score) page, bounded to the
    * node's window with deterministic (score DESC, id) cut. */
  def compile(s: SparkSession, dir: String, r: Retriever): DataFrame = r match {
    case RStandard(term, w) =>
      Tables.documents(s, dir)
        .select(col("doc_id").as("id"), tfOf(term, col("text")).as("tf"))
        .filter(col("tf") > 0)
        .orderBy(col("tf").desc, col("id"))
        .limit(w)
        .select(col("id"), col("tf").cast("double").as("_score"))
    case RKnn(qid, w) =>
      val qv = Tables.embeddings(s, dir)
        .filter(col("vec_id") === qid).select(col("embedding").as("q_emb"))
      Par.spread(s, Tables.embeddings(s, dir), col("vec_id"))
        .crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= qid)
        .select(col("vec_id").as("id"),
          round(vec_cosine(col("embedding"), col("q_emb")), 6).as("cos_r"))
        .agg(topk_by_score(col("id"), col("cos_r"), w).as("top"))
        .select(explode(col("top")).as("c"))
        .select(col("c.id").as("id"), col("c.score").as("_score"))
    case RRrf(children, w, k) =>
      val ranked = children.zipWithIndex.map { case (c, i) =>
        pageRank(compile(s, dir, c), s"__r$i").select(col("id"), col(s"__r$i"))
      }
      val fused = ranked.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
      val score = ranked.indices
        .map(i => coalesce(lit(1.0) / (lit(k) + col(s"__r$i")), lit(0.0)))
        .reduce(_ + _)
      fused.select(col("id"), score.as("_score"))
        .orderBy(col("_score").desc, col("id")).limit(w)
    case RRerank(child, q, w) =>
      val page = compile(s, dir, child).select("id")
      // fetch phase: ONE corpus pass probed by the broadcast page —
      // scoring only ever touches the page's documents
      Tables.documents(s, dir)
        .join(broadcast(page), col("doc_id") === col("id"))
        .select(col("id"),
          EsqlParser.lexicalRerankScore(q, col("text")).cast("double").as("_score"))
        .orderBy(col("_score").desc, col("id")).limit(w)
    case RRescorer(child, term, qw, rw, w) =>
      val page = compile(s, dir, child)
      Tables.documents(s, dir)
        .join(broadcast(page), col("doc_id") === col("id"))
        .select(col("id"),
          (col("_score") * qw + tfOf(term, col("text")).cast("double") * rw)
            .as("_score"))
        .orderBy(col("_score").desc, col("id")).limit(w)
    case RLinear(children, w) =>
      val normed = children.zipWithIndex.map { case ((c, _), i) =>
        val page = compile(s, dir, c)
        val stats = page.agg(min("_score").as("__mn"), max("_score").as("__mx"))
        page.crossJoin(broadcast(stats))
          .select(col("id"), when(col("__mx") > col("__mn"),
            (col("_score") - col("__mn")) / (col("__mx") - col("__mn")))
            .otherwise(lit(1.0)).as(s"__n$i"))
      }
      val fused = normed.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
      val score = children.zipWithIndex
        .map { case ((_, wt), i) => coalesce(col(s"__n$i"), lit(0.0)) * wt }
        .reduce(_ + _)
      fused.select(col("id"), score.as("_score"))
        .orderBy(col("_score").desc, col("id")).limit(w)
    case RRule(pinned, child, w) =>
      import s.implicits._
      // Pinned scores must be COMPOSITIONAL: derived from the child
      // page's own max (childMax + len − i), not a fixed constant — a
      // fixed 1e6 ties/loses against a NESTED rule child's pins, putting
      // the inner pins ahead of the outer node's (ES puts the outermost
      // rule's pins first). The max aggregate runs over the ≤window-row
      // page — page-bounded, broadcast back.
      val organic = compile(s, dir, child)
        .filter(!col("id").isin(pinned: _*))
      val mx = organic.agg(coalesce(max(col("_score")), lit(0.0)).as("__mx"))
      // ES query-rules pin documents by _id; a pinned id that matches no
      // document is simply ABSENT from the hits, never fabricated —
      // existence-filter the pin list against the corpus before the
      // union. The ≤|pins|-row list broadcasts into one map-side hash
      // join probe of the documents scan (no shuffle, no second pass).
      val pins = Tables.documents(s, dir).select(col("doc_id").as("id"))
        .join(broadcast(pinned.zipWithIndex
          .map { case (id, i) => (id, (pinned.length - i).toDouble) }
          .toDF("id", "__boost")), Seq("id"))
        .crossJoin(broadcast(mx))
        .select(col("id"), (col("__mx") + col("__boost")).as("_score"))
      organic.unionByName(pins)
        .orderBy(col("_score").desc, col("id")).limit(w)
  }

  /** The declared tree: every retriever type composed the way Kibana's
    * hybrid-search request nests them —
    * rule(pinned, text_similarity_reranker(rrf(standard, knn))). */
  private val treeTerm = "spark"
  private val treeQid = 7L
  private val treeRerankText = "spark data pipeline"
  private val treePinned = Seq(3L, 11L)
  private[graft] val declaredTree: Retriever =
    RRule(treePinned,
      RRerank(
        RRrf(Seq(RStandard(treeTerm, 50), RKnn(treeQid, 50)), window = 20),
        treeRerankText, window = 10),
      window = 10)

  val retrieverOp = QueryDef(
    "ns_search_retriever",
    (s, dir) => {
      val page = compile(s, dir, declaredTree)
      pageRank(page, "rank")
        .select(col("rank"), col("id").as("doc_id"),
          round(col("_score"), 6).as("score"))
        .orderBy(col("rank"))
    },
    Some(s"""WITH bar AS (SELECT doc_id AS id,
      |    concat('|', replace(trim(text), ' ', '||'), '|') AS bar FROM documents),
      |st AS (SELECT id, CAST((length(bar) - length(replace(bar, '|$treeTerm|', '')))
      |    // ${treeTerm.length + 2} AS BIGINT) AS tf FROM bar),
      |stp AS (SELECT id, CAST(tf AS DOUBLE) AS s FROM st
      |  WHERE tf > 0 ORDER BY tf DESC, id LIMIT 50),
      |str AS (SELECT id, row_number() OVER (ORDER BY s DESC, id) AS rnk FROM stp),
      |q AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = $treeQid),
      |kn AS (SELECT vec_id AS id,
      |    round(list_cosine_similarity(embedding::DOUBLE[], q_emb), 6) AS s
      |  FROM embeddings, q WHERE vec_id <> $treeQid),
      |knp AS (SELECT id, s FROM kn ORDER BY s DESC, id LIMIT 50),
      |knr AS (SELECT id, row_number() OVER (ORDER BY s DESC, id) AS rnk FROM knp),
      |fu AS (SELECT coalesce(a.id, b.id) AS id,
      |    coalesce(CAST(1 AS DOUBLE) / (60 + a.rnk), 0)
      |      + coalesce(CAST(1 AS DOUBLE) / (60 + b.rnk), 0) AS s
      |  FROM str a FULL OUTER JOIN knr b ON a.id = b.id),
      |fup AS (SELECT id FROM fu ORDER BY s DESC, id LIMIT 20),
      |rr AS (SELECT p.id,
      |    least((length(d.bar) - length(replace(d.bar, '|spark|', ''))) // 7, 5)
      |    + least((length(d.bar) - length(replace(d.bar, '|data|', ''))) // 6, 5)
      |    + least((length(d.bar) - length(replace(d.bar, '|pipeline|', ''))) // 10, 5) AS sc
      |  FROM fup p JOIN bar d ON d.id = p.id),
      |rrp AS (SELECT id, CAST(sc AS DOUBLE) AS s FROM rr ORDER BY sc DESC, id LIMIT 10),
      |pins(id, b) AS (VALUES ${treePinned.zipWithIndex.map {
        case (id, i) => s"(CAST($id AS BIGINT), CAST(${treePinned.length - i} AS DOUBLE))"
      }.mkString(", ")}),
      |ex AS (SELECT id, s FROM rrp WHERE id NOT IN (SELECT id FROM pins)),
      |mx AS (SELECT coalesce(max(s), 0) AS m FROM ex),
      |pinsx AS (SELECT p.id, p.b FROM pins p JOIN documents d ON d.doc_id = p.id),
      |ru AS (SELECT id, s FROM ex UNION ALL SELECT id, m + b AS s FROM pinsx, mx),
      |fin AS (SELECT id, s, row_number() OVER (ORDER BY s DESC, id) AS rank
      |  FROM ru)
      |SELECT rank, id AS doc_id, round(s, 6) AS score
      |FROM fin WHERE rank <= 10 ORDER BY rank""".stripMargin))

  /** The linear-fusion tree: ES 8.18+'s `linear` retriever composing a
    * lexical and a vector leg with explicit weights — the score-based
    * fusion mode next to the declared rrf tree. */
  private val linTerm = "data"
  private val linQid = 3L
  private val linLexW = 0.5
  private val linVecW = 0.5
  private[graft] val declaredLinearTree: Retriever =
    RLinear(Seq(RStandard(linTerm, 50) -> linLexW, RKnn(linQid, 50) -> linVecW),
      window = 10)

  val retrieverLinearOp = QueryDef(
    "ns_search_retriever_linear",
    (s, dir) => {
      val page = compile(s, dir, declaredLinearTree)
      pageRank(page, "rank")
        .select(col("rank"), col("id").as("doc_id"),
          round(col("_score"), 6).as("score"))
        .orderBy(col("rank"))
    },
    Some(s"""WITH bar AS (SELECT doc_id AS id,
      |    concat('|', replace(trim(text), ' ', '||'), '|') AS bar FROM documents),
      |st AS (SELECT id, CAST((length(bar) - length(replace(bar, '|$linTerm|', '')))
      |    // ${linTerm.length + 2} AS BIGINT) AS tf FROM bar),
      |stp AS (SELECT id, CAST(tf AS DOUBLE) AS s FROM st
      |  WHERE tf > 0 ORDER BY tf DESC, id LIMIT 50),
      |tn AS (SELECT id, CASE WHEN max(s) OVER () > min(s) OVER ()
      |    THEN (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ())
      |    ELSE 1.0 END AS n0 FROM stp),
      |q AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = $linQid),
      |kn AS (SELECT vec_id AS id,
      |    round(list_cosine_similarity(embedding::DOUBLE[], q_emb), 6) AS s
      |  FROM embeddings, q WHERE vec_id <> $linQid),
      |knp AS (SELECT id, s FROM kn ORDER BY s DESC, id LIMIT 50),
      |vn AS (SELECT id, CASE WHEN max(s) OVER () > min(s) OVER ()
      |    THEN (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ())
      |    ELSE 1.0 END AS n1 FROM knp),
      |f AS (SELECT coalesce(tn.id, vn.id) AS id,
      |    coalesce(tn.n0, 0) * $linLexW + coalesce(vn.n1, 0) * $linVecW AS s
      |  FROM tn FULL OUTER JOIN vn ON tn.id = vn.id),
      |fin AS (SELECT id, s, row_number() OVER (ORDER BY s DESC, id) AS rank FROM f)
      |SELECT rank, id AS doc_id, round(s, 6) AS score
      |FROM fin WHERE rank <= 10 ORDER BY rank""".stripMargin))

  def entries: Seq[QueryDef] = Seq(retrieverOp, retrieverLinearOp)
}
