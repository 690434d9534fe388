package graft

import java.nio.file.{Files, Paths}

/** Regenerates SURVEY.md §2.5.5's QUERY-DSL clause audit mechanically —
  * the fourth leg of the generated-audit discipline (r18: ES|QL
  * functions, r19: ingest processors + ES|QL commands, r20: the query
  * DSL — the ns_search family was the last large surface whose
  * completeness against the public reference rested on prose).
  *
  * The reference list below is the public Elasticsearch 9.1 Query DSL
  * clause reference (docs: query-dsl), grouped as the docs group them
  * (compound / full-text / term-level / geo / shape / joining / span /
  * specialized / match-all). Query clauses have no single compiler
  * dispatch point to scrape, so the mechanical guard is the
  * ProcessorAudit discipline — key EXISTENCE: every `implemented` row
  * names the Registry keys that gate it, and a named key Registry.all
  * doesn't declare fails the generator AND QueryDslAuditSpec.
  * Rejections carry their stated reason inline; the two deprecated
  * clauses are rejected with their documented successor. */
object QueryDslAudit {

  /** (category, clause, Left(reason) | Right(gating keys), note). */
  val reference: Seq[(String, String, Either[String, Seq[String]], String)] = Seq(
    ("compound", "bool", Right(Seq("ns_search_bool")),
      "must/should/must_not/filter as per-document bitset tests, fixed clause count at plan time"),
    ("compound", "boosting", Right(Seq("ns_search_boosting")),
      "positive score minus negative_boost-damped demotion"),
    ("compound", "constant_score", Right(Seq("ns_search_constant_score")),
      "filter context: every match scores the boost (the score column is constant BY CONTRACT — constOk ledger)"),
    ("compound", "dis_max", Right(Seq("ns_search_dis_max")),
      "best-field max with tie_breaker fraction"),
    ("compound", "function_score", Right(Seq("ns_search_function_score")),
      "7.x form; script_score is the successor row below"),
    ("fulltext", "match", Right(Seq("ns_text_bm25", "ns_esql_fulltext")),
      "the analyzed OR-of-terms match with BM25 scoring; ES|QL's MATCH() compiles to the same predicate"),
    ("fulltext", "match_bool_prefix", Right(Seq("ns_search_match_bool_prefix")),
      "terms as match + trailing term as prefix"),
    ("fulltext", "match_phrase", Right(Seq("ns_text_phrase")),
      "consecutive in-order positions in ONE explode(sequence) pass"),
    ("fulltext", "match_phrase_prefix", Right(Seq("ns_search_match_phrase_prefix")),
      "phrase context + bounded last-term expansion"),
    ("fulltext", "combined_fields", Right(Seq("ns_search_combined_fields")),
      "term-centric cross-field blending"),
    ("fulltext", "multi_match", Right(Seq("ns_search_multi_match")),
      "best_fields / most_fields over the field list"),
    ("fulltext", "intervals", Right(Seq("ns_search_intervals")),
      "ordered max_gaps interval matching"),
    ("fulltext", "query_string", Right(Seq("ns_search_query_string")),
      "full recursive-descent compiler (QueryStringParser) to one boolean codegen Column"),
    ("fulltext", "simple_query_string", Right(Seq("ns_search_simple_query_string")),
      "symbol operators + | -, never-throws leniency, parsed onto query_string's AST"),
    ("term-level", "exists", Right(Seq("ns_search_exists")), ""),
    ("term-level", "fuzzy", Right(Seq("ns_text_fuzzy")),
      "edit-distance ≤ 2 over the persisted vocabulary artifact, never the corpus"),
    ("term-level", "ids", Right(Seq("ns_search_ids")),
      "pure In pushdown (PlanSpec-locked)"),
    ("term-level", "prefix", Right(Seq("ns_search_prefix")),
      "StringStartsWith reaches PushedFilters"),
    ("term-level", "range", Right(Seq("ns_search_range")), ""),
    ("term-level", "regexp", Right(Seq("ns_search_regexp")),
      "literal-prefix pushdown + RLIKE residual"),
    ("term-level", "term", Right(Seq("ns_search_term_terms")),
      "exact keyword equality — pushed row filter (r20: previously prose-implied by every key, now named and gated)"),
    ("term-level", "terms", Right(Seq("ns_search_term_terms", "ns_search_terms_lookup")),
      "inlined IN list (pushed) and the terms-LOOKUP form (broadcast left-semi)"),
    ("term-level", "terms_set", Right(Seq("ns_search_terms_set")),
      "minimum_should_match over the term set"),
    ("term-level", "wildcard", Right(Seq("ns_search_wildcard")),
      "literal-prefix pushdown + LIKE residual"),
    ("geo", "geo_bounding_box", Right(Seq("ns_geo_bounding_box")), ""),
    ("geo", "geo_distance", Right(Seq("ns_agg_geo_distance", "ns_geo_distance")),
      "exact haversine rings"),
    ("geo", "geo_grid", Right(Seq("ns_search_mvt", "ns_agg_geotile_grid",
      "ns_agg_geohash_grid", "ns_agg_geohex_grid")),
      "the tile filter of the mvt key IS the geotile geo_grid query; hash/hex cell keys in the grid-agg twins"),
    ("geo", "geo_polygon", Right(Seq("ns_geo_polygon")),
      "deprecated in ES (geo_shape subsumes it) but still served; winding-agnostic ray cast"),
    ("geo", "geo_shape", Right(Seq("ns_search_geo_shape")),
      "WKT envelope relations (intersects/within/contains/disjoint)"),
    ("shape", "shape", Right(Seq("ns_esql_geo_cartesian")),
      "the cartesian (planar) leg of the shared envelope grammar"),
    ("joining", "nested", Right(Seq("ns_search_nested")),
      "per-parent aggregation over nested docs without materializing the struct"),
    ("joining", "has_child", Right(Seq("ns_search_has_child")),
      "child-side pre-aggregation before the join"),
    ("joining", "has_parent", Right(Seq("ns_search_has_parent")),
      "left-semi keyed on the parent id"),
    ("joining", "parent_id", Right(Seq("ns_search_parent_id")),
      "has_parent with a literal parent — pure equality pushdown, no join remains (r20: closes the last absent joining row)"),
    ("span", "span_containing", Right(Seq("ns_search_span_containing")), ""),
    ("span", "span_field_masking",
      Left("single shared whitespace analysis: masking one field's " +
        "positions onto another is the identity here — there is no " +
        "second analyzer to mask across, so the clause has no distinct " +
        "semantics to gate"), ""),
    ("span", "span_first", Right(Seq("ns_search_span_first")), ""),
    ("span", "span_multi", Right(Seq("ns_search_span_multi")),
      "multi-term (prefix) span wrapper, unrolled codegen OR"),
    ("span", "span_near", Right(Seq("ns_search_span_near")), ""),
    ("span", "span_not", Right(Seq("ns_search_span_not")), ""),
    ("span", "span_or", Right(Seq("ns_search_span_or")), ""),
    ("span", "span_term", Right(Seq("ns_search_span_first")),
      "the leaf span every span_* key positions in its ONE explode(sequence) pass; span_first(span_term) is its directly-gated form"),
    ("span", "span_within", Right(Seq("ns_search_span_within")), ""),
    ("specialized", "distance_feature", Right(Seq("ns_search_distance_feature")),
      "recency boost, pivot-scaled"),
    ("specialized", "more_like_this", Right(Seq("ns_search_mlt")),
      "like-terms from the persisted term-dictionary artifact"),
    ("specialized", "percolate", Right(Seq("ns_search_percolate", "ns_search_percolate_dsl")),
      "queries-as-data: conjunctive term sets AND full query-string rules"),
    ("specialized", "knn", Right(Seq("ns_similarity_knn", "ns_similarity_knn_filtered",
      "ns_esql_knn")),
      "the knn query / section; filtered + ES|QL function forms"),
    ("specialized", "rank_feature", Right(Seq("ns_search_rank_feature")),
      "saturation function, boost-capped"),
    ("specialized", "script", Right(Seq("ns_search_script_score")),
      "filter-context scripts compile through the same painless-seam Column the engine uses everywhere (np_tls_version's processor twin); script_score is the scored, gated form"),
    ("specialized", "script_score", Right(Seq("ns_search_script_score")),
      "function_score's 7.x+ successor"),
    ("specialized", "wrapper", Right(Seq("ns_search_wrapper")),
      "base64-shipped query_string, decoded at plan time"),
    ("specialized", "pinned", Right(Seq("ns_search_pinned")),
      "editorial ids first, organic below"),
    ("specialized", "rule", Right(Seq("ns_search_retriever")),
      "the rule node of the gated retriever tree (query rules → promote)"),
    ("specialized", "semantic",
      Left("semantic_text fields are served by a HOSTED inference " +
        "endpoint (ELSER) — environmental, the §2.5.3 inference/" +
        "attachment rejection; the caller-registered inference-catalog " +
        "seam (ENRICH/RERANK/COMPLETION) is the in-engine surface"), ""),
    ("specialized", "sparse_vector", Right(Seq("ns_search_sparse_vector")),
      "sparse dot product over expansion-term postings"),
    ("specialized", "text_expansion",
      Left("deprecated in 8.15 in favor of sparse_vector — " +
        "ns_search_sparse_vector carries the semantics"), ""),
    ("specialized", "weighted_tokens", Right(Seq("ns_search_sparse_vector")),
      "tech preview; caller-supplied (token, weight) pairs are exactly the sparse_vector key's query form (integer-literal weights)"),
    ("match-all", "match_all", Right(Seq("ns_search_term_terms")),
      "the absent-query default — gated as the match_all leg (full-table count, strictly above every filtered leg)"),
    ("match-all", "match_none",
      Left("compiles to the empty relation (constant-false folds to an " +
        "empty LocalRelation in Catalyst); a permanently-empty gated key " +
        "would violate the liveness audit's rows>0 gate by design"), ""))

  /** (category, clause, status, note) — fails loudly when an implemented
    * row names a key the Registry doesn't declare. */
  def rows(): Seq[(String, String, String, String)] = {
    val declared = Registry.all.map(_.name).toSet
    reference.map {
      case (cat, name, Right(keys), note) =>
        val ghost = keys.filterNot(declared)
        if (ghost.nonEmpty) sys.error(
          s"query-dsl clause '$name' cites undeclared keys: ${ghost.mkString(", ")}")
        (cat, name, "implemented",
          keys.map(k => s"`$k`").mkString(", ") +
            (if (note.nonEmpty) s" — $note" else ""))
      case (cat, name, Left(reason), _) =>
        (cat, name, "rejected by design", reason)
    }
  }

  def main(args: Array[String]): Unit = {
    val rs = rows()
    val nImpl = rs.count(_._3 == "implemented")
    val nRej = rs.count(_._3 == "rejected by design")
    val table = s"${reference.size} public 9.1 query-DSL clauses " +
      "(compound / full-text / term-level / geo / shape / joining / span / " +
      s"specialized / match-all): $nImpl implemented (each row names its " +
      s"gating Registry keys), $nRej rejected by design (reasons inline), " +
      "0 absent. Regenerate with `sbt \"runMain graft.QueryDslAudit\"`; an " +
      "implemented row citing a key Registry.all doesn't declare fails the " +
      "generator AND QueryDslAuditSpec.\n\n" +
      "| category | clause | status | keys / reason |\n|---|---|---|---|\n" +
      rs.map { case (c, n, s, note) => s"| $c | `$n` | $s | $note |" }.mkString("\n")
    val survey = Paths.get("SURVEY.md")
    val txt = new String(Files.readAllBytes(survey), "UTF-8")
    val b = "<!-- BEGIN GENERATED QUERY DSL AUDIT (sbt \"runMain graft.QueryDslAudit\") -->"
    val e = "<!-- END GENERATED QUERY DSL AUDIT -->"
    val i0 = txt.indexOf(b)
    val i1 = txt.indexOf(e)
    require(i0 >= 0 && i1 > i0, "query-dsl-audit markers missing in SURVEY.md")
    val out = txt.substring(0, i0 + b.length) + "\n" + table + "\n" + txt.substring(i1)
    Files.write(survey, out.getBytes("UTF-8"))
    println(s"query-dsl audit: ${reference.size} reference rows " +
      s"($nImpl implemented, $nRej rejected, 0 absent) written to SURVEY.md")
  }
}
