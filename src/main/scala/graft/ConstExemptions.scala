package graft

/** The gate-liveness audit's exemption ledger (r20): output columns
  * that are INTENTIONALLY constant or all-null at the audit SFs, one
  * row per (key, column) with the reason. Merged into each QueryDef's
  * `constOk` by Registry so graft.Liveness reports them as
  * `const_exempt` instead of flagging — and every entry is guarded by
  * LivenessSpec (a row naming a key or column that doesn't exist
  * fails the suite, so the ledger can't drift from the surface).
  *
  * Classification discipline: a constant column lands HERE only when
  * the constancy is the operator's CONTRACT (constant_score's score, a
  * set-processor literal, a null-on-unparseable pin) or an honest
  * property of the shared synthetic fixture that the key does not
  * exist to vary (single-month window, saturated user×type incidence).
  * A constant that meant a DEAD OPERATOR BRANCH was fixed instead, not
  * exempted — this round: ns_lang_id (marker overlay), ns_quality_
  * classifier (keep-side overlay), ns_quality_gopher (rule-violating
  * overlays), ns_semi_anti (anti ≡ 0 → urgent cut), np_geoip twins
  * (no miss side → LEFT join + out-of-range probes), np_ingest_
  * pipeline (source_domain ≡ null → hostname fixture rows),
  * ns_stream_throttle (admitted ≡ true → 24 h window), ns_esql_rerank
  * (_score ≡ 6 → cap 5), ns_search_rank_eval (all metrics ≡ 1.0 →
  * naive ranker under evaluation). */
object ConstExemptions {

  private val nullOnUnparseable =
    "the column EXISTS to pin the null-on-unparseable contract (all-null is the assertion)"
  private val saturation =
    "generator saturation: every bucket sees the full user/type universe, so the true distinct-count ties across buckets; the value itself is oracle-hashed"

  val byKey: Map[String, Map[String, String]] = Map(
    "np_array_ops" -> Map(
      "n_tags" -> "the fixture builds fixed-length tag arrays; the array-op semantics are oracle-hashed per element"),
    "np_date_index_name" -> Map(
      "idx_month" -> "the events fixture spans a single month, so the monthly date-math index name is one value; rounding is pinned by the oracle hash"),
    "np_field_ops" -> Map(
      "event_kind" -> "the ES set processor writes a literal constant — constancy IS the processor contract",
      "event_category" -> "the ES set processor writes a literal constant — constancy IS the processor contract"),
    "np_grok_access_log" -> Map(
      "http_version" -> "every synthetic access-log line is HTTP/1.1; the capture group itself is oracle-hashed"),
    "np_uri_parts" -> Map(
      "url_host" -> "the fixture synthesizes one API host; HOST extraction is oracle-hashed"),
    "ns_agg_approx_distinct" -> Map("approx_users" -> saturation),
    "ns_agg_distinct" -> Map("nd_users" -> saturation),
    "ns_agg_sketch_partial" -> Map("est_users" -> saturation),
    "ns_agg_auto_date_histogram" -> Map(
      "iv_ms" -> "auto_date_histogram CHOOSES one interval per result — a single iv_ms is the contract"),
    "ns_agg_frequent_item_sets" -> Map(
      "support" -> "the top item-sets tie at the same support in this corpus; support arithmetic is oracle-hashed",
      "support_pct" -> "ties with `support` (same rows, scaled)"),
    "ns_agg_geohash_grid" -> Map(
      "nd_countries" -> "one synthetic point per nation: each grid cell holds exactly one country by fixture construction"),
    "ns_agg_geohex_grid" -> Map(
      "nd_countries" -> "one synthetic point per nation: each grid cell holds exactly one country by fixture construction"),
    "ns_agg_geotile_grid" -> Map(
      "nd_countries" -> "one synthetic point per nation: each grid cell holds exactly one country by fixture construction"),
    "ns_agg_nested" -> Map(
      "doc_count" -> "the two synthetic nested buckets carry equal cardinalities at the audit SFs",
      "nd_parents" -> "the two synthetic nested buckets carry equal cardinalities at the audit SFs"),
    "ns_agg_rare_terms" -> Map(
      "df" -> "rare_terms returns terms AT the rarity floor — df at the threshold is the selection predicate, not a dead column"),
    "ns_agg_string_stats" -> Map(
      "min_length" -> "event_type tokens share min/max lengths across buckets in this fixture; the stats arithmetic is oracle-hashed",
      "max_length" -> "event_type tokens share min/max lengths across buckets in this fixture; the stats arithmetic is oracle-hashed"),
    "ns_agg_time_series" -> Map(
      "n_resets" -> "the synthetic counter resets a fixed number of times per series by construction; reset detection is oracle-hashed"),
    "ns_esql_date_parse" -> Map(
      "bad" -> nullOnUnparseable,
      "age_h" -> "DATE_DIFF from a fixed anchor over the fixture's single-day stamp set"),
    "ns_esql_dates" -> Map(
      "label" -> "DATE_FORMAT(yyyy-MM) over the single-month fixture window renders one label"),
    "ns_esql_fulltext" -> Map(
      "n" -> "per-source match counts tie at some SFs; the counts are oracle-hashed"),
    "ns_esql_functions" -> Map(
      "cst" -> "function-surface demo column derived from a literal",
      "yy" -> "derived from the single-month fixture window",
      "dow" -> "derived from the fixture's fixed date",
      "doy" -> "derived from the fixture's fixed date",
      "hh" -> "derived from the fixture's fixed hour"),
    "ns_esql_geo" -> Map(
      "bad" -> nullOnUnparseable,
      "xmn" -> "bounding-box accessor of one literal envelope",
      "ymx" -> "bounding-box accessor of one literal envelope"),
    "ns_esql_geo_cartesian" -> Map("bad" -> nullOnUnparseable),
    "ns_esql_mv_expand" -> Map(
      "n" -> "every fixture multivalue array has the same length; MV_EXPAND row multiplication is oracle-hashed"),
    "ns_esql_mv_stats" -> Map("bad_ip" -> nullOnUnparseable),
    "ns_esql_stats" -> Map("users" -> saturation),
    "ns_esql_values" -> Map(
      "distinct_types" -> saturation,
      "top_types" -> saturation),
    "ns_field_caps" -> Map(
      "searchable" -> "every mapped field in this catalog is searchable — the capability flag is a catalog contract"),
    "ns_multimodal_project" -> Map(
      "mime" -> "single-codec fixture (BMP): the mime tag is the decode contract, quarantine covers the non-decodable path"),
    "ns_pivot" -> Map(
      "n_refund" -> "the generator emits no refund events; the structurally-zero column PROVES pivot's absent-category zero-fill"),
    "ns_search_constant_score" -> Map(
      "score" -> "constant_score IS the operator contract — every matched doc scores the boost"),
    "ns_search_explain" -> Map(
      "doc_id" -> "explain targets ONE document by definition; rows are its per-term breakdown",
      "dl" -> "one document → one length",
      "total" -> "one document → one total score repeated beside each term's contribution"),
    "ns_search_geo_shape" -> Map(
      "r_within" -> "the fixed query shape is one-sided for within/contains at the audit SFs; relation truth is pinned by the WKT grammar fuzz + geo specs",
      "r_contains" -> "the fixed query shape is one-sided for within/contains at the audit SFs; relation truth is pinned by the WKT grammar fuzz + geo specs"),
    "ns_search_kql" -> Map(
      "lang" -> "the projected query-language tag is a provenance constant"),
    "ns_search_query_string" -> Map(
      "lang" -> "the projected query-language tag is a provenance constant"),
    "ns_search_template" -> Map(
      "lang" -> "the projected query-language tag is a provenance constant"),
    "ns_search_match_phrase_prefix" -> Map(
      "n_hits" -> "each matched doc carries the phrase once in this corpus",
      "completions" -> "the prefix expands to a fixed completion set per the bounded-expansion contract"),
    "ns_search_mlt" -> Map(
      "n_terms" -> "more_like_this selects a fixed number of like-terms per its max_query_terms contract"),
    "ns_search_nested" -> Map(
      "nd_owners" -> "the two synthetic parent buckets carry identical owner sets",
      "min_owner" -> "the two synthetic parent buckets carry identical owner sets",
      "max_owner" -> "the two synthetic parent buckets carry identical owner sets"),
    "ns_search_prefix" -> Map(
      "n" -> "per-bucket counts tie in this corpus; counts are oracle-hashed"),
    "ns_search_regexp" -> Map(
      "n" -> "per-bucket counts tie in this corpus; counts are oracle-hashed"),
    "ns_search_wildcard" -> Map(
      "n" -> "per-bucket counts tie in this corpus; counts are oracle-hashed"),
    "ns_search_intervals" -> Map(
      "n_intervals" -> "each matched doc carries one qualifying interval in this corpus"),
    "ns_search_range" -> Map(
      "event_type" -> "the range query is scoped to one event type by its own predicate"),
    "ns_search_sparse_vector" -> Map(
      "n_terms" -> "the sparse expansion emits a fixed term count per the pruning contract"),
    "ns_search_terms_lookup" -> Map("nd_users" -> saturation),
    "ns_sql_api" -> Map(
      "u_min" -> saturation,
      "u_max" -> saturation),
    "ns_stream_sessionize" -> Map(
      "closed_by" -> "batch mode cannot fire the timeout close by construction (no watermark clock); StreamingSpec drives that branch through MemoryStream"),
    "ns_text_fuzzy" -> Map(
      "term" -> "the corpus vocabulary holds ONE term within edit distance 2 of the query; selectivity is probed separately"),
    "ns_text_phrase" -> Map(
      "n_hits" -> "each matching doc contains the phrase exactly once in this corpus"),
    "ns_transform_pivot" -> Map("nd_types" -> saturation),
    "ns_anomaly_zscore" -> Map(
      "cnt" -> "the fixed detection window yields equal sample counts per series"),
    "ns_search_parent_id" -> Map(
      "l_orderkey" -> "the parent_id query names ONE parent by definition — the key column is the selected literal"),
    "ns_search_span_within" -> Map(
      "n_within" -> "per-doc span-within counts tie at sf0.1 (vary at sf0.01); the span arithmetic is oracle-hashed"),
    "ns_esql_functions2" -> Map(
      "mnd" -> "min over a demo column constant at the audit SFs",
      "mxd" -> "max over a demo column constant at the audit SFs",
      "xmn" -> "envelope-accessor demo column over a literal shape",
      "ymn" -> "envelope-accessor demo column over a literal shape"),
    "ns_cat_indices" -> Map(
      "docs_count" -> "the synthetic catalog allocates uniform per-index doc counts",
      "docs_empty" -> "the synthetic catalog allocates uniform per-index doc counts",
      "n_langs" -> "the synthetic catalog spreads every language over every index at sf0.1"),
    "ns_search_boosting" -> Map(
      "neg" -> "the demotion leg's contribution ties across the top page at sf0.1 (varies at sf0.01); the boosting arithmetic is oracle-hashed"),
    "ns_index_rollover" -> Map(
      "generation" -> "the synthetic rollover history advances one generation per index uniformly"))
}
