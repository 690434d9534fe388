package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The OpenSearch query-DSL residue beyond ops/TextOps.scala's search
  * family: `query_string` (the Kibana search-box mini-language, via
  * QueryStringParser), `terms_set`, `dis_max`, `boosting`,
  * `significant_text`, and the `range` query.
  *
  * Determinism discipline: every score here is either an exact integer
  * (term frequencies, conjunction counts — tie-broken by doc_id) or one
  * shared double derivation over exact integer moments; IEEE +,−,×,÷
  * are exact-rounded, so identical formula text over identical longs
  * yields bit-identical doubles in both engines.
  */
object SearchExt {
  private def docs(s: SparkSession, dir: String): DataFrame =
    Par.spread(s, Tables.documents(s, dir), col("doc_id"))

  private def toks = split(trim(col("text")), " ")

  // ------------------------------------------------------------ query_string
  /** The `query_string` query — the raw Kibana search box. The FIXED
    * query below exercises every grammar production: field scoping,
    * grouping, OR, implicit AND, a quoted phrase, negation, and a
    * prefix wildcard. QueryStringParser compiles it to one boolean
    * codegen Column; keyword-field predicates (lang, source) stay
    * pushdown-eligible conjuncts.
    *
    * Scale shape: a single pruned corpus scan with one codegen filter —
    * the text-side membership tests never explode tokens or shuffle.
    * (QueryStringSpec covers the parser itself: precedence, errors,
    * every production.) */
  private[graft] val qsQuery =
    """lang:en AND (spark OR "data column") -source:src7 que*"""
  val queryStringOp = QueryDef(
    "ns_search_query_string",
    (s, dir) => {
      val pred = QueryStringParser.compile(
        QueryStringParser.parse(qsQuery),
        col("text"),
        Map("lang" -> col("lang"), "source" -> col("source")))
      docs(s, dir).filter(pred).select("doc_id", "lang", "source")
    },
    Some("""SELECT doc_id, lang, source FROM documents
      |WHERE lang = 'en'
      |  AND (list_contains(string_split(trim(text), ' '), 'spark')
      |       OR contains(concat(' ', trim(text), ' '), ' data column '))
      |  AND NOT source = 'src7'
      |  AND len(list_filter(string_split(trim(text), ' '), x -> x LIKE 'que%')) > 0
      |""".stripMargin))

  // ----------------------------------------------------- simple_query_string
  /** The `simple_query_string` query — the third and last search-box
    * language (after query_string and KQL): symbol operators (`+` AND,
    * `|` OR, `-` NOT), bare adjacency = the OR default_operator, no
    * field syntax, and the never-throws leniency contract ES documents
    * for end-user input (SimpleQueryString.parseLenient; QueryStringSpec
    * covers the degradation). The FIXED query exercises phrase,
    * grouping, `+`, `-`, `|`, adjacency-OR, and a trailing-`*` prefix.
    * Same compile discipline as query_string — the whole query is one
    * boolean codegen Column over one pruned corpus scan; the prefix
    * production's exists() HOF runs over the row's own token array. */
  private[graft] val sqsQuery = """"slow join" | (spark + -table) window que*"""
  val simpleQueryStringOp = QueryDef(
    "ns_search_simple_query_string",
    (s, dir) => {
      val node = SimpleQueryString.parseLenient(sqsQuery)
        .getOrElse(sys.error("fixed query must parse"))
      val pred = QueryStringParser.compile(node, col("text"), Map.empty)
      docs(s, dir).filter(pred).select("doc_id", "source")
    },
    Some("""WITH d AS (SELECT doc_id, source, string_split(trim(text), ' ') AS t,
      |    concat(' ', trim(text), ' ') AS pad FROM documents)
      |SELECT doc_id, source FROM d
      |WHERE contains(pad, ' slow join ')
      |   OR (list_contains(t, 'spark') AND NOT list_contains(t, 'table'))
      |   OR list_contains(t, 'window')
      |   OR len(list_filter(t, x -> x LIKE 'que%')) > 0
      |""".stripMargin))

  // -------------------------------------------------------------------- kql
  /** KQL — the Kibana Query Language, the search bar's DEFAULT syntax
    * (Lucene query_string is the opt-in alternative), so every saved
    * Kibana dashboard filter against the reference's downstream is one
    * of these. The FIXED query exercises every KqlParser production:
    * explicit case-insensitive and/or/not, a field-distributed value
    * group (source:(src2 or src4)), a RANGE comparison on a numeric
    * field (n_chars >= 400 — the production query_string lacks), a
    * quoted phrase on the text field, a bare default-field term, and a
    * trailing `*` wildcard on a keyword field.
    *
    * Scale shape: one pruned corpus scan with one boolean codegen
    * filter — the keyword equality/LIKE and numeric range conjuncts
    * stay pushdown-eligible (LikeSimplification turns the trailing-`*`
    * LIKE into StartsWith); text membership never explodes tokens or
    * shuffles. (KqlSpec covers the parser: precedence, groups, ranges,
    * wildcards, errors.) */
  private[graft] val kqlQuery =
    """lang:en and (source:(src2 or src4) or n_chars >= 400) and not text:"slow join" and spark and not source:src1*"""
  val kqlOp = QueryDef(
    "ns_search_kql",
    (s, dir) => {
      val pred = KqlParser.compile(
        KqlParser.parse(kqlQuery),
        col("text"),
        keywordFields = Map("lang" -> col("lang"), "source" -> col("source")),
        numericFields = Map("n_chars" -> col("n_chars")))
      docs(s, dir).filter(pred).select("doc_id", "lang", "source", "n_chars")
    },
    Some("""SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE lang = 'en'
      |  AND ((source = 'src2' OR source = 'src4') OR n_chars >= 400)
      |  AND NOT contains(concat(' ', trim(text), ' '), ' slow join ')
      |  AND list_contains(string_split(trim(text), ' '), 'spark')
      |  AND NOT source LIKE 'src1%'
      |""".stripMargin))

  // ----------------------------------------------------------- percolate_dsl
  /** Percolation over the FULL query-string DSL — the real ES alerting
    * shape (Watcher / Kibana alert rules register arbitrary query
    * strings, not conjunctive term sets): each registered rule is a
    * `query_string` expression compiled by QueryStringParser, and every
    * arriving document is matched against all of them. This closes the
    * gap between `ns_search_percolate` (conjunctive term sets, the
    * inverted-join formulation) and what the alerting downstream
    * actually registers; Pipeline's in-stream alert stage runs this
    * same transform per micro-batch (StreamingSpec drives a
    * phrase/negation/prefix rule set through it).
    *
    * Scale shape: the rule table is alert-rules-sized (tens to
    * hundreds), so every compiled predicate rides ONE pruned corpus
    * scan as a stack of boolean codegen Columns — no token explode, no
    * join, no shuffle at all: matches emerge from a Generate over a
    * rules-sized CASE array followed by a plain null filter. Per-row
    * cost is |rules| codegen boolean evaluations, embarrassingly
    * parallel at any SF. (The prefix production's exists() HOF runs
    * over the row's own token array, the query_string discipline.) */
  private[graft] val percolateDslRules: Seq[(Long, String)] = Seq(
    1L -> "\"slow join\"",
    2L -> "spark AND NOT slow",
    3L -> "win* OR sort",
    4L -> "lang:en AND (shuffle OR partition)")
  private[graft] def percolateDsl(
      docsDf: DataFrame,
      rules: Seq[(Long, String)] = percolateDslRules,
      keywordFields: Map[String, org.apache.spark.sql.Column] = Map(
        "lang" -> col("lang"), "source" -> col("source"))): DataFrame = {
    val matched = rules.map { case (id, qs) =>
      when(QueryStringParser.compile(
        QueryStringParser.parse(qs), col("text"), keywordFields), lit(id))
    }
    docsDf
      .select(col("doc_id"), explode(array(matched: _*)).as("rule_id"))
      .filter(col("rule_id").isNotNull)
  }
  val percolateDslOp = QueryDef(
    "ns_search_percolate_dsl",
    (s, dir) => percolateDsl(docs(s, dir)),
    Some("""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS t,
      |    concat(' ', trim(text), ' ') AS pad, lang FROM documents)
      |SELECT doc_id, CAST(1 AS BIGINT) AS rule_id FROM d
      |  WHERE contains(pad, ' slow join ')
      |UNION ALL SELECT doc_id, CAST(2 AS BIGINT) FROM d
      |  WHERE list_contains(t, 'spark') AND NOT list_contains(t, 'slow')
      |UNION ALL SELECT doc_id, CAST(3 AS BIGINT) FROM d
      |  WHERE len(list_filter(t, x -> x LIKE 'win%')) > 0 OR list_contains(t, 'sort')
      |UNION ALL SELECT doc_id, CAST(4 AS BIGINT) FROM d
      |  WHERE lang = 'en' AND (list_contains(t, 'shuffle') OR list_contains(t, 'partition'))
      |""".stripMargin))

  /** The Watcher/alerting-rule execution path END-TO-END: registered
    * query-string rules percolate against the incoming documents
    * (ns_search_percolate_dsl's compiled-rule stack — one corpus pass,
    * all rules as codegen booleans), then per-rule per-window THROTTLE
    * picks one action (the ns_stream_throttle admission semantics,
    * here cap = 1): each (rule, 100-doc window) fires at most once, on
    * its FIRST match, with the window's match count carried for the
    * alert body. This is the ledger Watcher's action queue executes —
    * the full alerting path (register → percolate → throttle → act)
    * composed from the engine's own verified pieces. */
  val watcherThrottleOp = QueryDef(
    "ns_watcher_throttle",
    (s, dir) => percolateDsl(docs(s, dir))
      .withColumn("win", expr("doc_id div 100"))
      .groupBy("rule_id", "win")
      .agg(count(lit(1)).as("n_matches"), min(col("doc_id")).as("action_doc")),
    Some("""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS t,
      |    concat(' ', trim(text), ' ') AS pad, lang FROM documents),
      |m AS (
      |  SELECT doc_id, CAST(1 AS BIGINT) AS rule_id FROM d
      |    WHERE contains(pad, ' slow join ')
      |  UNION ALL SELECT doc_id, CAST(2 AS BIGINT) FROM d
      |    WHERE list_contains(t, 'spark') AND NOT list_contains(t, 'slow')
      |  UNION ALL SELECT doc_id, CAST(3 AS BIGINT) FROM d
      |    WHERE len(list_filter(t, x -> x LIKE 'win%')) > 0 OR list_contains(t, 'sort')
      |  UNION ALL SELECT doc_id, CAST(4 AS BIGINT) FROM d
      |    WHERE lang = 'en' AND (list_contains(t, 'shuffle') OR list_contains(t, 'partition')))
      |SELECT rule_id, doc_id // 100 AS win, count(*) AS n_matches,
      |  min(doc_id) AS action_doc
      |FROM m GROUP BY 1, 2""".stripMargin))

  // --------------------------------------------------------------- terms_set
  /** The `terms_set` query: match documents containing at least
    * `minimum_should_match` of a term set — the "2 of these 4 symptoms"
    * query. Same inverted shape as percolate: corpus tokens filter
    * against the broadcast term set BEFORE the distinct (only matched
    * rows dedup), then an integer conjunction count per doc. */
  private val termsSetTerms = Seq("spark", "join", "window", "sort")
  private val termsSetMin = 2
  val termsSetOp = QueryDef(
    "ns_search_terms_set",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val terms = termsSetTerms.toDF("term")
      docs(s, dir)
        .select(col("doc_id"), explode(toks).as("tok"))
        .join(broadcast(terms), col("tok") === col("term"))
        .select("doc_id", "term").distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_matched"))
        .filter(col("n_matched") >= termsSetMin)
    },
    Some(s"""SELECT doc_id, count(DISTINCT t) AS n_matched
       |FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents)
       |WHERE t IN (${termsSetTerms.map("'" + _ + "'").mkString(", ")})
       |GROUP BY doc_id HAVING count(DISTINCT t) >= $termsSetMin""".stripMargin))

  // ----------------------------------------------------------------- dis_max
  /** The `dis_max` compound query with tie_breaker 0.5: per-clause
    * scores combine as max + 0.5·(sum − max). Clause scores here are
    * exact term frequencies, and at tie_breaker ½ the doubled score is
    * the INTEGER identity max + sum — ranking and tie-breaks are
    * exact; ÷2 happens once at emission. One token explode serves all
    * clauses (conditional sums — the filters discipline); cutoff is
    * TakeOrderedAndProject. */
  private val disMaxTerms = Seq("spark", "join", "window")
  val disMaxOp = QueryDef(
    "ns_search_dis_max",
    (s, dir) => {
      val tfCols = disMaxTerms.map(t =>
        sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"tf_$t"))
      val tf = docs(s, dir)
        .select(col("doc_id"), explode(toks).as("tok"))
        .filter(col("tok").isin(disMaxTerms: _*))
        .groupBy("doc_id")
        .agg(tfCols.head, tfCols.tail: _*)
      val sumC = disMaxTerms.map(t => col(s"tf_$t")).reduce(_ + _)
      val maxC = greatest(disMaxTerms.map(t => col(s"tf_$t")): _*)
      val outCols = col("doc_id") +: disMaxTerms.map(t => col(s"tf_$t")) :+
        round(col("score2x") / 2, 1).as("score")
      tf.withColumn("score2x", maxC + sumC)
        .orderBy(col("score2x").desc, col("doc_id"))
        .limit(10)
        .select(outCols: _*)
    },
    Some(s"""WITH tf AS (
       |  SELECT doc_id,
       |    ${disMaxTerms.map(t => s"count(*) FILTER (WHERE t = '$t') AS tf_$t").mkString(",\n    ")}
       |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents)
       |  WHERE t IN (${disMaxTerms.map("'" + _ + "'").mkString(", ")})
       |  GROUP BY doc_id)
       |SELECT doc_id, ${disMaxTerms.map(t => s"tf_$t").mkString(", ")},
       |  round((greatest(${disMaxTerms.map(t => s"tf_$t").mkString(", ")})
       |       + ${disMaxTerms.map(t => s"tf_$t").mkString(" + ")}) / 2, 1) AS score
       |FROM tf
       |ORDER BY greatest(${disMaxTerms.map(t => s"tf_$t").mkString(", ")})
       |       + ${disMaxTerms.map(t => s"tf_$t").mkString(" + ")} DESC, doc_id
       |LIMIT 10""".stripMargin))

  // ---------------------------------------------------------------- boosting
  /** The `boosting` compound query: positive matches ranked down (not
    * out) when the negative clause also matches — negative_boost 0.5.
    * In doubled units the demotion stays integer: score2x =
    * tf(positive) · (negative? 1 : 2), so ranking is exact. */
  val boostingOp = QueryDef(
    "ns_search_boosting",
    (s, dir) => {
      val d = docs(s, dir)
        .withColumn("tf_pos", size(filter(toks, t => t === "spark")).cast("long"))
        .withColumn("neg", array_contains(toks, "slow"))
        .filter(col("tf_pos") > 0)
        .withColumn("score2x", col("tf_pos") * when(col("neg"), 1L).otherwise(2L))
      d.orderBy(col("score2x").desc, col("doc_id"))
        .limit(10)
        .select(col("doc_id"), col("tf_pos"), col("neg"),
          round(col("score2x") / 2, 1).as("score"))
    },
    Some("""WITH f AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(trim(text), ' '), x -> x = 'spark')) AS tf_pos,
      |    list_contains(string_split(trim(text), ' '), 'slow') AS neg
      |  FROM documents)
      |SELECT doc_id, tf_pos, neg,
      |  round(tf_pos * (CASE WHEN neg THEN 1 ELSE 2 END) / 2, 1) AS score
      |FROM f WHERE tf_pos > 0
      |ORDER BY tf_pos * (CASE WHEN neg THEN 1 ELSE 2 END) DESC, doc_id
      |LIMIT 10""".stripMargin))

  // -------------------------------------------------------- significant_text
  /** The `significant_text` aggregation: terms OVERREPRESENTED in the
    * foreground (docs matching the query) vs the background corpus —
    * the "what words characterize the matching docs" panel, scored by
    * ES's JLH = (fgPct − bgPct) · (fgPct / bgPct).
    *
    * Scale shape: ONE corpus pass — the foreground flag rides each doc
    * into a distinct-(doc, term) explode, and fg/bg doc counts emerge
    * as conditional sums of the same aggregate (the filters
    * discipline; no second scan, no foreground self-join). Doc totals
    * are a 1-row broadcast. JLH derives once per term from exact longs
    * — identical doubles both engines — so the top-k order needs no
    * epsilon. */
  private val sigTextFgTerm = "spark"
  private val sigTextK = 10
  private val jlhDerive =
    """(CAST(fg AS DOUBLE) / fg_total - CAST(bg AS DOUBLE) / bg_total)
      | * ((CAST(fg AS DOUBLE) / fg_total) / (CAST(bg AS DOUBLE) / bg_total))""".stripMargin.replace("\n", " ")
  val significantTextOp = QueryDef(
    "ns_search_significant_text",
    (s, dir) => {
      val d = docs(s, dir)
        .withColumn("fg", array_contains(toks, sigTextFgTerm))
      val totals = d.agg(
        sum(when(col("fg"), 1L).otherwise(0L)).as("fg_total"),
        count(lit(1)).as("bg_total"))
      val counts = d
        .select(col("doc_id"), col("fg"), explode(array_distinct(toks)).as("term"))
        .groupBy("term")
        .agg(sum(when(col("fg"), 1L).otherwise(0L)).as("fg"),
          count(lit(1)).as("bg"))
        .filter(col("fg") >= 3 && col("term") =!= sigTextFgTerm)
      counts.crossJoin(broadcast(totals))
        .withColumn("jlh", expr(jlhDerive))
        .orderBy(col("jlh").desc, col("term"))
        .limit(sigTextK)
        .select(col("term"), col("fg"), col("bg"), round(col("jlh"), 6).as("score"))
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS ts,
       |    list_contains(string_split(trim(text), ' '), '$sigTextFgTerm') AS fg
       |  FROM documents),
       |t AS (SELECT CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS fg_total,
       |    count(*) AS bg_total FROM d),
       |c AS (SELECT term, CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS fg,
       |    count(*) AS bg
       |  FROM (SELECT doc_id, fg, unnest(list_distinct(ts)) AS term FROM d)
       |  GROUP BY 1
       |  HAVING sum(CASE WHEN fg THEN 1 ELSE 0 END) >= 3 AND term <> '$sigTextFgTerm')
       |SELECT term, fg, bg, round($jlhDerive, 6) AS score
       |FROM c, t
       |ORDER BY $jlhDerive DESC, term LIMIT $sigTextK""".stripMargin))

  // ------------------------------------------------------------------- range
  /** The `range` query over a numeric field, inside the time window
    * every real search request carries — the one DSL query whose whole
    * body is scan-native: the numeric bounds and keyword term reach
    * PushedFilters (row-group stats skip non-overlapping parquet
    * chunks), while the time window hits the date-partitioned twin's
    * `dt` partition column and prunes whole day partitions at
    * file-listing time (both PlanSpec-locked). Returns matching
    * documents, the filter-context shape. */
  val rangeQueryOp = QueryDef(
    "ns_search_range",
    (s, dir) => Tables.eventsDt(s, dir)
      .filter(col("dt") >= lit(java.sql.Date.valueOf("2024-01-08")) &&
        col("dt") <= lit(java.sql.Date.valueOf("2024-01-21")) &&
        col("value") >= 100.0 && col("value") < 250.0 &&
        col("event_type") === "view")
      .select("event_id", "event_type", "value"),
    Some("""SELECT event_id, event_type, value FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-22 00:00:00'
      |  AND value >= 100.0 AND value < 250.0 AND event_type = 'view'""".stripMargin))

  // ------------------------------------------------------------- span_first
  /** The `span_first` query: the term must occur within the first N
    * token positions — "title-ish" matches over untyped text. One
    * codegen array_position per row (first occurrence), no explode,
    * no shuffle before the page. */
  private val spanFirstN = 10
  val spanFirstOp = QueryDef(
    "ns_search_span_first",
    (s, dir) => docs(s, dir)
      .withColumn("first_pos", array_position(toks, "spark"))
      .filter(col("first_pos") > 0 && col("first_pos") <= spanFirstN)
      .select("doc_id", "first_pos"),
    Some(s"""SELECT doc_id, CAST(list_position(string_split(trim(text), ' '), 'spark') AS BIGINT) AS first_pos
       |FROM documents
       |WHERE list_position(string_split(trim(text), ' '), 'spark') BETWEEN 1 AND $spanFirstN""".stripMargin))

  // ------------------------------------------------------------------ exists
  /** The `exists` query: documents where a field is present — over the
    * reference's json-or-text message mix (Synth.msgSql, the F4
    * fixture), "which events actually parsed as a JSON object carrying
    * `k`". Plain-text and scalar messages fail the path extraction to
    * NULL (main.go:492–510's parse-else-wrap), so exists == the
    * extracted path is non-null. One codegen json-path per row
    * (GetJsonObject), no explode, no shuffle. */
  val existsOp = QueryDef(
    "ns_search_exists",
    // Par.spread (r21): the per-row json-path probe was single-task
    (s, dir) => Par.spread(s, Synth.eventsWithMsg(s, dir), col("event_id"))
      .withColumn("k_val", get_json_object(col("msg"), "$.k"))
      .filter(col("k_val").isNotNull)
      .select("event_id", "k_val"),
    Some(Synth.withMsg(
      """SELECT event_id, k_val FROM (
        |  SELECT event_id,
        |    CASE WHEN json_valid(msg) THEN json_extract_string(msg, '$.k') END AS k_val
        |  FROM ev)
        |WHERE k_val IS NOT NULL""".stripMargin)))

  // --------------------------------------------------------------------- ids
  /** The `ids` query: fetch documents by explicit id list — the one DSL
    * query that is PURE pushdown: the In predicate reaches
    * PushedFilters, so parquet row-group stats (and at real scale,
    * bucket/partition pruning on the id layout) skip everything else.
    * PlanSpec locks the pushdown. */
  private val idsList = Seq(3L, 17L, 101L, 255L, 400L)
  val idsOp = QueryDef(
    "ns_search_ids",
    (s, dir) => Tables.documents(s, dir)
      .filter(col("doc_id").isin(idsList: _*))
      .select("doc_id", "lang", "source"),
    Some(s"""SELECT doc_id, lang, source FROM documents
       |WHERE doc_id IN (${idsList.mkString(", ")})""".stripMargin))

  // ---------------------------------------------------- term / terms / match_all
  /** The three foundational term-level clauses of the query DSL in one
    * gated key (r20 §2.5.5 query-DSL audit — these rows were
    * prose-implied by every other key but had no NAMED gate): `term`
    * (exact keyword equality), `terms` (the inlined IN list —
    * terms-LOOKUP is its own key), and `match_all` (the absent-query
    * default every request-body search starts from). Each clause is
    * its own pushed row filter — equality and In reach PushedFilters —
    * and the three counts collapse map-side, so the gate also pins the
    * relative-cardinality law term ≤ terms ≤ match_all can violate
    * only if a pushdown drops rows. */
  val termTermsOp = QueryDef(
    "ns_search_term_terms",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      def leg(name: String, d: org.apache.spark.sql.DataFrame) =
        d.agg(count(lit(1)).as("n")).select(lit(name).as("clause"), col("n"))
      leg("term", ev.filter(col("event_type") === "purchase"))
        .unionAll(leg("terms", ev.filter(col("event_type").isin("signup", "error"))))
        .unionAll(leg("match_all", ev))
    },
    Some("""SELECT 'term' AS clause, count(*) AS n FROM events WHERE event_type = 'purchase'
       |UNION ALL
       |SELECT 'terms', count(*) FROM events WHERE event_type IN ('signup', 'error')
       |UNION ALL
       |SELECT 'match_all', count(*) FROM events""".stripMargin),
    // every clause leg selects a non-empty, PROPER subset (or, for
    // match_all, the whole table) — a dropped pushdown can't hide
    liveness = Seq(
      "three_live_legs_with_strict_ordering" ->
        ("SELECT count(*) = 3 AND min(n) > 0 AND " +
          "max(CASE WHEN clause = 'term' THEN n END) < max(CASE WHEN clause = 'terms' THEN n END) AND " +
          "max(CASE WHEN clause = 'terms' THEN n END) < max(CASE WHEN clause = 'match_all' THEN n END) FROM r")))

  // ---------------------------------------------------------------- parent_id
  /** The `parent_id` join-field query: children of ONE named parent —
    * has_parent with the parent side reduced to a literal id, which
    * makes it pure pushdown: the equality predicate reaches the child
    * scan's PushedFilters and no join remains at all (the ids-query
    * discipline applied to the join key). */
  private val parentIdKey = 7L
  val parentIdOp = QueryDef(
    "ns_search_parent_id",
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_orderkey") === parentIdKey)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.Exact.cents(col("l_quantity")).as("qty_c")),
    Some(s"""SELECT l_orderkey, l_linenumber,
       |  CAST(round(l_quantity * 100, 0) AS BIGINT) AS qty_c
       |FROM lineitem WHERE l_orderkey = $parentIdKey""".stripMargin),
    liveness = Seq(
      "named_parent_has_children" -> "SELECT count(*) >= 1 FROM r"))

  // ------------------------------------------------------------ terms lookup
  /** The `terms` query in LOOKUP form: the term set is fetched from
    * another index's document (ES terms-lookup) instead of inlined —
    * here "users in the BUILDING segment" from the customer table
    * gating the event stream. The at-scale shape is a broadcast
    * LEFT SEMI join: the lookup side is a small dim (one segment), the
    * fact side streams through probe-only — no shuffle, no dedup of
    * the fact stream, and the semi join never multiplies rows. */
  val termsLookupOp = QueryDef(
    "ns_search_terms_lookup",
    (s, dir) => {
      val lookup = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("user_id"))
      Tables.events(s, dir)
        .join(broadcast(lookup), Seq("user_id"), "left_semi")
        .groupBy("event_type")
        .agg(count(lit(1)).as("doc_count"),
          countDistinct(col("user_id")).as("nd_users"))
    },
    Some("""SELECT event_type, count(*) AS doc_count,
      |  count(DISTINCT user_id) AS nd_users
      |FROM events
      |WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY 1""".stripMargin))

  // ------------------------------------------------------------ rank_feature
  /** The `rank_feature` query with the saturation function — score =
    * f / (f + pivot) over a numeric feature field (doc length here),
    * ES's "boost by popularity/length without letting it dominate".
    * The score is ONE shared derivation over exact longs (+ and ÷ are
    * IEEE exact-rounded — bit-identical both engines), monotone in
    * n_chars so ranking is exact; doc_id breaks length ties. Cutoff is
    * TakeOrderedAndProject over a 2-column pruned scan. */
  private val rankFeaturePivot = 500L
  private val rankFeatureK = 15
  val rankFeatureOp = QueryDef(
    "ns_search_rank_feature",
    (s, dir) => Tables.documents(s, dir)
      .withColumn("score",
        expr(s"CAST(n_chars AS DOUBLE) / (n_chars + $rankFeaturePivot)"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(rankFeatureK)
      .select(col("doc_id"), col("n_chars"), round(col("score"), 6).as("score")),
    Some(s"""SELECT doc_id, n_chars,
       |  round(CAST(n_chars AS DOUBLE) / (n_chars + $rankFeaturePivot), 6) AS score
       |FROM documents
       |ORDER BY n_chars DESC, doc_id LIMIT $rankFeatureK""".stripMargin))

  // --------------------------------------------------------------- intervals
  /** The `intervals` query (all_of, ordered, max_gaps) — the structured
    * proximity query beyond phrase/span_near: `data` then `column` then
    * `scan`, each within 4 gap tokens of the previous match. Runs on
    * the ns_text_phrase positional-span machinery: one explode over
    * anchor positions, then each chain step is ONE codegen
    * array_position over a bounded G-token slice — no positional
    * self-join, no per-term explode, corpus read once; gap windows are
    * constant so per-row cost is O(terms · G) at any SF. */
  private val intervalsGap = 5 // max_gaps 4 → window of 5 tokens
  val intervalsOp = QueryDef(
    "ns_search_intervals",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), col("t"),
        explode(when(size(col("t")) >= 3, sequence(lit(1), size(col("t"))))).as("i"))
      // slice+array_join keeps the anchor test null-tolerant (the
      // match_phrase_prefix constraint-propagation discipline)
      .filter(expr("array_join(slice(t, i, 1), '') = 'data'"))
      .withColumn("pb", expr(s"array_position(slice(t, i + 1, $intervalsGap), 'column')"))
      .filter(col("pb") > 0)
      .withColumn("pc",
        expr(s"array_position(slice(t, CAST(i + pb + 1 AS INT), $intervalsGap), 'scan')"))
      .filter(col("pc") > 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_intervals")),
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       |e AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
       |  FROM t WHERE len(t) >= 3),
       |a AS (SELECT doc_id, t, i,
       |    coalesce(list_position(t[i+1:i+$intervalsGap], 'column'), 0) AS pb
       |  FROM e WHERE t[i] = 'data'),
       |b AS (SELECT doc_id,
       |    coalesce(list_position(t[CAST(i+pb+1 AS INT):CAST(i+pb+$intervalsGap AS INT)], 'scan'), 0) AS pc
       |  FROM a WHERE pb > 0)
       |SELECT doc_id, count(*) AS n_intervals FROM b WHERE pc > 0
       |GROUP BY 1""".stripMargin))

  // ------------------------------------------------------------------ pinned
  /** The `pinned` query: editorially promoted ids surface first, in
    * their given order, above the organic ranking — the "sponsored
    * results" shape. The inline id list compiles to a CASE position
    * (no lookup structure needed), organic score is the exact term
    * frequency; the page is one TakeOrderedAndProject over a pruned
    * scan — promoted-first is just a null-last sort key. */
  private val pinnedIds = Seq(42L, 7L, 250L)
  val pinnedOp = QueryDef(
    "ns_search_pinned",
    (s, dir) => {
      val pinPos = pinnedIds.zipWithIndex.foldRight(lit(null).cast("long")) {
        case ((id, i), other) => when(col("doc_id") === id, (i + 1).toLong).otherwise(other)
      }
      docs(s, dir)
        .withColumn("tf", size(filter(toks, t => t === "spark")).cast("long"))
        .withColumn("pin_pos", pinPos)
        .filter(col("pin_pos").isNotNull || col("tf") > 0)
        .orderBy(col("pin_pos").asc_nulls_last, col("tf").desc, col("doc_id"))
        .limit(10)
        .select("doc_id", "pin_pos", "tf")
    },
    Some(s"""SELECT doc_id, pin_pos, tf FROM (
       |  SELECT doc_id,
       |    CASE ${pinnedIds.zipWithIndex.map { case (id, i) =>
               s"WHEN doc_id = $id THEN ${i + 1}" }.mkString(" ")} END AS pin_pos,
       |    len(list_filter(string_split(trim(text), ' '), x -> x = 'spark')) AS tf
       |  FROM documents)
       |WHERE pin_pos IS NOT NULL OR tf > 0
       |ORDER BY (pin_pos IS NULL), pin_pos, tf DESC, doc_id
       |LIMIT 10""".stripMargin))

  // -------------------------------------------------------- distance_feature
  /** The `distance_feature` query — "boost by recency": score =
    * boost·pivot/(pivot + |origin − ts|) decays with distance from a
    * fixed time origin. The distance is an exact epoch-ms long, the
    * score one shared derivation over it (monotone, so ranking sorts
    * the LONG — no float in the order), ties by event_id; cutoff is
    * TakeOrderedAndProject over a pruned scan. The same shape serves
    * geo origins with the haversine machinery. */
  private val dfOriginSql = "unix_millis(TIMESTAMP '2024-03-01 00:00:00')"
  private val dfPivotMs = 7L * 86400000L
  private val dfBoost = 2.0
  private val dfK = 15
  val distanceFeatureOp = QueryDef(
    "ns_search_distance_feature",
    (s, dir) => Tables.events(s, dir)
      .withColumn("dist_ms", abs(col("ts_ms") - expr(dfOriginSql)))
      .orderBy(col("dist_ms"), col("event_id"))
      .limit(dfK)
      .select(col("event_id"), col("dist_ms"),
        round(lit(dfBoost) * lit(dfPivotMs.toDouble) / (lit(dfPivotMs.toDouble) + col("dist_ms")), 6)
          .as("score")),
    Some(s"""SELECT event_id, dist_ms,
       |  round($dfBoost * ${dfPivotMs.toDouble} / (${dfPivotMs.toDouble} + dist_ms), 6) AS score
       |FROM (SELECT event_id,
       |    abs(epoch_ms(ts) - epoch_ms(TIMESTAMP '2024-03-01 00:00:00')) AS dist_ms
       |  FROM events)
       |ORDER BY dist_ms, event_id LIMIT $dfK""".stripMargin))

  // ---------------------------------------------------------- constant_score
  /** The `constant_score` query: a filter-context wrapper whose every
    * hit scores the fixed boost — "match these, don't rank them". Both
    * keyword predicates are stored-column equalities, so the whole
    * query body reaches PushedFilters (the range-query discipline). */
  val constantScoreOp = QueryDef(
    "ns_search_constant_score",
    (s, dir) => Tables.documents(s, dir)
      .filter(col("lang") === "en" && col("source") === "src3")
      .select(col("doc_id"), lit(1.2).as("score")),
    Some("""SELECT doc_id, CAST(1.2 AS DOUBLE) AS score FROM documents
      |WHERE lang = 'en' AND source = 'src3'""".stripMargin))

  // --------------------------------------------------------------- has_child
  /** The `has_child` query with `min_children`: return PARENT documents
    * having at least N children matching the child query — ES's
    * join-field relation ("orders with ≥ 3 returned lines"). The
    * at-scale shape is child-side PRE-AGGREGATION: the child predicate
    * filters a pruned 2-column scan, counts collapse per parent key
    * BEFORE the join (shuffle carries one row per qualifying parent,
    * not one per child), and the HAVING prunes again pre-join. AQE
    * co-partitions the two sides on the key. */
  private val hasChildMin = 3
  val hasChildOp = QueryDef(
    "ns_search_has_child",
    (s, dir) => {
      val matching = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_matching"))
        .filter(col("n_matching") >= hasChildMin)
      Tables.orders(s, dir)
        .join(matching, col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "n_matching")
    },
    Some(s"""SELECT o_orderkey, o_orderstatus, o_orderpriority, n_matching
       |FROM orders JOIN (
       |  SELECT l_orderkey, count(*) AS n_matching FROM lineitem
       |  WHERE l_returnflag = 'R' GROUP BY 1 HAVING count(*) >= $hasChildMin) c
       |ON o_orderkey = l_orderkey""".stripMargin))

  // -------------------------------------------------------------- has_parent
  /** The `has_parent` query: return CHILD documents whose parent matches
    * — "lines of urgent, still-open orders". A LEFT SEMI join keyed on
    * the parent id: the child stream probes and never multiplies, the
    * parent side carries only the key after its pushed filters. At real
    * scale both sides are big, so this is the shuffled semi join AQE
    * plans (broadcast only if the filtered parent side collapses). */
  val hasParentOp = QueryDef(
    "ns_search_has_parent",
    (s, dir) => {
      val parents = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      Tables.lineitem(s, dir)
        .join(parents, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F')""".stripMargin))

  // ------------------------------------------------------- match_bool_prefix
  /** The `match_bool_prefix` query — the search-as-you-type backbone:
    * every term matches as a full token except the LAST, which matches
    * as a prefix (the user is mid-word). Compiles to bool-should
    * conditional counts: score = tf(complete terms) + tf(prefix), all
    * exact longs, one codegen pass over the corpus (no explode, no
    * shuffle before the TakeOrderedAndProject page). */
  private val mbpTerm = "data"
  private val mbpPrefix = "col"
  val matchBoolPrefixOp = QueryDef(
    "ns_search_match_bool_prefix",
    (s, dir) => docs(s, dir)
      .withColumn("tf_term", size(filter(toks, t => t === mbpTerm)).cast("long"))
      .withColumn("tf_prefix",
        size(filter(toks, t => t.startsWith(mbpPrefix))).cast("long"))
      .filter(col("tf_term") > 0 || col("tf_prefix") > 0)
      .withColumn("score", col("tf_term") + col("tf_prefix"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
      .select("doc_id", "tf_term", "tf_prefix", "score"),
    Some(s"""SELECT doc_id, tf_term, tf_prefix, tf_term + tf_prefix AS score
       |FROM (SELECT doc_id,
       |    len(list_filter(string_split(trim(text), ' '), x -> x = '$mbpTerm')) AS tf_term,
       |    len(list_filter(string_split(trim(text), ' '), x -> x LIKE '$mbpPrefix%')) AS tf_prefix
       |  FROM documents)
       |WHERE tf_term > 0 OR tf_prefix > 0
       |ORDER BY tf_term + tf_prefix DESC, doc_id
       |LIMIT 10""".stripMargin))

  // ----------------------------------------------------------------- rescore
  /** The `rescore` phase: re-rank only the top `window_size` hits of the
    * cheap first pass with a costlier secondary query —
    * query_weight 1, rescore_query_weight 2, score_mode total. The
    * two-phase discipline is the at-scale point: the secondary scorer
    * (at 100 TB: a heavier model or proximity pass) touches exactly
    * `window_size` rows per shard page regardless of corpus size. Both
    * passes tie-break on doc_id, so the window membership — not just
    * its order — is deterministic in both engines. */
  private val rescoreWindow = 50
  val rescoreOp = QueryDef(
    "ns_search_rescore",
    (s, dir) => {
      val first = docs(s, dir)
        .withColumn("tf_primary", size(filter(toks, t => t === "spark")).cast("long"))
        .filter(col("tf_primary") > 0)
        .orderBy(col("tf_primary").desc, col("doc_id"))
        .limit(rescoreWindow)
      first
        .withColumn("tf_rescore", size(filter(toks, t => t === "data")).cast("long"))
        .withColumn("score", col("tf_primary") + lit(2L) * col("tf_rescore"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
        .select("doc_id", "tf_primary", "tf_rescore", "score")
    },
    Some(s"""WITH first AS (
       |  SELECT doc_id, text,
       |    len(list_filter(string_split(trim(text), ' '), x -> x = 'spark')) AS tf_primary
       |  FROM documents
       |  WHERE len(list_filter(string_split(trim(text), ' '), x -> x = 'spark')) > 0
       |  ORDER BY tf_primary DESC, doc_id
       |  LIMIT $rescoreWindow)
       |SELECT doc_id, tf_primary, tf_rescore, tf_primary + 2 * tf_rescore AS score
       |FROM (SELECT doc_id, tf_primary,
       |    len(list_filter(string_split(trim(text), ' '), x -> x = 'data')) AS tf_rescore
       |  FROM first)
       |ORDER BY score DESC, doc_id
       |LIMIT 10""".stripMargin))

  // ----------------------------------------------------------- sparse_vector
  /** The `sparse_vector` query — ES 8's ELSER-style learned sparse
    * retrieval: the query expands to weighted terms, each document
    * carries sparse term weights, and the score is the sparse dot
    * product Σ q_w · d_w over matching terms. Document weights here are
    * exact term frequencies (the deterministic stand-in for model
    * weights — the plan shape is identical); query weights are integer
    * literals, so every score is an exact long.
    *
    * Scale shape: the postings discipline — the corpus token explode
    * filters against the broadcast expansion BEFORE any aggregation
    * (only expansion-term postings survive the map side), per-doc
    * weighted sums ride one aggregate, cutoff is a top-k heap. No
    * per-term scan, no vocabulary shuffle. */
  private val svExpansion: Seq[(String, Long)] =
    Seq("spark" -> 5L, "data" -> 3L, "column" -> 2L, "join" -> 2L)
  val sparseVectorOp = QueryDef(
    "ns_search_sparse_vector",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val exp = svExpansion.toDF("term", "qw")
      docs(s, dir)
        .select(col("doc_id"), explode(toks).as("tok"))
        .join(broadcast(exp), col("tok") === col("term"))
        .groupBy("doc_id")
        .agg(sum(col("qw")).as("score"),
          countDistinct(col("term")).as("n_terms"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
        .select("doc_id", "n_terms", "score")
    },
    Some(s"""WITH exp(term, qw) AS (VALUES ${svExpansion.map { case (t, w) => s"('$t', ${w}::BIGINT)" }.mkString(", ")}),
       |p AS (SELECT doc_id, tok FROM
       |  (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents)),
       |sc AS (SELECT doc_id, CAST(sum(qw) AS BIGINT) AS score,
       |    count(DISTINCT term) AS n_terms
       |  FROM p JOIN exp ON tok = term
       |  GROUP BY 1)
       |SELECT doc_id, n_terms, score FROM sc
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin))

  // ------------------------------------------------------------ eql sequence
  /** The EQL `sequence` query — Elastic's event-correlation language:
    * `sequence by user_id with maxspan=1h [event_type=="view"]
    * [event_type=="purchase"]`. Each purchase pairs with the user's
    * MOST RECENT prior view inside the span (the funnel/attribution
    * primitive SIEM rules are built from).
    *
    * Scale shape: ONE shuffle by the join key, then a per-user running
    * max over (CASE view THEN ts) with the current row excluded — no
    * self-join of the event stream, no per-pair explosion; the window
    * frame is the streaming-state analog of ns_stream_join's
    * watermarked buffer. ts is exact epoch-ms; ties order by event_id
    * in both engines, so frame membership is deterministic. */
  private val eqlMaxspanMs = 3600000L // maxspan=1h
  val eqlSequenceOp = QueryDef(
    "ns_eql_sequence",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ms"))
        .withColumn("last_view_ts",
          max(when(col("event_type") === "view", col("ts_ms"))).over(w))
        .filter(col("event_type") === "purchase" &&
          col("last_view_ts").isNotNull &&
          col("ts_ms") - col("last_view_ts") <= eqlMaxspanMs)
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("last_view_ts"), col("ts_ms").as("purchase_ts"),
          (col("ts_ms") - col("last_view_ts")).as("gap_ms"))
    },
    Some(s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
       |m AS (SELECT user_id, event_id, event_type, ts_ms,
       |    max(CASE WHEN event_type = 'view' THEN ts_ms END) OVER (
       |      PARTITION BY user_id ORDER BY ts_ms, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
       |  FROM e)
       |SELECT user_id, event_id AS purchase_id, last_view_ts, ts_ms AS purchase_ts,
       |  ts_ms - last_view_ts AS gap_ms
       |FROM m
       |WHERE event_type = 'purchase' AND last_view_ts IS NOT NULL
       |  AND ts_ms - last_view_ts <= $eqlMaxspanMs""".stripMargin))

  // ---------------------------------------------------------------- msearch
  /** The `_msearch` API: N independent searches submitted as one
    * request. ES executes them as N separate query phases; the whole
    * point of owning the engine is that N FIXED queries over one index
    * are ONE corpus scan — every predicate compiles into the same
    * codegen pass, each row emits the (bounded, ≤ N) list of query ids
    * it matches, and per-query hit counts + top-3 hits come out of one
    * aggregation. At 100 TB this turns a dashboard's N-panel fan-out
    * from N scans into one.
    *
    * Each returned row is one ranked hit: (label, n_hits, rank, doc_id,
    * n_chars), rank by (n_chars DESC, doc_id) through the bounded
    * TopKByScoreAgg — k·tasks rows move per query, never a global
    * sort. */
  private val msearchK = 3
  private val msearchDefs: Seq[(String, (SparkSession, String) => Column, String)] = Seq(
    ("q_spark",
      (_, _) => array_contains(toks, "spark"),
      "list_contains(t, 'spark')"),
    ("q_phrase",
      (_, _) => concat(lit(" "), trim(col("text")), lit(" ")).contains(" slow join "),
      "contains(pad, ' slow join ')"),
    ("q_long_en",
      (_, _) => col("lang") === "en" && col("n_chars") >= 400,
      "lang = 'en' AND n_chars >= 400"),
    // a token starts with "que" iff " que" occurs in the space-padded
    // text — pure codegen StringContains, no ArrayExists HOF fallback
    ("q_prefix",
      (_, _) => concat(lit(" "), trim(col("text"))).contains(" que"),
      "len(list_filter(t, x -> x LIKE 'que%')) > 0"))
  val msearchOp = QueryDef(
    "ns_search_msearch",
    (s, dir) => {
      // exploded conditional literals, NOT a filter() HOF: ArrayFilter
      // is CodegenFallback and would run the whole corpus stage
      // interpreted — explode the (≤ N, null-padded) label array inside
      // codegen and drop the null slots after the Generate instead
      val labels = array(msearchDefs.map { case (l, p, _) => when(p(s, dir), lit(l)) }: _*)
      docs(s, dir)
        .select(col("doc_id"), col("n_chars"), explode(labels).as("label"))
        .filter(col("label").isNotNull)
        .groupBy("label")
        .agg(count(lit(1)).as("n_hits"),
          graft.expr.VecFunctions.topk_by_score(
            col("doc_id"), col("n_chars").cast("double"), msearchK).as("top"))
        .select(col("label"), col("n_hits"), posexplode(col("top")))
        .select(col("label"), col("n_hits"),
          (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("doc_id"),
          col("col.score").cast("long").as("n_chars"))
    },
    Some(s"""WITH d AS (SELECT doc_id, n_chars, lang,
       |    string_split(trim(text), ' ') AS t,
       |    concat(' ', trim(text), ' ') AS pad FROM documents),
       |m AS (${msearchDefs.map { case (l, _, sql) =>
             s"SELECT '$l' AS label, doc_id, n_chars FROM d WHERE $sql" }
             .mkString("\n  UNION ALL ")}),
       |r AS (SELECT label, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY label ORDER BY n_chars DESC, doc_id) AS rk,
       |    count(*) OVER (PARTITION BY label) AS n_hits
       |  FROM m)
       |SELECT label, n_hits, CAST(rk AS BIGINT) AS rank, doc_id, n_chars
       |FROM r WHERE rk <= $msearchK""".stripMargin))

  // ----------------------------------------------------------- request body
  /** The full `_search` REQUEST BODY composed end-to-end — the shape
    * every Kibana dashboard request takes: one request carrying
    * query + aggs + sort + from/size + highlight, answered in ES's own
    * two phases.
    *
    * Query phase — ONE corpus scan: the bool query's keyword conjunct
    * (`lang = 'en'`) pushes to the scan, the match conjunct is one
    * codegen padded-contains, and a single grouped aggregate computes
    * BOTH the terms-agg buckets (count + sum for the avg sub-agg) and
    * the per-bucket bounded page candidates (TopKByScoreAgg, k =
    * from+size). The aggs branch and the hits branch both consume that
    * aggregate, and runtime stage reuse collapses their shared
    * scan+shuffle to one executed pass (PlanSpec-locked) — msearch's
    * one-scan discipline with heterogeneous consumers. The global page
    * is the bounded re-fusion of bucket candidates: buckets×(from+size)
    * rows, driver-sized; sort = the request's (n_chars DESC, doc_id)
    * through the bounded aggregate, never a corpus sort; from/size cuts
    * rank ∈ (from, from+size].
    *
    * Fetch phase — highlight snippets are assembled ONLY for the page:
    * a broadcast probe of ≤ from+size ids into a map-only column-pruned
    * second pass (ES fetches page documents from the doc store the same
    * way; at 100 TB this pass is where a row-lookup store slots in). */
  private val srchTerm = "spark"
  private val srchFrom = 5
  private val srchSize = 10
  private val srchCtx = 3
  val searchBodyOp = QueryDef(
    "ns_search_request_body",
    (s, dir) => {
      val k = srchFrom + srchSize
      val pad = concat(lit(" "), trim(col("text")), lit(" "))
      val matched = docs(s, dir)
        .filter(col("lang") === "en" && pad.contains(s" $srchTerm "))
      val grouped = matched.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        graft.expr.VecFunctions.topk_by_score(
          col("doc_id"), col("n_chars").cast("double"), k).as("cand"))
      val nullL = lit(null).cast("long")
      val nullS = lit(null).cast("string")
      val nullD = lit(null).cast("double")
      val aggRows = grouped.select(
        lit("aggs").as("section"), col("source").as("key"),
        col("n_docs"),
        round(col("sum_chars").cast("double") / col("n_docs"), 6).as("avg_chars"),
        nullL.as("rank"), nullL.as("doc_id"), nullL.as("n_chars"),
        nullS.as("snippet"))
      val page = grouped
        .select(explode(col("cand")).as("c"))
        .agg(graft.expr.VecFunctions.topk_by_score(
          col("c.id"), col("c.score"), k).as("top"))
        .select(posexplode(col("top")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("doc_id"))
        .filter(col("rank") > srchFrom)
      val hitRows = docs(s, dir)
        .join(broadcast(page), "doc_id")
        .withColumn("t", split(trim(col("text")), " "))
        .withColumn("i", array_position(col("t"), srchTerm))
        .select(lit("hits").as("section"), nullS.as("key"),
          nullL.as("n_docs"), nullD.as("avg_chars"),
          col("rank"), col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          expr(s"""array_join(transform(
                  |  sequence(greatest(i - $srchCtx, 1L), least(i + $srchCtx, CAST(size(t) AS BIGINT))),
                  |  j -> IF(j = i, concat('<em>', element_at(t, CAST(j AS INT)), '</em>'),
                  |          element_at(t, CAST(j AS INT)))), ' ')""".stripMargin).as("snippet"))
      aggRows.unionByName(hitRows)
    },
    Some(s"""WITH m AS (SELECT doc_id, source, n_chars, text FROM documents
      |  WHERE lang = 'en'
      |    AND contains(concat(' ', trim(text), ' '), ' $srchTerm ')),
      |a AS (SELECT 'aggs' AS section, source AS key, count(*) AS n_docs,
      |    round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
      |    CAST(NULL AS BIGINT) AS rank, CAST(NULL AS BIGINT) AS doc_id,
      |    CAST(NULL AS BIGINT) AS n_chars, CAST(NULL AS VARCHAR) AS snippet
      |  FROM m GROUP BY source),
      |p AS (SELECT doc_id, n_chars, text,
      |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank FROM m),
      |pg AS (SELECT rank, doc_id, n_chars,
      |    string_split(trim(text), ' ') AS t,
      |    list_position(string_split(trim(text), ' '), '$srchTerm') AS i
      |  FROM p WHERE rank > $srchFrom AND rank <= ${srchFrom + srchSize}),
      |h AS (SELECT 'hits' AS section, CAST(NULL AS VARCHAR) AS key,
      |    CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS DOUBLE) AS avg_chars,
      |    rank, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      |    array_to_string(list_transform(
      |      generate_series(greatest(i - $srchCtx, 1), least(i + $srchCtx, len(t))),
      |      j -> CASE WHEN j = i THEN '<em>' || t[j] || '</em>' ELSE t[j] END), ' ') AS snippet
      |  FROM pg)
      |SELECT * FROM a UNION ALL SELECT * FROM h""".stripMargin))

  // ------------------------------------------------------------ post_filter
  /** `post_filter` — faceted navigation's load-bearing subtlety and the
    * most commonly misread part of the `_search` body: the post_filter
    * narrows the HITS only, while aggregations keep computing over the
    * full query scope (an e-commerce facet panel shows counts for every
    * brand while the hit list honors the clicked brand).
    *
    * One-scan shape (the request-body discipline, extended): the query
    * scope groups by (facet key × post-filter flag) in ONE grouped
    * aggregate carrying counts and per-group bounded page candidates;
    * the aggs branch re-aggregates the tiny bucket table over both
    * flags (full query scope), the hits branch keeps only flag=true
    * candidates — both branches share the scan+shuffle via runtime
    * stage reuse. */
  private val pfTerm = "merge"
  private val pfSource = "src1"
  private val pfSize = 10
  val postFilterOp = QueryDef(
    "ns_search_post_filter",
    (s, dir) => {
      val pad = concat(lit(" "), trim(col("text")), lit(" "))
      val matched = docs(s, dir)
        .filter(pad.contains(s" $pfTerm "))
      // ONE grouped aggregate serves both branches: the facet counts
      // stay on the full query scope, while the page candidates gate on
      // the post_filter INSIDE the aggregate (TopKByScoreAgg skips null
      // ids) — a filter on a grouping key would instead be pushed below
      // the aggregate into the scan, splitting the subtree and
      // defeating the stage reuse. Each bucket also reports its
      // post-filtered count (ES's filtered sub-agg pattern) and a chars
      // sum — and, load-bearing for the reuse: those stats make BOTH
      // branches reference the same scan columns, so column pruning
      // cannot split the shared subtree into two differently-pruned
      // scans (the failure the PlanSpec lock would catch).
      val grouped = matched.groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(when(col("source") === pfSource, 1L).otherwise(0L)).as("np"),
        sum(col("n_chars")).as("chars"),
        graft.expr.VecFunctions.topk_by_score(
          when(col("source") === pfSource, col("doc_id")),
          col("n_chars").cast("double"), pfSize).as("cand"))
      val nullL = lit(null).cast("long")
      val nullS = lit(null).cast("string")
      val aggRows = grouped
        .select(lit("aggs").as("section"), col("lang").as("key"),
          col("n").as("n_docs"), col("np").as("n_post"),
          col("chars").cast("long").as("chars"),
          nullL.as("rank"), nullL.as("doc_id"), nullL.as("n_chars"))
      val hitRows = grouped
        .select(explode(col("cand")).as("c"))
        .agg(graft.expr.VecFunctions.topk_by_score(
          col("c.id"), col("c.score"), pfSize).as("top"))
        .select(posexplode(col("top")))
        .select(lit("hits").as("section"), nullS.as("key"), nullL.as("n_docs"),
          nullL.as("n_post"), nullL.as("chars"),
          (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("doc_id"),
          col("col.score").cast("long").as("n_chars"))
      aggRows.unionByName(hitRows)
    },
    Some(s"""WITH m AS (SELECT doc_id, lang, source, n_chars FROM documents
      |  WHERE contains(concat(' ', trim(text), ' '), ' $pfTerm ')),
      |a AS (SELECT 'aggs' AS section, lang AS key, count(*) AS n_docs,
      |    CAST(sum(CASE WHEN source = '$pfSource' THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
      |    CAST(sum(n_chars) AS BIGINT) AS chars,
      |    CAST(NULL AS BIGINT) AS rank, CAST(NULL AS BIGINT) AS doc_id,
      |    CAST(NULL AS BIGINT) AS n_chars
      |  FROM m GROUP BY lang),
      |h AS (SELECT 'hits' AS section, CAST(NULL AS VARCHAR) AS key,
      |    CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS n_post,
      |    CAST(NULL AS BIGINT) AS chars, rank, doc_id, n_chars
      |  FROM (SELECT doc_id, n_chars,
      |      row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
      |    FROM m WHERE source = '$pfSource')
      |  WHERE rank <= $pfSize)
      |SELECT * FROM a UNION ALL SELECT * FROM h""".stripMargin))

  // ---------------------------------------------------------------- wrapper
  /** The `wrapper` query: a query_string shipped base64-encoded inside
    * the DSL (ES's escape hatch for clients that must embed queries in
    * JSON-hostile channels). Decode happens at PLAN time — exactly
    * where ES decodes it, in the coordinating node's parse phase — so
    * the executed plan is indistinguishable from the inner query's:
    * one pruned scan, one codegen filter, keyword conjuncts pushed. */
  private[graft] val wrapperInner = """lang:de OR (merge AND NOT window) sor*"""
  private val wrapperB64: String = java.util.Base64.getEncoder
    .encodeToString(wrapperInner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  val wrapperOp = QueryDef(
    "ns_search_wrapper",
    (s, dir) => {
      val decoded = new String(
        java.util.Base64.getDecoder.decode(wrapperB64),
        java.nio.charset.StandardCharsets.UTF_8)
      val pred = QueryStringParser.compile(
        QueryStringParser.parse(decoded),
        col("text"),
        Map("lang" -> col("lang")))
      docs(s, dir).filter(pred).select("doc_id", "lang", "source")
    },
    Some("""WITH d AS (SELECT doc_id, lang, source,
      |    string_split(trim(text), ' ') AS t FROM documents)
      |SELECT doc_id, lang, source FROM d
      |WHERE lang = 'de'
      |   OR (list_contains(t, 'merge') AND NOT list_contains(t, 'window')
      |       AND len(list_filter(t, x -> x LIKE 'sor%')) > 0)
      |""".stripMargin))

  // ----------------------------------------------------------------- scroll
  /** Scroll / point-in-time pagination: the deep-pagination contract
    * behind every ES export job. `from+size` pagination re-sorts and
    * discards `from` rows per page — quadratic at depth; scroll (and
    * its modern PIT + search_after form) carries a CURSOR, so page p is
    * a keyset-bounded query. Here: 3 pages × 10 rows over (ts,
    * event_id); each page's lower bound is the previous page's last
    * key, collected driver-side (10 bounded rows per page — the exact
    * cursor a scroll client holds). The native-ts bound on every
    * non-first page reaches the parquet scan's PushedFilters, so at
    * 100 TB page 1000 reads only the tail of the keyspace instead of
    * sorting the world, and each page plans as TakeOrderedAndProject
    * (k·tasks rows move, never a global sort). */
  private val scrollPages = 3
  private val scrollSize = 10
  // the scroll context's query: an export of the trailing window (the
  // production scroll shape — a full-index scroll is the degenerate
  // query:match_all case). The window start is the day-partition bound
  // every page keeps, and each cursor can only ADVANCE it.
  private val scrollFromMicros = 1706140800000000L // 2024-01-25T00:00:00Z
  val scrollOp = QueryDef(
    "ns_search_scroll",
    (s, dir) => {
      // scans the date-partitioned twin: the scroll query's window bound
      // plus the advancing cursor bound both mirror onto the dt
      // partition column — every page lists only the ≤6/30 day
      // directories at-or-after max(window, cursor) (PlanSpec locks the
      // PartitionFilters + partitionCount); row-identical to the flat
      // table, so the oracle stays valid
      val ev = Tables.eventsDt(s, dir)
      val micros = Tables.tsMicros(ev)
      val windowed = ev
        .filter(col("ts") >= Tables.tsLiteral(ev, scrollFromMicros)) // pushable query bound
        .filter(col("dt") >= lit(Tables.microsDay(scrollFromMicros))) // day-partition bound
      var cursor: Option[(Long, Long)] = None // (ts_micros, event_id) of last row served
      val pages = (1 to scrollPages).map { p =>
        val base = cursor match {
          case None => windowed
          case Some((cMicros, cId)) =>
            windowed.filter(col("ts") >= Tables.tsLiteral(ev, cMicros)) // pushable superset bound
              .filter(col("dt") >= lit(Tables.microsDay(cMicros))) // cursor advances the day bound
              .filter(micros > cMicros || (micros === cMicros && col("event_id") > cId))
        }
        val page = base
          .select(col("event_id"), col("tsu").as("ts"), col("event_type"), micros.as("ts_us"))
          .orderBy(col("ts"), col("event_id"))
          .limit(scrollSize)
        val rows = page.collect() // bounded: one page (the client's cursor state)
        if (rows.nonEmpty) {
          val last = rows.last
          cursor = Some((last.getAs[Long]("ts_us"), last.getAs[Long]("event_id")))
        }
        page.select(lit(p).cast("int").as("page"),
          col("event_id"), col("ts"), col("event_type"))
      }
      pages.reduce(_ unionAll _)
    },
    Some(s"""SELECT CAST((rn - 1) // $scrollSize + 1 AS INT) AS page,
       |  event_id, ts, event_type
       |FROM (SELECT event_id, ts, event_type,
       |    row_number() OVER (ORDER BY ts, event_id) AS rn FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00')
       |WHERE rn <= ${scrollPages * scrollSize}""".stripMargin))

  // --------------------------------------------------------------------- PIT
  /** The point-in-time API (`_pit`): ES pins a reader to the index
    * state at open time, so deep pagination with `search_after` stays
    * CONSISTENT while writes keep landing — no page ever shifts, no row
    * is served twice or skipped. In an append-only stream the snapshot
    * identity IS the open-time high-water mark, so the PIT id here
    * encodes the boundary instant: every page carries BOTH pushed
    * bounds — the pinned upper bound (`ts <=` boundary: rows arriving
    * after the open are invisible on every page, the property PIT
    * exists for) and the keyset cursor lower bound (the scroll
    * discipline — deep pages without a global sort). The same bounds
    * are mirrored at DAY granularity onto the date-partitioned twin's
    * `dt` partition column (a coarse superset of the precise ts
    * bounds, so the row set is untouched): the snapshot boundary prunes
    * the future-day partitions on EVERY page, and each cursor advances
    * the lower partition bound — deep pages list ever-fewer day
    * directories, which at 100 TB is the difference between touching
    * 30 days of files and touching the one day the page lives in. Per
    * page: one partition-and-rowgroup-pruned scan with both precise
    * bounds in PushedFilters + a TakeOrderedAndProject heap
    * (PlanSpec-locked, including non-empty PartitionFilters). */
  private val pitPages = 3
  private val pitSize = 10
  private val pitBoundaryMicros = 1705708800000000L // 2024-01-20T00:00:00Z
  private def microsDay(epochMicros: Long): java.sql.Date = Tables.microsDay(epochMicros)
  val pitOp = QueryDef(
    "ns_search_pit",
    (s, dir) => {
      val ev = Tables.eventsDt(s, dir)
      val micros = Tables.tsMicros(ev)
      val pinned = ev.filter(col("ts") <= Tables.tsLiteral(ev, pitBoundaryMicros))
        .filter(col("dt") <= lit(microsDay(pitBoundaryMicros)))
      var cursor: Option[(Long, Long)] = None
      val pages = (1 to pitPages).map { p =>
        val base = cursor match {
          case None => pinned
          case Some((cMicros, cId)) =>
            pinned.filter(col("ts") >= Tables.tsLiteral(ev, cMicros))
              .filter(col("dt") >= lit(microsDay(cMicros)))
              .filter(micros > cMicros || (micros === cMicros && col("event_id") > cId))
        }
        val page = base
          .select(col("event_id"), col("tsu").as("ts"), col("event_type"), micros.as("ts_us"))
          .orderBy(col("ts"), col("event_id"))
          .limit(pitSize)
        val rows = page.collect() // bounded: one page (the client's cursor state)
        if (rows.nonEmpty) {
          val last = rows.last
          cursor = Some((last.getAs[Long]("ts_us"), last.getAs[Long]("event_id")))
        }
        page.select(lit(p).cast("int").as("page"),
          col("event_id"), col("ts"), col("event_type"))
      }
      pages.reduce(_ unionAll _)
    },
    Some(s"""SELECT CAST((rn - 1) // $pitSize + 1 AS INT) AS page,
       |  event_id, ts, event_type
       |FROM (SELECT event_id, ts, event_type,
       |    row_number() OVER (ORDER BY ts, event_id) AS rn FROM events
       |  WHERE ts <= TIMESTAMP '2024-01-20 00:00:00')
       |WHERE rn <= ${pitPages * pitSize}""".stripMargin))

  // -------------------------------------------------------------- terms_enum
  /** The `_terms_enum` API: enumerate up to `size` index terms matching
    * a prefix, sorted — the keyword-autocomplete backend (distinct from
    * match_phrase_prefix, which completes within phrase context; this
    * walks the term dictionary itself). One pass: explode tokens,
    * prefix-filter immediately (the filter rides the Generate's output
    * inside codegen — non-matching tokens never reach the aggregate),
    * distinct into a |matching-terms|-bounded set, TakeOrdered cutoff. */
  private val termsEnumPrefix = "s"
  private val termsEnumSize = 10
  val termsEnumOp = QueryDef(
    "ns_search_terms_enum",
    (s, dir) => docs(s, dir)
      .select(explode(toks).as("term"))
      .filter(col("term").startsWith(termsEnumPrefix))
      .distinct()
      .orderBy("term")
      .limit(termsEnumSize),
    Some(s"""SELECT term FROM (
       |  SELECT DISTINCT x AS term
       |  FROM (SELECT unnest(string_split(trim(text), ' ')) AS x FROM documents)
       |  WHERE x LIKE '$termsEnumPrefix%')
       |ORDER BY term LIMIT $termsEnumSize""".stripMargin))

  // ---------------------------------------------------------- search_template
  /** The `_search/template` API: a stored mustache template rendered
    * with per-call params, then executed as the query it produces.
    * Rendering happens at PLAN time (where ES renders templates — the
    * coordinating node, before the query phase), so the executed plan
    * IS the rendered query's plan; what this op pins is the contract
    * that template + params and the hand-written query are the same
    * search. Params here hit every substitution position: a keyword
    * filter, a term, and a prefix. */
  private[graft] val searchTemplate =
    """lang:{{lang}} AND ({{t1}} OR {{t2}}*)"""
  private[graft] val templateParams =
    Map("lang" -> "en", "t1" -> "spark", "t2" -> "win")
  private[graft] def renderTemplate(tpl: String, params: Map[String, String]): String =
    params.foldLeft(tpl) { case (acc, (k, v)) => acc.replace(s"{{$k}}", v) }
  val searchTemplateOp = QueryDef(
    "ns_search_template",
    (s, dir) => {
      val rendered = renderTemplate(searchTemplate, templateParams)
      val pred = QueryStringParser.compile(
        QueryStringParser.parse(rendered),
        col("text"),
        Map("lang" -> col("lang")))
      docs(s, dir).filter(pred).select("doc_id", "lang", "n_chars")
    },
    Some("""WITH d AS (SELECT doc_id, lang, n_chars,
      |    string_split(trim(text), ' ') AS t FROM documents)
      |SELECT doc_id, lang, n_chars FROM d
      |WHERE lang = 'en'
      |  AND (list_contains(t, 'spark')
      |       OR len(list_filter(t, x -> x LIKE 'win%')) > 0)
      |""".stripMargin))

  // ------------------------------------------------------- msearch/template
  /** The `_msearch/template` API: N stored templates rendered with
    * per-search params and submitted as ONE request — the dashboard
    * fan-out composed with stored templates. Rendering happens at plan
    * time (where ES renders — the coordinating node), each rendered
    * query compiles through the engine's query_string parser, and the
    * N searches share ONE corpus scan exactly like msearch: each row
    * emits its (≤ N) matching template ids through an exploded
    * conditional-literal array (codegen; no filter() HOF) and the
    * per-template hit counts come out of one aggregation. */
  private val msearchTemplates: Seq[(String, String, Map[String, String], String)] = Seq(
    ("t_lang_term", "lang:{{lang}} AND {{term}}",
      Map("lang" -> "en", "term" -> "spark"),
      "lang = 'en' AND list_contains(t, 'spark')"),
    ("t_prefix", "{{p}}*", Map("p" -> "win"),
      "len(list_filter(t, x -> x LIKE 'win%')) > 0"),
    ("t_phrase", "\"slow join\"", Map.empty[String, String],
      "contains(pad, ' slow join ')"))
  val msearchTemplateOp = QueryDef(
    "ns_search_msearch_template",
    (s, dir) => {
      val preds = msearchTemplates.map { case (id, tpl, params, _) =>
        val q = renderTemplate(tpl, params)
        (id, QueryStringParser.compile(QueryStringParser.parse(q), col("text"),
          Map("lang" -> col("lang"))))
      }
      val labels = array(preds.map { case (id, p) => when(p, lit(id)) }: _*)
      docs(s, dir)
        .select(explode(labels).as("template_id"))
        .filter(col("template_id").isNotNull)
        .groupBy("template_id").agg(count(lit(1)).as("n_hits"))
    },
    Some(s"""WITH d AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS t,
       |    concat(' ', trim(text), ' ') AS pad FROM documents),
       |m AS (${msearchTemplates.map { case (id, _, _, sql) =>
             s"SELECT '$id' AS template_id, doc_id FROM d WHERE $sql" }
             .mkString("\n  UNION ALL ")})
       |SELECT template_id, count(*) AS n_hits FROM m GROUP BY 1""".stripMargin))

  // ------------------------------------------------------- render/template
  /** The `_render/template` API: render stored templates with params
    * WITHOUT executing them — the debugging endpoint clients call
    * before storing a search template. Rendering is the exact plan-time
    * path `_search/template` and `_msearch/template` take (same
    * renderTemplate); the plan is a LocalRelation — rendering never
    * touches data at any SF. */
  val renderTemplateOp = QueryDef(
    "ns_search_render_template",
    (s, dir) => {
      import s.implicits._
      msearchTemplates.map { case (id, tpl, params, _) =>
        (id, renderTemplate(tpl, params))
      }.toDF("template_id", "rendered")
    },
    Some {
      val rows = msearchTemplates.map { case (id, tpl, params, _) =>
        s"('$id', '${renderTemplate(tpl, params).replace("'", "''")}')"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $rows) AS v(template_id, rendered)"
    })

  // --------------------------------------------------------- validate/query
  /** The `_validate/query` API: parse + compile a query WITHOUT
    * executing it — the syntax-check endpoint clients call before
    * storing a query. Validity derives from actually running the
    * engine's parser/compiler (the exact path a search would take);
    * invalid queries report the failure class the way ES reports the
    * parse exception type. The plan is a LocalRelation — validation
    * never touches data, at any SF. */
  private val validateQueries = Seq(
    "lang:en AND (spark OR win*)",
    "\"slow join\" AND NOT lang:de",
    "lang:en AND (spark OR") // unbalanced parenthesis → invalid
  val validateOp = QueryDef(
    "ns_search_validate",
    (s, dir) => {
      import s.implicits._
      validateQueries.zipWithIndex.map { case (q, i) =>
        val err =
          try {
            QueryStringParser.compile(QueryStringParser.parse(q), col("text"),
              Map("lang" -> col("lang")))
            null: String
          } catch { case e: Throwable => e.getClass.getSimpleName }
        (i + 1L, q, err == null, Option(err))
      }.toDF("query_id", "query", "valid", "error")
    },
    Some(s"""SELECT * FROM (VALUES
       |  (CAST(1 AS BIGINT), 'lang:en AND (spark OR win*)', true, CAST(NULL AS VARCHAR)),
       |  (CAST(2 AS BIGINT), '"slow join" AND NOT lang:de', true, CAST(NULL AS VARCHAR)),
       |  (CAST(3 AS BIGINT), 'lang:en AND (spark OR', false, 'ParseError'))
       |  AS v(query_id, query, valid, error)""".stripMargin))

  // ------------------------------------------------------------------ ES|QL
  /** ES|QL — the piped language Kibana Discover now leads with
    * (EsqlParser). Two fixed pipelines cover the command surface; both
    * compile onto the SAME DataFrame algebra the rest of the registry
    * uses, so Catalyst applies its usual wins: the WHERE pushes into
    * the scan, STATS partial-aggregates, SORT+LIMIT fuse into
    * TakeOrderedAndProject. Aggregated values are exact longs (the
    * registry's integer-cents discipline, via TO_LONG(ROUND(value *
    * 100))). EsqlSpec covers the grammar (every command, precedence,
    * IN/LIKE, errors); ParserLawsSpec pins expression round-trips. */
  private[graft] val esqlStatsQuery =
    """FROM events
      || WHERE value >= 50 AND NOT event_type == "view"
      || EVAL vc = TO_LONG(ROUND(value * 100, 0)), day_ms = ts_ms - ts_ms % 86400000
      || STATS n = COUNT(*), sv = SUM(vc), users = COUNT_DISTINCT(user_id) BY event_type
      || SORT sv DESC
      || LIMIT 5""".stripMargin
  val esqlStatsOp = QueryDef(
    "ns_esql_stats",
    (s, dir) => EsqlParser.run(esqlStatsQuery, t => Tables.events(s, dir)),
    Some("""SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sv,
      |  count(DISTINCT user_id) AS users
      |FROM events
      |WHERE value >= 50 AND NOT event_type = 'view'
      |GROUP BY 1 ORDER BY sv DESC LIMIT 5""".stripMargin))

  private[graft] val esqlRowQuery =
    """FROM documents
      || EVAL wc = LENGTH(text), tag = CONCAT(lang, "_", source)
      || WHERE lang == "en" OR n_chars > 450
      || RENAME n_chars AS chars
      || KEEP doc_id, wc, tag, chars
      || SORT wc DESC, doc_id ASC
      || LIMIT 20""".stripMargin
  val esqlRowOp = QueryDef(
    "ns_esql_row",
    (s, dir) => EsqlParser.run(esqlRowQuery, t => docs(s, dir)),
    Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS wc,
      |  concat(lang, '_', source) AS tag, n_chars AS chars
      |FROM documents
      |WHERE lang = 'en' OR n_chars > 450
      |ORDER BY wc DESC, doc_id LIMIT 20""".stripMargin))

  /** The structured-extraction / lookup half of the ES|QL command set
    * (DISSECT, GROK, ENRICH, MV_EXPAND — the commands a Kibana user
    * reaches for against raw log lines). Each pipeline compiles onto
    * machinery the registry already trusts: DISSECT and GROK become one
    * codegen RegExpExtractStruct pass per row (np_grok_access_log's
    * expression), ENRICH a broadcast LEFT join against the policy dim,
    * MV_EXPAND a generate (explode_outer). The oracles recompute from
    * the access-log CTE's base columns — so a green row proves the
    * extraction actually recovered the fields the line was built from. */
  private[graft] val esqlBucketQuery =
    """FROM events
      || EVAL day = BUCKET(ts_ms, 86400000),
      |       vc = TO_LONG(ROUND(value * 100, 0)),
      |       tier = CASE(value >= 75, "high", value >= 25, "mid", "low")
      || STATS n = COUNT(*), sv = SUM(vc) BY day, tier
      || SORT day ASC, tier ASC""".stripMargin
  val esqlBucketOp = QueryDef(
    "ns_esql_bucket",
    (s, dir) => EsqlParser.run(esqlBucketQuery, _ => Tables.events(s, dir)),
    Some("""SELECT epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day,
      |  CASE WHEN value >= 75 THEN 'high' WHEN value >= 25 THEN 'mid' ELSE 'low' END AS tier,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sv
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  private[graft] val esqlStatsWhereQuery =
    """FROM events
      || EVAL vc = TO_LONG(ROUND(value * 100, 0)), day = BUCKET(ts_ms, 86400000)
      || STATS n_all = COUNT(*),
      |        n_buy = COUNT(*) WHERE event_type == "purchase",
      |        sv_big = SUM(vc) WHERE value >= 50,
      |        u_click = COUNT_DISTINCT(user_id) WHERE event_type == "click"
      |  BY day
      || SORT day ASC""".stripMargin
  val esqlStatsWhereOp = QueryDef(
    "ns_esql_stats_where",
    (s, dir) => EsqlParser.run(esqlStatsWhereQuery, _ => Tables.events(s, dir)),
    Some("""SELECT epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day,
      |  count(*) AS n_all,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS n_buy,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
      |    FILTER (WHERE value >= 50) AS BIGINT) AS sv_big,
      |  count(DISTINCT user_id) FILTER (WHERE event_type = 'click') AS u_click
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** The `_sql` endpoint (the OpenSearch SQL plugin / ES SQL API): the
    * engine's native SQL path serving the endpoint's dialect shape
    * directly — the query text a downstream BI tool would POST runs
    * via spark.sql over the registered view, Catalyst planning it like
    * any DataFrame query (pushdown, partial aggregation). */
  val sqlApiOp = QueryDef(
    "ns_sql_api",
    (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("sql_api_events")
      s.sql("""SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sv,
        |  min(user_id) AS u_min, max(user_id) AS u_max
        |FROM sql_api_events WHERE value >= 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
    },
    Some("""SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sv,
      |  min(user_id) AS u_min, max(user_id) AS u_max
      |FROM events WHERE value >= 10
      |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** The ES|QL commands COMPOSED the way a Kibana observability user
    * actually writes them: raw line → typed GROK extraction → derived
    * bucket → multi-filtered STATS — one pipeline, one corpus pass,
    * the extraction evaluated once behind its Generate barrier and the
    * per-aggregate filters as conditional sums in the same hash
    * aggregate. */
  private[graft] val esqlObservabilityQuery =
    """FROM access_log
      || GROK line "^%{IP:oip} - %{NOTSPACE:ousr} \\[%{HTTPDATE:odate}\\] \"%{WORD:omethod} %{NOTSPACE:ourl} HTTP/%{NUMBER:over}\" %{INT:ostatus:int} %{INT:obytes:int} %{INT:ort:int}"
      || EVAL day = BUCKET(ts_ms, 86400000)
      || STATS req = COUNT(*),
      |        err = COUNT(*) WHERE ostatus >= 500,
      |        get_bytes = SUM(obytes) WHERE omethod == "GET",
      |        slow = COUNT(*) WHERE ort >= 800
      |  BY day, omethod
      || SORT day ASC, omethod ASC""".stripMargin
  val esqlObservabilityOp = QueryDef(
    "ns_esql_observability",
    (s, dir) => EsqlParser.run(esqlObservabilityQuery, _ => Synth.accessLog(s, dir)),
    Some(Synth.withAccessLog(
      // hostname lines (event_id % 13 = 0, r20) fail %{IP}: GROK keeps
      // the ROW with null captures (ES's no-match contract), so they
      // land in a null-omethod bucket whose filtered aggregates see
      // only nulls — mirrored by the CASE/modulus guards
      """SELECT epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day,
        |  CASE WHEN event_id % 13 <> 0 THEN method END AS omethod,
        |  count(*) AS req,
        |  count(*) FILTER (WHERE event_id % 13 <> 0 AND status >= 500) AS err,
        |  CAST(sum(bytes) FILTER (WHERE event_id % 13 <> 0 AND method = 'GET') AS BIGINT) AS get_bytes,
        |  count(*) FILTER (WHERE event_id % 13 <> 0 AND rt_ms >= 800) AS slow
        |FROM access_log GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)))

  private[graft] val esqlInlineStatsQuery =
    """FROM events
      || EVAL vc = TO_LONG(ROUND(value * 100, 0))
      || INLINESTATS n_user = COUNT(*), sv_user = SUM(vc) BY user_id
      || WHERE vc * n_user * 2 > sv_user * 3
      || KEEP event_id, user_id, vc, n_user, sv_user
      || SORT event_id
      || LIMIT 50""".stripMargin
  /** INLINESTATS (8.16): group aggregates attach to every row instead
    * of collapsing — "events 1.5× above their user's average", with the
    * comparison in pure integer arithmetic (2·vc·n > 3·Σ) so no
    * division reaches it. Compiles to unordered-window aggregates over
    * the BY partition. */
  val esqlInlineStatsOp = QueryDef(
    "ns_esql_inlinestats",
    (s, dir) => EsqlParser.run(esqlInlineStatsQuery, _ => Tables.events(s, dir)),
    Some("""SELECT event_id, user_id, vc, n_user, sv_user FROM (
      |  SELECT event_id, user_id, CAST(round(value * 100, 0) AS BIGINT) AS vc,
      |    count(*) OVER (PARTITION BY user_id) AS n_user,
      |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
      |      OVER (PARTITION BY user_id) AS BIGINT) AS sv_user
      |  FROM events)
      |WHERE vc * n_user * 2 > sv_user * 3
      |ORDER BY event_id LIMIT 50""".stripMargin))

  private[graft] val esqlDissectQuery =
    """FROM access_log
      || DISSECT line "%{dip} - %{dusr} [%{ddate}] \"%{dreq}\" %{dstatus} %{dbytes} %{drt} \"%{dxff}\" client-%{dcid} txn-%{dtid} corr-%{dcorr}"
      || WHERE dstatus == "500" AND dreq LIKE "DELETE *"
      || EVAL b = TO_LONG(dbytes)
      || STATS n = COUNT(*), sb = SUM(b) BY dip
      || SORT n DESC, dip ASC
      || LIMIT 10""".stripMargin
  val esqlDissectOp = QueryDef(
    "ns_esql_dissect",
    (s, dir) => EsqlParser.run(esqlDissectQuery, _ => Synth.accessLog(s, dir)),
    Some(Synth.withAccessLog(
      // cliaddr, not ip (r20): the line's client token is a HOSTNAME on
      // every 13th event, and DISSECT is delimiter-based — it passes
      // hostnames through where grok's %{IP} would drop them
      """SELECT cliaddr AS dip, count(*) AS n, CAST(sum(bytes) AS BIGINT) AS sb
        |FROM access_log WHERE status = 500 AND method = 'DELETE'
        |GROUP BY 1 ORDER BY n DESC, dip LIMIT 10""".stripMargin)))

  private[graft] val esqlGrokQuery =
    """FROM access_log
      || GROK line "^%{IP:gip} - %{NOTSPACE:gusr} \\[%{HTTPDATE:gdate}\\] \"%{WORD:gmethod} %{NOTSPACE:gurl} HTTP/%{NUMBER:gver}\" %{INT:gstatus:int} %{INT:gbytes:int} %{INT:grt:int}"
      || WHERE gstatus >= 400 AND gmethod IN ("GET", "POST")
      || STATS n = COUNT(*), sb = SUM(gbytes), mx = MAX(grt) BY gmethod, gstatus
      || SORT gmethod ASC, gstatus ASC""".stripMargin
  val esqlGrokOp = QueryDef(
    "ns_esql_grok",
    (s, dir) => EsqlParser.run(esqlGrokQuery, _ => Synth.accessLog(s, dir)),
    Some(Synth.withAccessLog(
      // hostname lines (event_id % 13 = 0, r20) fail %{IP} and GROK
      // nulls every capture, so the WHERE drops them — a genuinely
      // exercised grok-miss branch, mirrored here by the modulus
      """SELECT method AS gmethod, CAST(status AS BIGINT) AS gstatus, count(*) AS n,
        |  CAST(sum(bytes) AS BIGINT) AS sb, max(rt_ms) AS mx
        |FROM access_log WHERE status >= 400 AND method IN ('GET', 'POST')
        |  AND event_id % 13 <> 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)))

  private[graft] val esqlEnrichQuery =
    """FROM events
      || EVAL nk = user_id % 25, vc = TO_LONG(ROUND(value * 100, 0))
      || ENRICH nations ON nk WITH n_name, n_regionkey
      || STATS n = COUNT(*), sv = SUM(vc) BY n_regionkey, n_name
      || SORT n_name ASC""".stripMargin
  val esqlEnrichOp = QueryDef(
    "ns_esql_enrich",
    (s, dir) => EsqlParser.run(esqlEnrichQuery, _ => Tables.events(s, dir),
      { case "nations" => (Tables.nation(s, dir), "n_nationkey") }),
    Some("""SELECT n_regionkey, n_name, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sv
      |FROM events LEFT JOIN nation ON user_id % 25 = n_nationkey
      |GROUP BY 1, 2 ORDER BY n_name""".stripMargin))

  // ---------------------------------------------------------------- analyze
  /** The `_analyze` API: run an analyzer chain over requested docs and
    * return the token stream — the debugging endpoint every mapping
    * change is tested against. Chain here = standard tokenizer (the
    * corpus is space-tokenized) → lowercase → English stop filter,
    * with POSITIONS assigned BEFORE stop removal (ES's position
    * gapping: removed stops leave holes, which is what makes phrase
    * queries behave across them). The requested ids push to the scan;
    * one posexplode is the whole plan. */
  private val analyzeStops = Seq("a", "an", "and", "are", "as", "at", "be", "but",
    "by", "for", "if", "in", "is", "it", "of", "on", "or", "the", "to", "with")
  private val analyzeDocIds = Seq(11L, 42L)
  val analyzeOp = QueryDef(
    "ns_search_analyze",
    (s, dir) => docs(s, dir)
      .filter(col("doc_id").isin(analyzeDocIds: _*))
      .select(col("doc_id"), posexplode(toks).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("position"),
        lower(col("tok")).as("token"))
      .filter(!col("token").isin(analyzeStops: _*)),
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
      |  WHERE doc_id IN (${analyzeDocIds.mkString(", ")}))
      |SELECT doc_id, CAST(i AS BIGINT) AS position, lower(t[i]) AS token
      |FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM t)
      |WHERE lower(t[i]) NOT IN (${analyzeStops.map(w => s"'$w'").mkString(", ")})""".stripMargin))

  /** ILM `_rollover` with max_docs: the write alias points at
    * generation N until N holds max_docs, then rolls to N+1 — so a
    * document's generation is floor(itsrank / max_docs) within its
    * alias (loggroup), ranked by event time. The corpus-wide per-alias
    * rank does NOT use a global window: the ns_text_pack discipline —
    * exclusive prefix COUNTS within hour blocks (windows partitioned
    * by (alias, block)), block base counts summed over the tiny
    * per-alias block table, rank = base + in-block prefix. Output is
    * the rollover ledger: per (alias, generation) — doc count and the
    * covered time range. */
  private val rolloverMaxDocs = 1000L
  val rolloverOp = QueryDef(
    "ns_index_rollover",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Synth.accessLog(s, dir)
        .select(col("loggroup"),
          (col("ts_ms") * 1048576L + col("event_id")).as("ok"))
        .withColumn("block", expr("shiftright(ok, 20) div 3600000"))
      val wIn = Window.partitionBy("loggroup", "block").orderBy("ok")
        .rowsBetween(Window.unboundedPreceding, -1)
      val within = t.withColumn("prev_in_block",
        coalesce(sum(lit(1L)).over(wIn), lit(0L)))
      val wBase = Window.partitionBy("loggroup").orderBy("block")
        .rowsBetween(Window.unboundedPreceding, -1)
      val bases = within.groupBy("loggroup", "block")
        .agg(max(col("prev_in_block") + 1L).as("bn"))
        .withColumn("base", coalesce(sum(col("bn")).over(wBase), lit(0L)))
        .select("loggroup", "block", "base")
      within.join(broadcast(bases), Seq("loggroup", "block"))
        .select(col("loggroup"), col("ok"),
          expr(s"(base + prev_in_block) div $rolloverMaxDocs").as("generation"))
        .groupBy("loggroup", "generation")
        .agg(count(lit(1)).as("n_docs"),
          shiftright(min(col("ok")), 20).as("min_ms"),
          shiftright(max(col("ok")), 20).as("max_ms"))
    },
    Some(Synth.withAccessLog(
      s"""SELECT loggroup, CAST((rn - 1) // $rolloverMaxDocs AS BIGINT) AS generation,
         |  count(*) AS n_docs, min(ok) // 1048576 AS min_ms, max(ok) // 1048576 AS max_ms
         |FROM (SELECT loggroup, epoch_ms(ts) * 1048576 + event_id AS ok,
         |    row_number() OVER (PARTITION BY loggroup
         |      ORDER BY epoch_ms(ts) * 1048576 + event_id) AS rn
         |  FROM access_log)
         |GROUP BY 1, 2""".stripMargin)))

  /** `_field_caps`: the schema-introspection API Kibana calls before
    * rendering any field picker — per field: the mapped ES type
    * (derived from the storage type by the same rule in both engines:
    * the analyzed body field is `text`, other strings `keyword`,
    * integers `long`, timestamps `date`) and the searchable/
    * aggregatable capabilities (text is searchable but not
    * aggregatable — the doc_values rule). Driver-side metadata over
    * the table schema; no data is scanned at all. */
  val fieldCapsOp = QueryDef(
    "ns_field_caps",
    (s, dir) => {
      import org.apache.spark.sql.types._
      val spark = s
      import spark.implicits._
      val rows = Tables.documents(s, dir).schema.fields.toSeq.map { f =>
        val esType = f.dataType match {
          case LongType | IntegerType => "long"
          case DoubleType | FloatType => "double"
          case StringType => if (f.name == "text") "text" else "keyword"
          case TimestampType => "date"
          case other => other.simpleString
        }
        (f.name, esType, 1L, if (esType == "text") 0L else 1L)
      }
      rows.toDF("field", "es_type", "searchable", "aggregatable")
    },
    Some("""SELECT column_name AS field,
      |  CASE WHEN column_name = 'text' THEN 'text'
      |       WHEN column_type = 'VARCHAR' THEN 'keyword'
      |       WHEN column_type IN ('BIGINT', 'INTEGER') THEN 'long'
      |       WHEN column_type IN ('DOUBLE', 'FLOAT') THEN 'double'
      |       WHEN column_type LIKE 'TIMESTAMP%' THEN 'date'
      |       ELSE lower(column_type) END AS es_type,
      |  CAST(1 AS BIGINT) AS searchable,
      |  CAST(CASE WHEN column_name = 'text' THEN 0 ELSE 1 END AS BIGINT) AS aggregatable
      |FROM (DESCRIBE SELECT * FROM documents)""".stripMargin))

  /** `_cat/indices` + `_stats`, with `source` standing in for the
    * index: per index — doc count, store size (chars), deleted-doc
    * stand-in (empty docs), field cardinality, and the min/max primary
    * key. One map-side-combined aggregate; the ops dashboard's
    * cheapest call stays the cheapest plan. */
  val indexStatsOp = QueryDef(
    "ns_cat_indices",
    (s, dir) => docs(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("docs_count"),
        sum(length(col("text")).cast("long")).as("store_chars"),
        sum(when(length(trim(col("text"))) === 0, 1L).otherwise(0L)).as("docs_empty"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id")),
    Some("""SELECT source, count(*) AS docs_count,
      |  CAST(sum(length(text)) AS BIGINT) AS store_chars,
      |  CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_empty,
      |  count(DISTINCT lang) AS n_langs,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents GROUP BY 1""".stripMargin))

  // ----------------------------------------------------- document-level APIs
  /** `_count` — the query without the hits: the SAME compiled
    * query_string predicate as ns_search_query_string, reduced to one
    * map-side-combined count. At scale this is the cheapest query in
    * the API: one pruned scan, a 1-row exchange. */
  val countOp = QueryDef(
    "ns_search_count",
    (s, dir) => {
      val pred = QueryStringParser.compile(
        QueryStringParser.parse(qsQuery),
        col("text"),
        Map("lang" -> col("lang"), "source" -> col("source")))
      docs(s, dir).filter(pred).agg(count(lit(1)).as("n"))
    },
    Some("""SELECT count(*) AS n FROM documents
      |WHERE lang = 'en'
      |  AND (list_contains(string_split(trim(text), ' '), 'spark')
      |       OR contains(concat(' ', trim(text), ' '), ' data column '))
      |  AND NOT source = 'src7'
      |  AND len(list_filter(string_split(trim(text), ' '), x -> x LIKE 'que%')) > 0
      |""".stripMargin))

  /** `_update_by_query` with a script: the matched docs are rewritten
    * in place, everything else passes through untouched — which in an
    * immutable-storage engine is COPY-ON-WRITE: one codegen pass where
    * the script is a CASE projection, emitting the post-update index
    * plus the per-doc `updated` flag (the API's response counts are
    * sum(updated)). No shuffle; at 100 TB the rewrite cost is the
    * stream-through, exactly like ES's internal scroll+bulk loop but
    * one pass. */
  val updateByQueryOp = QueryDef(
    "ns_update_by_query",
    (s, dir) => docs(s, dir).select(
      col("doc_id"), col("lang"),
      when(col("lang") === "de", lit("archived")).otherwise(col("source")).as("source"),
      when(col("lang") === "de", 1L).otherwise(0L).as("updated")),
    Some("""SELECT doc_id, lang,
      |  CASE WHEN lang = 'de' THEN 'archived' ELSE source END AS source,
      |  CAST(CASE WHEN lang = 'de' THEN 1 ELSE 0 END AS BIGINT) AS updated
      |FROM documents""".stripMargin))

  /** `_reindex` with a source query and script: only matching docs
    * move, reshaped for the destination mapping. The source filter is
    * a plain stored-column comparison, so it reaches PushedFilters and
    * row-group pruning skips non-matching chunks before any transform
    * — the reindex reads the slice, not the index. */
  val reindexOp = QueryDef(
    "ns_reindex",
    (s, dir) => docs(s, dir)
      .filter(col("n_chars") >= 300)
      .select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).cast("long").as("text_len")),
    Some("""SELECT doc_id, lang, source, CAST(length(text) AS BIGINT) AS text_len
      |FROM documents WHERE n_chars >= 300""".stripMargin))

  // ---------------------------------------------------------- graph explore
  /** The X-Pack Graph API (`_graph/explore`): seed terms expand one hop
    * to their most significantly co-occurring vertices, with edge
    * weights. The adjacency_matrix discipline, not a corpus self-join:
    * the distinct (doc, term) postings form once under the doc_id
    * partitioning (explode → distinct, exchange-free), per-doc seed
    * flags are a second exchange-free aggregate of the SAME frame, the
    * flags join back co-partitioned, and the only shuffle is the term-
    * keyed stats aggregate. The final per-seed top-8 ranks a
    * vocabulary-bounded frame (terms × seeds), so the window is safe at
    * any corpus size. Weight is the significant_terms simple ratio
    * P(term | seed-doc) = overlap/df, rounded to 6 places in both
    * engines. */
  private val graphSeeds = Seq("spark", "vector")
  private val graphTopK = 8
  val graphExploreOp = QueryDef(
    "ns_search_graph_explore", {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir).select(col("doc_id"), toks.as("t"))
        val post = d.select(col("doc_id"), explode(when(size(col("t")) >= 1, col("t"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).drop("tf")
        val flagCols = graphSeeds.zipWithIndex.map { case (sd, i) =>
          max(when(col("term") === sd, 1L).otherwise(0L)).as(s"f$i")
        }
        val flags = post.groupBy("doc_id").agg(flagCols.head, flagCols.tail: _*)
        val statCols = count(lit(1)).as("df") +:
          graphSeeds.zipWithIndex.map { case (_, i) => sum(col(s"f$i")).as(s"o$i") }
        // MATERIALIZE the vocabulary-sized stats table before the
        // per-seed fan-out (r21, the ns_dedup_pipeline localCheckpoint
        // discipline): each seed's edge branch replans the whole
        // postings→flags→join→agg subtree otherwise (ProfileBench: 7
        // jobs / 131 tasks / 739 ms for this key). |terms| rows at any
        // corpus scale.
        val stats = post.join(flags, "doc_id")
          .groupBy("term").agg(statCols.head, statCols.tail: _*)
          .localCheckpoint(true)
        val edges = graphSeeds.zipWithIndex.map { case (sd, i) =>
          stats.filter(col("term") =!= sd && col(s"o$i") > 0)
            .select(lit(sd).as("seed"), col("term"), col(s"o$i").as("n_overlap"), col("df"),
              round(col(s"o$i").cast("double") / col("df"), 6).as("weight"))
        }.reduce(_ unionAll _)
        val rk = Window.partitionBy("seed").orderBy(col("weight").desc, col("term"))
        edges.withColumn("rk", row_number().over(rk)).filter(col("rk") <= graphTopK).drop("rk")
    },
    Some {
      val seedEdges = graphSeeds.zipWithIndex.map { case (sd, i) =>
        s"""SELECT '$sd' AS seed, term, o$i AS n_overlap, df,
           |  round(CAST(o$i AS DOUBLE) / df, 6) AS weight
           |FROM stats WHERE term <> '$sd' AND o$i > 0""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH post AS (
         |  SELECT DISTINCT doc_id, term FROM (
         |    SELECT doc_id, unnest(str_split(trim(text), ' ')) AS term FROM documents)),
         |flags AS (SELECT doc_id,
         |    ${graphSeeds.zipWithIndex.map { case (sd, i) =>
              s"max(CASE WHEN term = '$sd' THEN 1 ELSE 0 END) AS f$i" }.mkString(",\n    ")}
         |  FROM post GROUP BY 1),
         |stats AS (SELECT term, count(*) AS df,
         |    ${graphSeeds.indices.map(i => s"CAST(sum(f$i) AS BIGINT) AS o$i").mkString(", ")}
         |  FROM post JOIN flags USING (doc_id) GROUP BY 1),
         |edges AS (
         |  $seedEdges)
         |SELECT seed, term, n_overlap, df, weight FROM (
         |  SELECT *, row_number() OVER (PARTITION BY seed ORDER BY weight DESC, term) AS rk
         |  FROM edges)
         |WHERE rk <= $graphTopK""".stripMargin
    })

  // ------------------------------------------------------------ termvectors
  /** The `_termvectors` API (with term_statistics=true): for requested
    * doc ids, every term with its in-doc frequency plus the index-wide
    * doc_freq and total term frequency. The corpus side is the SAME
    * postings shuffle BM25 rides — tf per (doc, term), then df/ttf as
    * a second aggregate of that frame, so Spark computes the postings
    * once and reuses the exchange. The requested docs' term list is
    * tiny (3 docs × their vocabulary) and broadcasts; the stats stream
    * past it — no full-stats materialization lands on the driver. At
    * index scale df/ttf come from the persisted corpus-stats artifact;
    * the aggregation here is what builds that artifact. */
  private val termvectorDocIds = Seq(11L, 42L, 97L)
  val termvectorsOp = QueryDef(
    "ns_search_termvectors",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), toks.as("t"))
      // when() guard: a bare explode lets Catalyst push re-tokenizing
      // predicates into the scan (see ns_text_bm25)
      val post = d.select(col("doc_id"), explode(when(size(col("t")) >= 1, col("t"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val stats = post.groupBy("term").agg(count(lit(1)).as("df"), sum(col("tf")).as("ttf"))
      val mine = post.filter(col("doc_id").isin(termvectorDocIds: _*))
      stats.join(broadcast(mine), "term")
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("ttf"))
    },
    Some(s"""WITH post AS (
      |  SELECT doc_id, unnest(str_split(trim(text), ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM post GROUP BY 1, 2),
      |stats AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS ttf FROM tf GROUP BY 1)
      |SELECT t.doc_id, t.term, t.tf, s.df, s.ttf
      |FROM tf t JOIN stats s USING (term)
      |WHERE t.doc_id IN (${termvectorDocIds.mkString(", ")})""".stripMargin))

  // ---------------------------------------------------------------- _mget
  /** The `_mget` API — the multi-document point read (fetch by id):
    * N requested ids come back in REQUEST order, with ES's
    * `found: false` marker for ids the index does not hold. Scale
    * shape: the id set pushes to the parquet scan as ONE In predicate
    * (PushedFilters-locked — a few row groups read, never a corpus
    * pass), the ≤ N matched docs broadcast against the tiny LOCAL
    * request-order frame, and request order returns via the left
    * join's order column — no corpus-side sort anywhere. */
  private val mgetIds = Seq(42L, 7L, 911L, -1L, 13L) // request order; -1 never exists
  val mgetOp = QueryDef(
    "ns_search_mget",
    (s, dir) => {
      import s.implicits._
      val req = mgetIds.zipWithIndex
        .map { case (id, i) => (i + 1L, id) }.toDF("req_order", "doc_id")
      val hit = docs(s, dir)
        .filter(col("doc_id").isin(mgetIds: _*))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      req.join(broadcast(hit), Seq("doc_id"), "left")
        .select(col("req_order"), col("doc_id"), col("lang"), col("source"),
          col("n_chars"), col("lang").isNotNull.as("found"))
        .orderBy("req_order")
    },
    Some(s"""WITH req(req_order, doc_id) AS (VALUES ${mgetIds.zipWithIndex
        .map { case (id, i) => s"(CAST(${i + 1} AS BIGINT), CAST($id AS BIGINT))" }
        .mkString(", ")})
      |SELECT req_order, req.doc_id AS doc_id, d.lang, d.source, d.n_chars,
      |  d.lang IS NOT NULL AS found
      |FROM req LEFT JOIN documents d ON req.doc_id = d.doc_id
      |ORDER BY req_order""".stripMargin))

  private[graft] val esqlLookupJoinQuery =
    """FROM events
      || EVAL nk = user_id % 25
      || LOOKUP JOIN nations_lu ON nk
      || WHERE n_regionkey <= 2
      || STATS n = COUNT(*) BY n_name
      || SORT n_name ASC""".stripMargin
  val esqlLookupJoinOp = QueryDef(
    "ns_esql_lookup_join",
    (s, dir) => EsqlParser.run(esqlLookupJoinQuery, {
      case "events" => Tables.events(s, dir)
      case "nations_lu" => Tables.nation(s, dir)
        .select(col("n_nationkey").as("nk"), col("n_name"), col("n_regionkey"))
    }),
    Some("""SELECT n_name, count(*) AS n
      |FROM events LEFT JOIN nation ON user_id % 25 = n_nationkey
      |WHERE n_regionkey <= 2 GROUP BY 1 ORDER BY 1""".stripMargin))

  /** CHANGE_POINT surfaced as an ES|QL command (9.x): the pipeline
    * aggregates the error series per day first (so the command's
    * windows order a |days|-bounded table — ES itself caps the input at
    * 1000 rows), then the CUSUM argmax row gains (cp_type, cp_pvalue)
    * non-collapsing; the semantics are ns_agg_change_point's, reached
    * from the language surface. */
  private[graft] val esqlChangePointQuery =
    """FROM events
      || WHERE event_type == "error"
      || EVAL day = BUCKET(ts_ms, 86400000)
      || STATS c = COUNT(*) BY day
      || CHANGE_POINT c ON day AS cp_type, cp_pvalue
      || SORT day ASC""".stripMargin
  val esqlChangePointOp = QueryDef(
    "ns_esql_change_point",
    (s, dir) => EsqlParser.run(esqlChangePointQuery, _ => Tables.events(s, dir)),
    Some("""WITH b AS (SELECT epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day, count(*) AS c
      |  FROM events WHERE event_type = 'error' GROUP BY 1),
      |p AS (SELECT day, c,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
      |    CAST(sum(c) OVER (ORDER BY day) AS BIGINT) AS sk,
      |    CAST(sum(c) OVER () AS BIGINT) AS st,
      |    CAST(count(*) OVER () AS BIGINT) AS n FROM b),
      |s AS (SELECT day, c,
      |    CASE WHEN k < n THEN CAST(k AS DOUBLE) * (n - k)
      |      * (CAST(sk AS DOUBLE) / k - CAST(st - sk AS DOUBLE) / (n - k))
      |      * (CAST(sk AS DOUBLE) / k - CAST(st - sk AS DOUBLE) / (n - k)) END AS score
      |  FROM p),
      |r AS (SELECT day, c, score,
      |    row_number() OVER (ORDER BY score DESC NULLS LAST, day) AS rk FROM s)
      |SELECT day, c,
      |  CASE WHEN rk = 1 AND score IS NOT NULL THEN 'step_change' END AS cp_type,
      |  CASE WHEN rk = 1 AND score IS NOT NULL
      |    THEN round(1.0 / (1.0 + score), 6) END AS cp_pvalue
      |FROM r ORDER BY day""".stripMargin))

  /** SAMPLE surfaced as an ES|QL command (9.x): the deterministic
    * md5-bucket membership of ns_agg_random_sampler reached from the
    * language surface — a pure map-side filter (any worker decides
    * membership independently, no shuffle before the aggregate), and
    * reproducible across engines/runs where ES's seeded RNG is not. */
  private[graft] val esqlSampleQuery =
    """FROM events
      || SAMPLE 0.05 ON event_id
      || EVAL vc = TO_LONG(ROUND(value * 100, 0))
      || STATS n = COUNT(*), sv = SUM(vc) BY event_type
      || SORT event_type ASC""".stripMargin
  val esqlSampleOp = QueryDef(
    "ns_esql_sample",
    (s, dir) => EsqlParser.run(esqlSampleQuery, _ => Tables.events(s, dir)),
    Some("""SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sv
      |FROM events
      |WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 < 50000
      |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** ES|QL 9.x's full-text functions inside WHERE — MATCH (the match
    * query's OR-of-terms), QSTR (query_string syntax) and KQL, each
    * compiled by the engine's OWN parser for that language onto one
    * boolean codegen expression. ES resolves the searched field from
    * the index default; the dialect here names it as the first
    * argument. One corpus pass, no second engine. */
  private[graft] val esqlFulltextQuery =
    """FROM documents
      || WHERE MATCH(text, "slow quick") AND KQL(text, "lang:en AND n_chars >= 300")
      |        AND NOT QSTR(text, "win*")
      || STATS n = COUNT(*), mx = MAX(n_chars) BY source
      || SORT source ASC""".stripMargin
  val esqlFulltextOp = QueryDef(
    "ns_esql_fulltext",
    (s, dir) => EsqlParser.run(esqlFulltextQuery, _ => docs(s, dir)),
    Some("""WITH d AS (SELECT source, n_chars, lang,
      |    string_split(trim(text), ' ') AS t FROM documents)
      |SELECT source, count(*) AS n, max(n_chars) AS mx FROM d
      |WHERE (list_contains(t, 'slow') OR list_contains(t, 'quick'))
      |  AND lang = 'en' AND n_chars >= 300
      |  AND NOT len(list_filter(t, x -> x LIKE 'win%')) > 0
      |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** FORK (9.x): each branch runs the incoming frame through its own
    * sub-pipeline; results union by name with a `_fork` discriminator
    * and branch-missing columns null — and because every branch
    * transforms the SAME frame, Catalyst/AQE share the scan the way
    * msearch's N queries share one corpus pass. The declared pipeline
    * aggregates per branch, proving both the discriminator and the
    * null-fill. */
  private[graft] val esqlForkQuery =
    """FROM documents
      || FORK (WHERE MATCH(text, "spark"))
      |       (WHERE n_chars >= 450 | EVAL flag = 1)
      || STATS n = COUNT(*), nf = SUM(flag) BY _fork
      || SORT _fork ASC""".stripMargin
  val esqlForkOp = QueryDef(
    "ns_esql_fork",
    (s, dir) => EsqlParser.run(esqlForkQuery, _ => docs(s, dir)),
    Some("""WITH d AS (SELECT n_chars, string_split(trim(text), ' ') AS t FROM documents),
      |f AS (SELECT 'fork1' AS _fork, CAST(NULL AS BIGINT) AS flag FROM d
      |        WHERE list_contains(t, 'spark')
      |      UNION ALL
      |      SELECT 'fork2' AS _fork, CAST(1 AS BIGINT) AS flag FROM d
      |        WHERE n_chars >= 450)
      |SELECT _fork, count(*) AS n, CAST(sum(flag) AS BIGINT) AS nf
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin))

  /** FUSE (9.x): RRF over FORK's ranked pages — per-branch rank from
    * the RANK column (desc, id-tie-broken, matching each branch's own
    * SORT), fused score Σ round(1e6/(60+rank)) in EXACT micros so the
    * hash never rides float addition order. The windows order pages
    * the branches' LIMITs already bounded (k·branches rows), and docs
    * retrieved by BOTH legs outrank either leg alone — the engine's
    * ns_search_rrf discipline reached from the language surface. */
  private[graft] val esqlFuseQuery =
    """FROM documents
      || FORK (WHERE MATCH(text, "spark") | SORT n_chars DESC, doc_id ASC | LIMIT 20)
      |       (WHERE lang == "en" | SORT n_chars DESC, doc_id ASC | LIMIT 20)
      || FUSE ON doc_id RANK n_chars
      || SORT _score_c DESC, doc_id ASC
      || LIMIT 10""".stripMargin
  val esqlFuseOp = QueryDef(
    "ns_esql_fuse",
    (s, dir) => EsqlParser.run(esqlFuseQuery, _ => docs(s, dir)),
    Some("""WITH d AS (SELECT doc_id, n_chars, lang,
      |    string_split(trim(text), ' ') AS t FROM documents),
      |l1 AS (SELECT doc_id, n_chars FROM d WHERE list_contains(t, 'spark')
      |       ORDER BY n_chars DESC, doc_id LIMIT 20),
      |l2 AS (SELECT doc_id, n_chars FROM d WHERE lang = 'en'
      |       ORDER BY n_chars DESC, doc_id LIMIT 20),
      |f AS (SELECT 'fork1' AS leg, doc_id, n_chars FROM l1
      |      UNION ALL SELECT 'fork2', doc_id, n_chars FROM l2),
      |r AS (SELECT doc_id,
      |    row_number() OVER (PARTITION BY leg ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM f)
      |SELECT doc_id,
      |  CAST(sum(CAST(round(1000000.0 / (60.0 + rk), 0) AS BIGINT)) AS BIGINT) AS _score_c,
      |  count(*) AS n_legs
      |FROM r GROUP BY 1
      |ORDER BY _score_c DESC, doc_id LIMIT 10""".stripMargin))

  /** ES|QL `TS` — the 9.x time-series command: `TS metrics | STATS
    * outer(inner_over_time(field)) BY dims`. The catalog resolves the
    * TSDB index into a series-shaped frame (`_tsid` = the dimension
    * identity, `_ts_ms` = the sample timestamp, one sample per
    * (series, timestamp) — TSDB rejects per-series duplicate
    * timestamps, so the dedup below IS the index's write-path
    * contract). The counter column is the same synthetic
    * cumulative-sum-mod counter ns_agg_time_series builds (reference
    * TSDB semantics: non-negative, wraps on reset); the gauge is the
    * exact-cents value. compileTsStats then runs the TWO-LEVEL
    * aggregation: RATE/AVG_OVER_TIME per (day, series), MAX/SUM/AVG
    * across series — see EsqlParser.compileTsStats for the scale
    * shape (series-bounded lag window, two hash aggregates). */
  private[graft] val esqlTsQuery =
    """TS metrics
      || STATS max_rate = MAX(RATE(counter)), total_rate = SUM(RATE(counter)),
      |        avg_gauge = AVG(AVG_OVER_TIME(gauge_c)), n = COUNT(*)
      |    BY day
      || SORT day""".stripMargin
  private val tsCounterMod = 1048576L
  private[graft] def tsMetricsFrame(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val series = Window.partitionBy("_tsid").orderBy("_ts_ms")
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("ts_ms").as("_ts_ms"))
      .agg(min_by(col("value"), col("event_id")).as("v"),
        min(date_trunc("day", col("tsu")).cast("date")).as("day"))
      .select(col("user_id").cast("string").as("_tsid"), col("_ts_ms"),
        col("day"), round(col("v") * 100, 0).cast("long").as("gauge_c"))
      .withColumn("counter",
        sum(col("gauge_c")).over(
          series.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          % tsCounterMod)
  }
  /** The per-(day, series) inner-aggregate CTE chain BOTH ts oracles
    * share (one text — they cannot drift): synthesize the series frame,
    * lag-window the counter within (day, series), and fold each series'
    * reset-adjusted milli-rate / milli-average / sample count. */
  private val tsDailyCte = s"""WITH s0 AS (
    |  SELECT user_id, epoch_ms(ts) AS ms,
    |    min(CAST(date_trunc('day', ts) AS DATE)) AS day,
    |    CAST(round(min_by(value, event_id) * 100, 0) AS BIGINT) AS gauge_c
    |  FROM events GROUP BY 1, 2),
    |s AS (
    |  SELECT user_id, ms, day, gauge_c,
    |    CAST(sum(gauge_c) OVER (PARTITION BY user_id ORDER BY ms
    |      ROWS UNBOUNDED PRECEDING) % $tsCounterMod AS BIGINT) AS counter
    |  FROM s0),
    |d AS (
    |  SELECT user_id, ms, day, gauge_c, counter,
    |    lag(counter) OVER (PARTITION BY day, user_id ORDER BY ms) AS prev
    |  FROM s),
    |i AS (
    |  SELECT day, user_id,
    |    CAST(round(CAST(sum(CASE WHEN prev IS NULL THEN 0
    |        WHEN counter >= prev THEN counter - prev ELSE counter END) AS DOUBLE)
    |      * 1000000 / greatest(max(ms) - min(ms), 1), 0) AS BIGINT) AS rate_milli,
    |    CAST(round(CAST(sum(gauge_c) AS DOUBLE) * 1000 / count(gauge_c), 0)
    |      AS BIGINT) AS avg_g,
    |    count(*) AS n_samp
    |  FROM d GROUP BY 1, 2)""".stripMargin
  val esqlTsOp = QueryDef(
    "ns_esql_ts",
    (s, dir) => EsqlParser.run(esqlTsQuery, _ => tsMetricsFrame(s, dir)),
    Some(s"""$tsDailyCte
      |SELECT day, max(rate_milli) AS max_rate,
      |  CAST(sum(rate_milli) AS BIGINT) AS total_rate,
      |  CAST(round(CAST(sum(avg_g) AS DOUBLE) * 1000 / count(avg_g), 0) AS BIGINT)
      |    AS avg_gauge,
      |  CAST(sum(n_samp) AS BIGINT) AS n
      |FROM i GROUP BY 1 ORDER BY day""".stripMargin))

  /** TS with a pipeline CONTINUING past the time-series STATS: the
    * first STATS collapses the series (two-level aggregation), and the
    * second is an ORDINARY aggregation over the daily frame — TS mode
    * applies to the first STATS only (ES's contract; the r17 pipeline
    * fuzzer found the mode leaking pipeline-wide, demanding _tsid of
    * an already-collapsed frame — EsqlParser.compile now drops it
    * after the first STATS, and this key pins the fix under the
    * DuckDB oracle). */
  private[graft] val esqlTsPipelineQuery =
    """TS metrics
      || STATS day_rate = SUM(RATE(counter)), samp = COUNT(*) BY day
      || STATS peak_rate = MAX(day_rate), days = COUNT(*), total_samp = SUM(samp)""".stripMargin
  val esqlTsPipelineOp = QueryDef(
    "ns_esql_ts_pipeline",
    (s, dir) => EsqlParser.run(esqlTsPipelineQuery, _ => tsMetricsFrame(s, dir)),
    Some(s"""$tsDailyCte,
      |day_agg AS (
      |  SELECT day, CAST(sum(rate_milli) AS BIGINT) AS day_rate,
      |    CAST(sum(n_samp) AS BIGINT) AS samp
      |  FROM i GROUP BY 1)
      |SELECT max(day_rate) AS peak_rate, count(*) AS days,
      |  CAST(sum(samp) AS BIGINT) AS total_samp
      |FROM day_agg""".stripMargin))

  /** ES|QL `knn` (9.1's vector match function inside WHERE — the
    * language's entry point to the engine's similarity stack): `WHERE
    * label < 12 AND KNN(embedding, [q…], 7)` keeps the exact 7 nearest
    * rows OF the prefiltered subset (the other conjuncts are
    * PREFILTERS — the ns_similarity_knn_filtered discipline, never the
    * under-filled post-filter residue ES documents as the failure
    * mode). The bracketed query vector is the new numeric MULTIVALUE
    * literal; its values are dyadic rationals (k/4), exactly
    * representable in both float and double, so the only cross-engine
    * residue is the shared round(·, 6) the similarity family already
    * absorbs. Ordering: rounded cosine desc, first-column (vec_id)
    * tie-break; compiles to TakeOrderedAndProject — top-k bounded, no
    * global sort (PlanSpec-locked shape across the similarity keys). */
  private[graft] val esqlKnnVec: Seq[Double] =
    (0 until 64).map(i => ((i % 7) - 3) * 0.25)
  private[graft] val esqlKnnQuery =
    s"""FROM embeddings
       || WHERE label < 12 AND KNN(embedding, [${esqlKnnVec.mkString(", ")}], 7)
       || KEEP vec_id, label
       || SORT vec_id""".stripMargin
  val esqlKnnOp = QueryDef(
    "ns_esql_knn",
    (s, dir) => EsqlParser.run(esqlKnnQuery,
      _ => graft.ops.Par.spread(s, Tables.embeddings(s, dir), col("vec_id"))),
    Some(s"""WITH c AS (SELECT vec_id, label,
      |    round(list_cosine_similarity(embedding::DOUBLE[],
      |      [${esqlKnnVec.mkString(", ")}]::DOUBLE[]), 6) AS s
      |  FROM embeddings WHERE label < 12),
      |r AS (SELECT vec_id, label,
      |    row_number() OVER (ORDER BY s DESC, vec_id) AS rk
      |  FROM c WHERE s IS NOT NULL)
      |SELECT vec_id, label FROM r WHERE rk <= 7 ORDER BY vec_id""".stripMargin))

  /** ES|QL `CATEGORIZE` — 9.x's log-template grouping function, the
    * observability flagship (`STATS n BY cat = CATEGORIZE(message)`).
    * Compiles to the ns_agg_categorize_text normalization as an inline
    * grouping expression — reachable from the language via the r13
    * `BY name = expr` form, one codegen regexp pass per row, and
    * Catalyst partial-aggregates the templates map-side exactly like
    * any other STATS. */
  private[graft] val esqlCategorizeQuery =
    """FROM access_log
      || EVAL line = CONCAT(method, " ", url)
      || STATS n = COUNT(*), n_get = COUNT(*) WHERE method == "GET"
      |    BY cat = CATEGORIZE(line)
      || SORT n DESC, cat
      || LIMIT 20""".stripMargin
  val esqlCategorizeOp = QueryDef(
    "ns_esql_categorize",
    (s, dir) => EsqlParser.run(esqlCategorizeQuery, _ => Synth.accessLog(s, dir)),
    Some(Synth.withAccessLog(
      """SELECT regexp_replace(concat(method, ' ', url), '[0-9]+', '?', 'g') AS cat,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN method = 'GET' THEN 1 ELSE 0 END) AS BIGINT) AS n_get
        |FROM access_log
        |GROUP BY 1 ORDER BY n DESC, cat LIMIT 20""".stripMargin)))

  /** ES|QL `VALUES` and `TOP` — the multivalue aggregates (VALUES =
    * the group's distinct values; TOP = k values by their own
    * ordering, repeats included). VALUES sorts where ES leaves
    * multivalue order undefined — the deterministic refinement — and
    * both ride the same hash aggregate as any STATS; the declared
    * query flattens the multivalues with MV_CONCAT so the output stays
    * scalar (the oracle contract). */
  private[graft] val esqlValuesQuery =
    """FROM events
      || EVAL day = DATE_TRUNC(1 day, tsu)
      || STATS n = COUNT(*), vals = VALUES(event_type),
      |        top2 = TOP(event_type, 2, "desc") BY day
      || EVAL distinct_types = MV_CONCAT(vals, ","),
      |       top_types = MV_CONCAT(top2, ",")
      || DROP vals, top2
      || SORT day""".stripMargin
  val esqlValuesOp = QueryDef(
    "ns_esql_values",
    (s, dir) => EsqlParser.run(esqlValuesQuery, _ => Tables.events(s, dir)),
    Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n,
      |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS distinct_types,
      |  array_to_string(list_sort(list(event_type), 'DESC')[1:2], ',') AS top_types
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin))

  /** ES|QL metric-aggregate residue: PERCENTILE (exact linear
    * interpolation — the dialect contract; the engine's mergeable
    * sketch twin remains the declared at-scale path), STD_DEV
    * (population), WEIGHTED_AVG. Inputs are exact cents longs; the
    * doubles derive once and round through the language's own ROUND,
    * the identical-formula determinism rule. */
  private[graft] val esqlStatsAggsQuery =
    """FROM events
      || EVAL c = TO_LONG(ROUND(value * 100, 0)), w = event_id % 7 + 1
      || STATS p50 = PERCENTILE(c, 50), p95 = PERCENTILE(c, 95),
      |        sd = STD_DEV(c), wa = WEIGHTED_AVG(c, w) BY event_type
      || EVAL p50 = ROUND(p50, 4), p95 = ROUND(p95, 4),
      |       sd = ROUND(sd, 4), wa = ROUND(wa, 4)
      || SORT event_type""".stripMargin
  val esqlStatsAggsOp = QueryDef(
    "ns_esql_stats_aggs",
    (s, dir) => EsqlParser.run(esqlStatsAggsQuery, _ => Tables.events(s, dir)),
    Some("""SELECT event_type,
      |  round(quantile_cont(c, 0.5), 4) AS p50,
      |  round(quantile_cont(c, 0.95), 4) AS p95,
      |  round(stddev_pop(c), 4) AS sd,
      |  round(CAST(sum(c * w) AS DOUBLE)
      |    / sum(CASE WHEN c IS NOT NULL THEN w END), 4) AS wa
      |FROM (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c,
      |    event_id % 7 + 1 AS w FROM events)
      |GROUP BY 1 ORDER BY event_type""".stripMargin))

  /** ES|QL `RERANK` — 9.x's reranking command. In ES the WITH clause
    * names an inference endpoint; the engine compiles the COMMAND and
    * routes scoring through the same catalog seam as ENRICH policies —
    * the shipped `lexical` reranker is the engine's own exact
    * cross-scorer (capped-tf sum, BM25's saturation idea as integer
    * arithmetic; see EsqlParser.lexicalRerankScore), not an imitation
    * of a model. The command adds `_score` to the LIMIT-bounded page
    * it receives — reranking never touches the corpus beyond the
    * retrieval page, which is the entire point of the two-stage
    * shape. */
  private[graft] val esqlRerankQuery =
    """FROM documents
      || WHERE MATCH(text, "spark data")
      || SORT n_chars DESC, doc_id
      || LIMIT 40
      || RERANK "spark data pipeline" ON text
      || SORT _score DESC, doc_id
      || KEEP doc_id, _score
      || LIMIT 15""".stripMargin
  val esqlRerankOp = QueryDef(
    "ns_esql_rerank",
    (s, dir) => EsqlParser.run(esqlRerankQuery, _ => docs(s, dir)),
    Some("""WITH page AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE list_has_any(string_split(trim(text), ' '), ['spark', 'data'])
      |  ORDER BY n_chars DESC, doc_id LIMIT 40),
      |s AS (SELECT doc_id,
      |    concat('|', replace(trim(text), ' ', '||'), '|') AS bar FROM page),
      |sc AS (SELECT doc_id,
      |    least((length(bar) - length(replace(bar, '|spark|', ''))) // 7, 5)
      |    + least((length(bar) - length(replace(bar, '|data|', ''))) // 6, 5)
      |    + least((length(bar) - length(replace(bar, '|pipeline|', ''))) // 10, 5)
      |      AS _score
      |  FROM s)
      |SELECT doc_id, CAST(_score AS BIGINT) AS _score
      |FROM sc ORDER BY _score DESC, doc_id LIMIT 15""".stripMargin))

  /** ES|QL `COMPLETION` — 9.x's text-generation command, closing the
    * last ES|QL command family. In ES the WITH names a hosted
    * inference endpoint; the compiler routes through the same catalog
    * seam as RERANK, and the shipped `bigram_lm` endpoint is the
    * engine's OWN statistical language model — greedy argmax
    * continuation from the PERSISTED corpus bigram artifact (the
    * ns_text_bigram_logprob / ns_quality_perplexity model), not an
    * imitation of a hosted LLM: real, deterministic generation from
    * real learned statistics, the honest in-sandbox twin of the
    * inference call.
    *
    * Scale shape: the "model" is the vocabulary-bounded next-token
    * dim (argmax over the persisted bigram table, one row per vocab
    * word — built from the artifact, never the corpus, at query
    * time), generation is K successive broadcast-hash lookups against
    * that dim, and the command applies to the LIMIT-bounded page only
    * (the RERANK page discipline — generation is per-retrieved-row
    * work, never corpus-wide). Greedy decode ties break
    * lexicographically (count DESC, token ASC) so both engines
    * generate identical text; a token with no observed continuation
    * ends the generation (concat_ws skips the null tail). */
  private val complSteps = 4
  /** The greedy next-token dim, PERSISTED (the unigram-dictionary
    * discipline): argmax over the bigram artifact runs once per corpus
    * snapshot, so query-time generation only scans the one-row-per-
    * vocab-word dim — never re-aggregates the bigram table per query. */
  private def bigramNextDim(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/documents.parquet", "bigram_next") { path =>
      TextOps.bigramFreq(s, dir)
        .groupBy("w1")
        .agg(min(struct((-col("bc")).as("nb"), col("w2").as("w2"))).as("m"))
        .select(col("w1"), col("m.w2").as("next"))
        .coalesce(1)  // dim-bounded: one row per vocabulary word
        .write.mode("overwrite").parquet(path)
    }
  private[graft] def bigramGreedyCompletion(s: SparkSession, dir: String)(
      df: DataFrame, prompt: Column, target: String): DataFrame = {
    val dim = bigramNextDim(s, dir)
    val seeded = df.withColumn("__g0", element_at(split(trim(prompt), " "), -1))
    val stepped = (1 to complSteps).foldLeft(seeded) { (d, i) =>
      val dm = dim.select(col("w1").as(s"__k$i"), col("next").as(s"__g$i"))
      d.join(broadcast(dm), d(s"__g${i - 1}") === dm(s"__k$i"), "left")
        .drop(s"__k$i")
    }
    stepped
      .withColumn(target,
        concat_ws(" ", (1 to complSteps).map(i => col(s"__g$i")): _*))
      .drop("__g0" +: (1 to complSteps).map(i => s"__g$i"): _*)
  }
  private[graft] val esqlCompletionQuery =
    """FROM documents
      || WHERE MATCH(text, "spark")
      || SORT n_chars DESC, doc_id
      || LIMIT 20
      || COMPLETION next_words = text WITH bigram_lm
      || KEEP doc_id, next_words
      || SORT doc_id""".stripMargin
  val esqlCompletionOp = QueryDef(
    "ns_esql_completion",
    (s, dir) => EsqlParser.run(esqlCompletionQuery, _ => docs(s, dir),
      completions = {
        case "bigram_lm" => bigramGreedyCompletion(s, dir)
        case n => throw EsqlParser.ParseError(s"unknown completion endpoint $n", 0)
      }),
    Some("""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM t)),
      |bf AS (SELECT w1, w2, count(*) AS bc FROM bg GROUP BY 1, 2),
      |nx AS (SELECT w1, w2 AS next FROM (
      |    SELECT w1, w2, row_number() OVER (PARTITION BY w1 ORDER BY bc DESC, w2) AS rn
      |    FROM bf) WHERE rn = 1),
      |page AS (SELECT doc_id, t[len(t)] AS g0 FROM (
      |    SELECT doc_id, string_split(trim(text), ' ') AS t, n_chars FROM documents
      |    WHERE list_contains(string_split(trim(text), ' '), 'spark')
      |    ORDER BY n_chars DESC, doc_id LIMIT 20)),
      |g AS (SELECT p.doc_id,
      |    n1.next AS g1, n2.next AS g2, n3.next AS g3, n4.next AS g4
      |  FROM page p
      |    LEFT JOIN nx n1 ON n1.w1 = p.g0
      |    LEFT JOIN nx n2 ON n2.w1 = n1.next
      |    LEFT JOIN nx n3 ON n3.w1 = n2.next
      |    LEFT JOIN nx n4 ON n4.w1 = n3.next)
      |SELECT doc_id, concat_ws(' ', g1, g2, g3, g4) AS next_words
      |FROM g ORDER BY doc_id""".stripMargin))

  /** ES|QL `METADATA _index` — the multi-index disambiguator: each row
    * of a `FROM a, b` union carries its source index name, so the
    * pipeline can group or filter by provenance. The column is a
    * plan-time literal per union leg (zero per-row work); _id /
    * _version / _score are rejected by name — no doc-store identity
    * backs them here. */
  private[graft] val esqlMetadataQuery =
    """FROM docs_en, docs_rest METADATA _index
      || STATS n = COUNT(*), chars = SUM(n_chars) BY _index
      || SORT _index""".stripMargin
  val esqlMetadataOp = QueryDef(
    "ns_esql_metadata",
    (s, dir) => EsqlParser.run(esqlMetadataQuery, {
      case "docs_en" => docs(s, dir).filter(col("lang") === "en")
      case "docs_rest" => docs(s, dir).filter(col("lang") =!= "en")
      case n => throw new IllegalArgumentException(s"unknown index $n")
    }),
    Some("""SELECT idx AS _index, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM (SELECT 'docs_en' AS idx, n_chars FROM documents WHERE lang = 'en'
      |      UNION ALL
      |      SELECT 'docs_rest', n_chars FROM documents WHERE lang <> 'en')
      |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** ES|QL ENRICH with a RANGE-typed policy — ES's second enrich policy
    * type (`range`: the match field falls inside a dim row's interval —
    * IP blocks, SLA tiers, price bands). The catalog shapes the policy
    * dim with __range_lo/__range_hi and the compiler emits the geoip
    * discipline: the interval table broadcasts, the probe side stays
    * unshuffled, and the join is a BroadcastNestedLoopJoin whose inner
    * side is |dim| rows (PlanSpec-locked). */
  private[graft] val esqlEnrichRangeQuery =
    """FROM events
      || EVAL value_c = TO_LONG(ROUND(value * 100, 0))
      || ENRICH tiers ON value_c
      || STATS n = COUNT(*), s = SUM(value_c) BY tier
      || SORT tier""".stripMargin
  private val tierRows = Seq(
    (0L, 20000L, "bronze"), (20000L, 60000L, "silver"),
    (60000L, Long.MaxValue, "gold"))
  val esqlEnrichRangeOp = QueryDef(
    "ns_esql_enrich_range",
    (s, dir) => {
      import s.implicits._
      val tiers = tierRows.toDF("__range_lo", "__range_hi", "tier")
      EsqlParser.run(esqlEnrichRangeQuery, _ => Tables.events(s, dir),
        policies = { case "tiers" => (tiers, "value_c")
                     case n => throw EsqlParser.ParseError(s"unknown enrich policy $n", 0) })
    },
    Some("""SELECT CASE WHEN v < 20000 THEN 'bronze'
      |            WHEN v < 60000 THEN 'silver' ELSE 'gold' END AS tier,
      |  count(*) AS n, CAST(sum(v) AS BIGINT) AS s
      |FROM (SELECT CAST(round(value * 100, 0) AS BIGINT) AS v FROM events)
      |GROUP BY 1 ORDER BY tier""".stripMargin))

  /** ES|QL date-function residue: DATE_TRUNC with span literals
    * (calendar AND fixed-multiple units), DATE_FORMAT, DATE_DIFF
    * (truncate-toward-zero, ES's contract), TO_DATETIME — the
    * functions every observability pipeline leads with. The fixed-
    * width truncs are pure epoch-long arithmetic (codegen, no
    * session-zone dependence); everything else is the builtin
    * date_trunc/date_format. NOW() stays deliberately absent:
    * wall-clock reads are nondeterministic and results must replay. */
  private[graft] val esqlDatesQuery =
    """FROM events
      || EVAL hr4 = DATE_TRUNC(4 hours, tsu),
      |       label = DATE_FORMAT("yyyy-MM", tsu),
      |       age_h = DATE_DIFF("hours", tsu, TO_DATETIME(1706659200000))
      || STATS n = COUNT(*), mx = MAX(age_h) BY hr4, label
      || SORT hr4
      || LIMIT 50""".stripMargin
  val esqlDatesOp = QueryDef(
    "ns_esql_dates",
    (s, dir) => EsqlParser.run(esqlDatesQuery, _ => Tables.events(s, dir)),
    Some("""SELECT make_timestamp(CAST(epoch_us(ts) - epoch_us(ts) % 14400000000 AS BIGINT)) AS hr4,
      |  strftime(ts, '%Y-%m') AS label, count(*) AS n,
      |  max(CAST(trunc((1706659200000000 - epoch_us(ts)) / 3600000000) AS BIGINT)) AS mx
      |FROM events GROUP BY 1, 2 ORDER BY hr4 LIMIT 50""".stripMargin))

  /** ES|QL scalar-function residue in one declared sweep: the string
    * library (REVERSE/REPEAT/LTRIM/SPACE/BIT_LENGTH/BYTE_LENGTH), the
    * hash + base64 family (MD5 / SHA256 / HASH(alg) / TO_BASE64 /
    * FROM_BASE64), the full trigonometric + hyperbolic set (SIN…ATAN2,
    * SINH/COSH/TANH, CBRT/HYPOT, PI/TAU/E, TO_DEGREES/TO_RADIANS) and
    * DATE_EXTRACT with java.time ChronoField names (ISO day-of-week).
    * All pure codegen scalar ops on a pushed-down 20-row slice;
    * engine-compared doubles round through the language's own ROUND
    * (the determinism discipline), trig inputs derive from exact
    * decimal grids so both engines see identical doubles. */
  private[graft] val esqlFunctionsQuery =
    """FROM events
      || WHERE event_id < 20
      || EVAL d = (event_id % 10) / 10.0, vx = ROUND(value, 2)
      || EVAL rev = REVERSE(event_type), rep = REPEAT(event_type, 2),
      |       pad = LTRIM(CONCAT(SPACE(3), event_type)),
      |       bl = BIT_LENGTH(event_type), byl = BYTE_LENGTH(event_type),
      |       h1 = MD5(event_type), h2 = HASH("sha256", event_type),
      |       b64 = TO_BASE64(event_type), rtp = FROM_BASE64(TO_BASE64(event_type)),
      |       sn = ROUND(SIN(vx), 6), cs = ROUND(COS(vx), 6), tn = ROUND(TAN(vx), 6),
      |       asn = ROUND(ASIN(d), 6), acs = ROUND(ACOS(d), 6),
      |       at = ROUND(ATAN(vx), 6), at2 = ROUND(ATAN2(d, 2.0), 6),
      |       sh = ROUND(SINH(d), 6), ch = ROUND(COSH(d), 6), th = ROUND(TANH(d), 6),
      |       cb = ROUND(CBRT(vx), 6), hy = ROUND(HYPOT(d, 2.0), 6),
      |       cst = ROUND(PI() + TAU() + E(), 6),
      |       dg = ROUND(TO_DEGREES(d), 6), rd = ROUND(TO_RADIANS(dg), 6),
      |       yy = DATE_EXTRACT("year", tsu), dow = DATE_EXTRACT("day_of_week", tsu),
      |       doy = DATE_EXTRACT("day_of_year", tsu), hh = DATE_EXTRACT("hour_of_day", tsu)
      || EVAL v = SPLIT(CONCAT(TO_STRING(event_id % 7), ",",
      |                 TO_STRING(event_id % 5), ",", TO_STRING(event_id % 3)), ","),
      |       md = MV_MEDIAN(v), pc = ROUND(MV_PERCENTILE(v, 75), 6),
      |       zp = MV_CONCAT(MV_ZIP(v, v, "-"), "|")
      || KEEP event_id, rev, rep, pad, bl, byl, h1, h2, b64, rtp, sn, cs, tn,
      |       asn, acs, at, at2, sh, ch, th, cb, hy, cst, dg, rd, yy, dow, doy, hh,
      |       md, pc, zp
      || SORT event_id""".stripMargin
  val esqlFunctionsOp = QueryDef(
    "ns_esql_functions",
    (s, dir) => EsqlParser.run(esqlFunctionsQuery, _ => Tables.events(s, dir)),
    Some("""SELECT event_id,
      |  reverse(event_type) AS rev, repeat(event_type, 2) AS rep,
      |  ltrim(concat(repeat(' ', 3), event_type)) AS pad,
      |  CAST(bit_length(event_type) AS BIGINT) AS bl,
      |  CAST(octet_length(event_type::BLOB) AS BIGINT) AS byl,
      |  md5(event_type) AS h1, sha256(event_type) AS h2,
      |  to_base64(event_type::BLOB) AS b64,
      |  decode(from_base64(to_base64(event_type::BLOB))) AS rtp,
      |  round(sin(vx), 6) AS sn, round(cos(vx), 6) AS cs, round(tan(vx), 6) AS tn,
      |  round(asin(d), 6) AS asn, round(acos(d), 6) AS acs,
      |  round(atan(vx), 6) AS at, round(atan2(d, 2.0), 6) AS at2,
      |  round((exp(d) - exp(-d)) / 2, 6) AS sh,
      |  round((exp(d) + exp(-d)) / 2, 6) AS ch,
      |  round((exp(d) - exp(-d)) / (exp(d) + exp(-d)), 6) AS th,
      |  round(cbrt(vx), 6) AS cb, round(sqrt(d * d + 4.0), 6) AS hy,
      |  round(pi() + 2 * pi() + exp(1), 6) AS cst,
      |  round(degrees(d), 6) AS dg, round(radians(degrees(d)), 6) AS rd,
      |  CAST(extract(year FROM ts) AS BIGINT) AS yy,
      |  CAST(extract(isodow FROM ts) AS BIGINT) AS dow,
      |  CAST(extract(doy FROM ts) AS BIGINT) AS doy,
      |  CAST(extract(hour FROM ts) AS BIGINT) AS hh,
      |  list_aggregate(list_transform(v, x -> CAST(x AS DOUBLE)), 'median') AS md,
      |  round(list_aggregate(list_transform(v, x -> CAST(x AS DOUBLE)),
      |    'quantile_cont', 0.75), 6) AS pc,
      |  array_to_string(list_transform(list_zip(v, v),
      |    p -> concat_ws('-', p[1], p[2])), '|') AS zp
      |FROM (SELECT event_id, event_type, ts,
      |    (event_id % 10) / 10.0 AS d, round(value, 2) AS vx,
      |    string_split(concat(CAST(event_id % 7 AS VARCHAR), ',',
      |      CAST(event_id % 5 AS VARCHAR), ',',
      |      CAST(event_id % 3 AS VARCHAR)), ',') AS v
      |  FROM events WHERE event_id < 20)
      |ORDER BY event_id""".stripMargin))

  /** The r18 function-audit closure sweep (SURVEY §2.5.2's top absent
    * rows, now closed): the 9.1 full-text additions MATCH_PHRASE /
    * MULTI_MATCH / TERM (compiled onto the engine's shared whitespace
    * analysis — padded-containment phrase, OR'd per-field match,
    * token-equality term), the 9.1 math additions COPY_SIGN and
    * ROUND_TO (one codegen CASE over plan-time-sorted points, both in
    * a long and a double flavor), ST_DISJOINT (intersects' DE-9IM
    * negation, null-safe), and ST_EXTENT_AGG (the group bounding box
    * as four partial-aggregating min/max passes, emitted in the
    * ENVELOPE struct layout so ST_XMIN…ST_YMAX compose on it).
    * Determinism: the only doubles are ROUND_TO's literal points
    * (min/max aggregated — no accumulation-order exposure) and the
    * integer-valued grid coordinates; everything else is long counts
    * and sums. */
  private[graft] val esqlFunctions2Query =
    """FROM documents
      || EVAL mp = MATCH_PHRASE(text, "table scan"),
      |       mm = MULTI_MATCH("vector src3", text, source),
      |       tm = TERM(text, "vector"),
      |       cs = COPY_SIGN(n_chars, doc_id % 3 - 1),
      |       rt = ROUND_TO(n_chars - 300, -250, -50, 0, 150),
      |       rtd = ROUND_TO(n_chars / 7.0, 10.25, 33.75, 60.5),
      |       p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(doc_id % 360 - 180),
      |                              " ", TO_STRING(doc_id % 170 - 85), ")")),
      |       dj = ST_DISJOINT(p, TO_GEOSHAPE("ENVELOPE (-60, 60, 45, -45)"))
      || STATS nmp = COUNT(*) WHERE mp, nmm = COUNT(*) WHERE mm,
      |        ntm = COUNT(*) WHERE tm, ndj = COUNT(*) WHERE dj,
      |        scs = SUM(cs), srt = SUM(rt),
      |        mnd = MIN(rtd), mxd = MAX(rtd),
      |        ext = ST_EXTENT_AGG(p) BY lang
      || EVAL xmn = ST_XMIN(ext), xmx = ST_XMAX(ext),
      |       ymn = ST_YMIN(ext), ymx = ST_YMAX(ext)
      || DROP ext
      || SORT lang""".stripMargin
  val esqlFunctions2Op = QueryDef(
    "ns_esql_functions2",
    (s, dir) => EsqlParser.run(esqlFunctions2Query,
      _ => graft.ops.Par.spread(s, Tables.documents(s, dir), col("doc_id"))),
    Some("""WITH b AS (SELECT lang,
      |    contains(' ' || trim(text) || ' ', ' table scan ') AS mp,
      |    (list_has_any(string_split(trim(text), ' '), ['vector', 'src3'])
      |      OR list_has_any(string_split(trim(source), ' '), ['vector', 'src3'])) AS mm,
      |    list_contains(string_split(trim(text), ' '), 'vector') AS tm,
      |    CASE WHEN (doc_id % 3 - 1) < 0 THEN -abs(n_chars) ELSE abs(n_chars) END AS cs,
      |    CASE WHEN n_chars - 300 >= 150 THEN 150
      |         WHEN n_chars - 300 >= 0 THEN 0
      |         WHEN n_chars - 300 >= -50 THEN -50 ELSE -250 END AS rt,
      |    CAST(CASE WHEN n_chars / 7.0 >= 60.5 THEN 60.5
      |         WHEN n_chars / 7.0 >= 33.75 THEN 33.75 ELSE 10.25 END AS DOUBLE) AS rtd,
      |    CAST(doc_id % 360 - 180 AS DOUBLE) AS x,
      |    CAST(doc_id % 170 - 85 AS DOUBLE) AS y
      |  FROM documents)
      |SELECT count(*) FILTER (WHERE mp) AS nmp,
      |  count(*) FILTER (WHERE mm) AS nmm,
      |  count(*) FILTER (WHERE tm) AS ntm,
      |  count(*) FILTER (WHERE NOT (x >= -60 AND x <= 60 AND y >= -45 AND y <= 45)) AS ndj,
      |  CAST(sum(cs) AS BIGINT) AS scs, CAST(sum(rt) AS BIGINT) AS srt,
      |  min(rtd) AS mnd, max(rtd) AS mxd, lang,
      |  min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, max(y) AS ymx
      |FROM b GROUP BY lang ORDER BY lang""".stripMargin))

  /** The function audit's LAST two rows closed (r18: TO_VERSION /
    * TO_DATE_NANOS): semver-aware version ORDERING proven through SORT
    * on the encoded keyword — minors span 0..12 so numeric and
    * lexicographic order genuinely disagree ("1.2.x" < "1.11.x"), and
    * every fourth version carries a prerelease tag that must sort
    * BEFORE its release — plus nanosecond timestamps carried as
    * epoch-nanos longs: a 9-digit fraction parsed exactly and the long
    * passthrough leg (TO_DATE_NANOS of an already-nanos value is
    * identity). DuckDB mirrors the nanos ARITHMETICALLY
    * (epoch_ns(base) + tail): its own VARCHAR→TIMESTAMP_NS cast
    * truncates fractions to micros, so a cast-based oracle would
    * under-assert by exactly the nano tail under test. */
  private[graft] val esqlFunctions3Query =
    """FROM documents
      || WHERE doc_id < 120
      || EVAL vs = CONCAT(TO_STRING(doc_id % 2 + 1), ".",
      |                   TO_STRING(doc_id % 13), ".", TO_STRING(n_chars % 7)),
      |       vstr = CASE(doc_id % 4 == 0,
      |                   CONCAT(vs, "-beta.", TO_STRING(doc_id % 2)), vs),
      |       ver = TO_VERSION(vstr),
      |       dn = TO_DATE_NANOS(CONCAT("2024-03-05T10:30:15.",
      |                                 TO_STRING(100000000 + doc_id))),
      |       dn2 = TO_DATE_NANOS(dn)
      || SORT ver, doc_id
      || LIMIT 40
      || KEEP doc_id, vstr, dn, dn2""".stripMargin
  val esqlFunctions3Op = QueryDef(
    "ns_esql_functions3",
    (s, dir) => EsqlParser.run(esqlFunctions3Query, _ => Tables.documents(s, dir)),
    Some("""SELECT doc_id, vstr, dn, dn AS dn2 FROM (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0
      |         THEN concat(vs, '-beta.', CAST(doc_id % 2 AS VARCHAR)) ELSE vs END AS vstr,
      |    epoch_ns(TIMESTAMP '2024-03-05 10:30:15') + 100000000 + doc_id AS dn,
      |    doc_id % 2 + 1 AS vmaj, doc_id % 13 AS vmin, n_chars % 7 AS vpat,
      |    (doc_id % 4 = 0) AS haspre,
      |    concat('beta.', CAST(doc_id % 2 AS VARCHAR)) AS pretag
      |  FROM (SELECT doc_id, n_chars,
      |      concat(CAST(doc_id % 2 + 1 AS VARCHAR), '.',
      |        CAST(doc_id % 13 AS VARCHAR), '.',
      |        CAST(n_chars % 7 AS VARCHAR)) AS vs
      |    FROM documents WHERE doc_id < 120))
      |ORDER BY vmaj, vmin, vpat,
      |  CASE WHEN haspre THEN 0 ELSE 1 END,
      |  CASE WHEN haspre THEN pretag ELSE '' END, doc_id
      |LIMIT 40""".stripMargin))

  /** ES|QL `SHOW INFO` — the remaining source command (the fourth
    * pipeline head next to FROM/TS/ROW): one deterministic row of
    * engine build facts, compiled to a LocalRelation that touches no
    * data at any SF. No wall-clock build date — results must replay. */
  val esqlShowOp = QueryDef(
    "ns_esql_show",
    (s, dir) => EsqlParser.run("SHOW INFO",
      n => throw EsqlParser.ParseError(s"SHOW INFO resolves no index ($n)", 0),
      session = Some(s)),
    Some(s"SELECT '${graft.BuildInfo.version}' AS version, " +
      s"'${graft.BuildInfo.date}' AS date, '${graft.BuildInfo.hash}' AS hash"))

  /** ES|QL `DATE_PARSE` — DATE_FORMAT's inverse (the weekly log-pipeline
    * hit: a stringly date column back to TIMESTAMP). Round-trips the
    * formatted instant, parses a FIXED reference stamp for a nontrivial
    * DATE_DIFF, and exercises ES's unparseable-input contract
    * (null-with-warning, not an error) on a garbage column — all codegen
    * scalars (try_to_timestamp) on a pushed 20-row slice. */
  private[graft] val esqlDateParseQuery =
    """FROM events
      || WHERE event_id < 20
      || EVAL s = DATE_FORMAT("yyyy-MM-dd HH:mm:ss", tsu),
      |       d = DATE_PARSE("yyyy-MM-dd HH:mm:ss", s),
      |       ref = DATE_PARSE("yyyy-MM-dd HH:mm:ss", "2024-01-15 12:00:00"),
      |       age_h = DATE_DIFF("hours", d, ref),
      |       bad = DATE_PARSE("yyyy-MM-dd", event_type)
      || KEEP event_id, s, d, age_h, bad
      || SORT event_id""".stripMargin
  val esqlDateParseOp = QueryDef(
    "ns_esql_date_parse",
    (s, dir) => EsqlParser.run(esqlDateParseQuery, _ => Tables.events(s, dir)),
    Some("""SELECT event_id, s, strptime(s, '%Y-%m-%d %H:%M:%S') AS d,
      |  CAST(trunc((epoch_us(TIMESTAMP '2024-01-15 12:00:00')
      |      - epoch_us(strptime(s, '%Y-%m-%d %H:%M:%S'))) / 3600000000.0) AS BIGINT) AS age_h,
      |  try_strptime(event_type, '%Y-%m-%d') AS bad
      |FROM (SELECT event_id, event_type,
      |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS s FROM events
      |  WHERE event_id < 20)
      |ORDER BY event_id""".stripMargin))

  /** ES|QL request-pinned time parameters — the deterministic answer to
    * NOW(): the client pins the instant once per request (`?now`, ES's
    * params mechanism / Kibana's `?_tstart`), the engine substitutes the
    * literal at parse time, and `?now - 1 day` compiles through the
    * span-arithmetic path to a CONSTANT bound — constant-folded, so the
    * relative-time-range idiom costs exactly what a hand-written literal
    * costs, and results replay byte-equal. Unknown `?name` fails at
    * parse time. */
  private[graft] val esqlParamsQuery =
    """FROM events
      || WHERE tsu > ?now - 1 day AND value >= ?floor
      || STATS n = COUNT(*), mx = MAX(value) BY event_type
      || SORT event_type""".stripMargin
  val esqlParamsOp = QueryDef(
    "ns_esql_params",
    (s, dir) => EsqlParser.run(esqlParamsQuery, _ => Tables.events(s, dir),
      params = Map(
        "now" -> EsqlParser.param(java.time.Instant.parse("2024-01-30T00:00:00Z")),
        "floor" -> EsqlParser.param(100L))),
    Some("""SELECT event_type, count(*) AS n, max(value) AS mx
      |FROM events
      |WHERE ts > TIMESTAMP '2024-01-29 00:00:00' AND value >= 100
      |GROUP BY 1 ORDER BY event_type""".stripMargin))

  /** ES|QL `MEDIAN_ABSOLUTE_DEVIATION` — the robust-dispersion
    * aggregate (median(|x − median(x)|)): no single-pass exact form
    * exists, so the compiler emits TWO aggregation stages — per-group
    * medians (|groups| rows, dashboard-bounded) broadcast back onto the
    * rows, then an ordinary aggregate computes the deviation median
    * next to every other requested aggregate. ES serves MAD from a
    * TDigest sketch; this dialect's contract is exact (like its
    * PERCENTILE), and DuckDB's mad() oracles it directly. */
  private[graft] val esqlMadQuery =
    """FROM events
      || STATS mad = MEDIAN_ABSOLUTE_DEVIATION(value), med = MEDIAN(value),
      |        n = COUNT(*) BY event_type
      || EVAL mad = ROUND(mad, 6), med = ROUND(med, 6)
      || SORT event_type""".stripMargin
  val esqlMadOp = QueryDef(
    "ns_esql_mad",
    (s, dir) => EsqlParser.run(esqlMadQuery, _ => Tables.events(s, dir)),
    Some("""SELECT event_type, round(mad(value), 6) AS mad,
      |  round(median(value), 6) AS med, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin))

  /** ES|QL multivalue/conversion residue sweep #2: the
    * robust-dispersion and rank-weighting multivalue reducers
    * (MV_MEDIAN_ABSOLUTE_DEVIATION, MV_PSERIES_WEIGHTED_SUM — ES
    * 8.16's p-series scorer, Σ v(i)/i^p in multivalue order), SCALB
    * (d·2^n), and TO_IP's value-or-null conversion contract exercised
    * on both a valid dotted-quad construction (some octets pushed past
    * 255 to exercise the null side) and a garbage column. All codegen
    * scalars on the pushed 20-row slice. */
  private[graft] val esqlMvStatsQuery =
    """FROM events
      || WHERE event_id < 20
      || EVAL v = SPLIT(CONCAT(TO_STRING(event_id % 7), ",",
      |                TO_STRING(event_id % 5), ",", TO_STRING(event_id % 3), ",",
      |                TO_STRING(event_id % 11)), ","),
      |       vmad = ROUND(MV_MEDIAN_ABSOLUTE_DEVIATION(v), 6),
      |       ps = ROUND(MV_PSERIES_WEIGHTED_SUM(v, 1.5), 6),
      |       ip = TO_IP(CONCAT("10.0.0.", TO_STRING(event_id * 20))),
      |       bad_ip = TO_IP(event_type),
      |       sc = ROUND(SCALB(ROUND(value, 2), 3), 6)
      || KEEP event_id, vmad, ps, ip, bad_ip, sc
      || SORT event_id""".stripMargin
  val esqlMvStatsOp = QueryDef(
    "ns_esql_mv_stats",
    (s, dir) => EsqlParser.run(esqlMvStatsQuery, _ => Tables.events(s, dir)),
    Some("""SELECT event_id,
      |  round(list_aggregate(ld, 'mad'), 6) AS vmad,
      |  round(list_sum(list_transform(list_zip(ld, range(1, len(ld) + 1)),
      |    p -> p[1] / pow(p[2], 1.5))), 6) AS ps,
      |  CASE WHEN regexp_full_match(ip_c,
      |    '((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])')
      |    THEN ip_c END AS ip,
      |  CASE WHEN regexp_full_match(event_type,
      |    '((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])')
      |    THEN event_type END AS bad_ip,
      |  round(round(value, 2) * 8, 6) AS sc
      |FROM (SELECT event_id, event_type, value,
      |    list_transform(string_split(concat(
      |      CAST(event_id % 7 AS VARCHAR), ',', CAST(event_id % 5 AS VARCHAR), ',',
      |      CAST(event_id % 3 AS VARCHAR), ',', CAST(event_id % 11 AS VARCHAR)), ','),
      |      x -> CAST(x AS DOUBLE)) AS ld,
      |    concat('10.0.0.', CAST(event_id * 20 AS VARCHAR)) AS ip_c
      |  FROM events WHERE event_id < 20)
      |ORDER BY event_id""".stripMargin))

  /** ES|QL spatial functions (8.14+): TO_GEOPOINT (WKT POINT parse,
    * invalid → null), ST_X/ST_Y, ST_DISTANCE (the engine's shared
    * haversine in meters, identical operation order in both engines —
    * the ns_geo discipline — so round(2) absorbs the 1-ulp
    * transcendental residue), TO_GEOSHAPE's ENVELOPE form and the
    * point-vs-envelope ST_CONTAINS/ST_WITHIN/ST_INTERSECTS relations.
    * All codegen scalars on the pushed 20-row slice; the synthesized
    * coordinates derive from exact integer grids so both engines see
    * identical doubles. */
  private[graft] val esqlGeoQuery =
    """FROM events
      || WHERE event_id < 20
      || EVAL wkt = CONCAT("POINT (", TO_STRING(event_id * 15 - 150), " ",
      |                    TO_STRING(event_id * 6 - 57), ")"),
      |       p = TO_GEOPOINT(wkt),
      |       x = ST_X(p), y = ST_Y(p),
      |       d = ROUND(ST_DISTANCE(p, TO_GEOPOINT("POINT (103.8 1.5)")), 2),
      |       inbox = ST_WITHIN(p, TO_GEOSHAPE("ENVELOPE (-60, 60, 45, -45)")),
      |       bad = ST_X(TO_GEOPOINT(event_type)),
      |       xmn = ST_XMIN(TO_GEOSHAPE("ENVELOPE (-60, 60, 45, -45)")),
      |       ymx = ST_YMAX(TO_GEOSHAPE("ENVELOPE (-60, 60, 45, -45)")),
      |       bymn = ST_YMIN(ST_ENVELOPE(p)), bxmx = ST_XMAX(ST_ENVELOPE(p))
      || KEEP event_id, x, y, d, inbox, bad, xmn, ymx, bymn, bxmx
      || SORT event_id""".stripMargin
  val esqlGeoOp = QueryDef(
    "ns_esql_geo",
    (s, dir) => EsqlParser.run(esqlGeoQuery, _ => Tables.events(s, dir)),
    Some("""SELECT event_id, x, y,
      |  round(2 * 6371000.0 * asin(sqrt(
      |    sin((1.5 - y) * pi() / 360) * sin((1.5 - y) * pi() / 360) +
      |    cos(y * pi() / 180) * cos(1.5 * pi() / 180) *
      |    sin((103.8 - x) * pi() / 360) * sin((103.8 - x) * pi() / 360))), 2) AS d,
      |  (x >= -60 AND x <= 60 AND y >= -45 AND y <= 45) AS inbox,
      |  CAST(NULL AS DOUBLE) AS bad,
      |  CAST(-60 AS DOUBLE) AS xmn, CAST(45 AS DOUBLE) AS ymx,
      |  y AS bymn, x AS bxmx
      |FROM (SELECT event_id,
      |    CAST(event_id * 15 - 150 AS DOUBLE) AS x,
      |    CAST(event_id * 6 - 57 AS DOUBLE) AS y
      |  FROM events WHERE event_id < 20)
      |ORDER BY event_id""".stripMargin))

  /** ES|QL `ST_CENTROID_AGG` — the spatial aggregate (component-wise
    * mean of the group's points, ES's geo-centroid contract): the
    * grid coordinates are integer-valued doubles, so the sums are
    * EXACT in IEEE double regardless of accumulation order and the
    * single closing division matches bit-for-bit across engines. */
  private[graft] val esqlGeoCentroidQuery =
    """FROM events
      || EVAL p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(event_id % 360 - 180),
      |           " ", TO_STRING(event_id % 120 - 60), ")"))
      || STATS c = ST_CENTROID_AGG(p), n = COUNT(*) BY event_type
      || EVAL cx = ROUND(ST_X(c), 6), cy = ROUND(ST_Y(c), 6)
      || DROP c
      || SORT event_type""".stripMargin
  val esqlGeoCentroidOp = QueryDef(
    "ns_esql_geo_centroid",
    (s, dir) => EsqlParser.run(esqlGeoCentroidQuery, _ => Tables.events(s, dir)),
    Some("""SELECT event_type, count(*) AS n,
      |  round(avg(CAST(event_id % 360 - 180 AS DOUBLE)), 6) AS cx,
      |  round(avg(CAST(event_id % 120 - 60 AS DOUBLE)), 6) AS cy
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin))

  // ------------------------------------------------ ES|QL polygon + grids
  /** Shared synthesized point (integer degrees from event_id — exact
    * in IEEE double, so every cross product / quantization below is
    * bit-identical across engines). */
  private val esqlPtLonSql = "CAST(event_id % 360 - 180 AS DOUBLE)"
  private val esqlPtLatSql = "CAST(event_id % 120 - 60 AS DOUBLE)"
  private val esqlPtEval =
    """p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(event_id % 360 - 180),
      |           " ", TO_STRING(event_id % 120 - 60), ")"))""".stripMargin

  /** Half-plane containment text for the DuckDB oracle — the ONE
    * shared builder (Enrich.halfPlaneInsideSql), term-order-aligned
    * with EsqlParser.pointInPoly's Column mirror. */
  private def polyInsideSqlText(ring: Seq[(Int, Int)], x: String, y: String): String =
    Enrich.halfPlaneInsideSql(ring.map { case (px, py) => (px.toLong, py.toLong) }, x, y)
  // (lon, lat) rings, closed in the WKT literal below
  private val esqlQuad = Seq((-150, -70), (-100, 80), (120, 75), (150, -60))
  private val esqlTri = Seq((-160, -65), (140, 70), (135, -30))
  private def wktPolygon(ring: Seq[(Int, Int)]): String =
    (ring :+ ring.head).map { case (x, y) => s"$x $y" }.mkString("POLYGON ((", ", ", "))")

  /** ES|QL TO_GEOSHAPE WKT POLYGON + point-in-polygon relations — the
    * drawn-region filter as a query-language function: the ring parses
    * at PLAN time (query geometries are constants) and containment
    * compiles to the ns_geo_polygon half-plane discipline — one cross
    * product per edge, pure codegen arithmetic over the row's point,
    * map-only. Integer vertices × integer points keep every product
    * exact, so the booleans (boundary included) are bit-identical in
    * both engines. A quad and a triangle cover >3-vertex rings and
    * both argument roles (ST_WITHIN and ST_CONTAINS). */
  private[graft] val esqlGeoPolygonQuery =
    s"""FROM events
       || EVAL $esqlPtEval,
       |       inq = ST_WITHIN(p, TO_GEOSHAPE("${wktPolygon(esqlQuad)}")),
       |       intr = ST_CONTAINS(TO_GEOSHAPE("${wktPolygon(esqlTri)}"), p)
       || STATS n = COUNT(*), nq = SUM(CASE(inq, 1, 0)), nt = SUM(CASE(intr, 1, 0)) BY event_type
       || SORT event_type""".stripMargin
  val esqlGeoPolygonOp = QueryDef(
    "ns_esql_geo_polygon",
    (s, dir) => EsqlParser.run(esqlGeoPolygonQuery, _ => Tables.events(s, dir)),
    Some(s"""SELECT event_type, count(*) AS n,
       |  CAST(sum(CASE WHEN ${polyInsideSqlText(esqlQuad, esqlPtLonSql, esqlPtLatSql)}
       |    THEN 1 ELSE 0 END) AS BIGINT) AS nq,
       |  CAST(sum(CASE WHEN ${polyInsideSqlText(esqlTri, esqlPtLonSql, esqlPtLatSql)}
       |    THEN 1 ELSE 0 END) AS BIGINT) AS nt
       |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin))

  /** ES|QL spatial grid functions — ST_GEOTILE / ST_GEOHASH /
    * ST_GEOHEX, the scalar twins of the grid AGGREGATIONS (same cell
    * math as ns_agg_geotile_grid / ns_agg_geohash_grid /
    * ns_agg_geohex_grid): web-mercator z/x/y at zoom 3 (integer lats
    * sit ≥5.9e-4 tiles from every boundary — transcendental-safe),
    * precision-2 geohash (pure integer interleave, no transcendental),
    * and the affine hex lattice. One codegen pass computes all three
    * cells inline; the STATS shuffle is |cells|-bounded — the
    * map-clustering shape that holds at any scale. */
  private[graft] val esqlGeoGridQuery =
    s"""FROM events
       || EVAL $esqlPtEval,
       |       tile = ST_GEOTILE(p, 3), gh = ST_GEOHASH(p, 2), hex = ST_GEOHEX(p)
       || STATS n = COUNT(*) BY tile, gh, hex
       || SORT tile, gh, hex""".stripMargin
  private val esqlGridOracle: String = {
    // tile x/y carry the engine's [0, 2^z−1] clamp (a no-op on this
    // corpus — lon ≤ 179, |lat| ≤ 60 — kept for term alignment)
    val tile = "concat('3/', LEAST(GREATEST(CAST(floor((px + 180) / 360 * 8) AS BIGINT), 0), 7), '/', " +
      "LEAST(GREATEST(CAST(floor((1 - ln(tan(py * pi() / 180) + 1 / cos(py * pi() / 180)) / pi()) / 2 * 8) AS BIGINT), 0), 7))"
    val ix = "LEAST(GREATEST(CAST(floor((px + 180) / 360 * 32) AS BIGINT), 0), 31)"
    val iy = "LEAST(GREATEST(CAST(floor((py + 90) / 180 * 32) AS BIGINT), 0), 31)"
    // 10-bit lon-first interleave (msb first), then two base-32 chars
    val cell = (0 until 10).map { j =>
      val weight = 1L << (9 - j)
      if (j % 2 == 0) s"((ix // ${1L << (4 - j / 2)}) % 2) * $weight"
      else s"((iy // ${1L << (4 - (j - 1) / 2)}) % 2) * $weight"
    }.mkString("(", " + ", ")")
    val b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    val gh = s"concat(substring('$b32', CAST((cell // 32) % 32 AS INT) + 1, 1), " +
      s"substring('$b32', CAST(cell % 32 AS INT) + 1, 1))"
    s"""WITH pts AS (SELECT event_id, $esqlPtLonSql AS px, $esqlPtLatSql AS py FROM events),
       |q AS (SELECT event_id,
       |    CAST(px * 2 AS BIGINT) AS lx, CAST(py * 2 AS BIGINT) AS ly,
       |    $ix AS ix,
       |    $iy AS iy,
       |    $tile AS tile
       |  FROM pts),
       |h AS (SELECT event_id, tile, $cell AS cell,
       |    CAST(floor((lx + 18) / 36.0) AS BIGINT) * 36 AS hax,
       |    CAST(floor((ly + 31) / 62.0) AS BIGINT) * 62 AS hay,
       |    CAST(floor(lx / 36.0) AS BIGINT) * 36 + 18 AS hbx,
       |    CAST(floor(ly / 62.0) AS BIGINT) * 62 + 31 AS hby,
       |    lx, ly
       |  FROM q),
       |c AS (SELECT event_id, tile, $gh AS gh,
       |    CASE WHEN (lx - hax) * (lx - hax) + (ly - hay) * (ly - hay)
       |           <= (lx - hbx) * (lx - hbx) + (ly - hby) * (ly - hby)
       |         THEN concat(hax, '/', hay) ELSE concat(hbx, '/', hby) END AS hex
       |  FROM h)
       |SELECT tile, gh, hex, count(*) AS n FROM c
       |GROUP BY 1, 2, 3 ORDER BY tile, gh, hex""".stripMargin
  }
  val esqlGeoGridOp = QueryDef(
    "ns_esql_geo_grid",
    (s, dir) => EsqlParser.run(esqlGeoGridQuery, _ => Tables.events(s, dir)),
    Some(esqlGridOracle))

  /** ES|QL cartesian_point family — TO_CARTESIANPOINT plus the SAME
    * ST_X / ST_Y / ST_DISTANCE functions resolving to the planar
    * coordinate system at ANALYSIS time (graftshim.GeoCoordAccessor /
    * SpatialDistance): Euclidean distance, no wrap, no mercator — the
    * `point` field type ES serves for CAD / floor-plan / game-world
    * coordinates. Integer-grid points keep every difference and square
    * exact in IEEE double and sqrt is correctly rounded, so the
    * distances are bit-identical across engines with no transcendental
    * caveat at all (unlike the haversine twin). */
  private[graft] val esqlGeoCartesianQuery =
    """FROM events
      || WHERE event_id < 40
      || EVAL cp = TO_CARTESIANPOINT(CONCAT("POINT (", TO_STRING(event_id % 2000 - 1000),
      |             " ", TO_STRING(event_id % 1200 - 600), ")")),
      |       cx = ST_X(cp), cy = ST_Y(cp),
      |       cd = ROUND(ST_DISTANCE(cp, TO_CARTESIANPOINT("POINT (25 -17)")), 4),
      |       bad = ST_Y(TO_CARTESIANPOINT(event_type))
      || KEEP event_id, cx, cy, cd, bad
      || SORT event_id""".stripMargin
  val esqlGeoCartesianOp = QueryDef(
    "ns_esql_geo_cartesian",
    (s, dir) => EsqlParser.run(esqlGeoCartesianQuery, _ => Tables.events(s, dir)),
    Some("""SELECT event_id, cx, cy,
      |  round(sqrt((cx - 25) * (cx - 25) + (cy - (-17)) * (cy - (-17))), 4) AS cd,
      |  CAST(NULL AS DOUBLE) AS bad
      |FROM (SELECT event_id,
      |    CAST(event_id % 2000 - 1000 AS DOUBLE) AS cx,
      |    CAST(event_id % 1200 - 600 AS DOUBLE) AS cy
      |  FROM events WHERE event_id < 40)
      |ORDER BY event_id""".stripMargin))

  /** ES|QL IP functions: CIDR_MATCH as a WHERE predicate and IP_PREFIX
    * as the network-bucketing EVAL — the SIEM pair. The dotted quad
    * compiles to u32 long arithmetic in one codegen pass; each CIDR
    * literal is parsed at plan time into a (network, bits) prefix
    * comparison. */
  private[graft] val esqlCidrQuery =
    """FROM access_log
      || WHERE CIDR_MATCH(ip, "203.0.0.0/28", "203.0.0.128/27")
      || EVAL net = IP_PREFIX(ip, 28, 0)
      || STATS n = COUNT(*) BY net
      || SORT net""".stripMargin
  val esqlCidrOp = QueryDef(
    "ns_esql_cidr",
    (s, dir) => EsqlParser.run(esqlCidrQuery, _ => Synth.accessLog(s, dir)),
    Some(Synth.withAccessLog(
      """, u AS (SELECT
        |    CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
        |    + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
        |    + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
        |    + CAST(string_split(ip, '.')[4] AS BIGINT) AS ipu
        |  FROM access_log),
        |m AS (SELECT (ipu // 16) * 16 AS net_u FROM u
        |  WHERE ipu // 16 = (CAST(203 AS BIGINT) * 16777216 + 0) // 16
        |     OR ipu // 32 = (CAST(203 AS BIGINT) * 16777216 + 128) // 32),
        |nets AS (SELECT concat(
        |    CAST(net_u // 16777216 % 256 AS VARCHAR), '.',
        |    CAST(net_u // 65536 % 256 AS VARCHAR), '.',
        |    CAST(net_u // 256 % 256 AS VARCHAR), '.',
        |    CAST(net_u % 256 AS VARCHAR)) AS net FROM m)
        |SELECT net, count(*) AS n FROM nets GROUP BY 1 ORDER BY net""".stripMargin)))

  private[graft] val esqlMvExpandQuery =
    """FROM access_log
      || EVAL hops = SPLIT(xff, ",")
      || MV_EXPAND hops
      || WHERE hops LIKE "10.0.0.*"
      || STATS n = COUNT(*) BY hops
      || SORT n DESC, hops ASC
      || LIMIT 15""".stripMargin
  val esqlMvExpandOp = QueryDef(
    "ns_esql_mv_expand",
    (s, dir) => EsqlParser.run(esqlMvExpandQuery, _ => Synth.accessLog(s, dir)),
    Some(Synth.withAccessLog(
      """SELECT hop AS hops, count(*) AS n
        |FROM (SELECT unnest(str_split(xff, ',')) AS hop FROM access_log)
        |WHERE hop LIKE '10.0.0.%' GROUP BY 1 ORDER BY n DESC, hops LIMIT 15""".stripMargin)))

  def entries: Seq[QueryDef] = Seq(
    esqlStatsOp, esqlRowOp, esqlDissectOp, esqlGrokOp, esqlEnrichOp, esqlMvExpandOp,
    esqlLookupJoinOp, esqlBucketOp, esqlStatsWhereOp, esqlObservabilityOp, esqlInlineStatsOp, sqlApiOp,
    esqlChangePointOp, esqlSampleOp, esqlFulltextOp, esqlForkOp, esqlFuseOp, esqlTsOp,
    esqlTsPipelineOp, esqlKnnOp,
    esqlDatesOp, esqlCidrOp, esqlEnrichRangeOp, esqlMetadataOp, esqlRerankOp,
    esqlCompletionOp, esqlFunctionsOp, esqlFunctions2Op, esqlFunctions3Op, esqlShowOp,
    esqlDateParseOp, esqlParamsOp,
    esqlMadOp, esqlMvStatsOp, esqlGeoOp, esqlGeoCentroidOp,
    esqlGeoPolygonOp, esqlGeoGridOp, esqlGeoCartesianOp,
    esqlCategorizeOp, esqlValuesOp, esqlStatsAggsOp, renderTemplateOp,
    termvectorsOp, graphExploreOp, mgetOp,
    countOp, updateByQueryOp, reindexOp, analyzeOp, indexStatsOp, rolloverOp,
    watcherThrottleOp, fieldCapsOp,
    queryStringOp, simpleQueryStringOp, kqlOp, percolateDslOp, termsSetOp,
    disMaxOp, boostingOp, significantTextOp,
    rangeQueryOp, spanFirstOp, existsOp, idsOp, termTermsOp, parentIdOp,
    termsLookupOp, rankFeatureOp,
    intervalsOp, pinnedOp, distanceFeatureOp, constantScoreOp,
    hasChildOp, hasParentOp, matchBoolPrefixOp, rescoreOp, eqlSequenceOp,
    sparseVectorOp, msearchOp, searchBodyOp, postFilterOp, wrapperOp, scrollOp, pitOp, termsEnumOp,
    searchTemplateOp, msearchTemplateOp, validateOp)
}
