package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Exact, QueryDef, Tables}

/** Training-data pipeline text operators over `documents` (north-star
  * extension, SURVEY.md §2.5): exact + MinHash-LSH + SimHash + n-gram
  * Jaccard dedup, language ID, quality scoring, token counting, and
  * document fingerprinting.
  *
  * Scale design: every operator is a pure column pipeline or a
  * band-bucket equi-join. The MinHash candidate join is the classic LSH
  * shape — signatures shrink each doc to a few band keys, the join is an
  * equi-join on (band, signature) that shuffles only the tiny signature
  * relation, never doc×doc. Nothing here is quadratic in the corpus and
  * nothing collects to the driver.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  /** Overlapping word 3-shingles via the native WordShingles3 byte-pass
    * expression (graftshim) — one scan over the bytes, no regex engine.
    * Equivalent to
    * `transform(sequence(1, n-2), i -> t[i]||' '||t[i+1]||' '||t[i+2])`
    * over `t = split(text, ' ')` (the oracle formulation), which as a
    * HOF would be CodegenFallback and knock the whole explode stage out
    * of whole-stage codegen (measured 10× slower); the prior
    * `regexp_extract_all` lookahead form was codegen'd but still paid a
    * regex match per token boundary. */
  private[graft] def shingles3(text: Column): Column =
    graft.Cols.column(org.apache.spark.sql.graftshim.WordShingles3(
      graft.Cols.expr(text)))

  /** Banded MinHash signatures of `textCol`: one row per (id, band,
    * sig), the candidate-generation key shared by the batch dedup ops
    * and the streaming incremental dedup (streaming/DedupStream).
    * Same scheme (and bit-identical values) as the definitional
    * explode → groupBy(doc) → min(md5('b:'||x)) form the oracle
    * computes: `nHashes` min-hashes over word 3-shingles, banded
    * `nHashes/bandWidth` × `bandWidth` — but via the native
    * `MinHashSigs` expression, ONE codegen map pass from document to
    * signature vector: no shingle-row amplification through a shuffle,
    * no per-document aggregation. The only remaining exploded rows are
    * the nHashes/bandWidth band keys per document. Documents with
    * fewer than 3 tokens produce no rows. */
  private[graft] def bandSignatures(df: DataFrame, idCol: String,
                                    textCol: String): DataFrame = {
    // No isNotNull filter on `mh`: Catalyst pushes such a predicate
    // below the Project, DUPLICATING the minhash_sigs call into the
    // filter (and the scan's DataFilters) — every signature computed
    // twice (measured 2.7×). A null vector instead rides into the band
    // concat, which nulls every sig, and the null-sig filter sits ABOVE
    // the Generate, where it cannot be pushed into a recomputation.
    val withMh = df.select(
      col(idCol),
      graft.expr.TextFunctions.minhash_sigs(
        shingles3(trim(col(textCol))), nHashes).as("mh"))
    withMh.select(
      col(idCol),
      posexplode(array((0 until nHashes / bandWidth).map { g =>
        concat((0 until bandWidth).map(i =>
          col("mh").getItem(g * bandWidth + i)): _*)
      }: _*)))
      .select(col(idCol), col("pos").as("band"), col("col").as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** Distinct shingle sets for exact-Jaccard verification: (id, sh). */
  private[graft] def shingleSets(df: DataFrame, idCol: String,
                                 textCol: String): DataFrame =
    df.select(col(idCol), array_distinct(shingles3(trim(col(textCol)))).as("sh"))
      .filter(size(col("sh")) >= 1)

  /** The duplicate-overlay offset: max(doc_id)+1, DERIVED from the
    * table (r20 advice — the r19 fixed +100000/+200000 offsets would
    * alias genuine doc_ids once the table exceeds 100k rows, and the
    * oracle mirrored the collision so the compare stayed green while
    * overlay ids silently stopped being unique). A one-row aggregate
    * broadcast onto the overlay rows — the blessed one-row-crossJoin
    * stats-frame shape; DuckDB mirrors it as a scalar subquery. Offset
    * uniqueness now holds BY CONSTRUCTION at every SF: overlay ids
    * live in (max, 2·max+1] (and the second overlay in a disjoint
    * higher band), which no real document can occupy. */
  private def overlayOffset(base: DataFrame): DataFrame =
    base.agg((max(col("doc_id")) + lit(1L)).as("ov_off"))

  /** Exact dedup: hash-groupBy on normalized text (map-side combine →
    * one shuffle on the 128-bit key). The corpus is overlaid with a
    * deterministic duplicate of every 7th document (same text, shifted
    * doc_id) because the synthetic documents table carries NO exact
    * duplicates at any SF — the r19 oracle-mutant audit caught that
    * (min(doc_id)→max(doc_id) changed nothing), meaning the gate was
    * only proving the grouping shape, never the keep-one-of-many
    * semantics. With the overlay, n_copies=2 groups exist at every SF
    * and keep_id genuinely selects the survivor. */
  val dedupExactOp = QueryDef(
    "ns_dedup_exact",
    { (s, dir) =>
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val dups = base.filter(col("doc_id") % 7 === 0)
        .crossJoin(broadcast(overlayOffset(base)))
        .withColumn("doc_id", col("doc_id") + col("ov_off")).drop("ov_off")
      base.unionByName(dups)
        .withColumn("text_hash", md5(lower(col("text")).cast("binary")))
        .groupBy("text_hash")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    },
    Some("""SELECT md5(lower(text)) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
           |FROM (SELECT doc_id, text FROM documents
           |      UNION ALL
           |      SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), text
           |      FROM documents WHERE doc_id % 7 = 0)
           |GROUP BY 1""".stripMargin),
    // the r19 vacuity catch, now a standing first-class gate: the
    // keep-one-of-many branch needs REAL n_copies>1 groups, and the
    // trivial singleton branch must coexist (both sides of the group
    // cardinality split live)
    liveness = Seq(
      "duplicate_groups_exist" -> "SELECT max(n_copies) >= 2 FROM r",
      "singleton_groups_exist" -> "SELECT min(n_copies) = 1 FROM r"))

  // MinHash: word 3-shingles, 8 hash functions (min over md5('<b>:'||shingle)),
  // banded 4×2 → candidate pairs share ≥1 band. Min over hex strings is a
  // valid minhash (lexicographic order on a uniform hash).
  // bandCap bounds hot-bucket skew: a (band, sig) bucket of n docs emits
  // C(n,2) candidate pairs, so one boilerplate-heavy bucket can go
  // quadratic at corpus scale; buckets over the cap are dropped whole
  // (deterministic — near-dups that common still pair through their
  // other bands or the exact-dedup path).
  private val nHashes = 8
  private val bandWidth = 2
  private val bandCap = 50

  val dedupMinhashOp = QueryDef(
    "ns_dedup_minhash", {
      (s, dir) =>
        // signatures via the native MinHashSigs map pass (r8): document
        // → signature vector with no shingle explode and no per-doc
        // aggregation — the r7 explode/groupBy form cost a corpus-wide
        // clustering shuffle before candidate generation. Par.spread
        // still widens a narrow scan for local parallelism (passthrough
        // on a many-split scan at scale).
        val bands0 = bandSignatures(
          Par.spread(s, docs(s, dir), col("doc_id")), "doc_id", "text")
        // Candidate generation in the MapReduce-LSH shape (group by
        // bucket, emit the bucket's pairs) instead of a self-join: the
        // join formulation plans the minhash subtree once per join side
        // PLUS once per cap branch — and neither static ReuseExchange
        // nor AQE stage reuse deduplicates them (measured: 4 full
        // signature computations) — while this is ONE scan, one shuffle
        // on (band, sig), one shuffle of the (tiny) pair set. The cap
        // lives INSIDE the aggregate: BoundedBucketAgg (a native
        // TypedImperativeAggregate over a primitive long buffer) keeps ≤
        // bandCap+1 ids per bucket (map-side partial aggregation
        // pre-shrinks hot buckets before the shuffle) and drops over-cap
        // buckets whole — the same semantics, with constant memory per
        // bucket where the old count().over(band,sig) window buffered
        // every row of the hottest bucket in one task.
        val buckets = bands0.groupBy("band", "sig")
          .agg(graft.expr.TextFunctions.bounded_bucket(col("doc_id"), bandCap).as("ds"))
          .filter(col("ds").isNotNull)
        buckets
          .select(explode(graft.expr.TextFunctions.ordered_pairs(col("ds"),
            includeDiagonal = false)).as("p"))
          .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
          .agg(count(lit(1)).as("n_shared_bands"))
    },
    Some {
      val mhCols = (0 until nHashes).map { b =>
        s"list_aggregate(list_transform(s, x -> md5(concat('$b:', x))), 'min') AS mh$b"
      }.mkString(", ")
      val bandSelects = (0 until nHashes / bandWidth).map { g =>
        val sig = (0 until bandWidth).map(i => s"mh${g * bandWidth + i}").mkString("concat(", ", ", ")")
        s"SELECT doc_id, $g AS band, $sig AS sig FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         |sh AS (SELECT doc_id, list_transform(generate_series(1, len(t)-2),
         |         i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])) AS s
         |       FROM toks WHERE len(t) >= 3),
         |mh AS (SELECT doc_id, $mhCols FROM sh),
         |bands0 AS ($bandSelects),
         |bands AS (SELECT * FROM bands0
         |  QUALIFY count(*) OVER (PARTITION BY band, sig) <= $bandCap)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
         |FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |GROUP BY 1, 2""".stripMargin
    })

  /** SimHash: 16-bit signature from per-bit majority vote over token
    * hashes (first 8 md5 hex chars → 32-bit int; bits 0..15 used).
    * Computed by the native `SimHashBits` codegen expression
    * (graftshim.GraftShim) — one map pass over the token array, ZERO
    * shuffles, vs the naive SQL shape (explode ×16 bit positions + two
    * aggregations) that amplifies every token row 16× through a shuffle.
    * The oracle keeps the naive formulation; results are bit-identical. */
  val dedupSimhashOp = QueryDef(
    "ns_dedup_simhash",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      graft.expr.TextFunctions.simhash_bits(split(trim(col("text")), " ")).as("simhash")),
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
           |h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT AS BIGINT) AS h FROM tok),
           |bits AS (SELECT doc_id, j, CAST(sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS w
           |  FROM h, (SELECT unnest(generate_series(0, 15)) AS j) js GROUP BY doc_id, j)
           |SELECT doc_id, CAST(sum(CASE WHEN w >= 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS simhash
           |FROM bits GROUP BY doc_id""".stripMargin))

  /** n-gram (3-shingle) Jaccard similarity join as an inverted-index
    * join (the set-similarity-join shape of Vernica et al., SIGMOD'10):
    * explode distinct shingles, self-equi-join on the shingle to count
    * each pair's exact overlap o = |A∩B| in one groupBy, then
    * J = o / (|A|+|B|−o) via a broadcast size dimension — union by
    * inclusion–exclusion, no arrays carried through any join, every
    * operator codegen'd. Work is Σ_s C(df_s, 2) over shingle document
    * frequencies — linear on real corpora where shingle df is small and
    * Zipf-bounded (max 25 here); at 100 TB the standard guard is
    * dropping ultra-common shingles from the index: `dfCap` filters any
    * shingle appearing in more than `dfCap` docs (boilerplate — license
    * headers, nav chrome) out of the EFFECTIVE shingle set, on both
    * engines identically, so no join key can contribute more than
    * C(dfCap, 2) pairs. Jaccard is then computed over the capped sets
    * (sizes too), keeping the inclusion–exclusion algebra exact for the
    * semantics both engines implement. Locally max df is 25 < dfCap, so
    * the cap is a pure plan bound, not a result change. Word-token or
    * substring-prefix blocking both degenerate on this corpus (31-token
    * vocab at ~80% df); 3-shingles are the discriminative unit. */
  private val ngramT = 0.5
  private val dfCap = 100
  val dedupNgramOp = QueryDef(
    "ns_dedup_ngram", {
      (s, dir) =>
        // spread shingle construction across cores when the scan is one
        // small file split.
        val d = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), array_distinct(shingles3(trim(col("text")))).as("sh"))
          .filter(size(col("sh")) >= 1)
        // Candidate generation in the MapReduce set-similarity shape
        // (group by shingle, emit the posting list's pairs — Vernica et
        // al.'s job structure) instead of a self-join: the join
        // formulation plans the shingle-index subtree once per join side
        // plus once per cap branch plus once per sizes broadcast, and
        // neither ReuseExchange nor AQE stage reuse deduplicates them
        // (measured: EIGHT full scans of the index pipeline). This is
        // ONE scan. The df cap lives inside BoundedBucketAgg (≤ dfCap+1
        // ids in a primitive buffer per shingle, over-cap shingles
        // dropped whole, map-side partial agg pre-shrinks hot shingles
        // pre-shuffle).
        // Set sizes ride the SAME pair stream as diagonal (d, d) pairs —
        // |A| = count of A's surviving shingles = the diagonal's
        // overlap-with-self — then reach each candidate row via two
        // conditional windows whose partitions are per-DOC candidate
        // lists (bounded by doc length × dfCap, never corpus-scale).
        val idx = d.select(col("doc_id"), explode(col("sh")).as("s"))
        val buckets = idx.groupBy("s")
          .agg(graft.expr.TextFunctions.bounded_bucket(col("doc_id"), dfCap).as("ds"))
          .filter(col("ds").isNotNull)
        val pc = buckets
          .select(explode(graft.expr.TextFunctions.ordered_pairs(col("ds"),
            includeDiagonal = true)).as("p"))
          .groupBy(col("p.a").as("pa"), col("p.b").as("pb"))
          .agg(count(lit(1)).as("cnt"))
        val diag = when(col("pa") === col("pb"), col("cnt"))
        pc
          .withColumn("na", max(diag).over(Window.partitionBy("pa")))
          .withColumn("nb", max(diag).over(Window.partitionBy("pb")))
          .filter(col("pa") < col("pb"))
          .select(col("pa").as("doc_a"), col("pb").as("doc_b"),
            expr("round(CAST(cnt AS DOUBLE) / (na + nb - cnt), 6)").as("jaccard"))
          .filter(col("jaccard") >= ngramT)
    },
    Some(s"""WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |d AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
           |        i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS sh
           |      FROM toks WHERE len(t) >= 3),
           |s0 AS (SELECT doc_id, unnest(sh) AS sh FROM d),
           |s AS (SELECT doc_id, sh FROM s0
           |  QUALIFY count(*) OVER (PARTITION BY sh) <= $dfCap),
           |sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
           |ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS o
           |    FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |    GROUP BY 1, 2),
           |j AS (SELECT ov.doc_a, ov.doc_b,
           |    round(CAST(ov.o AS DOUBLE) / (na.n + nb.n - ov.o), 6) AS jaccard
           |  FROM ov JOIN sizes na ON na.doc_id = ov.doc_a
           |          JOIN sizes nb ON nb.doc_id = ov.doc_b)
           |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= $ngramT""".stripMargin))

  /** Span-level exact-substring dedup — the k-gram hash-counting
    * approximation of suffix-array substring dedup (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): a
    * span is duplicated if the SAME k consecutive tokens occur in any
    * other document, and a document's score is the fraction of its
    * distinct k-token spans that are duplicated. This is span-level
    * where ns_dedup_ngram is document-level: boilerplate stitched into
    * otherwise-unique documents (license headers, nav chrome, quoted
    * reply chains) shows up here long before whole-document Jaccard
    * notices, and the per-doc dup_frac is the signal pipelines use to
    * TRIM spans or drop documents.
    *
    * Scale shape: each span is hashed to a 60-bit integer (engine-
    * identical md5-prefix recipe, ns_fingerprint) the moment it is
    * formed, so every shuffle moves (BIGINT, BIGINT) rows — never span
    * text (~16 B/row vs ~8×avg-token bytes; at 100 TB the difference
    * is the exchange). Span formation is explode(sequence) + slice +
    * array_join — ordinary codegen'd expressions fused into the
    * Generate stage (the transform() HOF formulation is
    * CodegenFallback and breaks the stage, the shingles3 lesson). The
    * per-(doc, span) distinct and the per-span document-frequency
    * count both partial-aggregate map-side, so ultra-common spans
    * shrink to one row per map task pre-shuffle; the df join back to
    * the span stream is an equi-join on the hash (AQE handles the hot
    * keys a skewed corpus produces). Work is linear in corpus tokens —
    * no pair enumeration anywhere (the counting sidesteps
    * ns_dedup_ngram's C(df,2) posting-list pairs entirely). */
  private val spanK = 8
  val dedupSubstringOp = QueryDef(
    "ns_dedup_substring", {
      (s, dir) =>
        // No Filter node anywhere in the span stream: a size guard as a
        // .filter() gets pushed below the tokenizing Project and
        // re-tokenizes every document in the scan's DataFilters (the
        // bandSignatures trap, measured 2.7×) — instead short docs
        // yield a NULL sequence, which explode() drops inside the
        // Generate itself. coalesce pins the hash non-nullable so the
        // join/agg below infer no isnotnull(g) predicate (which would
        // re-evaluate the md5 in a pushed Filter per span).
        val grams = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"),
            explode(when(size(col("t")) >= spanK,
              sequence(lit(1), size(col("t")) - (spanK - 1)))).as("i"),
            col("t"))
          .select(col("doc_id"),
            coalesce(expr(md5Long(s"array_join(slice(t, i, $spanK), ' ')")), lit(0L)).as("g"))
          .distinct()
        val df = grams.groupBy("g").agg(count(lit(1)).as("nd"))
        grams.join(df, "g")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("dup_spans"))
          .select(col("doc_id"), col("n_spans"), col("dup_spans"),
            round(col("dup_spans").cast("double") / col("n_spans"), 6).as("dup_frac"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |g0 AS (SELECT doc_id, array_to_string(t[i:i+${spanK - 1}], ' ') AS gram
           |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${spanK - 1})) AS i
           |        FROM t WHERE len(t) >= $spanK)),
           |g AS (SELECT DISTINCT doc_id, ${md5LongSql("gram")} AS g FROM g0),
           |nd AS (SELECT g, count(*) AS nd FROM g GROUP BY g)
           |SELECT doc_id, count(*) AS n_spans,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
           |  round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_frac
           |FROM g JOIN nd USING (g)
           |GROUP BY doc_id""".stripMargin))

  /** Text statistics: token counts, distinct tokens, type-token ratio. */
  val textStatsOp = QueryDef(
    "ns_text_stats",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_calc"),
      size(split(trim(col("text")), " ")).cast("long").as("n_tokens"),
      size(array_distinct(split(trim(col("text")), " "))).cast("long").as("n_distinct"),
      expr("round(CAST(size(array_distinct(split(trim(text), ' '))) AS DOUBLE) / size(split(trim(text), ' ')), 6)").as("ttr")),
    Some("""SELECT doc_id, length(text) AS n_chars_calc,
           |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           |  CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
           |  round(CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
           |        / len(string_split(trim(text), ' ')), 6) AS ttr
           |FROM documents""".stripMargin))

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs / digit runs / single non-space symbols). */
  val tokenCountOp = QueryDef(
    "ns_token_count",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws"),
      regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).cast("long").as("n_bpe")),
    Some("""SELECT doc_id,
           |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws,
           |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe
           |FROM documents""".stripMargin))

  /** The English stopword marker — ONE definition shared by ns_lang_id
    * (the en marker), ns_quality_score, ns_filter_funnel, and
    * ns_select_budget. Held as a Scala value with REAL backslashes so
    * it survives both plain and s-interpolated oracle strings
    * (interpolated VALUES are never escape-processed; a literal `\b`
    * inside an s-string would become a backspace). */
  private val stopRx = "\\b(the|a|of|and|to|is)\\b"

  /** ns_quality_score's composite quality formula, one definition per
    * dialect: the Spark form reads prepared n_stop/n_tokens columns
    * (regex via the API `lit`, not a SQL literal); the DuckDB form is
    * inline over `text`. ns_filter_funnel and ns_select_budget
    * threshold/bucket EXACTLY this expression, so the three operators
    * can never desynchronize from the verified score. */
  private val qualitySpark =
    "0.5 * least(CAST(length(text) AS DOUBLE) / 500, 1.0) + 0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)"
  private val qualityDuck =
    s"0.5 * least(CAST(length(text) AS DOUBLE) / 500, 1.0)" +
      s" + 0.5 * (CAST(len(regexp_extract_all(text, '$stopRx')) AS DOUBLE) / len(string_split(trim(text), ' ')))"

  /** Adds the n_stop/n_tokens columns qualitySpark reads. */
  private def withQualityInputs(df: DataFrame): DataFrame = df
    .withColumn("n_stop", regexp_count(col("text"), lit(stopRx)).cast("long"))
    .withColumn("n_tokens", size(split(trim(col("text")), " ")).cast("long"))

  /** Language ID: stopword-marker n-gram heuristic with a fixed argmax
    * tie order (en > de > fr > es > zh). */
  private val langMarkers = Seq(
    "en" -> stopRx,
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|la|les|et|est)\\b",
    "es" -> "\\b(el|la|los|y|es)\\b",
    // \x{h..h} escape form: valid in BOTH Java regex (Spark) and RE2
    // (DuckDB); RE2 rejects the \uXXXX form.
    "zh" -> "[\\x{4e00}-\\x{9fff}]")

  /** Fixed-tie-order argmax over the marker scores — valid verbatim in
    * both Spark SQL and DuckDB (shared by ns_lang_id and the
    * ns_filter_funnel lang-mismatch rule). */
  private val langArgmax =
    """CASE
      | WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
      | WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
      | WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
      | WHEN s_es >= s_zh THEN 'es'
      | ELSE 'zh' END""".stripMargin

  private def langScores(df: DataFrame): DataFrame =
    langMarkers.foldLeft(df) { case (d, (l, rx)) =>
      d.withColumn(s"s_$l", regexp_count(col("text"), lit(rx)).cast("long"))
    }

  private val langScoresSql = langMarkers.map { case (l, rx) =>
    s"CAST(len(regexp_extract_all(text, '$rx')) AS BIGINT) AS s_$l"
  }.mkString(", ")

  /** The language-marker overlay (r20 gate-liveness audit): the
    * synthetic corpus is English prose under EVERY lang label, so
    * s_de/s_fr/s_es/s_zh were identically zero corpus-wide and
    * pred_lang was the constant 'en' — four of the five argmax
    * branches never ran (the ns_except vacuity class, caught this
    * round by the generic no-constant-column check). Two deterministic
    * marker docs per language, replayed in BOTH engines at ids above
    * max(doc_id) (the dedup-overlay offset discipline), make every
    * score column vary and every argmax branch reachable at every SF. */
  private val langOverlay = Seq(
    (1L, "de", "der die das und ist der die das"),
    (2L, "de", "der und ist heute gut"),
    (3L, "fr", "le la les et est le la"),
    (4L, "fr", "le et est bon jour"),
    (5L, "es", "el la los y es el la"),
    (6L, "es", "el los y es manana"),
    (7L, "zh", "汉字系统测试汉字"),
    (8L, "zh", "机器学习"))

  private val langOverlaySql = langOverlay.map { case (o, l, t) =>
    s"($o, '$l', '$t')"
  }.mkString("(VALUES ", ", ", ") AS v(ord, lang, text)")

  val langIdOp = QueryDef(
    "ns_lang_id", {
      (s, dir) =>
        import s.implicits._
        val base = docs(s, dir).select(col("doc_id"), col("lang"), col("text"))
        val ov = langOverlay.toDF("ord", "lang", "text")
          .crossJoin(broadcast(overlayOffset(base)))
          .select((col("ord") + col("ov_off")).as("doc_id"),
            col("lang"), col("text"))
        langScores(base.unionByName(ov)).select(
          col("doc_id"), col("lang"),
          col("s_en"), col("s_de"), col("s_fr"), col("s_es"), col("s_zh"),
          expr(langArgmax).as("pred_lang"))
    },
    Some(
      s"""WITH base AS (SELECT doc_id, lang, text FROM documents
         |  UNION ALL
         |  SELECT (SELECT max(doc_id) + 1 FROM documents) + ord, lang, text
         |  FROM $langOverlaySql),
         |scored AS (SELECT doc_id, lang, $langScoresSql FROM base)
         |SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh,
         |  $langArgmax AS pred_lang
         |FROM scored""".stripMargin),
    liveness = Seq(
      "all_five_argmax_branches_predicted" ->
        "SELECT count(DISTINCT pred_lang) >= 5 FROM r",
      "every_marker_score_fires" ->
        "SELECT max(s_en) > 0 AND max(s_de) > 0 AND max(s_fr) > 0 AND max(s_es) > 0 AND max(s_zh) > 0 FROM r"))

  /** Quality scoring: length score + stopword ratio, fixed formula. */
  val qualityScoreOp = QueryDef(
    "ns_quality_score",
    (s, dir) => withQualityInputs(docs(s, dir))
      .select(
        col("doc_id"),
        expr(s"round($qualitySpark, 6)").as("quality")),
    Some(s"SELECT doc_id, round($qualityDuck, 6) AS quality FROM documents"))

  /** Document fingerprint: md5 of whitespace-normalized text plus a
    * 60-bit integer prefix for compact storage/joins. */
  val fingerprintOp = QueryDef(
    "ns_fingerprint",
    (s, dir) => docs(s, dir)
      .withColumn("norm", expr("regexp_replace(trim(lower(text)), '\\\\s+', ' ')"))
      .select(
        col("doc_id"),
        md5(col("norm").cast("binary")).as("fp_hex"),
        expr(md5Long("norm")).as("fp_long")),
    // built by concatenation, not s-interpolation: the interpolator
    // processes \s in triple quotes as an escape (the \b lesson)
    Some(("""WITH n AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm FROM documents)
           |SELECT doc_id, md5(norm) AS fp_hex,
           |  """ + md5LongSql("norm") + """ AS fp_long
           |FROM n""").stripMargin))

  /** Collocation mining — top bigrams by pointwise mutual information
    * PMI = ln(P(ab) / (P(a)·P(b))), the classic phrase-mining signal
    * (Church & Hanks 1990) a tokenizer/vocabulary build runs over the
    * corpus to promote "new york"-style units, with the standard
    * min-count floor that keeps rare-pair noise (PMI's known bias) out
    * of the ranking.
    *
    * Scale shape: bigrams form in the explode(sequence)+slice codegen
    * pass (the ns_text_phrase shape); unigram and bigram counts are
    * map-side partial aggregations over vocabulary-sized keys; the
    * margin join attaches the two unigram counts to each bigram row
    * (vocabulary-sized dims, AQE broadcasts when they fit) and the
    * final ranking is orderBy+limit → TakeOrderedAndProject.
    * Determinism: exact long counts, a fixed division/ln tree, round-6
    * with a (w1, w2) tiebreak. */
  private val collocMinCount = 5
  private val collocTopK = 20
  val collocationsOp = QueryDef(
    "ns_text_collocations", {
      (s, dir) =>
        val toks = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(split(trim(col("text")), " ").as("t"))
        // when() guard: see ns_text_bm25 — a bare explode re-tokenizes
        // every document through inferred scan filters
        val uni = toks.select(explode(when(size(col("t")) >= 1, col("t"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val n1 = uni.agg(sum("c").as("n1"))
        // bigrams via zipped shifted slices (r22): the explode(sequence)
        // form emits (i, t) rows — the FULL token array is copied into
        // every per-position output row, O(L²) bytes per document
        // through the Generate. Zipping the two shifted slices first
        // emits narrow (w1, w2) structs instead, O(L) — same pairs,
        // same counts, all codegen expressions.
        val big = toks
          .select(explode(when(size(col("t")) >= 2, arrays_zip(
            slice(col("t"), lit(1), size(col("t")) - 1).as("w1"),
            slice(col("t"), lit(2), size(col("t")) - 1).as("w2")))).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        val n2 = big.agg(sum("c_ab").as("n2"))
        big.filter(col("c_ab") >= collocMinCount)
          .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
          .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
          .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
          .select(col("w1"), col("w2"), col("c_ab"),
            round(log((col("c_ab") * lit(1.0) / col("n2")) /
              ((col("c_a") * lit(1.0) / col("n1")) * (col("c_b") * lit(1.0) / col("n1")))), 6)
              .as("pmi"))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(collocTopK)
    },
    Some(s"""WITH t AS (SELECT string_split(trim(text), ' ') AS t FROM documents),
           |uni AS (SELECT w, count(*) AS c
           |  FROM (SELECT unnest(t) AS w FROM t) GROUP BY 1),
           |n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n1 FROM uni),
           |big AS (SELECT w1, w2, count(*) AS c_ab FROM (
           |    SELECT t[i] AS w1, t[i+1] AS w2
           |    FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
           |          FROM t WHERE len(t) >= 2))
           |  GROUP BY 1, 2),
           |n2 AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n2 FROM big),
           |sc AS (SELECT w1, w2, c_ab,
           |    round(ln((c_ab * 1.0 / n2) /
           |      ((a.c * 1.0 / n1) * (b.c * 1.0 / n1))), 6) AS pmi
           |  FROM big JOIN uni a ON a.w = big.w1 JOIN uni b ON b.w = big.w2, n1, n2
           |  WHERE c_ab >= $collocMinCount)
           |SELECT w1, w2, c_ab, pmi FROM sc
           |ORDER BY pmi DESC, w1, w2 LIMIT $collocTopK""".stripMargin))

  /** Percolation — the OpenSearch percolate query, the primitive under
    * alerting/watchers: a REGISTERED set of conjunctive term queries is
    * matched against each arriving document (queries are data, documents
    * are the stream — retrieval inverted). A document matches a query
    * when it contains ALL the query's terms; matching is per-doc
    * distinct tokens ⋈ broadcast query-term table, then a (doc, query)
    * count compared to the query's term count. The query table is
    * dashboards/alert-rules sized — always broadcast — so the corpus
    * pass is map-side; only matched (doc, query) candidate rows (≤
    * docs × matching queries, sparse) reach the counting shuffle.
    * `percolate(df)` is the reusable transform; the streaming form runs
    * it per micro-batch unchanged (StreamingSpec drives it through
    * MemoryStream) — the batch query below is the oracle-checked twin. */
  private[graft] val percolateQueries: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "join",
    2L -> "slow",
    3L -> "window", 3L -> "sort")
  private[graft] def percolate(docsDf: DataFrame,
                               queries: Seq[(Long, String)] = percolateQueries): DataFrame = {
    val s = docsDf.sparkSession
    import s.implicits._
    // dedupe registrations: a duplicated (query, term) row would raise
    // n_terms above what the post-join distinct can ever count, silently
    // killing the query (and diverging from the oracle, which joins the
    // duplicate rows)
    val qs = queries.distinct
    val q = qs.toDF("query_id", "term")
    val nterms = qs.groupBy(_._1).view.mapValues(_.size).toSeq
      .toDF("query_id", "n_terms")
    // distinct AFTER the broadcast join, never before: pre-join
    // distinct would shuffle the whole corpus token stream to dedup
    // tokens the query table doesn't even mention — post-join, the
    // dedup (needed so repeated tokens don't double-count toward the
    // conjunction) touches only the sparse matched rows
    docsDf
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
      .join(broadcast(q), col("tok") === col("term"))
      .select(col("doc_id"), col("query_id"), col("term"))
      .distinct()
      .groupBy("doc_id", "query_id")
      .agg(count(lit(1)).as("n_matched"))
      .join(broadcast(nterms), "query_id")
      .filter(col("n_matched") === col("n_terms"))
      .select(col("doc_id"), col("query_id"))
  }
  val percolateOp = QueryDef(
    "ns_search_percolate",
    (s, dir) => percolate(Par.spread(s, docs(s, dir), col("doc_id"))),
    Some({
      val values = percolateQueries
        .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $values),
         |nt AS (SELECT query_id, count(*) AS n_terms FROM q GROUP BY 1),
         |toks AS (SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS tok
         |  FROM documents),
         |m AS (SELECT doc_id, query_id, count(*) AS n_matched
         |  FROM toks JOIN q ON tok = term GROUP BY 1, 2)
         |SELECT doc_id, CAST(query_id AS BIGINT) AS query_id
         |FROM m JOIN nt USING (query_id) WHERE n_matched = n_terms""".stripMargin
    }))

  /** Fuzzy term match — the OpenSearch `fuzzy` query (typo-tolerant
    * term lookup): expand the query term against the VOCABULARY by
    * Damerau-free Levenshtein distance ≤ 2, then count per-document
    * occurrences of every expanded term. The edit-distance scan runs
    * over the distinct vocabulary — vocabulary-sized, never the corpus
    * token stream (exactly how Lucene walks its term dictionary) — and
    * the surviving terms (a handful) BROADCAST back into the token
    * stream, so the corpus pass stays map-side; only the final
    * (doc, term) count shuffles. Levenshtein is exact integer DP in
    * both engines — no float parity concerns. */
  private val fuzzyTerm = "sprak"
  private val fuzzyMaxDist = 2
  val fuzzyMatchOp = QueryDef(
    "ns_text_fuzzy", {
      (s, dir) =>
        val toks = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
        // the vocabulary walk reads the PERSISTED unigram artifact
        // (r10 — the term-dictionary discipline ns_search_suggest and
        // ns_search_mlt follow): no corpus-token distinct per query.
        // The matched-terms frame is still rebuilt from its RDD:
        // constraint propagation otherwise carries the levenshtein
        // predicate across the tok equivalence onto the CORPUS side of
        // the join, running the edit-distance DP once per token
        // OCCURRENCE instead of once per vocabulary entry (the whole
        // point of walking the term dictionary) — and localCheckpoint
        // alone does NOT help, its LogicalRDD keeps the origin
        // constraints. The materialized frame is a handful of matched
        // terms (the ns_dedup_pipeline edge-set precedent); PlanSpec
        // asserts the main plan carries zero levenshtein calls.
        val matchedRaw = unigramFreq(s, dir).select("tok")
          .filter(levenshtein(col("tok"), lit(fuzzyTerm)) <= fuzzyMaxDist)
        val matched = s.createDataFrame(matchedRaw.rdd, matchedRaw.schema)
        toks.join(broadcast(matched), "tok")
          .groupBy("doc_id", "tok")
          .agg(count(lit(1)).as("hits"))
          .select(col("doc_id"), col("tok").as("term"), col("hits"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
           |m AS (SELECT DISTINCT tok FROM toks
           |  WHERE levenshtein(tok, '$fuzzyTerm') <= $fuzzyMaxDist)
           |SELECT doc_id, tok AS term, count(*) AS hits
           |FROM toks JOIN m USING (tok)
           |GROUP BY 1, 2""".stripMargin),
    // the edit-distance filter BITES: matches exist, yet not every
    // document matches (the vocabulary walk excludes far terms)
    liveness = Seq(
      "fuzzy_filter_selective" ->
        ("SELECT (SELECT count(*) FROM r) > 0 AND " +
          "(SELECT count(DISTINCT doc_id) FROM r) < (SELECT count(*) FROM documents)")))

  /** The OpenSearch term suggester ("did you mean…"): for a misspelled
    * query term, candidate corrections from the corpus VOCABULARY
    * within edit distance ≤ 2, ranked the way ES does — closer first,
    * then more frequent, then lexicographic.
    *
    * Scale shape: the suggester never touches the corpus at query
    * time — it walks the persisted (tok, cnt) unigram artifact (the
    * same buildOnce term dictionary unigram scoring reads), so the
    * edit-distance DP runs once per VOCABULARY entry on a
    * vocabulary-sized scan, exactly like Lucene's FST term walk; the
    * cutoff is TakeOrderedAndProject. PlanSpec asserts no documents
    * scan exists in the query-time plan. */
  private val suggestSize = 5
  val suggestOp = QueryDef(
    "ns_search_suggest", { (s, dir) =>
      unigramFreq(s, dir)
        .filter(levenshtein(col("tok"), lit(fuzzyTerm)) <= fuzzyMaxDist)
        .select(col("tok").as("suggestion"),
          levenshtein(col("tok"), lit(fuzzyTerm)).cast("long").as("distance"),
          col("cnt").as("freq"))
        .orderBy(col("distance"), col("freq").desc, col("suggestion"))
        .limit(suggestSize)
    },
    Some(s"""WITH toks AS (SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents),
           |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1)
           |SELECT tok AS suggestion,
           |  CAST(levenshtein(tok, '$fuzzyTerm') AS BIGINT) AS distance,
           |  cnt AS freq
           |FROM freq WHERE levenshtein(tok, '$fuzzyTerm') <= $fuzzyMaxDist
           |ORDER BY distance, freq DESC, suggestion LIMIT $suggestSize""".stripMargin))

  /** The OpenSearch PHRASE suggester: the term suggester's big sibling
    * — correct a whole query phrase, not a word, by generating per-
    * position candidates and RESCORING candidate phrases with the
    * corpus language model (ES wires the same bigram smoothing through
    * its `laplace` smoothing option). Pipeline: each query position
    * draws its top-3 candidates from the persisted unigram artifact
    * (edit distance ≤ 2, ranked distance → frequency → lexicographic —
    * the term-suggester ordering), the ≤ 3³ candidate phrases cross-
    * join from three broadcast singleton lists, and each phrase scores
    * as the sum of its two adjacent-pair Laplace bigram log terms in
    * exact integer micros (the ns_text_bigram_logprob discipline —
    * scores are exact longs, no double ever compared).
    *
    * Scale shape: query time never touches the corpus — both count
    * tables are persisted buildOnce artifacts; the candidate window
    * partitions by query position over a vocabulary-bounded scan; all
    * joins broadcast the candidate side. */
  private val phraseSuggestQuery = Seq("fast", "sprak", "join")
  private val phraseSuggestCandK = 3
  val phraseSuggestOp = QueryDef(
    "ns_search_phrase_suggest", { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val uf = unigramFreq(s, dir)
      val bf = bigramFreq(s, dir)
      val vocabV = uf.agg(count(lit(1)).as("v"))
      val qterms = phraseSuggestQuery.zipWithIndex
        .map { case (t, i) => (i + 1, t) }.toDF("pos", "qterm")
      val cand = uf.crossJoin(broadcast(qterms))
        .withColumn("d", levenshtein(col("tok"), col("qterm")))
        .filter(col("d") <= fuzzyMaxDist)
        .withColumn("rk", row_number().over(
          Window.partitionBy("pos").orderBy(col("d"), col("cnt").desc, col("tok"))))
        .filter(col("rk") <= phraseSuggestCandK)
      def posCands(i: Int) = cand.filter(col("pos") === i).select(col("tok").as(s"w$i"))
      val phrases = broadcast(posCands(1))
        .crossJoin(broadcast(posCands(2)))
        .crossJoin(broadcast(posCands(3)))
      val pair12 = bf.select(col("w1").as("p1"), col("w2").as("p2"), col("bc").as("bc12"))
      val pair23 = bf.select(col("w1").as("p2b"), col("w2").as("p3"), col("bc").as("bc23"))
      val u1 = uf.select(col("tok").as("u1t"), col("cnt").as("uc1"))
      val u2 = uf.select(col("tok").as("u2t"), col("cnt").as("uc2"))
      def logTermC(bc: Column, uc: Column) =
        round(log((coalesce(bc, lit(0L)) + lit(1.0)) / (uc + col("v"))) * 1e6, 0).cast("long")
      phrases
        .join(pair12, col("w1") === col("p1") && col("w2") === col("p2"), "left")
        .join(pair23, col("w2") === col("p2b") && col("w3") === col("p3"), "left")
        .join(u1, col("w1") === col("u1t"))
        .join(u2, col("w2") === col("u2t"))
        .crossJoin(broadcast(vocabV))
        .select(concat_ws(" ", col("w1"), col("w2"), col("w3")).as("suggestion"),
          (logTermC(col("bc12"), col("uc1")) + logTermC(col("bc23"), col("uc2"))).as("score_c"))
        .orderBy(col("score_c").desc, col("suggestion"))
        .limit(suggestSize)
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |uf AS (SELECT tok, count(*) AS cnt FROM (SELECT unnest(t) AS tok FROM t) GROUP BY 1),
           |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
           |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM t)),
           |bf AS (SELECT w1, w2, count(*) AS bc FROM bg GROUP BY 1, 2),
           |vv AS (SELECT count(*) AS v FROM uf),
           |q(pos, qterm) AS (VALUES ${phraseSuggestQuery.zipWithIndex
              .map { case (t, i) => s"(${i + 1}, '$t')" }.mkString(", ")}),
           |cand AS (SELECT pos, tok, row_number() OVER (PARTITION BY pos
           |    ORDER BY levenshtein(tok, qterm), cnt DESC, tok) AS rk
           |  FROM uf, q WHERE levenshtein(tok, qterm) <= $fuzzyMaxDist),
           |c1 AS (SELECT tok AS w1 FROM cand WHERE pos = 1 AND rk <= $phraseSuggestCandK),
           |c2 AS (SELECT tok AS w2 FROM cand WHERE pos = 2 AND rk <= $phraseSuggestCandK),
           |c3 AS (SELECT tok AS w3 FROM cand WHERE pos = 3 AND rk <= $phraseSuggestCandK),
           |ph AS (SELECT w1, w2, w3 FROM c1, c2, c3),
           |sc AS (SELECT ph.w1 AS w1, ph.w2 AS w2, ph.w3 AS w3,
           |    CAST(round(ln((coalesce(b1.bc, 0) + 1.0) / (u1.cnt + v)) * 1000000, 0) AS BIGINT)
           |    + CAST(round(ln((coalesce(b2.bc, 0) + 1.0) / (u2.cnt + v)) * 1000000, 0) AS BIGINT) AS score_c
           |  FROM ph
           |  LEFT JOIN bf b1 ON b1.w1 = ph.w1 AND b1.w2 = ph.w2
           |  LEFT JOIN bf b2 ON b2.w1 = ph.w2 AND b2.w2 = ph.w3
           |  JOIN uf u1 ON u1.tok = ph.w1
           |  JOIN uf u2 ON u2.tok = ph.w2, vv)
           |SELECT w1 || ' ' || w2 || ' ' || w3 AS suggestion, score_c
           |FROM sc ORDER BY score_c DESC, suggestion LIMIT $suggestSize""".stripMargin))

  /** The `completion` suggester — the third and last ES suggester:
    * weighted prefix autocomplete, the search-box default ES serves
    * from an in-memory FST on every keystroke. The FST's Spark twin is
    * the persisted (tok, cnt) term-dictionary artifact (unigramFreq —
    * the same buildOnce dictionary the term/phrase suggesters walk):
    * the typed prefix becomes a pushed StringStartsWith on the
    * artifact's parquet scan (PlanSpec-locked — a dictionary-sized
    * read narrowed further by the pushdown, never a corpus scan),
    * suggestions rank by weight exactly as ES ranks by the completion
    * field's indexed weight (weight here = corpus term frequency, the
    * natural popularity weight an index build would attach), and the
    * cutoff is a top-k heap. */
  private val completionPrefix = "s"
  val completionSuggestOp = QueryDef(
    "ns_search_completion_suggest", { (s, dir) =>
      unigramFreq(s, dir)
        .filter(col("tok").startsWith(completionPrefix))
        .select(col("tok").as("suggestion"), col("cnt").as("weight"))
        .orderBy(col("weight").desc, col("suggestion"))
        .limit(suggestSize)
    },
    Some(s"""WITH toks AS (SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents),
           |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1)
           |SELECT tok AS suggestion, cnt AS weight FROM freq
           |WHERE tok LIKE '$completionPrefix%'
           |ORDER BY cnt DESC, suggestion LIMIT $suggestSize""".stripMargin))

  /** The per-context (lang) weighted term dictionary — the completion
    * suggester's `contexts` artifact: one (lang, tok, cnt) table per
    * corpus snapshot, so a context-filtered completion walks only its
    * context's rows (ES stores per-context FST branches the same
    * way). */
  private def unigramFreqByLang(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/documents.parquet", "unigram_freq_lang") {
      path =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("lang"), explode(split(trim(col("text")), " ")).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
          .coalesce(1)  // dim-bounded: (lang, tok) vocabulary cardinality
          .write.mode("overwrite").parquet(path)
    }

  /** The completion suggester's two request options beyond the plain
    * prefix walk: `contexts` (restrict candidates to a category —
    * here the language) and `fuzzy` (tolerate one edit in the TYPED
    * prefix, ES's FuzzyCompletionQuery default). The dictionary walk
    * compares the typed prefix against each term's same-length prefix
    * with the edit-distance DP — a vocabulary-bounded scan of the
    * per-context artifact, never the corpus (the ns_search_suggest
    * discipline; fuzziness forfeits the pushed StringStartsWith, which
    * is exactly the trade ES makes — a fuzzy FST walk visits edit-
    * distance neighbors instead of one prefix path). */
  private val completionFuzzyPrefix = "spak" // one edit from "spar…"
  private val completionContextLang = "en"
  val completionFuzzyOp = QueryDef(
    "ns_search_completion_fuzzy", { (s, dir) =>
      val plen = completionFuzzyPrefix.length
      unigramFreqByLang(s, dir)
        .filter(col("lang") === completionContextLang)
        .filter(levenshtein(substring(col("tok"), 1, plen),
          lit(completionFuzzyPrefix)) <= 1)
        .select(col("tok").as("suggestion"), col("cnt").as("weight"))
        .orderBy(col("weight").desc, col("suggestion"))
        .limit(suggestSize)
    },
    Some(s"""WITH toks AS (SELECT lang, unnest(string_split(trim(text), ' ')) AS tok
           |  FROM documents),
           |freq AS (SELECT lang, tok, count(*) AS cnt FROM toks GROUP BY 1, 2)
           |SELECT tok AS suggestion, cnt AS weight FROM freq
           |WHERE lang = '$completionContextLang'
           |  AND levenshtein(substring(tok, 1, ${completionFuzzyPrefix.length}),
           |        '$completionFuzzyPrefix') <= 1
           |ORDER BY cnt DESC, suggestion LIMIT $suggestSize""".stripMargin))

  /** The OpenSearch `rare_terms` aggregation: the long-tail complement
    * of a terms agg — bucket values appearing in at most
    * `max_doc_count` documents (one-off identifiers, anomalous
    * amounts, contamination markers — the buckets a terms agg's
    * size-N head can never surface). The term here is the exact-cents
    * event value, the testdata's one genuinely long-tailed keyword
    * (the synthetic document vocabulary is 31 dense tokens — no tail).
    * Output bounded to the `size` rarest with (df, term) ordering so
    * both engines cut identically.
    *
    * Scale shape: ES bounds this agg with a CuckooFilter because a
    * long tail is huge by definition; here the same bound is the
    * term-cardinality df aggregate (map-side partials, one shuffle of
    * term groups, never row groups) followed by TakeOrderedAndProject
    * — the tail is enumerated from the df dim, the corpus is scanned
    * once, and the result is `size`-bounded at any SF. */
  private val rareMaxDocCount = 2
  private val rareSize = 100
  val rareTermsOp = QueryDef(
    "ns_agg_rare_terms", { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(Exact.cents(col("value")).as("term"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= rareMaxDocCount)
        .orderBy(col("df"), col("term"))
        .limit(rareSize)
    },
    Some(s"""WITH dfq AS (SELECT ${Exact.sqlCents("value")} AS term, count(*) AS df
           |  FROM events GROUP BY 1)
           |SELECT term, df FROM dfq WHERE df <= $rareMaxDocCount
           |ORDER BY df, term LIMIT $rareSize""".stripMargin))

  /** Phrase match — the OpenSearch `match_phrase` query: documents
    * containing an exact N-token phrase, with occurrence counts. Runs
    * as a positional bigram scan, not a position self-join: spans form
    * by explode(sequence)+slice (the ns_dedup_substring shape — one
    * codegen pass, no Filter below the tokenizing Project possible
    * because the phrase test references the generated index), so the
    * corpus is read once and only matching (doc, span) rows survive to
    * the per-doc count. A position-index self-join (pos a ⋈ pos b ON
    * a.p+1=b.p) would shuffle the full positional index twice to find
    * the same rows. */
  private val phraseQuery = "slow join"
  val phraseMatchOp = QueryDef(
    "ns_text_phrase", {
      (s, dir) =>
        val pl = phraseQuery.split(" ").length
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"),
            explode(when(size(col("t")) >= pl,
              sequence(lit(1), size(col("t")) - (pl - 1)))).as("i"),
            col("t"))
          .filter(expr(s"array_join(slice(t, i, $pl), ' ')") === phraseQuery)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |g AS (SELECT doc_id, array_to_string(t[i:i+${phraseQuery.split(" ").length - 1}], ' ') AS span
           |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${phraseQuery.split(" ").length - 1})) AS i
           |        FROM t WHERE len(t) >= ${phraseQuery.split(" ").length}))
           |SELECT doc_id, count(*) AS n_hits
           |FROM g WHERE span = '$phraseQuery'
           |GROUP BY 1""".stripMargin))

  /** The OpenSearch `match_phrase_prefix` query — the autocomplete
    * primitive (the search box completing "slow jo…" while the user
    * types): an exact phrase whose LAST term matches as a prefix. Runs
    * on the ns_text_phrase positional-span machinery — one codegen
    * pass, explode(sequence) span formation with the size guard keeping
    * split out of every Filter/pushdown — with the span test split into
    * the exact leading-terms check and the startswith on the final
    * position. Output adds the distinct completions each document
    * supplies (what ES's suggester surfaces), sorted for determinism
    * and joined to one space-separated string — the registry's output
    * contract is scalar columns only (array/map outputs are not
    * orderable by the external row-sorting comparator; RegistrySpec
    * guards the class). Same scale shape as phrase: no positional
    * self-join, corpus read once, per-doc aggregation only on
    * surviving spans. */
  private val phrasePrefixLead = "slow"
  private val phrasePrefixLast = "jo"
  val phrasePrefixOp = QueryDef(
    "ns_search_match_phrase_prefix", {
      (s, dir) =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"),
            explode(when(size(col("t")) >= 2,
              sequence(lit(1), size(col("t")) - 1))).as("i"),
            col("t"))
          // coalesce blocks InferFiltersFromConstraints: a bare
          // element_at(t, i) = 'slow' is null-intolerant, so Catalyst
          // infers isnotnull(t) and pushes a split-recomputing Filter
          // below the Project (the bandSignatures trap — PlanSpec
          // watches for split( in Filters); element_at is never null
          // here anyway (i ranges over the guarded sequence)
          .filter(coalesce(element_at(col("t"), col("i")), lit("")) === phrasePrefixLead &&
            expr(s"startswith(coalesce(element_at(t, i + 1), ''), '$phrasePrefixLast')"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"),
            array_join(array_sort(collect_set(element_at(col("t"), col("i") + 1))), " ")
              .as("completions"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |g AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
           |        FROM t WHERE len(t) >= 2))
           |SELECT doc_id, count(*) AS n_hits,
           |  array_to_string(list_sort(list_distinct(list(w2))), ' ') AS completions
           |FROM g WHERE w1 = '$phrasePrefixLead' AND starts_with(w2, '$phrasePrefixLast')
           |GROUP BY 1""".stripMargin))

  /** The OpenSearch `span_near` query (in_order=true) — proximity
    * search: the two terms in order within `slop` intervening tokens
    * ("slow … join" with up to 2 tokens between). This is exactly ES's
    * span_near semantics with in_order (match_phrase's slop adds
    * move-counting reorder allowances on top; the in-order span form is
    * the one Kibana's proximity searches compile to). Same single-pass
    * positional-span machinery as phrase/phrase_prefix: the lead term
    * anchors at position i and the follower is an array_contains over
    * the next slop+1 positions' slice — one codegen pass, no
    * positional-index self-join; coalesce guards block the inferred
    * isnotnull(split(…)) re-tokenization (the bandSignatures trap). */
  private val spanLead = "slow"
  private val spanLast = "join"
  private val spanSlop = 2
  private val spanOrTerm = "spark"
  private val spanNotInclude = "data"
  private val spanNotExclude = "slow"
  val spanNearOp = QueryDef(
    "ns_search_span_near", {
      (s, dir) =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"),
            explode(when(size(col("t")) >= 2,
              sequence(lit(1), size(col("t")) - 1))).as("i"),
            col("t"))
          .filter(coalesce(element_at(col("t"), col("i")), lit("")) === spanLead &&
            coalesce(array_contains(
              expr(s"slice(t, i + 1, ${spanSlop + 1})"), spanLast), lit(false)))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |g AS (SELECT doc_id, t[i] AS w1, t[i + 1 : i + ${spanSlop + 1}] AS win
           |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
           |        FROM t WHERE len(t) >= 2))
           |SELECT doc_id, count(*) AS n_hits
           |FROM g WHERE w1 = '$spanLead' AND list_contains(win, '$spanLast')
           |GROUP BY 1""".stripMargin))

  /** The `span_multi` query — the span wrapper over a MULTI-TERM leaf
    * (prefix/wildcard/fuzzy inside positional context; ES docs' own
    * example is a prefix): here, `spanLead` followed within the slop
    * window by ANY token matching the prefix. Same one-pass positional
    * discipline as span_near; the window's prefix test is an UNROLLED
    * slop+1-term codegen OR (element_at + startsWith), never an
    * exists() HOF — the variable_width_histogram fallback lesson. */
  private val spanMultiPrefix = "win"
  val spanMultiOp = QueryDef(
    "ns_search_span_multi", {
      (s, dir) =>
        val windowHit = (1 to spanSlop + 1).map(k =>
          coalesce(try_element_at(col("t"), (col("i") + k).cast("int")), lit(""))
            .startsWith(spanMultiPrefix)).reduce(_ || _)
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"),
            explode(when(size(col("t")) >= 2,
              sequence(lit(1), size(col("t")) - 1))).as("i"),
            col("t"))
          .filter(coalesce(element_at(col("t"), col("i")), lit("")) === spanLead &&
            windowHit)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |g AS (SELECT doc_id, t[i] AS w1, t[i + 1 : i + ${spanSlop + 1}] AS win
           |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
           |        FROM t WHERE len(t) >= 2))
           |SELECT doc_id, count(*) AS n_hits
           |FROM g WHERE w1 = '$spanLead'
           |  AND len(list_filter(win, x -> x LIKE '$spanMultiPrefix%')) > 0
           |GROUP BY 1""".stripMargin))

  /** The `span_containing` query — the first of the two span-nesting
    * relations: match BIG spans (span_near lead→last, minimal form —
    * the shortest window reaching `last`, which is Lucene's span) that
    * CONTAIN a match of the LITTLE span (span_term). Same positional
    * discipline as span_near: one explode(sequence) pass, the minimal
    * span end via array_position on a bounded slice, containment via
    * array_contains on the span's own slice — every predicate codegen,
    * no positional self-join. */
  val spanContainingOp = QueryDef(
    "ns_search_span_containing", {
      (s, dir) =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"),
            explode(when(size(col("t")) >= 2,
              sequence(lit(1), size(col("t")) - 1))).as("i"),
            col("t"))
          .withColumn("kpos", coalesce(
            array_position(expr(s"slice(t, i + 1, $spanSlop + 1)"), spanLast), lit(0L)))
          .withColumn("is_big",
            coalesce(element_at(col("t"), col("i")) === spanLead, lit(false)) &&
              col("kpos") > 0)
          .withColumn("containing", col("is_big") &&
            coalesce(array_contains(
              expr("slice(t, i, CAST(kpos AS INT) + 1)"), spanOrTerm), lit(false)))
          .groupBy("doc_id")
          .agg(sum(when(col("is_big"), 1L).otherwise(0L)).as("n_big"),
            sum(when(col("containing"), 1L).otherwise(0L)).as("n_containing"))
          .filter(col("n_containing") > 0)
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |g AS (SELECT doc_id, t, i, t[i] AS w1,
           |    coalesce(list_position(t[i + 1 : i + ${spanSlop + 1}], '$spanLast'), 0) AS kpos
           |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
           |        FROM t WHERE len(t) >= 2)),
           |b AS (SELECT doc_id,
           |    CASE WHEN w1 = '$spanLead' AND kpos > 0 THEN 1 ELSE 0 END AS is_big,
           |    CASE WHEN w1 = '$spanLead' AND kpos > 0
           |      AND list_contains(t[i : i + kpos], '$spanOrTerm') THEN 1 ELSE 0 END AS containing
           |  FROM g)
           |SELECT doc_id, CAST(sum(is_big) AS BIGINT) AS n_big,
           |  CAST(sum(containing) AS BIGINT) AS n_containing
           |FROM b GROUP BY 1 HAVING sum(containing) > 0""".stripMargin))

  /** The `span_within` query — the inverse nesting relation: match
    * LITTLE spans (span_term at position p) that sit INSIDE some big
    * span. The backward check unrolls over the bounded span width
    * (d = 1..slop+1): position p is within a big span iff some
    * lead at p−d starts a minimal span reaching at least p — a fixed
    * OR of codegen comparisons, no join, no HOF fallback. */
  val spanWithinOp = QueryDef(
    "ns_search_span_within", {
      (s, dir) =>
        val base = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"),
            explode(when(size(col("t")) >= 1, sequence(lit(1), size(col("t"))))).as("p"),
            col("t"))
          .withColumn("is_term",
            coalesce(element_at(col("t"), col("p")) === spanOrTerm, lit(false)))
        val withinAnyBig = (1 to spanSlop + 1).map { d =>
          // p - d can be 0 (element_at rejects index 0) — gate the probe
          coalesce(when(col("p") > d,
            element_at(col("t"), col("p") - d) === spanLead), lit(false)) &&
            coalesce(array_position(
              expr(s"slice(t, greatest(p - $d + 1, 1), $spanSlop + 1)"), spanLast) >= d, lit(false))
        }.reduce(_ || _)
        base
          .withColumn("within", col("is_term") && withinAnyBig)
          .groupBy("doc_id")
          .agg(sum(when(col("within"), 1L).otherwise(0L)).as("n_within"))
          .filter(col("n_within") > 0)
    },
    Some {
      val conds = (1 to spanSlop + 1).map { d =>
        s"""(p - $d >= 1 AND t[p - $d] = '$spanLead'
           | AND coalesce(list_position(t[p - $d + 1 : p - $d + $spanSlop + 1], '$spanLast'), 0) >= $d)""".stripMargin
      }.mkString("\n    OR ")
      s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         |g AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p
         |  FROM t WHERE len(t) >= 1),
         |w AS (SELECT doc_id,
         |    CASE WHEN t[p] = '$spanOrTerm' AND ($conds) THEN 1 ELSE 0 END AS within
         |  FROM g)
         |SELECT doc_id, CAST(sum(within) AS BIGINT) AS n_within
         |FROM w GROUP BY 1 HAVING sum(within) > 0""".stripMargin
    })

  /** The `span_or` query: a span matches where ANY clause span matches
    * — here span_term(spark) OR span_near(slow→join, slop 2). ONE
    * positional explode serves both clauses (conditional sums, the
    * filters discipline): per position, clause membership is a codegen
    * boolean, and per-doc hit counts emerge from the same aggregate —
    * no per-clause scan, no positional self-join. */
  val spanOrOp = QueryDef(
    "ns_search_span_or", {
      (s, dir) =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"),
            explode(when(size(col("t")) >= 1, sequence(lit(1), size(col("t"))))).as("i"),
            col("t"))
          .withColumn("is_term",
            coalesce(element_at(col("t"), col("i")) === spanOrTerm, lit(false)))
          .withColumn("is_near",
            coalesce(element_at(col("t"), col("i")) === spanLead, lit(false)) &&
              coalesce(array_contains(
                expr(s"slice(t, i + 1, ${spanSlop + 1})"), spanLast), lit(false)))
          .groupBy("doc_id")
          .agg(sum(when(col("is_term"), 1L).otherwise(0L)).as("n_term_hits"),
            sum(when(col("is_near"), 1L).otherwise(0L)).as("n_near_hits"))
          .filter(col("n_term_hits") + col("n_near_hits") > 0)
          .withColumn("n_hits", col("n_term_hits") + col("n_near_hits"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       |g AS (SELECT doc_id,
       |    CASE WHEN t[i] = '$spanOrTerm' THEN 1 ELSE 0 END AS is_term,
       |    CASE WHEN t[i] = '$spanLead'
       |      AND list_contains(t[i + 1 : i + ${spanSlop + 1}], '$spanLast')
       |      THEN 1 ELSE 0 END AS is_near
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
       |        FROM t WHERE len(t) >= 1))
       |SELECT doc_id, CAST(sum(is_term) AS BIGINT) AS n_term_hits,
       |  CAST(sum(is_near) AS BIGINT) AS n_near_hits,
       |  CAST(sum(is_term) + sum(is_near) AS BIGINT) AS n_hits
       |FROM g GROUP BY 1
       |HAVING sum(is_term) + sum(is_near) > 0""".stripMargin))

  /** The `span_not` query: spans of the include clause that do NOT
    * overlap the exclude clause's vicinity — "`data` but not within 2
    * tokens of `slow`", the negative-context filter. Same single
    * positional explode; the exclusion window is one bounded slice per
    * anchor (constant per-row cost at any SF). */
  private val spanNotDist = 2
  val spanNotOp = QueryDef(
    "ns_search_span_not", {
      (s, dir) =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"),
            explode(when(size(col("t")) >= 1, sequence(lit(1), size(col("t"))))).as("i"),
            col("t"))
          .filter(coalesce(element_at(col("t"), col("i")), lit("")) === spanNotInclude)
          .withColumn("excluded",
            coalesce(array_contains(expr(
              s"slice(t, greatest(i - $spanNotDist, 1), i + $spanNotDist - greatest(i - $spanNotDist, 1) + 1)"),
              spanNotExclude), lit(false)))
          .groupBy("doc_id")
          .agg(sum(when(!col("excluded"), 1L).otherwise(0L)).as("n_clean_hits"),
            sum(when(col("excluded"), 1L).otherwise(0L)).as("n_excluded"))
          .filter(col("n_clean_hits") > 0)
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       |a AS (SELECT doc_id, i,
       |    list_contains(t[greatest(i - $spanNotDist, 1) : i + $spanNotDist], '$spanNotExclude') AS excluded
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
       |        FROM t WHERE len(t) >= 1)
       |  WHERE t[i] = '$spanNotInclude')
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN NOT excluded THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_hits,
       |  CAST(sum(CASE WHEN excluded THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded
       |FROM a GROUP BY 1
       |HAVING sum(CASE WHEN NOT excluded THEN 1 ELSE 0 END) > 0""".stripMargin))

  /** The OpenSearch `rank_eval` API — search-quality evaluation:
    * given rated (query, document) judgments and the engine's ranked
    * results, compute precision@k, MRR, and NDCG@k per query — the
    * relevance scorecard a search deployment (and a training-data
    * retrieval pipeline) runs against every ranking change.
    *
    * Rankings here are tf-ordered top-10 per query term (bounded top-k
    * aggregate — ≤ N rows per query per map task, the top_hits
    * discipline); judgments derive from a deterministic tf rule (tf≥3
    * → rating 2, tf≥2 → 1) so both engines rate identically — in
    * production the judgment table is a tiny human-labeled dim, which
    * is exactly how it enters the plan (a broadcast join against the
    * ranked rows). Determinism: every DCG term (gain·ln2/ln(rank+1),
    * the engine-dependent log) rounds to integer MICROS before the
    * per-query sum — the repo's data-dependent-term rule — and
    * precision/MRR are exact integer ratios. The ideal-DCG window runs
    * over the judged set only (judgments are human-made, so bounded by
    * construction at any corpus size). */
  private val evalK = 5
  private val evalTopN = 10
  private val evalTerms = Seq("spark", "join", "data")
  val rankEvalOp = QueryDef(
    "ns_search_rank_eval", {
      (s, dir) =>
        import s.implicits._
        val terms = evalTerms.toDF("term")
        // MATERIALIZE the judgment matrix before the metric fan-out
        // (r21, the ns_dedup_pipeline localCheckpoint discipline): tf
        // is referenced FOUR times below (ranked's base, ranked's
        // rating join, ideal, judged) and Catalyst replans the whole
        // tokenize→explode→join→groupBy subtree per reference —
        // ProfileBench measured 20 jobs / 177 tasks / 1.25 s exec for
        // this one key. tf is the rated (term, doc) matrix — rank_eval
        // evaluates a BOUNDED query set with bounded judgments (the ES
        // rank_eval API ships explicit rated docs), so the checkpoint
        // is eval-harness-sized at any corpus scale; the corpus scan
        // now runs exactly once.
        val tf = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"), explode(when(size(col("t")) >= 1, col("t"))).as("tok"))
          .join(broadcast(terms), col("tok") === col("term"))
          .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
          .withColumn("rating",
            when(col("tf") >= 3, 2L).when(col("tf") >= 2, 1L).otherwise(0L))
          // doc lengths joined in BEFORE the checkpoint: the naive
          // ranker needs n_chars only for JUDGED docs, so the join is
          // judgment-sized and every downstream reference replans only
          // checkpoint-fed operators — zero corpus scans after the one
          // materialization.
          .join(docs(s, dir).select(col("doc_id"), col("n_chars")), "doc_id")
          .localCheckpoint(true)
        // the ranking UNDER EVALUATION: a deliberately naive
        // shortest-document-first retrieval, top-N per query by
        // (n_chars asc, doc_id). r20 gate-liveness audit: the old
        // tf-ordered ranking was scored against tf-DERIVED ratings, so
        // the list was ideal by construction and all three metrics sat
        // pinned at 1.0 — the position discounts, the miss branch of
        // MRR, and the sub-ideal NDCG arithmetic never ran. rank_eval's
        // whole job is to measure an ARBITRARY ranking against
        // independent judgments; the naive ranker makes every metric
        // branch live at every SF (spark@sf0.1 even hits the
        // zero-relevant page → the 0.0 fallbacks).
        val ranked = tf
          .groupBy("term")
          .agg(graft.expr.VecFunctions.topk_by_score(
            col("doc_id"), -col("n_chars").cast("double"), evalTopN).as("top"))
          .select(col("term"), posexplode(col("top")))
          .select(col("term"), col("col.id").as("doc_id"),
            (col("pos") + 1).cast("long").as("rank"))
          .join(tf.select("term", "doc_id", "rating"), Seq("term", "doc_id"))
        // ranked is referenced three times (dcg, prec, mrr) but its
        // subtree above the tf checkpoint is judged-set-sized — the
        // replans are cheap, and leaving it live keeps the bounded
        // top-k aggregate in the locked physical plan (PlanSpec).
        // integer-micros DCG terms: gain·ln(2)/ln(rank+1)
        def dcgMicro(rankCol: String): org.apache.spark.sql.Column =
          round((pow(lit(2.0), col("rating")) - 1.0) * log(lit(2.0))
            / log(col(rankCol) + 1.0) * 1e6, 0).cast("long")
        val dcg = ranked.filter(col("rank") <= evalK)
          .withColumn("m", dcgMicro("rank"))
          .groupBy("term").agg(sum(col("m")).as("dcg_micro"))
        val ideal = tf
          .withColumn("irank", row_number().over(
            Window.partitionBy("term").orderBy(col("rating").desc, col("doc_id"))))
          .filter(col("irank") <= evalK)
          .withColumn("m", dcgMicro("irank"))
          .groupBy("term").agg(sum(col("m")).as("idcg_micro"))
        val prec = ranked.filter(col("rank") <= evalK)
          .groupBy("term")
          .agg(sum(when(col("rating") > 0, 1L).otherwise(0L)).as("rel_at_k"))
        val mrr = ranked.filter(col("rating") > 0)
          .groupBy("term").agg(min(col("rank")).as("first_rel"))
        val judged = tf.groupBy("term").agg(count(lit(1)).as("n_judged"))
        judged
          .join(prec, Seq("term"), "left")
          .join(mrr, Seq("term"), "left")
          .join(dcg, Seq("term"), "left")
          .join(ideal, Seq("term"), "left")
          .select(col("term"), col("n_judged"),
            round(coalesce(col("rel_at_k"), lit(0L)).cast("double") / evalK, 6).as("precision_k"),
            round(when(col("first_rel").isNotNull, lit(1.0) / col("first_rel"))
              .otherwise(0.0), 6).as("mrr"),
            round(when(coalesce(col("idcg_micro"), lit(0L)) > 0,
              coalesce(col("dcg_micro"), lit(0L)).cast("double") / col("idcg_micro"))
              .otherwise(0.0), 6).as("ndcg_k"))
    },
    Some(s"""WITH terms AS (SELECT unnest(ARRAY[${evalTerms.map("'" + _ + "'").mkString(", ")}]) AS term),
           |tf AS (SELECT term, doc_id, count(*) AS tf,
           |    CASE WHEN count(*) >= 3 THEN 2 WHEN count(*) >= 2 THEN 1 ELSE 0 END AS rating
           |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents) tk
           |  JOIN terms ON tok = term GROUP BY 1, 2),
           |ranked AS (SELECT term, tf.doc_id, rating,
           |    row_number() OVER (PARTITION BY term ORDER BY n_chars, tf.doc_id) AS rank
           |  FROM tf JOIN documents d ON tf.doc_id = d.doc_id QUALIFY rank <= $evalTopN),
           |dcg AS (SELECT term, sum(CAST(round((pow(2.0, rating) - 1.0) * ln(2.0)
           |      / ln(rank + 1.0) * 1e6, 0) AS BIGINT)) AS dcg_micro
           |  FROM ranked WHERE rank <= $evalK GROUP BY 1),
           |ideal AS (SELECT term, sum(CAST(round((pow(2.0, rating) - 1.0) * ln(2.0)
           |      / ln(irank + 1.0) * 1e6, 0) AS BIGINT)) AS idcg_micro
           |  FROM (SELECT term, rating,
           |      row_number() OVER (PARTITION BY term ORDER BY rating DESC, doc_id) AS irank
           |    FROM tf QUALIFY irank <= $evalK) GROUP BY 1),
           |prec AS (SELECT term, sum(CASE WHEN rating > 0 THEN 1 ELSE 0 END) AS rel_at_k
           |  FROM ranked WHERE rank <= $evalK GROUP BY 1),
           |mrr AS (SELECT term, min(rank) AS first_rel FROM ranked WHERE rating > 0 GROUP BY 1),
           |judged AS (SELECT term, count(*) AS n_judged FROM tf GROUP BY 1)
           |SELECT j.term, j.n_judged,
           |  round(CAST(coalesce(rel_at_k, 0) AS DOUBLE) / $evalK, 6) AS precision_k,
           |  round(CASE WHEN first_rel IS NOT NULL THEN 1.0 / first_rel ELSE 0.0 END, 6) AS mrr,
           |  round(CASE WHEN coalesce(idcg_micro, 0) > 0
           |        THEN CAST(coalesce(dcg_micro, 0) AS DOUBLE) / idcg_micro ELSE 0.0 END, 6) AS ndcg_k
           |FROM judged j
           |LEFT JOIN prec USING (term) LEFT JOIN mrr USING (term)
           |LEFT JOIN dcg USING (term) LEFT JOIN ideal USING (term)""".stripMargin),
    // the evaluated ranking is genuinely non-ideal: metrics move off
    // 1.0 and MRR discriminates between queries
    liveness = Seq(
      "metrics_off_the_ideal_point" ->
        ("SELECT min(precision_k) < 1.0 AND max(precision_k) > 0.0 AND " +
          "count(DISTINCT mrr) >= 2 FROM r")))

  /** The OpenSearch `collapse` feature — field collapsing: the result
    * list deduped on a field, keeping only each field value's BEST hit,
    * still ranked by score ("one result per domain" — every search UI's
    * anti-spam grouping). Scoring here is the spark-term tf (exact
    * integer, engine-identical); the per-source best is the bounded
    * top-k aggregate at k=1 (≤ 1 row per source per map task — a
    * 10^9-page domain ships one row, never a per-source window sort),
    * the page cutoff a TakeOrderedAndProject. */
  private val collapseTerm = "spark"
  private val collapseSize = 10
  val collapseOp = QueryDef(
    "ns_search_collapse", {
      (s, dir) =>
        val tf = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), col("source"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"), col("source"),
            explode(when(size(col("t")) >= 1, col("t"))).as("tok"))
          .filter(col("tok") === collapseTerm)
          .groupBy("source", "doc_id").agg(count(lit(1)).as("score"))
        tf.groupBy("source")
          .agg(graft.expr.VecFunctions.topk_by_score(
            col("doc_id"), col("score").cast("double"), 1).as("top"))
          .select(col("source"),
            col("top").getItem(0).getField("id").as("doc_id"),
            col("top").getItem(0).getField("score").cast("long").as("score"))
          .orderBy(col("score").desc, col("source"))
          .limit(collapseSize)
    },
    Some(s"""WITH tf AS (SELECT source, doc_id, count(*) AS score
           |  FROM (SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS tok
           |        FROM documents) t
           |  WHERE tok = '$collapseTerm' GROUP BY 1, 2),
           |best AS (SELECT source, doc_id, score FROM (
           |    SELECT tf.*, row_number() OVER (PARTITION BY source
           |      ORDER BY score DESC, doc_id) AS rk FROM tf) WHERE rk = 1)
           |SELECT source, doc_id, score FROM best
           |ORDER BY score DESC, source LIMIT $collapseSize""".stripMargin))

  /** significant_terms — the OpenSearch aggregation that surfaces
    * terms OVER-REPRESENTED in a foreground slice relative to the whole
    * corpus (here: per `source`, scored by lift =
    * (fg/N_source)/(bg/N_corpus), the simple-ratio heuristic; top 5 per
    * source). The dashboard question it answers — "what distinguishes
    * THIS slice's documents" — is the other half of the reference's
    * search story alongside ns_text_bm25.
    *
    * Scale shape: ONE corpus token pass builds the (source, tok)
    * foreground counts; every background statistic (per-term bg,
    * per-source totals, the corpus total) is RE-AGGREGATED from that
    * vocabulary-sized table, never from a second corpus scan. The
    * ranking window partitions by source over the per-source vocabulary
    * — bounded by vocabulary size, never corpus rows. Determinism: all
    * counts are exact longs; lift is two fixed-order double divisions
    * both engines evaluate identically, round-6 with a term tiebreak. */
  val significantTermsOp = QueryDef(
    "ns_significant_terms", {
      (s, dir) =>
        // isNotNull(source) INSIDE the shared fg definition: the join
        // below infers it onto the fg branch only, and a constraint
        // present in one branch but not the bg/nf/n re-aggregations
        // makes the subtrees canonically different — AQE then cannot
        // collapse them and the corpus is scanned twice. With the
        // filter shared, all four branches are identical and reuse to
        // ONE executed scan (PlanSpec counts it). explode guarded by
        // when() — see ns_text_bm25.
        val fg = Par.spread(s, docs(s, dir), col("doc_id"))
          .filter(col("source").isNotNull)
          .select(col("source"), split(trim(col("text")), " ").as("t"))
          .select(col("source"),
            explode(when(size(col("t")) >= 1, col("t"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("fg"))
        val bg = fg.groupBy("tok").agg(sum("fg").as("bg"))
        val nf = fg.groupBy("source").agg(sum("fg").as("nf"))
        val n = fg.agg(sum("fg").as("n"))
        val w = Window.partitionBy("source")
          .orderBy(col("lift").desc, col("tok"))
        fg.join(bg, "tok").join(broadcast(nf), "source").crossJoin(broadcast(n))
          .withColumn("lift",
            round((col("fg") * lit(1.0) / col("nf")) / (col("bg") * lit(1.0) / col("n")), 6))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("source"), col("tok"), col("fg"), col("lift"))
    },
    Some("""WITH t AS (SELECT source, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
           |fg AS (SELECT source, tok, count(*) AS fg FROM t GROUP BY 1, 2),
           |bg AS (SELECT tok, CAST(sum(fg) AS BIGINT) AS bg FROM fg GROUP BY 1),
           |nf AS (SELECT source, CAST(sum(fg) AS BIGINT) AS nf FROM fg GROUP BY 1),
           |n AS (SELECT CAST(sum(fg) AS BIGINT) AS n FROM fg),
           |sc AS (SELECT source, tok, fg,
           |    round((fg * 1.0 / nf) / (bg * 1.0 / n), 6) AS lift
           |  FROM fg JOIN bg USING (tok) JOIN nf USING (source), n)
           |SELECT source, tok, fg, lift FROM sc
           |QUALIFY row_number() OVER (PARTITION BY source ORDER BY lift DESC, tok) <= 5""".stripMargin))

  /** BM25 full-text retrieval (Robertson/Spärck Jones; the Lucene
    * practical-scoring form OpenSearch runs): top-k documents for a
    * term query, scored Σ_t idf(t)·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    * with idf = ln((N−df+0.5)/(df+0.5)+1). The reference's whole job is
    * shipping documents INTO a search engine; this op answers the
    * search query itself, completing the round trip.
    *
    * Scale shape: the classic inverted-index retrieval plan. The
    * query-term filter sits directly above the token explode (codegen,
    * map-side), so only query-term postings — |q| rows per matching
    * doc, not the corpus token stream — reach the tf aggregation; the
    * df dimension (≤|q| rows) and corpus stats (1 row) broadcast; the
    * final top-k is orderBy+limit, which Spark plans as
    * TakeOrderedAndProject (per-partition heaps + driver merge of k
    * rows), never a global sort. Determinism discipline: per-term
    * scores are summed in FIXED query order (one addend per term, no
    * accumulation-order dependence), avgdl is exact-integer
    * sum(dl)/count, and the top-k cutoff tie-breaks on doc_id over the
    * round-6 score both engines compute identically. */
  private val bm25K1 = 1.2
  private val bm25B = 0.75
  private val bm25Query = Seq("spark", "join", "window")
  private val bm25TopK = 20

  /** Corpus-level BM25 statistics (n_docs, avgdl) as a PERSISTED
    * artifact — what Lucene stores in the index: without it every
    * retrieval query pays a full corpus tokenize pass just to learn
    * the average document length. Built once per corpus snapshot;
    * every retrieval plan broadcasts the one-row dim. */
  private def corpusStats(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/documents.parquet", "corpus_stats") {
      path =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(size(split(trim(col("text")), " ")).cast("long").as("dl"))
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
          .coalesce(1)  // dim-bounded: one-row corpus stats
          .write.mode("overwrite").parquet(path)
    }

  /** The BM25 scoring chain, shared by ns_text_bm25 (global top-k) and
    * ns_search_top_hits (per-bucket top-k): every matching document's
    * rounded score plus its `source` carried along for bucketing —
    * doc_id is unique, so the extra group key changes no counts.
    * Corpus stats read the persisted artifact (r10) — the only
    * documents scans left in the plan are the posting stream's. */
  private def bm25ScoredDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Par.spread(s, docs(s, dir), col("doc_id"))
      .select(col("doc_id"), col("source"), split(trim(col("text")), " ").as("t"))
      .select(col("doc_id"), col("source"), col("t"), size(col("t")).cast("long").as("dl"))
    val stats = corpusStats(s, dir)
    // explode guarded by when(): a bare explode(t) lets Catalyst
    // infer size(split(...))>0 / isnotnull(split(...)) and push
    // them into the scan, re-tokenizing every document in the
    // Filter and DataFilters (the bandSignatures trap)
    val tf = d.select(col("doc_id"), col("source"), col("dl"),
        explode(when(size(col("t")) >= 1, col("t"))).as("tok"))
      .filter(col("tok").isin(bm25Query: _*))
      .groupBy("doc_id", "source", "dl", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("sc", col("idf") * (col("tf") * lit(bm25K1 + 1)) /
        (col("tf") + lit(bm25K1) * (lit(1 - bm25B) + lit(bm25B) * col("dl") / col("avgdl"))))
    val perTerm = bm25Query.map(t =>
      coalesce(sum(when(col("tok") === t, col("sc"))), lit(0.0)).as(s"s_$t"))
    scored.groupBy("doc_id", "source")
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id"), col("source"),
        round(bm25Query.map(t => col(s"s_$t")).reduce(_ + _), 6).as("score"))
  }

  /** Oracle twin of bm25ScoredDocs, ending at `agg(doc_id, source,
    * score)`. */
  private def bm25SqlCtes: String =
    s"""d AS (SELECT doc_id, source, string_split(trim(text), ' ') AS t FROM documents),
       |dd AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS dl, t FROM d),
       |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dd),
       |tf AS (SELECT doc_id, source, dl, tok, count(*) AS tf
       |  FROM (SELECT doc_id, source, dl, unnest(t) AS tok FROM dd)
       |  WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2, 3, 4),
       |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT doc_id, source, tok,
       |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * (${bm25K1 + 1})::DOUBLE) /
       |      (tf + $bm25K1 * (1 - $bm25B + $bm25B * dl / avgdl)) AS sc
       |  FROM tf JOIN dfq USING (tok), stats),
       |agg AS (SELECT doc_id, source, round(
       |    ${bm25Query.map(t => s"coalesce(sum(CASE WHEN tok = '$t' THEN sc END), 0)").mkString(" + ")}, 6) AS score
       |  FROM sc GROUP BY 1, 2)""".stripMargin

  val bm25Op = QueryDef(
    "ns_text_bm25",
    (s, dir) =>
      bm25ScoredDocs(s, dir)
        .select(col("doc_id"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(bm25TopK),
    Some(s"""WITH $bm25SqlCtes
           |SELECT doc_id, score FROM agg ORDER BY score DESC, doc_id LIMIT $bm25TopK""".stripMargin))

  /** Terms-bucketed retrieval — the OpenSearch `terms` aggregation
    * with a `top_hits` sub-aggregation: the best `topHitsK` documents
    * for the query WITHIN each source bucket (the "best matches per
    * site" page every search UI renders). Reuses the verified BM25
    * chain, then selects per bucket through the bounded top-k
    * TypedImperativeAggregate — partial aggregation ships ≤ k rows per
    * (source, map task), never a per-bucket window sort of all
    * matching docs. Output matches row_number(PARTITION BY source
    * ORDER BY score DESC, doc_id). */
  private val topHitsK = 3
  val topHitsOp = QueryDef(
    "ns_search_top_hits",
    (s, dir) =>
      bm25ScoredDocs(s, dir)
        .groupBy("source")
        .agg(graft.expr.VecFunctions.topk_by_score(
          col("doc_id"), col("score"), topHitsK).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"),
          col("col.id").as("doc_id"),
          col("col.score").as("score"),
          (col("pos") + 1).cast("long").as("rank")),
    Some(s"""WITH $bm25SqlCtes
           |SELECT source, doc_id, score, rank FROM (
           |  SELECT source, doc_id, score,
           |    CAST(row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS BIGINT) AS rank
           |  FROM agg)
           |WHERE rank <= $topHitsK""".stripMargin))

  /** The OpenSearch `function_score` query: a relevance query wrapped
    * with a score-modifying function — here `field_value_factor` on
    * `n_chars` with the `log1p` modifier (boost substantial documents
    * over fragments), the most common production shape (recency/
    * popularity/length boosts). Final score =
    * round(bm25 · ln(1 + n_chars/100), 6), top-k with doc_id
    * tie-break.
    *
    * Scale shape: the factor column is ES's doc-values lookup — a
    * SECOND scan of documents pruned to exactly (doc_id, n_chars),
    * joined to the (small) match set on doc_id, with AQE free to
    * broadcast whichever side is tiny. The BM25 chain itself is the
    * shared verified plan; the factor math is one codegen projection;
    * the cutoff stays TakeOrderedAndProject. */
  val functionScoreOp = QueryDef(
    "ns_search_function_score", { (s, dir) =>
      val factor = docs(s, dir).select(col("doc_id"), col("n_chars"))
      bm25ScoredDocs(s, dir)
        .join(factor, "doc_id")
        .select(col("doc_id"),
          round(col("score") * log(lit(1.0) + col("n_chars").cast("double") / 100.0), 6)
            .as("fscore"))
        .orderBy(col("fscore").desc, col("doc_id"))
        .limit(bm25TopK)
    },
    Some(s"""WITH $bm25SqlCtes
           |SELECT agg.doc_id AS doc_id,
           |  round(score * ln(1.0 + n_chars::DOUBLE / 100.0), 6) AS fscore
           |FROM agg JOIN documents USING (doc_id)
           |ORDER BY fscore DESC, doc_id LIMIT $bm25TopK""".stripMargin))

  /** The ES `script_score` query — function_score's 7.x+ successor: the
    * final score is a SCRIPT over the query score and doc values. The
    * declared script is the canonical rank-feature pair ES's docs lead
    * with: `_score * saturation(doc['n_chars'].value, k)` with
    * saturation(x, k) = x / (x + k) — the bounded length boost (unlike
    * function_score's unbounded log1p factor, saturation caps the
    * boost at 1, the property rank_feature exists for). Same scale
    * shape as function_score: the doc-values lookup is a second
    * documents scan pruned to (doc_id, n_chars) joined to the small
    * match set; the script is one codegen projection; the cutoff stays
    * TakeOrderedAndProject. */
  private val scriptScoreSatK = 500.0
  val scriptScoreOp = QueryDef(
    "ns_search_script_score", { (s, dir) =>
      val factor = docs(s, dir).select(col("doc_id"), col("n_chars"))
      bm25ScoredDocs(s, dir)
        .join(factor, "doc_id")
        .select(col("doc_id"),
          round(col("score") * (col("n_chars").cast("double") /
            (col("n_chars").cast("double") + lit(scriptScoreSatK))), 6)
            .as("sscore"))
        .orderBy(col("sscore").desc, col("doc_id"))
        .limit(bm25TopK)
    },
    Some(s"""WITH $bm25SqlCtes
           |SELECT agg.doc_id AS doc_id,
           |  round(score * (n_chars::DOUBLE / (n_chars::DOUBLE + $scriptScoreSatK)), 6) AS sscore
           |FROM agg JOIN documents USING (doc_id)
           |ORDER BY sscore DESC, doc_id LIMIT $bm25TopK""".stripMargin))

  /** The OpenSearch `more_like_this` query: given a SEED document,
    * select its `max_query_terms` most characteristic terms by TF-IDF
    * against the corpus (the Lucene MLT interesting-terms pass), then
    * retrieve the BM25 top-k for those terms, excluding the seed
    * itself — "find me documents like this one" without the caller
    * naming a single term.
    *
    * Determinism discipline, stricter than the static-query BM25 ops:
    * the query terms are DATA-DEPENDENT, so the fixed-order per-term
    * addition trick is unavailable — instead every per-(doc, term)
    * score rounds to integer MICROS (×1e6 longs) before summation,
    * making the per-doc sum accumulation-order independent and
    * bit-identical across engines; the interesting-terms ranking
    * orders by the same integer-micros tf·idf with a term-text
    * tie-break, so both engines pick the identical term set.
    *
    * Scale shape (r10 rework — the inverted-index discipline): the
    * document-frequency dim is a PERSISTED buildOnce artifact
    * (vocabulary-bounded, corpus-size-independent), so no query-time
    * full-vocabulary aggregation exists anywhere in the plan; the
    * SEED document reaches the tokenizer through a doc_id equality
    * that pushes into the parquet scan (PushedFilters — one row-group
    * read, not a corpus pass; PlanSpec-locked); and the corpus token
    * stream semi-joins the broadcast 5-term seed dim BEFORE the tf
    * aggregation, so only the query terms' postings ever shuffle —
    * the original formulation aggregated the ENTIRE corpus token
    * stream into a per-(doc,term) tf table per query, a full token
    * shuffle that at 100 TB dwarfs the retrieval itself. Corpus
    * stats stay a map-side singleton agg; the cutoff is
    * TakeOrderedAndProject. */
  private val mltSeedDoc = 42L
  private val mltMaxTerms = 5

  /** Per-term document frequency as a PERSISTED artifact (tok, df) —
    * the term-dictionary statistics every retrieval query reads,
    * built once per corpus snapshot (the unigramFreq discipline). */
  private def termDf(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/documents.parquet", "term_df") {
      path =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
          .distinct()
          .groupBy("tok").agg(count(lit(1)).as("df"))
          .coalesce(1)  // dim-bounded: term-dictionary cardinality
          .write.mode("overwrite").parquet(path)
    }

  /** The `_explain` API: WHY did this document get this score — the
    * per-clause BM25 breakdown ES renders as the explanation tree,
    * flattened to one row per matching query term: tf, dl, df, the idf
    * and tf-norm factors, the term's contribution, and the document
    * total (= ns_text_bm25's score for the same doc, same rounding).
    *
    * Scale shape: explain is a point lookup — the requested doc id
    * pushes to a one-document parquet scan; df and (n_docs, avgdl)
    * come from the persisted term-dictionary artifacts, so no corpus
    * scan exists in the plan at any SF. The total sums three rows
    * through a doc-partitioned window. */
  private val explainDocId = 42L
  val explainOp = QueryDef(
    "ns_search_explain", { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Par.spread(s, docs(s, dir), col("doc_id"))
        .filter(col("doc_id") === explainDocId)
        .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
        .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("dl"))
      val tf = d.select(col("doc_id"), col("dl"),
          explode(when(size(col("t")) >= 1, col("t"))).as("tok"))
        .filter(col("tok").isin(bm25Query: _*))
        .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
      tf.join(broadcast(termDf(s, dir)), "tok")
        .crossJoin(broadcast(corpusStats(s, dir)))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("tfn", col("tf") * lit(bm25K1 + 1) /
          (col("tf") + lit(bm25K1) * (lit(1 - bm25B) + lit(bm25B) * col("dl") / col("avgdl"))))
        .withColumn("sc", col("idf") * col("tfn"))
        .withColumn("total", round(sum(col("sc")).over(Window.partitionBy("doc_id")), 6))
        .select(col("doc_id"), col("tok").as("term"), col("tf"), col("dl"), col("df"),
          round(col("idf"), 6).as("idf"), round(col("tfn"), 6).as("tf_norm"),
          round(col("sc"), 6).as("contribution"), col("total"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |stats AS (SELECT count(*) AS n_docs,
           |    CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl FROM t),
           |tdf AS (SELECT tok, count(*) AS df FROM (
           |  SELECT DISTINCT doc_id, tok FROM (
           |    SELECT doc_id, unnest(t) AS tok FROM t)) GROUP BY 1),
           |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM (
           |    SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS tok FROM t)
           |  WHERE doc_id = $explainDocId
           |    AND tok IN (${bm25Query.map(t => s"'$t'").mkString(", ")})
           |  GROUP BY 1, 2, 3),
           |e AS (SELECT doc_id, tok, tf, dl, df,
           |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf,
           |    tf * ${bm25K1 + 1} / (tf + $bm25K1 * (${1 - bm25B} + $bm25B * dl / avgdl)) AS tfn
           |  FROM tf JOIN tdf USING (tok), stats)
           |SELECT doc_id, tok AS term, tf, dl, df,
           |  round(idf, 6) AS idf, round(tfn, 6) AS tf_norm,
           |  round(idf * tfn, 6) AS contribution,
           |  round(sum(idf * tfn) OVER (PARTITION BY doc_id), 6) AS total
           |FROM e""".stripMargin))

  val mltOp = QueryDef(
    "ns_search_mlt", { (s, dir) =>
      val d = Par.spread(s, docs(s, dir), col("doc_id"))
        .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
        .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("dl"))
      val stats = corpusStats(s, dir)
      val dfDim = termDf(s, dir)
      // seed: only the seed document's row reaches the tokenizer — the
      // doc_id equality pushes into the parquet scan
      val seedTf = docs(s, dir).filter(col("doc_id") === mltSeedDoc)
        .select(explode(split(trim(col("text")), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("tf"))
      val seed = seedTf.join(dfDim, "tok").crossJoin(broadcast(stats))
        .withColumn("tfidf_c",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")) * 1e6, 0)
            .cast("long"))
        .orderBy(col("tfidf_c").desc, col("tok"))
        .limit(mltMaxTerms)
        .select("tok")
      // match: the 5-term seed dim broadcasts into the token stream
      // BEFORE the tf aggregation — only query-term postings shuffle
      val tf = d.select(col("doc_id"), col("dl"),
          explode(when(size(col("t")) >= 1, col("t"))).as("tok"))
        .join(broadcast(seed), "tok")
        .filter(col("doc_id") =!= mltSeedDoc)
        .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
      tf.join(broadcast(dfDim), "tok")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("sc", col("idf") * (col("tf") * lit(bm25K1 + 1)) /
          (col("tf") + lit(bm25K1) * (lit(1 - bm25B) + lit(bm25B) * col("dl") / col("avgdl"))))
        .withColumn("sc_c", round(col("sc") * 1e6, 0).cast("long"))
        .groupBy("doc_id")
        .agg(sum(col("sc_c")).as("score_c"), count(lit(1)).as("n_terms"))
        .orderBy(col("score_c").desc, col("doc_id"))
        .limit(bm25TopK)
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |dd AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, t FROM d),
           |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dd),
           |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
           |  FROM (SELECT doc_id, dl, unnest(t) AS tok FROM dd) GROUP BY 1, 2, 3),
           |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
           |seed AS (SELECT tok FROM tf JOIN dfq USING (tok), stats
           |  WHERE doc_id = $mltSeedDoc
           |  ORDER BY CAST(round(tf * ln(n_docs::DOUBLE / df) * 1000000, 0) AS BIGINT) DESC, tok
           |  LIMIT $mltMaxTerms),
           |sc AS (SELECT doc_id,
           |    CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * (${bm25K1 + 1})::DOUBLE) /
           |      (tf + $bm25K1 * (1 - $bm25B + $bm25B * dl / avgdl)) * 1000000, 0) AS BIGINT) AS sc_c
           |  FROM tf JOIN dfq USING (tok), stats
           |  WHERE tok IN (SELECT tok FROM seed) AND doc_id <> $mltSeedDoc)
           |SELECT doc_id, ${Exact.sqlSum("sc_c")} AS score_c, count(*) AS n_terms
           |FROM sc GROUP BY 1
           |ORDER BY score_c DESC, doc_id LIMIT $bm25TopK""".stripMargin))

  /** Multi-field match — the OpenSearch `multi_match` query with
    * `best_fields` scoring over a boosted field list (`title^2, body`):
    * each field is scored as its OWN BM25 index (field-local dl, avgdl,
    * df and doc count — the way Lucene keeps per-field postings), and a
    * document's final score is the MAX of its boosted field scores
    * (best_fields with the default tie_breaker 0). The testdata
    * documents carry one text column, so the two fields are carved
    * deterministically — `title` = the first 8 tokens, `body` = the
    * rest — mirroring the title/body analyzer duals the reference's
    * mapping bootstrap pins (HttpBulk.mappingJson).
    *
    * Scale shape: ONE tokenize — both fields come off a single split,
    * exploded as a 2-element (field, tokens) array; the query-term
    * filter sits directly above the token explode so only query
    * postings (≤ |q| rows per doc-field) reach the tf aggregation;
    * per-field stats (2 rows) and df (≤ |q|·|fields| rows) broadcast;
    * per-term scores pivot to FIXED-order addends (the bm25
    * determinism discipline) and best-field selection is a ≤2-row
    * max aggregate per doc; the top-k plans as TakeOrderedAndProject.
    * No per-field corpus rescan: at 100 TB, scoring F fields costs one
    * token stream, not F of them. */
  private val mmTitleLen = 8
  private val mmTitleBoost = 2.0
  /** The (doc_id, fld, toks, dl) field carve shared by the multi_match
    * probe and its stats-artifact build. */
  private def mmFields(s: SparkSession, dir: String): DataFrame =
    Par.spread(s, docs(s, dir), col("doc_id"))
      .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
      .select(col("doc_id"), explode(array(
        struct(lit("title").as("fld"),
          slice(col("t"), 1, mmTitleLen).as("toks")),
        struct(lit("body").as("fld"),
          expr(s"slice(t, ${mmTitleLen + 1}, greatest(size(t) - $mmTitleLen, 0))")
            .as("toks")))).as("f"))
      .select(col("doc_id"), col("f.fld").as("fld"), col("f.toks").as("toks"))
      .filter(size(col("toks")) >= 1)
      .withColumn("dl", size(col("toks")).cast("long"))

  /** Per-field (n_docs, avgdl) as a PERSISTED artifact — the
    * corpusStats discipline, field-keyed. */
  private def fieldStats(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/documents.parquet", "field_stats") {
      path =>
        mmFields(s, dir).groupBy("fld")
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
          .coalesce(1)  // dim-bounded: one row per field
          .write.mode("overwrite").parquet(path)
    }

  val multiMatchOp = QueryDef(
    "ns_search_multi_match", { (s, dir) =>
      val d = mmFields(s, dir)
      val stats = fieldStats(s, dir)
      val tf = d.select(col("doc_id"), col("fld"), col("dl"),
          explode(when(size(col("toks")) >= 1, col("toks"))).as("tok"))
        .filter(col("tok").isin(bm25Query: _*))
        .groupBy("doc_id", "fld", "dl", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("fld", "tok").agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(dfreq), Seq("fld", "tok"))
        .join(broadcast(stats), "fld")
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("sc", col("idf") * (col("tf") * lit(bm25K1 + 1)) /
          (col("tf") + lit(bm25K1) * (lit(1 - bm25B) + lit(bm25B) * col("dl") / col("avgdl"))))
      val perTerm = bm25Query.map(t =>
        coalesce(sum(when(col("tok") === t, col("sc"))), lit(0.0)).as(s"s_$t"))
      scored.groupBy("doc_id", "fld")
        .agg(perTerm.head, perTerm.tail: _*)
        .select(col("doc_id"), col("fld"),
          bm25Query.map(t => col(s"s_$t")).reduce(_ + _).as("fscore"))
        .groupBy("doc_id")
        .agg(max(when(col("fld") === "title", col("fscore") * mmTitleBoost)
          .otherwise(col("fscore"))).as("raw"))
        .select(col("doc_id"), round(col("raw"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(bm25TopK)
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |f AS (SELECT doc_id, 'title' AS fld, t[1:$mmTitleLen] AS toks FROM d
           |      UNION ALL
           |      SELECT doc_id, 'body' AS fld, t[${mmTitleLen + 1}:] AS toks FROM d),
           |ff AS (SELECT doc_id, fld, CAST(len(toks) AS BIGINT) AS dl, toks
           |  FROM f WHERE len(toks) >= 1),
           |stats AS (SELECT fld, count(*) AS n_docs,
           |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM ff GROUP BY 1),
           |tf AS (SELECT doc_id, fld, dl, tok, count(*) AS tf
           |  FROM (SELECT doc_id, fld, dl, unnest(toks) AS tok FROM ff)
           |  WHERE tok IN (${bm25Query.map(t => s"'$t'").mkString(", ")}) GROUP BY 1, 2, 3, 4),
           |dfq AS (SELECT fld, tok, count(*) AS df FROM tf GROUP BY 1, 2),
           |sc AS (SELECT doc_id, tf.fld AS fld, tok,
           |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * (${bm25K1 + 1})::DOUBLE) /
           |      (tf + $bm25K1 * (1 - $bm25B + $bm25B * dl / avgdl)) AS sc
           |  FROM tf JOIN dfq USING (fld, tok) JOIN stats USING (fld)),
           |fs AS (SELECT doc_id, fld,
           |    ${bm25Query.map(t => s"coalesce(sum(CASE WHEN tok = '$t' THEN sc END), 0)").mkString(" + ")} AS fscore
           |  FROM sc GROUP BY 1, 2),
           |best AS (SELECT doc_id,
           |    max(CASE WHEN fld = 'title' THEN fscore * $mmTitleBoost ELSE fscore END) AS raw
           |  FROM fs GROUP BY 1)
           |SELECT doc_id, round(raw, 6) AS score FROM best
           |ORDER BY score DESC, doc_id LIMIT $bm25TopK""".stripMargin))

  /** The `combined_fields` query — multi_match's term-centric sibling:
    * fields merge into ONE pseudo-field per term (tf = Σ weight·tf_f)
    * BEFORE terms combine, so a term split across fields scores as if
    * the fields were one (the failure mode best_fields has). Same
    * title/body fixture as ns_search_multi_match (first $mmTitleLen
    * tokens, title weight 2); weights are integers over exact tf longs
    * — no float anywhere. One codegen pass per doc (two bounded
    * slices), no explode, cutoff is TakeOrderedAndProject. */
  private val cfTerms = Seq("data", "column")
  private val cfTitleWeight = 2L
  val combinedFieldsOp = QueryDef(
    "ns_search_combined_fields", {
      (s, dir) =>
        val t = split(trim(col("text")), " ")
        val title = expr(s"slice(t, 1, $mmTitleLen)")
        val body = expr(s"slice(t, $mmTitleLen + 1, greatest(size(t) - $mmTitleLen, 0))")
        val perTerm = cfTerms.map { term =>
          (size(filter(title, x => x === term)).cast("long") * cfTitleWeight +
            size(filter(body, x => x === term)).cast("long")).as(s"ctf_$term")
        }
        docs(s, dir)
          .withColumn("t", t)
          .select(col("doc_id") +: perTerm: _*)
          .withColumn("score", cfTerms.map(t => col(s"ctf_$t")).reduce(_ + _))
          .filter(col("score") > 0)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       |c AS (SELECT doc_id,
       |    ${cfTerms.map(term =>
             s"len(list_filter(t[1:$mmTitleLen], x -> x = '$term')) * $cfTitleWeight\n" +
             s"      + len(list_filter(t[${mmTitleLen + 1}:], x -> x = '$term')) AS ctf_$term")
             .mkString(",\n    ")}
       |  FROM d)
       |SELECT doc_id, ${cfTerms.map(t => s"ctf_$t").mkString(", ")},
       |  ${cfTerms.map(t => s"ctf_$t").mkString(" + ")} AS score
       |FROM c WHERE ${cfTerms.map(t => s"ctf_$t").mkString(" + ")} > 0
       |ORDER BY ${cfTerms.map(t => s"ctf_$t").mkString(" + ")} DESC, doc_id
       |LIMIT 10""".stripMargin))

  /** Unigram language-model quality score: mean ln P(token) under the
    * corpus's own unigram distribution — the statistical complement to
    * ns_quality_score's surface heuristics: garbled/rare-token-heavy
    * documents score low, natural running text high (the classic
    * perplexity-proxy filter training pipelines run).
    *
    * The vocabulary is a PERSISTED artifact (Artifacts.buildOnce, the
    * IVF-index discipline, keyed on the corpus file's identity): built
    * once per corpus with one map-combined shuffle, then every scoring
    * run just SCANS the tiny (tok, cnt) dim — the probe side's token
    * explode is the ONLY documents scan in the scoring plan (PlanSpec
    * asserts it). The inline formulation re-derived the vocabulary per
    * run and replanned the explode subtree once per reference — two
    * full corpus scans per score at 100 TB. AQE broadcasts the vocab
    * dim when it fits. */
  /** The persisted (tok, cnt) unigram vocabulary — ONE build per corpus
    * snapshot (Artifacts.buildOnce), shared by unigram scoring and the
    * term suggester: the term-dictionary artifact every query-time
    * vocabulary walk reads instead of re-aggregating the corpus. */
  private def unigramFreq(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/documents.parquet", "unigram_freq") {
      path =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(explode(split(trim(col("text")), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .coalesce(1)  // dim-bounded: token-vocabulary cardinality
          .write.mode("overwrite").parquet(path)
    }

  val unigramLogprobOp = QueryDef(
    "ns_text_unigram_logprob", {
      (s, dir) =>
        val freq = unigramFreq(s, dir)
        val total = freq.agg(sum(col("cnt")).as("n_total"))
        val toks = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
        toks.join(freq, "tok")
          .groupBy("doc_id")
          .agg(avg(log(col("cnt"))).as("avg_log_cnt"),
            count(lit(1)).as("n_toks"))
          .crossJoin(broadcast(total))
          .select(col("doc_id"),
            round(col("avg_log_cnt") - log(col("n_total")), 6).as("logprob"),
            col("n_toks"))
    },
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
           |  FROM documents),
           |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
           |total AS (SELECT sum(cnt) AS n_total FROM freq)
           |SELECT doc_id,
           |  round(avg(ln(cnt)) - any_value(ln(n_total)), 6) AS logprob,
           |  count(*) AS n_toks
           |FROM toks JOIN freq USING (tok), total
           |GROUP BY doc_id""".stripMargin))

  /** Bigram language-model quality score — the ≥2-gram perplexity
    * proxy real curation pipelines run where ns_text_unigram_logprob
    * is the first cut: mean ln P(w2|w1) under the corpus's own bigram
    * counts with add-one (Laplace) smoothing over the unigram
    * vocabulary, ln((c(w1,w2)+1)/(c(w1)+V)). Catches word-salad text
    * that unigram statistics cannot (every word common, no pair ever
    * seen together).
    *
    * Determinism discipline: each bigram's log term rounds to integer
    * MICROS before the per-doc sum (the ns_search_mlt rule — data-
    * dependent term sets forbid fixed-order addition), so the mean is
    * an exact long sum divided once.
    *
    * Scale shape: BOTH count tables are persisted buildOnce artifacts
    * (vocabulary- and vocabulary²-bounded — corpus-size-independent);
    * the scoring plan's only documents scan is the probe-side bigram
    * explode (PlanSpec-locked, the unigram discipline); V is a
    * one-row aggregate of the unigram dim; AQE broadcasts all three
    * dims onto the bigram stream. Docs with < 2 tokens have no bigram
    * distribution and drop from the output in both engines. */
  private[graft] def bigramFreq(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/documents.parquet", "bigram_freq") {
      path =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(split(trim(col("text")), " ").as("t"))
          .select(explode(when(size(col("t")) >= 2, expr(
            "transform(sequence(1, size(t) - 1), i -> named_struct('w1', element_at(t, i), 'w2', element_at(t, i + 1)))")))
            .as("b"))
          .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .agg(count(lit(1)).as("bc"))
          .coalesce(1)  // dim-bounded: bigram-vocabulary cardinality
          .write.mode("overwrite").parquet(path)
    }

  val bigramLogprobOp = QueryDef(
    "ns_text_bigram_logprob", { (s, dir) =>
      val uf = unigramFreq(s, dir)
      val bf = bigramFreq(s, dir)
      val vocabV = uf.agg(count(lit(1)).as("v"))
      val bigrams = Par.spread(s, docs(s, dir), col("doc_id"))
        .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
        .select(col("doc_id"), explode(when(size(col("t")) >= 2, expr(
          "transform(sequence(1, size(t) - 1), i -> named_struct('w1', element_at(t, i), 'w2', element_at(t, i + 1)))")))
          .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      bigrams
        .join(bf, Seq("w1", "w2"))
        .join(uf.select(col("tok").as("w1"), col("cnt").as("uc")), "w1")
        .crossJoin(broadcast(vocabV))
        .withColumn("term_c",
          round(log((col("bc") + lit(1.0)) / (col("uc") + col("v"))) * 1e6, 0).cast("long"))
        .groupBy("doc_id")
        .agg(sum(col("term_c")).as("sum_c"), count(lit(1)).as("n_bigrams"))
        .select(col("doc_id"),
          round(col("sum_c").cast("double") / col("n_bigrams") / 1e6, 6).as("logprob"),
          col("n_bigrams"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM t)),
           |uf AS (SELECT w1 AS tok, count(*) AS uc FROM (
           |  SELECT doc_id, unnest(t) AS w1 FROM t) GROUP BY 1),
           |bf AS (SELECT w1, w2, count(*) AS bc FROM bg GROUP BY 1, 2),
           |vv AS (SELECT count(*) AS v FROM uf),
           |terms AS (SELECT doc_id,
           |    CAST(round(ln((bc + 1.0) / (uc + v)) * 1000000, 0) AS BIGINT) AS term_c
           |  FROM bg JOIN bf USING (w1, w2) JOIN uf ON uf.tok = bg.w1, vv)
           |SELECT doc_id,
           |  round(CAST(CAST(sum(term_c) AS BIGINT) AS DOUBLE) / count(*) / 1000000, 6) AS logprob,
           |  count(*) AS n_bigrams
           |FROM terms GROUP BY doc_id""".stripMargin))

  /** CCNet-style perplexity filtering — the canonical LM-quality gate
    * of the large web-corpus pipelines: score each document by its
    * language-model perplexity and split the corpus into head / middle
    * / tail under FIXED per-language thresholds. The thresholds being
    * fixed constants is CCNet's actual design (it ships per-language
    * cutoffs computed offline from the reference LM), not a shortcut —
    * at 100 TB the alternative (corpus-wide exact percentiles per run)
    * is a global sort the real pipeline deliberately avoids.
    *
    * The LM is the corpus Laplace-bigram model (the
    * ns_text_bigram_logprob discipline): per-bigram log-terms round to
    * integer MICROS before summation, and the per-doc mean NLL
    * (micro-nats per bigram) is the perplexity proxy — monotone in
    * true perplexity, exact long arithmetic end to end. Docs with < 2
    * tokens carry no bigram evidence and drop, as in the logprob op.
    *
    * Scale shape: the model is the two persisted count artifacts
    * (unigram/bigram tables built once per corpus snapshot); the
    * query-time plan is one corpus bigram explode joined against them
    * and one per-doc aggregate — no window, no global sort, cutoffs
    * are plan-time literals. */
  private val pplThresholds: Map[String, (Long, Long)] = Map(
    "de" -> (3387000L, 3415000L), "en" -> (3392000L, 3417000L),
    "es" -> (3387000L, 3412000L), "fr" -> (3396000L, 3414000L),
    "zh" -> (3390000L, 3419000L))
  val perplexityFilterOp = QueryDef(
    "ns_quality_perplexity", { (s, dir) =>
      val uf = unigramFreq(s, dir)
      val bf = bigramFreq(s, dir)
      val vocabV = uf.agg(count(lit(1)).as("v"))
      val bigrams = Par.spread(s, docs(s, dir), col("doc_id"))
        .select(col("doc_id"), col("lang"), split(trim(col("text")), " ").as("t"))
        .select(col("doc_id"), col("lang"), explode(when(size(col("t")) >= 2, expr(
          "transform(sequence(1, size(t) - 1), i -> named_struct('w1', element_at(t, i), 'w2', element_at(t, i + 1)))")))
          .as("b"))
        .select(col("doc_id"), col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val nll = bigrams
        .join(bf, Seq("w1", "w2"))
        .join(uf.select(col("tok").as("w1"), col("cnt").as("uc")), "w1")
        .crossJoin(broadcast(vocabV))
        .withColumn("term_c",
          round(log((col("bc") + lit(1.0)) / (col("uc") + col("v"))) * 1e6, 0).cast("long"))
        .groupBy("doc_id", "lang")
        .agg(round((-sum(col("term_c"))).cast("double") / count(lit(1)), 0)
          .cast("long").as("nll_micro"))
      val t1 = pplThresholds.foldLeft(lit(null).cast("long")) {
        case (acc, (l, (a, _))) => when(col("lang") === l, lit(a)).otherwise(acc)
      }
      val t2 = pplThresholds.foldLeft(lit(null).cast("long")) {
        case (acc, (l, (_, b))) => when(col("lang") === l, lit(b)).otherwise(acc)
      }
      nll.select(col("doc_id"), col("lang"), col("nll_micro"),
        when(col("nll_micro") < t1, "head")
          .when(col("nll_micro") < t2, "middle")
          .otherwise("tail").as("bucket"))
    },
    Some {
      val caseT1 = pplThresholds.map { case (l, (a, _)) =>
        s"WHEN '$l' THEN $a" }.mkString(" ")
      val caseT2 = pplThresholds.map { case (l, (_, b)) =>
        s"WHEN '$l' THEN $b" }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS t FROM documents),
         |bg AS (SELECT doc_id, lang, t[i] AS w1, t[i + 1] AS w2
         |  FROM (SELECT doc_id, lang, t, unnest(generate_series(1, len(t) - 1)) AS i FROM t)),
         |uf AS (SELECT w1 AS tok, count(*) AS uc FROM (
         |  SELECT doc_id, unnest(t) AS w1 FROM t) GROUP BY 1),
         |bf AS (SELECT w1, w2, count(*) AS bc FROM bg GROUP BY 1, 2),
         |vv AS (SELECT count(*) AS v FROM uf),
         |terms AS (SELECT doc_id, lang,
         |    CAST(round(ln((bc + 1.0) / (uc + v)) * 1000000, 0) AS BIGINT) AS term_c
         |  FROM bg JOIN bf USING (w1, w2) JOIN uf ON uf.tok = bg.w1, vv),
         |d AS (SELECT doc_id, lang,
         |    CAST(round(CAST(-sum(term_c) AS DOUBLE) / count(*), 0) AS BIGINT) AS nll_micro
         |  FROM terms GROUP BY 1, 2)
         |SELECT doc_id, lang, nll_micro,
         |  CASE WHEN nll_micro < (CASE lang $caseT1 END) THEN 'head'
         |       WHEN nll_micro < (CASE lang $caseT2 END) THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM d""".stripMargin
    })

  /** Within-document token-distribution entropy — the third classic
    * quality signal next to the surface heuristics (ns_quality_score)
    * and the LM scores (unigram/bigram logprob): H = −Σ (c/n)·ln(c/n)
    * over the document's OWN token histogram. Low entropy flags
    * repetition loops and template spam (few tokens dominate); high
    * entropy with low LM score flags gibberish (uniformly random
    * tokens). Emitted with n_toks and n_distinct so a filter funnel
    * can combine them.
    *
    * Scale shape: one token explode → per-(doc, tok) counts → a
    * doc-partitioned window for n (never a global window) → per-doc
    * sum. Per-term entropy contributions round to integer MICROS
    * before summation (the data-dependent-term determinism rule), so
    * the per-doc sum is exact long arithmetic and hash-matches the
    * oracle. */
  val entropyOp = QueryDef(
    "ns_text_entropy", { (s, dir) =>
      val tf = Par.spread(s, docs(s, dir), col("doc_id"))
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val wd = Window.partitionBy("doc_id")
      tf.withColumn("n", sum(col("c")).over(wd))
        .withColumn("term_c",
          round(lit(1e6) * col("c") / col("n") * log(col("n").cast("double") / col("c")), 0)
            .cast("long"))
        .groupBy("doc_id")
        .agg(sum(col("term_c")).as("sum_c"),
          max(col("n")).as("n_toks"),
          count(lit(1)).as("n_distinct"))
        .select(col("doc_id"),
          round(col("sum_c").cast("double") / 1e6, 6).as("entropy"),
          col("n_toks"), col("n_distinct"))
    },
    Some("""WITH tf AS (SELECT doc_id, tok, count(*) AS c FROM (
           |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents)
           |  GROUP BY 1, 2),
           |w AS (SELECT doc_id, tok, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM tf),
           |terms AS (SELECT doc_id,
           |    CAST(round(1000000.0 * c / n * ln(CAST(n AS DOUBLE) / c), 0) AS BIGINT) AS term_c,
           |    n FROM w)
           |SELECT doc_id,
           |  round(CAST(CAST(sum(term_c) AS BIGINT) AS DOUBLE) / 1000000, 6) AS entropy,
           |  CAST(max(n) AS BIGINT) AS n_toks,
           |  count(*) AS n_distinct
           |FROM terms GROUP BY doc_id""".stripMargin))

  /** Deterministic hash bucket in [0, 100) from an id column — the
    * reproducible-sampling primitive: stable across runs, engines, and
    * cluster sizes, unlike seeded RNG sampling (Spark's sample() RNG is
    * partition-dependent and not reproducible in any oracle). ONE
    * definition parameterized by the key column: the sampling ops key
    * on doc_id, the leakage-safe splits on the cluster id — the copies
    * must stay byte-identical or the split contracts diverge. */
  /** Deterministic 1-in-`mod` md5 bucket, the reproducible-sampling
    * primitive behind every split/sample operator. 8 hex digits (2^32
    * values) keep the modulo bias ≤ 1 part in 4×10^5 even at
    * mod 10000 — a 4-digit (65536-value) source would over-accept the
    * low buckets by ~6.8% at that grain. ONE definition parameterized
    * by key column and modulus: the Spark and DuckDB forms must stay
    * recipe-identical or the split contracts diverge. */
  private def hashBucketOn(idCol: String, mod: Int = 100): String =
    s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 8), 16, 10) AS BIGINT) % $mod"
  private def hashBucketSqlOn(idCol: String, mod: Int = 100): String =
    s"('0x' || substr(md5(CAST($idCol AS VARCHAR)), 1, 8))::BIGINT % $mod"

  /** 60-bit md5-prefix integer hash of a string expression — the
    * compact-key recipe (ns_fingerprint, ns_dedup_substring,
    * DedupStream doc ids). Like hashBucketOn/hashBucketSqlOn, the
    * Spark and DuckDB forms are a PAIR: they must stay
    * recipe-identical or every oracle keying on the hash diverges —
    * which is why both live here and call sites never hand-write the
    * expression. */
  private def md5Long(e: String): String =
    s"CAST(conv(substring(md5($e), 1, 15), 16, 10) AS BIGINT)"
  private def md5LongSql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15))::UBIGINT AS BIGINT)"
  private val hashBucket = hashBucketOn("doc_id")
  private val hashBucketSql = hashBucketSqlOn("doc_id")

  /** Stratified sampling with per-class rates (quality-weighted corpus
    * construction): a pure filter — no shuffle, fully pushdown-friendly,
    * and any worker can evaluate membership independently at 100 TB. */
  val sampleStratifiedOp = QueryDef(
    "ns_sample_stratified",
    (s, dir) => docs(s, dir)
      .withColumn("bkt", expr(hashBucket))
      .filter(expr("bkt < CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 50 ELSE 80 END"))
      .select(col("doc_id"), col("lang"), col("bkt")),
    Some(s"""SELECT doc_id, lang, $hashBucketSql AS bkt FROM documents
           |WHERE $hashBucketSql < CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 50 ELSE 80 END""".stripMargin))

  /** Train/val/test split: disjoint + complete by construction (one
    * hash, three CASE arms), the standard reproducible split for
    * training corpora. Emits per-(split, lang) counts. */
  val splitTrainTestOp = QueryDef(
    "ns_split_train_test",
    (s, dir) => docs(s, dir)
      .withColumn("split", expr(
        s"CASE WHEN $hashBucket < 80 THEN 'train' WHEN $hashBucket < 90 THEN 'val' ELSE 'test' END"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n")),
    Some(s"""SELECT CASE WHEN $hashBucketSql < 80 THEN 'train'
           |    WHEN $hashBucketSql < 90 THEN 'val' ELSE 'test' END AS split,
           |  lang, count(*) AS n
           |FROM documents GROUP BY 1, 2""".stripMargin),
    // all three CASE arms of the split take documents
    liveness = Seq(
      "all_three_splits_populated" -> "SELECT count(DISTINCT split) = 3 FROM r"))

  /** Leakage-safe train/test split: the split key is the DUPLICATE
    * CLUSTER, not the document — copies of the same text must never
    * straddle train and test, or the model is evaluated on (near)
    * training data. Cluster identity here is the exact-dup canonical
    * (min doc_id per normalized-text hash, the ns_dedup_exact contract);
    * ns_split_leakage_near below is the production twin that keys on
    * the near-dup pipeline's cluster labels. One shuffle for
    * the cluster min, then a pure projection — the split itself stays
    * the deterministic md5-bucket primitive, reproducible across runs,
    * engines, and cluster sizes. */
  val splitLeakageSafeOp = QueryDef(
    "ns_split_leakage_safe", {
      (s, dir) =>
        val d = docs(s, dir)
          .withColumn("h", md5(lower(col("text")).cast("binary")))
        val clusters = d.groupBy("h").agg(min(col("doc_id")).as("cluster_id"))
        val bucket = hashBucketOn("cluster_id")
        d.join(clusters, "h")
          .withColumn("split", expr(
            s"CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'val' ELSE 'test' END"))
          .select(col("doc_id"), col("cluster_id"), col("split"))
    },
    Some(s"""WITH d AS (SELECT doc_id, md5(lower(text)) AS h FROM documents),
           |c AS (SELECT h, min(doc_id) AS cluster_id FROM d GROUP BY h),
           |b AS (SELECT d.doc_id, c.cluster_id,
           |    ${hashBucketSqlOn("c.cluster_id")} AS bkt
           |  FROM d JOIN c USING (h))
           |SELECT doc_id, cluster_id,
           |  CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split
           |FROM b""".stripMargin))

  /** Duplicate-cluster canonicalization: connected components over the
    * exact-dup edge set, each doc labeled with the min doc_id of its
    * component (the canonical copy a training pipeline keeps). Classic
    * distributed min-label propagation: each round is one equi-join +
    * groupBy-min, labels only decrease, and K rounds cover any
    * component of diameter ≤ K. Both engines run the SAME fixed K, so
    * the compare holds even on a graph where K hasn't converged —
    * here exact-dup components are cliques (diameter 1) and K=3 is
    * already fixpoint. At 100 TB each round is one shuffle on doc_id;
    * K stays small because near-dup graphs are overwhelmingly tiny
    * cliques plus rare short chains. */
  /** Rounds of min-label propagation in ns_dedup_cluster. The contract
    * (verified by TextOpsSpec on a diameter-5 chain): K rounds converge
    * every component of diameter ≤ K; a longer chain is left PARTIALLY
    * labeled after K rounds — min labels travel one hop per round — so
    * raising K must happen in lockstep with the oracle's closed form.
    * Exact-dup components are hub-stars (diameter ≤ 2), so K=3 is past
    * fixpoint for this operator's actual graphs. */
  private[graft] val propagationRounds = 3

  /** K rounds of distributed min-label propagation over an undirected
    * edge set: per round, label(v) = min(label(v), min over neighbors) —
    * one equi-join + one groupBy-min per round, each a single shuffle;
    * labels only decrease, so K rounds reach the component minimum for
    * every node within K hops of it. */
  private[graft] def minLabelPropagate(nodes: DataFrame, edges: DataFrame,
                                       rounds: Int): DataFrame = {
    val undirected = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    val init = nodes.select(col("node_id"), col("node_id").as("label"))
    (1 to rounds).foldLeft(init) { (lab, _) =>
      val viaNbr = undirected.join(lab.withColumnRenamed("node_id", "src"), "src")
        .select(col("dst").as("node_id"), col("label"))
      lab.unionByName(viaNbr)
        .groupBy("node_id").agg(min(col("label")).as("label"))
    }
  }

  val dedupClusterOp = QueryDef(
    "ns_dedup_cluster", {
      (s, dir) =>
        // duplicate overlay (the ns_dedup_exact r19 discipline): the
        // corpus itself has NO exact dups at any SF, so without it the
        // clique graph has zero non-self edges and the label
        // propagation under test never moves a label — the r19
        // oracle-mutant audit surfaced exactly that blindness. Every
        // 7th doc gains one copy and every 14th a second, so 2- and
        // 3-cliques exist and min-label genuinely propagates across
        // non-hub members at every SF.
        val base = docs(s, dir).select(col("doc_id"), col("text"))
        // offsets ov_off / 2·ov_off derived from max(doc_id)+1 (r20
        // advice): the two overlay bands and the real id range are
        // pairwise disjoint at ANY SF by construction
        val off = broadcast(overlayOffset(base))
        val overlay = base.unionByName(
          base.filter(col("doc_id") % 7 === 0).crossJoin(off)
            .withColumn("doc_id", col("doc_id") + col("ov_off")).drop("ov_off"))
          .unionByName(
            base.filter(col("doc_id") % 14 === 0).crossJoin(off)
              .withColumn("doc_id", col("doc_id") + col("ov_off") * 2)
              .drop("ov_off"))
        val d = overlay
          .withColumn("h", md5(lower(col("text")).cast("binary")))
          .select(col("doc_id"), col("h"))
        // edges doc ↔ min(doc with same hash): a star per clique;
        // materialized before the propagation loop (same discipline as
        // ns_dedup_pipeline — each round would replan the hash+join
        // subtree otherwise)
        val hubs = d.groupBy("h").agg(min(col("doc_id")).as("hub"))
        val edges = d.join(hubs, "h")
          .select(col("doc_id").as("src"), col("hub").as("dst"))
          .localCheckpoint(true)
        minLabelPropagate(d.select(col("doc_id").as("node_id")), edges,
            propagationRounds)
          .select(col("node_id").as("doc_id"), col("label").as("cluster_id"))
    },
    // exact-dup components are cliques, so min-label = min doc_id per
    // text hash — the closed form the propagation converges to
    Some("""WITH o AS (SELECT max(doc_id) + 1 AS ov_off FROM documents),
           |d AS (SELECT doc_id, md5(lower(text)) AS h FROM (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL SELECT doc_id + (SELECT ov_off FROM o), text
           |    FROM documents WHERE doc_id % 7 = 0
           |  UNION ALL SELECT doc_id + 2 * (SELECT ov_off FROM o), text
           |    FROM documents WHERE doc_id % 14 = 0))
           |SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS cluster_id FROM d""".stripMargin),
    // the r19 vacuity catch, standing: label propagation must actually
    // MOVE labels (non-self clusters) while self-labeled singletons
    // coexist
    liveness = Seq(
      "labels_propagate" ->
        "SELECT count(CASE WHEN cluster_id <> doc_id THEN 1 END) > 0 FROM r",
      "singleton_clusters_exist" ->
        "SELECT count(CASE WHEN cluster_id = doc_id THEN 1 END) > 0 FROM r"))

  /** Text normalization for dedup keys / training corpora: Unicode NFC
    * (the native NfcNormalize expression — decomposed and composed
    * accents must hash identically), then lowercase, strip
    * non-alphanumerics, collapse whitespace — pure codegen projection.
    * NFC is the identity on the ASCII synthetic corpus, which is what
    * keeps the normalizer-free DuckDB oracle valid while the Spark plan
    * runs the real production operator (ExprSpec covers the non-ASCII
    * semantics the oracle can't). */
  val textNormalizeOp = QueryDef(
    "ns_text_normalize",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      trim(regexp_replace(
        regexp_replace(
          lower(graft.expr.TextFunctions.nfc_normalize(col("text"))),
          "[^a-z0-9 ]", ""),
        " +", " ")).as("norm")),
    Some("""SELECT doc_id,
           |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           |       ' +', ' ', 'g')) AS norm
           |FROM documents""".stripMargin))

  /** The end-to-end near-dup pipeline a training corpus actually runs,
    * composing the verified stages: normalize (NFC → lowercase → strip →
    * collapse, the ns_text_normalize operator) → MinHash-LSH candidate
    * generation over the normalized shingles (the ns_dedup_minhash
    * shape: banded signatures, cap inside BoundedBucketAgg) →
    * exact-Jaccard VERIFICATION of candidates only (the LSH promise:
    * the expensive set comparison runs on the candidate set, never
    * doc×doc — candidates join back to the distinct-shingle arrays by
    * doc_id, two equi-joins on a pair set that is tiny relative to the
    * corpus) → connected components over the verified edges (K rounds
    * of min-label propagation, same contract as ns_dedup_cluster) →
    * canonical keep (min doc_id per component).
    *
    * Every stage is the 100 TB shape established by its standalone
    * operator; nothing here is quadratic and nothing collects. Exact
    * duplicates ride the same path (identical norms share every band).
    * Output: one row per document with its cluster label and whether a
    * dedup'd corpus keeps it. */
  /** The near-dup pipeline's cluster labeling (normalize → LSH →
    * Jaccard-verify → K-round min-label propagation), shared by
    * ns_dedup_pipeline and the leakage-safe split that keys on these
    * labels (ns_split_leakage_near): one row per document with its
    * cluster label and whether a dedup'd corpus keeps it. */
  private[graft] def nearDupClusters(s: SparkSession, dir: String): DataFrame = {
        val normCol = trim(regexp_replace(
          regexp_replace(
            lower(graft.expr.TextFunctions.nfc_normalize(col("text"))),
            "[^a-z0-9 ]", ""),
          " +", " "))
        val base = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), normCol.as("norm"))
        // distinct shingle sets for the verification stage
        val sets = base
          .select(col("doc_id"), array_distinct(shingles3(col("norm"))).as("sh"))
          .filter(size(col("sh")) >= 1)
        // MinHash-LSH candidates over the normalized shingles — the
        // native MinHashSigs map pass (r8), no explode/groupBy shuffle
        val bands = bandSignatures(base, "doc_id", "norm")
        val cand = bands.groupBy("band", "sig")
          .agg(graft.expr.TextFunctions.bounded_bucket(col("doc_id"), bandCap).as("ds"))
          .filter(col("ds").isNotNull)
          .select(explode(graft.expr.TextFunctions.ordered_pairs(col("ds"),
            includeDiagonal = false)).as("p"))
          .select(col("p.a").as("da"), col("p.b").as("db"))
          .distinct()
        // exact-Jaccard verify, candidates only
        val ver = cand
          .join(sets.select(col("doc_id").as("da"), col("sh").as("sa")), "da")
          .join(sets.select(col("doc_id").as("db"), col("sh").as("sb")), "db")
          .withColumn("o", size(array_intersect(col("sa"), col("sb"))).cast("long"))
          .withColumn("na", size(col("sa")).cast("long"))
          .withColumn("nb", size(col("sb")).cast("long"))
          .filter(expr(s"CAST(o AS DOUBLE) / (na + nb - o) >= $ngramT"))
          .select(col("da").as("src"), col("db").as("dst"))
        // MATERIALIZE the verified edge set before the propagation loop
        // (localCheckpoint: executor-side, lineage-truncating — the
        // iterative-algorithm discipline every connected-components
        // implementation follows): each of the K rounds references the
        // edges again, and Catalyst REPLANS the whole
        // normalize→signature→candidate→verify subtree per reference —
        // 32 plan copies measured (the PlanSpec lock below counts
        // minhash_sigs occurrences). The edge set is tiny (near-dup
        // pairs), so the checkpoint is cheap; everything upstream runs
        // exactly once.
        val verMat = ver.localCheckpoint(true)
        // propagate only over edge-INCIDENT docs: near-dup edges touch a
        // tiny fraction of a real corpus, so the K propagation shuffles
        // run on |incident| rows, not |corpus|; untouched docs are
        // singleton clusters by definition (label = own id) and union in
        // with zero propagation cost. Same result, oracle unchanged.
        val allDocs = docs(s, dir).select(col("doc_id").as("node_id"))
        val incident = verMat.select(col("src").as("node_id"))
          .unionByName(verMat.select(col("dst").as("node_id"))).distinct()
        val propagated = minLabelPropagate(incident, verMat, propagationRounds)
        val singletons = allDocs.join(incident, Seq("node_id"), "left_anti")
          .select(col("node_id"), col("node_id").as("label"))
        propagated.unionByName(singletons)
          .select(col("node_id").as("doc_id"), col("label").as("cluster_id"),
            (col("node_id") === col("label")).as("keep"))
  }

  /** The oracle's CTE chain for the near-dup pipeline (normalize → LSH
    * → verify → K propagation rounds), ending at `l$propagationRounds`
    * — shared by ns_dedup_pipeline and ns_split_leakage_near so the
    * split's oracle provably keys on the SAME cluster labels. */
  private lazy val pipelineOracleCtes: String = {
    val mhCols = (0 until nHashes).map { b =>
      s"list_aggregate(list_transform(s, x -> md5(concat('$b:', x))), 'min') AS mh$b"
    }.mkString(", ")
    val bandSelects = (0 until nHashes / bandWidth).map { g =>
      val sig = (0 until bandWidth).map(i => s"mh${g * bandWidth + i}").mkString("concat(", ", ", ")")
      s"SELECT doc_id, $g AS band, $sig AS sig FROM mh"
    }.mkString(" UNION ALL ")
    // the same K propagation rounds as the Spark side, in lockstep
    // with `propagationRounds` (see ns_dedup_cluster's contract)
    val rounds = (1 to propagationRounds).map { r =>
      s"""l$r AS (SELECT node_id, min(label) AS label FROM (
         |  SELECT node_id, label FROM l${r - 1}
         |  UNION ALL
         |  SELECT e.dst AS node_id, l${r - 1}.label FROM e JOIN l${r - 1} ON l${r - 1}.node_id = e.src
         |) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH nrm AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
       |        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm FROM documents),
       |toks AS (SELECT doc_id, string_split(norm, ' ') AS t FROM nrm),
       |shl AS (SELECT doc_id, list_transform(generate_series(1, len(t)-2),
       |          i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])) AS s
       |        FROM toks WHERE len(t) >= 3),
       |d AS (SELECT doc_id, list_distinct(s) AS sh FROM shl),
       |mh AS (SELECT doc_id, $mhCols FROM shl),
       |bands0 AS ($bandSelects),
       |bands AS (SELECT * FROM bands0
       |  QUALIFY count(*) OVER (PARTITION BY band, sig) <= $bandCap),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |ver AS (SELECT da, db FROM (
       |    SELECT cand.da, cand.db, len(list_intersect(x.sh, y.sh)) AS o,
       |           len(x.sh) AS na, len(y.sh) AS nb
       |    FROM cand JOIN d x ON x.doc_id = cand.da JOIN d y ON y.doc_id = cand.db)
       |  WHERE CAST(o AS DOUBLE) / (na + nb - o) >= $ngramT),
       |e AS (SELECT da AS src, db AS dst FROM ver UNION ALL SELECT db AS src, da AS dst FROM ver),
       |l0 AS (SELECT doc_id AS node_id, doc_id AS label FROM documents),
       |$rounds""".stripMargin
  }

  val dedupPipelineOp = QueryDef(
    "ns_dedup_pipeline", nearDupClusters,
    Some(s"""$pipelineOracleCtes
           |SELECT node_id AS doc_id, label AS cluster_id, node_id = label AS keep
           |FROM l$propagationRounds""".stripMargin))

  /** Leakage-safe split on NEAR-dup cluster labels — the production
    * form of ns_split_leakage_safe: the split key is the near-dup
    * pipeline's cluster label (nearDupClusters — normalize → LSH →
    * Jaccard-verify → propagate), so near-identical copies (not just
    * byte-identical ones) can never straddle train and test — the
    * contamination guarantee an eval actually needs. The split itself
    * stays the deterministic md5-bucket primitive on the cluster id,
    * reproducible across runs, engines, and cluster sizes; the oracle
    * reuses the pipeline oracle's CTE chain verbatim, so the compare
    * proves both the labels and the split rule. */
  /** The near-dup cluster labels as a PERSISTED artifact (the
    * IVF-index/unigram-vocab discipline, keyed on the corpus file's
    * identity): at 100 TB the cluster labeling runs ONCE — the dedup
    * pipeline job — and every consumer (the leakage-safe split here,
    * corpus compaction, dedup reporting) reads the label store instead
    * of re-running normalize→LSH→verify→propagate per query. */
  private def nearDupClusterDim(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/documents.parquet", "neardup_clusters") { path =>
      // per-DOCUMENT labels (corpus-sized, unlike the tiny lang-count /
      // centroid dims): written through a bounded repartition, never a
      // coalesce(1) single-task funnel
      nearDupClusters(s, dir).repartition(8, col("doc_id"))
        .write.mode("overwrite").parquet(path)
    }

  val splitLeakageNearOp = QueryDef(
    "ns_split_leakage_near", {
      (s, dir) =>
        val bucket = hashBucketOn("cluster_id")
        nearDupClusterDim(s, dir)
          .withColumn("split", expr(
            s"CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'val' ELSE 'test' END"))
          .select(col("doc_id"), col("cluster_id"), col("split"))
    },
    Some(s"""$pipelineOracleCtes,
           |b AS (SELECT node_id, label,
           |    ${hashBucketSqlOn("label")} AS bkt
           |  FROM l$propagationRounds)
           |SELECT node_id AS doc_id, label AS cluster_id,
           |  CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split
           |FROM b""".stripMargin))

  /** PII scrubbing for training corpora: redact email addresses, IPv4
    * addresses, and SSN-shaped ids to placeholder tokens, and count the
    * redactions per document — a pure codegen projection (regexp_replace
    * + regexp_extract_all), zero shuffles, the same 100 TB posture as
    * the other text ops. Patterns stay in the RE2-compatible subset
    * (no lookaround) so Spark's Java regex and the oracle's RE2 agree.
    * The synthetic corpus carries no PII, so the query PLANTS
    * deterministic PII derived from doc_id before scrubbing — every
    * row exercises the redaction path, and the word-salad text doubles
    * as the false-positive control (n_pii must count only what was
    * planted). */
  /** The PII patterns and redaction/count columns, shared by the batch
    * ns_text_pii_scrub operator and the in-stream scrub stage
    * (streaming/IngestPipeline.scrubPii). RE2-compatible subset (no
    * lookaround) so Spark's Java regex and the oracle's RE2 agree. */
  private[graft] val piiEmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val piiIpRx = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val piiSsnRx = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Redact email/IPv4/SSN matches to placeholder tokens — a pure
    * codegen projection, zero shuffles. */
  private[graft] def piiScrubbed(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      piiEmailRx, "<EMAIL>"), piiIpRx, "<IP>"), piiSsnRx, "<ID>")

  /** Count of PII matches in `c` — computed on the RAW column, before
    * redaction. A null input counts 0 (not null): a document without a
    * message carries no PII, and a null count would silently drop the
    * row from BOTH sides of any `n_pii > 0` / `n_pii = 0` filter. */
  private[graft] def piiCount(c: Column): Column =
    coalesce(
      (size(regexp_extract_all(c, lit(piiEmailRx), lit(0))) +
        size(regexp_extract_all(c, lit(piiIpRx), lit(0))) +
        size(regexp_extract_all(c, lit(piiSsnRx), lit(0)))).cast("long"),
      lit(0L))

  val piiScrubOp = QueryDef(
    "ns_text_pii_scrub", {
      (s, dir) =>
        // Par.spread (r21): six regex passes per row ran in the single
        // scan task locally; passthrough on wide scans.
        val planted = Par.spread(s, docs(s, dir), col("doc_id")).select(
          col("doc_id"),
          concat(
            when(col("doc_id") % 2 === 0,
              concat(lit("mail u"), col("doc_id").cast("string"),
                lit("@example.com "))).otherwise(""),
            when(col("doc_id") % 3 === 0,
              concat(lit("from 10."), (col("doc_id") % 256).cast("string"),
                lit(".0.7 "))).otherwise(""),
            when(col("doc_id") % 5 === 0, lit("ssn 123-45-6789 ")).otherwise(""),
            col("text")).as("raw"))
        planted.select(
          col("doc_id"),
          piiScrubbed(col("raw")).as("scrubbed"),
          piiCount(col("raw")).as("n_pii"))
    },
    Some("""WITH planted AS (SELECT doc_id,
           |  concat(
           |    CASE WHEN doc_id % 2 = 0
           |         THEN concat('mail u', CAST(doc_id AS VARCHAR), '@example.com ') ELSE '' END,
           |    CASE WHEN doc_id % 3 = 0
           |         THEN concat('from 10.', CAST(doc_id % 256 AS VARCHAR), '.0.7 ') ELSE '' END,
           |    CASE WHEN doc_id % 5 = 0 THEN 'ssn 123-45-6789 ' ELSE '' END,
           |    text) AS raw
           |  FROM documents)
           |SELECT doc_id,
           |  regexp_replace(regexp_replace(regexp_replace(raw,
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           |    '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g') AS scrubbed,
           |  len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           |    + len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
           |    + len(regexp_extract_all(raw, '\b\d{3}-\d{2}-\d{4}\b')) AS n_pii
           |FROM planted""".stripMargin))

  /** Benchmark decontamination — the train/eval contamination sweep
    * every serious pretraining pipeline runs (the GPT-3 appendix-C
    * n-gram collision rule): a training document is CONTAMINATED if it
    * shares any word n-gram (3-shingles here, same unit as the dedup
    * family) with any document of the held-out benchmark set. The
    * benchmark is the deterministic doc_id % `decontMod` slice,
    * standing in for "the eval suites" a production run loads as a
    * separate small table.
    *
    * Scale shape: the benchmark side is small BY DEFINITION (eval
    * suites are thousands of docs against a 100 TB corpus), so its
    * distinct shingle set builds from a filter-pruned scan and
    * BROADCASTS; the training side is ONE corpus scan —
    * `explode_outer` keeps a (null-shingle) row for short documents,
    * so the per-doc collision count covers every training doc without
    * a second corpus pass for the zero rows — a map-side broadcast
    * left join + one groupBy(doc) shuffle; the corpus is never
    * shuffled on the shingle and no shingle inverted index is
    * materialized. Output: one row per training doc with the count of
    * its distinct shingles that collide with the benchmark (0 = clean),
    * the signal a pipeline thresholds or hard-drops on. */
  private val decontMod = 41
  val decontaminateOp = QueryDef(
    "ns_decontaminate", {
      (s, dir) =>
        // no size/null filter on the shingle array: explode_outer keeps
        // empty/null arrays as a single null row, and an explicit
        // filter would be PUSHED below the Project, duplicating the
        // whole shingle computation into the scan's DataFilters (the
        // minhash_sigs pushdown trap — measured 2.7× there)
        val bench = docs(s, dir).filter(col("doc_id") % decontMod === 0)
          .select(explode(array_distinct(shingles3(trim(col("text"))))).as("x"))
          .distinct()
          .withColumn("hit", lit(1))
        val tr = Par.spread(s, docs(s, dir), col("doc_id"))
          .filter(col("doc_id") % decontMod =!= 0)
          .select(col("doc_id"),
            explode_outer(array_distinct(shingles3(trim(col("text"))))).as("x"))
        tr.join(broadcast(bench), Seq("x"), "left")
          .groupBy("doc_id").agg(count(col("hit")).as("n_hits"))
          .select(col("doc_id"), col("n_hits"),
            (col("n_hits") > 0).as("contaminated"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
           |        i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS s
           |      FROM toks WHERE len(t) >= 3),
           |bench AS (SELECT DISTINCT unnest(s) AS x FROM sh WHERE doc_id % $decontMod = 0),
           |tr AS (SELECT doc_id, unnest(s) AS x FROM sh WHERE doc_id % $decontMod <> 0),
           |hits AS (SELECT doc_id, count(*) AS hits FROM tr JOIN bench USING (x) GROUP BY 1)
           |SELECT d.doc_id, coalesce(hits, 0) AS n_hits, hits IS NOT NULL AS contaminated
           |FROM (SELECT doc_id FROM documents WHERE doc_id % $decontMod <> 0) d
           |LEFT JOIN hits USING (doc_id)""".stripMargin),
    // the benchmark overlap PARTITIONS the corpus: contaminated docs
    // exist (the drop branch does work) and clean docs survive
    liveness = Seq(
      "contaminated_and_clean_docs_coexist" ->
        ("SELECT count(CASE WHEN contaminated THEN 1 END) > 0 AND " +
          "count(CASE WHEN NOT contaminated THEN 1 END) > 0 FROM r")))

  /** Benchmark decontamination, the BLOOM-prefiltered at-scale twin:
    * when the benchmark shingle set outgrows a comfortable broadcast
    * hash relation (all of HELM + every eval suite), the membership
    * structure a 100 TB pass actually ships is a Bloom filter — a few
    * MB for hundreds of millions of shingles. Shape: build the filter
    * over the benchmark shingles in ONE aggregate row
    * (bloom_filter_agg over xxhash64), broadcast it, drop the
    * (overwhelming) bloom-negative majority of training shingles with
    * a per-row might_contain, then CONFIRM the survivors against the
    * exact set — false positives die at the confirm join, so the
    * result is hash-identical to ns_decontaminate (the shared oracle
    * proves it), while the join's build side only ever sees
    * bloom-positive rows. */
  val decontaminateBloomOp = QueryDef(
    "ns_decontaminate_bloom", {
      (s, dir) =>
        val benchSh = docs(s, dir).filter(col("doc_id") % decontMod === 0)
          .select(explode(array_distinct(shingles3(trim(col("text"))))).as("x"))
          .distinct()
        // might_contain requires a CONSTANT filter — materialize the
        // one-row aggregate on the driver (a few MB for hundreds of
        // millions of shingles), exactly the scalar-subquery constant
        // Spark's own InjectRuntimeFilter embeds; this is a bounded
        // 1-row fetch, not a corpus collect
        val bfBytes = benchSh
          .agg(graft.expr.TextFunctions.bloom_filter_agg(
            xxhash64(col("x")), 20000L, 200000L).as("bf"))
          .head().getAs[Array[Byte]]("bf")
        val tr = Par.spread(s, docs(s, dir), col("doc_id"))
          .filter(col("doc_id") % decontMod =!= 0)
          .select(col("doc_id"),
            explode(array_distinct(shingles3(trim(col("text"))))).as("x"))
        val hits = tr
          .filter(graft.expr.TextFunctions.might_contain(
            lit(bfBytes), xxhash64(col("x"))))
          .join(broadcast(benchSh), Seq("x"))
          .groupBy("doc_id").agg(count(lit(1)).as("hits"))
        docs(s, dir).filter(col("doc_id") % decontMod =!= 0).select("doc_id")
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("hits"), lit(0L)).as("n_hits"),
            col("hits").isNotNull.as("contaminated"))
    },
    // the exact op's oracle verbatim: the bloom is plan-level only
    Some(s"""WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
           |        i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS s
           |      FROM toks WHERE len(t) >= 3),
           |bench AS (SELECT DISTINCT unnest(s) AS x FROM sh WHERE doc_id % $decontMod = 0),
           |tr AS (SELECT doc_id, unnest(s) AS x FROM sh WHERE doc_id % $decontMod <> 0),
           |hits AS (SELECT doc_id, count(*) AS hits FROM tr JOIN bench USING (x) GROUP BY 1)
           |SELECT d.doc_id, coalesce(hits, 0) AS n_hits, hits IS NOT NULL AS contaminated
           |FROM (SELECT doc_id FROM documents WHERE doc_id % $decontMod <> 0) d
           |LEFT JOIN hits USING (doc_id)""".stripMargin))

  /** Repetition signals — the MassiveText/Gopher quality rules a
    * pretraining filter thresholds on: the fraction of the document
    * its single most frequent token occupies (boilerplate/spam
    * indicator) and the duplicate-token fraction (1 − type/token
    * ratio). Per-token frequencies via groupBy(doc, token) with
    * map-side combine — two map-side-combined shuffles keyed by
    * doc_id, no arrays carried through an aggregation, the shape that
    * survives arbitrarily long documents at 100 TB (a per-row HOF
    * over the token array would be O(distinct × n) per document and
    * interpreted). */
  val textRepetitionOp = QueryDef(
    "ns_text_repetition", {
      (s, dir) =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(
            max(col("c")).as("max_c"),
            sum(col("c")).as("n"),
            count(lit(1)).as("n_distinct"))
          .select(col("doc_id"),
            expr("round(CAST(max_c AS DOUBLE) / n, 6)").as("top_tok_frac"),
            expr("round(1 - CAST(n_distinct AS DOUBLE) / n, 6)").as("dup_tok_frac"))
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
           |per AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
           |agg AS (SELECT doc_id, max(c) AS max_c, sum(c) AS n, count(*) AS n_distinct
           |  FROM per GROUP BY 1)
           |SELECT doc_id, round(CAST(max_c AS DOUBLE) / n, 6) AS top_tok_frac,
           |  round(1 - CAST(n_distinct AS DOUBLE) / n, 6) AS dup_tok_frac
           |FROM agg""".stripMargin))

  /** Document chunking — the context-window packing precursor: split
    * each document into overlapping windows of `chunkW` tokens at
    * stride `chunkS` (overlap = chunkW − chunkS), the unit a training
    * pipeline tokenizes and packs. The final window of a document may
    * be shorter than chunkW (the tail is never dropped); documents
    * shorter than one window emit a single whole-document chunk, and a
    * window whose content would be entirely contained in its
    * predecessor (fewer than chunkW − chunkS tokens remain past the
    * overlap) is not emitted — every chunk after the first carries at
    * least one new token, and every token is covered. Pure per-row
    * explode + slice — codegen-friendly (`slice` with a column start
    * stays in whole-stage codegen where a `transform` HOF would fall
    * back to interpreted eval), embarrassingly parallel, no shuffle at
    * any corpus size. */
  private val chunkW = 32
  private val chunkS = 24
  val textChunkOp = QueryDef(
    "ns_text_chunk", {
      (s, dir) =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"), col("t"),
            explode(expr(s"sequence(1, size(t), $chunkS)")).as("i"))
          // new-content guard: window at i > 1 adds tokens beyond its
          // predecessor's end iff i + (chunkW − chunkS) ≤ n; the filter
          // references the Generate output, so it cannot be pushed into
          // a recomputation below it
          .filter(col("i") === 1 ||
            col("i") + (chunkW - chunkS) <= size(col("t")))
          .select(col("doc_id"),
            expr(s"CAST((i - 1) div $chunkS AS BIGINT)").as("chunk_idx"),
            array_join(slice(col("t"), col("i"), lit(chunkW)), " ").as("chunk"),
            least(lit(chunkW), size(col("t")) - col("i") + 1).cast("long").as("n_chunk_tokens"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |idx0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t), $chunkS)) AS i FROM toks),
           |idx AS (SELECT * FROM idx0 WHERE i = 1 OR i + ${chunkW - chunkS} <= len(t))
           |SELECT doc_id, CAST((i - 1) // $chunkS AS BIGINT) AS chunk_idx,
           |  array_to_string(t[i : i + ${chunkW - 1}], ' ') AS chunk,
           |  CAST(least($chunkW, len(t) - i + 1) AS BIGINT) AS n_chunk_tokens
           |FROM idx""".stripMargin))

  /** Packing offsets — the concatenate-then-split step of causal-LM
    * data prep: documents are laid end-to-end in a deterministic order
    * (doc_id) and the resulting token stream is cut into fixed
    * `packC`-token training sequences; each document's global start
    * offset decides its bin and position. The offsets are a prefix sum
    * over the corpus, computed in the DISTRIBUTED two-level shape: a
    * bounded window inside each `packB`-doc block (partition-local,
    * ≤ packB rows of state) plus a per-block base from a window over
    * the tiny block-sum dim — never one global single-partition window
    * over the corpus (the naive `Window.orderBy(doc_id)` plan funnels
    * every row through one task). At 10^9 docs the block dim is
    * |corpus|/packB ≈ 250k rows — still one task, but of longs, and a
    * third level handles another 10^6× if ever needed. */
  private val packC = 256L
  private val packB = 4096L
  val textPackOp = QueryDef(
    "ns_text_pack", {
      (s, dir) =>
        // explicit null gate on the RAW columns (mirrored in the
        // oracle's WHERE): packing is undefined for null ids/text, and
        // with nulls excluded up front the block totals below are an
        // exact sum (a null text would make size() yield −1 and skew
        // max-based totals). The coalesce then only serves nullability:
        // a non-nullable block key means the join inserts no one-sided
        // isnotnull pushdown, the two branches' exchange subtrees stay
        // canonically equal, and AQE reuses the scan+shuffle stage
        val t = Par.spread(
            s, docs(s, dir).filter(col("doc_id").isNotNull && col("text").isNotNull),
            col("doc_id"))
          .select(col("doc_id"),
            size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
          .withColumn("block", expr(s"coalesce(doc_id div $packB, -1)"))
        val wIn = Window.partitionBy("block").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val within = t.withColumn("prev_in_block",
          coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
        val wBase = Window.orderBy("block")
          .rowsBetween(Window.unboundedPreceding, -1)
        // block totals off the WINDOWED frame (last row's exclusive
        // prefix + its own tokens = the block total) — shares the
        // windowed branch's scan+exchange via ReuseExchange instead of
        // re-scanning and re-shuffling the corpus for the block sums
        val bases = within.groupBy("block")
          .agg(max(col("prev_in_block") + col("n_tokens")).as("bsum"))
          .withColumn("base", coalesce(sum(col("bsum")).over(wBase), lit(0L)))
          .select("block", "base")
        within.join(broadcast(bases), "block")
          .select(col("doc_id"), col("n_tokens"),
            (col("base") + col("prev_in_block")).as("start_off"))
          .select(col("doc_id"), col("n_tokens"), col("start_off"),
            expr(s"start_off div $packC").as("bin"),
            expr(s"start_off % $packC").as("bin_off"))
    },
    Some(s"""WITH t AS (SELECT doc_id,
           |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
           |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
           |c AS (SELECT doc_id, n_tokens,
           |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off FROM t)
           |SELECT doc_id, n_tokens, start_off,
           |  start_off // $packC AS bin, start_off % $packC AS bin_off
           |FROM c""".stripMargin))

  /** Per-language corpus counts as a PERSISTED artifact: mixture rates
    * are corpus statistics, computed once per corpus snapshot like the
    * IVF centroids and the unigram vocabulary — every sampling query
    * reads the tiny dim instead of re-aggregating the corpus. */
  private def langCountDim(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/documents.parquet", "lang_counts") { path =>
      docs(s, dir).groupBy("lang").agg(count(lit(1)).as("cnt"))
        .coalesce(1).write.mode("overwrite").parquet(path)  // dim-bounded: one row per language
    }

  /** Mixture rebalancing — the multilingual-corpus sampling step
    * (XLM-R-style temperature sampling, τ = 0.5): each language's
    * acceptance rate is `min(1, K/sqrt(count))`, so high-resource
    * languages are downsampled toward the tempered distribution while
    * low-resource ones are availability-capped at keep-everything.
    * The rate is materialized as an integer threshold over the
    * deterministic 1-in-10000 md5 bucket: `floor(10000·rate)` —
    * every arithmetic step (sqrt, one divide, one multiply, floor) is
    * a single correctly-rounded IEEE-754 op on identical inputs, so
    * Spark and DuckDB derive bit-identical thresholds and membership
    * is engine-independent. Plan shape: ONE corpus scan probed against
    * the broadcast rate dim — a pure pushdown-friendly filter any
    * worker evaluates independently at 100 TB. */
  private val mixtureK = 8.0
  val sampleMixtureOp = QueryDef(
    "ns_sample_mixture", {
      (s, dir) =>
        val rates = langCountDim(s, dir).select(
          col("lang"),
          expr(s"CAST(floor(10000 * least(1.0, $mixtureK / sqrt(cnt))) AS INT)").as("thr"))
        docs(s, dir)
          .join(broadcast(rates), "lang")
          .filter(expr(hashBucketOn("doc_id", 10000)) < col("thr"))
          .select(col("doc_id"), col("lang"), col("thr"))
    },
    Some(
      s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
         |r AS (SELECT lang, CAST(floor(10000 * least(1.0, $mixtureK / sqrt(cnt))) AS INT) AS thr FROM c)
         |SELECT d.doc_id, d.lang, r.thr
         |FROM documents d JOIN r USING (lang)
         |WHERE ${hashBucketSqlOn("d.doc_id", 10000)} < r.thr""".stripMargin))

  /** Temperature resampling with the NORMALIZED tempered distribution —
    * mixture's exact-share sibling (T5/mT5-style, α = 3/4): target
    * share p_i = w_i / Σ_j w_j with w = cnt^α, and acceptance rate
    * min(1, budget·p_i/cnt_i) — a fixed total training budget spread
    * across languages by the tempered law.
    *
    * Determinism discipline: cnt^(3/4) is sqrt(cnt·sqrt(cnt)) — a
    * COMPOSITION of correctly-rounded IEEE ops, bit-identical across
    * engines where pow(x, 0.75) is not — and the weight QUANTIZES to
    * an exact integer (floor(10⁶·w)) before the cross-language sum, so
    * Σw is an order-free exact long and no accumulation-order pact is
    * needed at all. The rate then derives once per language from exact
    * integers through one shared formula text. Same md5-bucket
    * threshold membership as mixture; one corpus scan probed against
    * the broadcast rate dim. */
  private val temperatureBudget = 300.0
  private val tempWInt = "CAST(floor(1000000 * sqrt(cnt * sqrt(cnt))) AS BIGINT)"
  private def tempThr(budget: Double) =
    s"CAST(floor(10000 * least(1.0, $budget * (CAST(w_int AS DOUBLE) / s_wint) / cnt)) AS INT)"
  val sampleTemperatureOp = QueryDef(
    "ns_sample_temperature", {
      (s, dir) =>
        val dimW = langCountDim(s, dir).withColumn("w_int", expr(tempWInt))
        val tot = dimW.agg(sum(col("w_int")).as("s_wint"))
        val rates = dimW.crossJoin(broadcast(tot))
          .select(col("lang"), expr(tempThr(temperatureBudget)).as("thr"))
        docs(s, dir)
          .join(broadcast(rates), "lang")
          .filter(expr(hashBucketOn("doc_id", 10000)) < col("thr"))
          .select(col("doc_id"), col("lang"), col("thr"))
    },
    Some(
      s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
         |w AS (SELECT lang, cnt, $tempWInt AS w_int FROM c),
         |t AS (SELECT CAST(sum(w_int) AS BIGINT) AS s_wint FROM w),
         |r AS (SELECT lang, ${tempThr(temperatureBudget)} AS thr FROM w, t)
         |SELECT d.doc_id, d.lang, r.thr
         |FROM documents d JOIN r USING (lang)
         |WHERE ${hashBucketSqlOn("d.doc_id", 10000)} < r.thr""".stripMargin))

  /** Per-source document cap — the RefinedWeb/CCNet domain-cap rule:
    * no single domain may dominate the corpus, so each source keeps at
    * most `domainCap` documents, chosen by quality (the verified
    * ns_quality_score formula, ties broken by doc_id). The selection
    * uses the bounded top-k TypedImperativeAggregate (expr/TopK.scala):
    * partial aggregation keeps ≤ cap rows per (source, map task), so a
    * boilerplate domain with 10^9 pages ships cap rows per task — never
    * a per-source window sort over the domain's full page list. Output
    * matches row_number(PARTITION BY source ORDER BY q DESC, doc_id)
    * exactly. */
  private val domainCap = 10
  val sampleDomainCapOp = QueryDef(
    "ns_sample_domain_cap", {
      (s, dir) =>
        withQualityInputs(docs(s, dir))
          .select(col("source"), col("doc_id"),
            expr(s"round($qualitySpark, 6)").as("q"))
          .groupBy("source")
          .agg(graft.expr.VecFunctions.topk_by_score(
            col("doc_id"), col("q"), domainCap).as("top"))
          .select(col("source"), posexplode(col("top")))
          .select(col("source"),
            col("col.id").as("doc_id"),
            col("col.score").as("q"),
            (col("pos") + 1).cast("long").as("rank"))
    },
    Some(
      s"""WITH s AS (SELECT source, doc_id, round($qualityDuck, 6) AS q FROM documents)
         |SELECT source, doc_id, q, rank FROM (
         |  SELECT source, doc_id, q,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS BIGINT) AS rank
         |  FROM s)
         |WHERE rank <= $domainCap""".stripMargin))

  /** Deterministic global shuffle into training shards — the corpus
    * randomization every pretraining run needs, reproducible across
    * runs, engines, and cluster sizes: shard = md5 bucket of the
    * doc_id, within-shard order = the full md5 (ties broken by
    * doc_id). The plan is the scale shape for "shuffle 100 TB": ONE
    * hash-partition shuffle into `nShards` independent groups, each
    * sorted locally — never a global sort, and shard count (not
    * corpus size) bounds the per-task sort. */
  private val nShards = 16
  val shardOrderOp = QueryDef(
    "ns_shard_order", {
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"),
            expr("md5(CAST(doc_id AS STRING))").as("h"))
          .withColumn("shard",
            expr(s"CAST(conv(substring(h, 1, 4), 16, 10) AS INT) % $nShards"))
          .withColumn("ord", row_number()
            .over(Window.partitionBy("shard").orderBy("h", "doc_id"))
            .cast("long"))
          .select(col("doc_id"), col("shard"), col("ord"))
    },
    Some(
      s"""WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |s AS (SELECT doc_id, h, ('0x' || substr(h, 1, 4))::INT % $nShards AS shard FROM h)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS ord
         |FROM s""".stripMargin))

  /** Quality-filter funnel — the C4/Gopher-style filter cascade with
    * the per-rule drop accounting every corpus paper reports: rules
    * fire in a fixed order (length gate → language-ID agreement →
    * repetition via type/token ratio → composite quality score), each
    * document gets its FIRST failing rule as a verdict, and the
    * output is the (source, verdict) funnel table. The thresholds
    * reuse this file's scoring formulas verbatim (ns_lang_id's argmax,
    * ns_text_stats' ttr, ns_quality_score's composite), so the funnel
    * is the composition of already-verified signals. One codegen map
    * pass over the corpus plus a tiny map-side-combined count — no
    * per-document state, no second scan. */
  val filterFunnelOp = QueryDef(
    "ns_filter_funnel", {
      (s, dir) =>
        withQualityInputs(langScores(docs(s, dir)))
          .withColumn("pred_lang", expr(langArgmax))
          .withColumn("ttr", expr(
            "CAST(size(array_distinct(split(trim(text), ' '))) AS DOUBLE) / size(split(trim(text), ' '))"))
          .withColumn("q", expr(qualitySpark))
          .withColumn("verdict", expr(
            """CASE WHEN length(text) < 150 THEN 'too_short'
              |     WHEN pred_lang <> lang THEN 'lang_mismatch'
              |     WHEN ttr < 0.40 THEN 'repetitive'
              |     WHEN q < 0.20 THEN 'low_quality'
              |     ELSE 'keep' END""".stripMargin))
          .groupBy("source", "verdict")
          .agg(count(lit(1)).as("n"))
    },
    Some(
      s"""WITH scored AS (SELECT doc_id, source, lang, text, $langScoresSql FROM documents),
         |f AS (SELECT source,
         |  CASE WHEN length(text) < 150 THEN 'too_short'
         |       WHEN ($langArgmax) <> lang THEN 'lang_mismatch'
         |       WHEN CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
         |            / len(string_split(trim(text), ' ')) < 0.40 THEN 'repetitive'
         |       WHEN $qualityDuck < 0.20 THEN 'low_quality'
         |       ELSE 'keep' END AS verdict
         |  FROM scored)
         |SELECT source, verdict, count(*) AS n FROM f GROUP BY 1, 2""".stripMargin),
    // the funnel REJECTS through at least two distinct rules AND keeps
    // survivors — a funnel where only one arm fires (or nothing
    // survives) is not exercising its cascade
    liveness = Seq(
      "multiple_reject_rules_fire_and_docs_survive" ->
        ("SELECT count(DISTINCT verdict) >= 3 AND " +
          "count(CASE WHEN verdict = 'keep' THEN 1 END) > 0 FROM r")))

  /** Dedup report — the cluster-size histogram every dedup run
    * publishes (how much of the corpus sits in singletons vs small
    * near-dup clusters vs boilerplate blobs). A further consumer of
    * the persisted near-dup label artifact: two tiny aggregations over
    * the label store — the normalize→LSH→verify→propagate pipeline
    * never re-runs, and the plan contains no corpus scan (same lock as
    * the leakage split). The oracle reuses the pipeline CTE chain, so
    * the histogram provably describes the same labels. */
  val dedupReportOp = QueryDef(
    "ns_dedup_report", {
      (s, dir) =>
        nearDupClusterDim(s, dir)
          .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    },
    Some(s"""$pipelineOracleCtes,
           |cs AS (SELECT label, count(*) AS cluster_size FROM l$propagationRounds GROUP BY 1)
           |SELECT cluster_size, count(*) AS n_clusters FROM cs GROUP BY 1""".stripMargin),
    // the histogram spans both regimes: singleton clusters AND real
    // multi-member near-dup clusters
    liveness = Seq(
      "singletons_and_multi_member_clusters" ->
        ("SELECT count(CASE WHEN cluster_size = 1 THEN 1 END) > 0 AND " +
          "count(CASE WHEN cluster_size >= 2 THEN 1 END) > 0 FROM r")))

  /** Token-budget data selection — "take the best documents until the
    * budget is spent", the data-selection step of corpus curation:
    * rank documents by quality, keep them in rank order while the
    * running token total fits `selectBudget`. The ranking NEVER runs
    * as a global sort + single-task window: quality is bucketed into
    * a ≤1001-value histogram, the cumulative-before-bucket total runs
    * over that tiny dim, and each bucket's internal prefix sum is a
    * bucket-partitioned window — the ns_text_pack two-level shape,
    * keyed here by a data-dependent (quality-rank) order. The greedy
    * rule is `cum ≤ budget` under the total order (qb DESC, doc_id),
    * so the kept set is a deterministic prefix, bit-identical across
    * engines (the quality bucket floors the proven ns_quality_score
    * double, and everything after is integer arithmetic). */
  private val selectBudget = 8000L
  val selectBudgetOp = QueryDef(
    "ns_select_budget", {
      (s, dir) =>
        // explicit null gate on the RAW columns (mirrored in the
        // oracle's WHERE): selection is undefined for null ids/text,
        // and with nulls excluded the max(win) bucket totals below are
        // exact sums. The coalesce then only serves nullability — a
        // non-nullable bucket key means the join inserts no one-sided
        // isnotnull pushdown, the two branches' exchange subtrees stay
        // canonically equal, and AQE reuses the scan+shuffle stage
        // instead of scanning the corpus twice
        val t = withQualityInputs(
            docs(s, dir).filter(col("doc_id").isNotNull && col("text").isNotNull))
          .withColumn("qb", expr(s"coalesce(CAST(floor(1000 * ($qualitySpark)) AS INT), -1)"))
          .select(col("doc_id"), col("qb"), col("n_tokens"))
        val wIn = Window.partitionBy("qb").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val within = t.withColumn("win", sum(col("n_tokens")).over(wIn))
        val wBase = Window.orderBy(col("qb").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        // bucket totals come off the WINDOWED frame (max of the inclusive
        // running sum = the bucket's total), not a second aggregation of
        // `t` — the two branches then share one scan+exchange via
        // ReuseExchange instead of scanning the corpus twice
        val bases = within.groupBy("qb").agg(max(col("win")).as("bsum"))
          .withColumn("base", coalesce(sum(col("bsum")).over(wBase), lit(0L)))
          .select("qb", "base")
        within.join(broadcast(bases), "qb")
          .withColumn("cum_tokens", col("base") + col("win"))
          .filter(col("cum_tokens") <= selectBudget)
          .select(col("doc_id"), col("qb"), col("n_tokens"), col("cum_tokens"))
    },
    Some(
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
         |    CAST(floor(1000 * ($qualityDuck)) AS INT) AS qb
         |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |c AS (SELECT doc_id, qb, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY qb DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM t)
         |SELECT doc_id, qb, n_tokens, cum_tokens FROM c WHERE cum_tokens <= $selectBudget""".stripMargin))

  /** Incremental corpus dedup — the shape continuous training-data
    * ingestion actually runs: a NEW batch of documents (here the
    * deterministic 20% slice doc_id % 5 = 0, standing in for "what the
    * crawler just delivered") deduped against the EXISTING corpus
    * without ever pairing the corpus with itself. Candidates come from
    * the same banded-MinHash buckets as ns_dedup_minhash, but the
    * bucket aggregate keeps the sides SEPARATE — two `BoundedBucketAgg`
    * lists per (band, sig), each side capped — and emits only
    * new × corpus pairs, so the corpus × corpus bulk a full re-dedup
    * pays is never generated: per batch the work is
    * O(|new| + candidates), not O(|corpus|²). ONE signature pass
    * computes both sides (side is a derived column, not a second
    * plan); verification is exact Jaccard on candidates only
    * (ns_dedup_pipeline's contract). Output: every new document with
    * its canonical corpus duplicate (min doc_id) or null = genuinely
    * new. At 100 TB the corpus side's band signatures come from a
    * persisted signature table maintained by prior batches (the
    * ns_similarity_ivf centroid-store pattern) instead of
    * recomputation — candidate generation and verify are unchanged. */
  val dedupIncrementalOp = QueryDef(
    "ns_dedup_incremental", {
      (s, dir) =>
        val base = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), (col("doc_id") % 5 === 0).as("is_new"),
            trim(col("text")).as("t"))
        // native MinHashSigs map pass (r8); the side tag re-derives from
        // the id, so the shared signature helper needs no extra column
        val bands = bandSignatures(base, "doc_id", "t")
          .withColumn("is_new", col("doc_id") % 5 === 0)
        val buckets = bands.groupBy("band", "sig").agg(
          graft.expr.TextFunctions.bounded_bucket(
            when(col("is_new"), col("doc_id")), bandCap).as("news"),
          graft.expr.TextFunctions.bounded_bucket(
            when(!col("is_new"), col("doc_id")), bandCap).as("olds"))
          .filter(col("news").isNotNull && col("olds").isNotNull &&
            size(col("news")) > 0 && size(col("olds")) > 0)
        val cand = buckets
          .select(explode(col("news")).as("new_id"), col("olds"))
          .select(col("new_id"), explode(col("olds")).as("corpus_id"))
          .distinct()
        val sets = shingleSets(base, "doc_id", "t")
        val dups = cand
          .join(sets.select(col("doc_id").as("new_id"), col("sh").as("sa")), "new_id")
          .join(sets.select(col("doc_id").as("corpus_id"), col("sh").as("sb")), "corpus_id")
          .withColumn("o", size(array_intersect(col("sa"), col("sb"))).cast("long"))
          .withColumn("na", size(col("sa")).cast("long"))
          .withColumn("nb", size(col("sb")).cast("long"))
          .filter(expr(s"CAST(o AS DOUBLE) / (na + nb - o) >= $ngramT"))
          .groupBy("new_id").agg(min(col("corpus_id")).as("dup_of"))
        base.filter(col("is_new")).select(col("doc_id"))
          .join(dups.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("is_unique"))
    },
    Some {
      val mhCols = (0 until nHashes).map { b =>
        s"list_aggregate(list_transform(s, x -> md5(concat('$b:', x))), 'min') AS mh$b"
      }.mkString(", ")
      val bandSelects = (0 until nHashes / bandWidth).map { g =>
        val sig = (0 until bandWidth).map(i => s"mh${g * bandWidth + i}").mkString("concat(", ", ", ")")
        s"SELECT doc_id, is_new, $g AS band, $sig AS sig FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT doc_id, doc_id % 5 = 0 AS is_new,
         |        string_split(trim(text), ' ') AS t FROM documents),
         |shl AS (SELECT doc_id, is_new, list_transform(generate_series(1, len(t)-2),
         |          i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])) AS s
         |        FROM toks WHERE len(t) >= 3),
         |d AS (SELECT doc_id, list_distinct(s) AS sh FROM shl),
         |mh AS (SELECT doc_id, is_new, $mhCols FROM shl),
         |bands0 AS ($bandSelects),
         |bands AS (SELECT * FROM bands0
         |  QUALIFY count(CASE WHEN is_new THEN 1 END) OVER (PARTITION BY band, sig) <= $bandCap
         |      AND count(CASE WHEN NOT is_new THEN 1 END) OVER (PARTITION BY band, sig) <= $bandCap),
         |cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS corpus_id
         |  FROM bands n JOIN bands o ON n.band = o.band AND n.sig = o.sig
         |  WHERE n.is_new AND NOT o.is_new),
         |dups AS (SELECT new_id, min(corpus_id) AS dup_of FROM (
         |    SELECT cand.new_id, cand.corpus_id, len(list_intersect(x.sh, y.sh)) AS o,
         |           len(x.sh) AS na, len(y.sh) AS nb
         |    FROM cand JOIN d x ON x.doc_id = cand.new_id
         |              JOIN d y ON y.doc_id = cand.corpus_id)
         |  WHERE CAST(o AS DOUBLE) / (na + nb - o) >= $ngramT GROUP BY 1)
         |SELECT t.doc_id, dups.dup_of, dups.dup_of IS NULL AS is_unique
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) t
         |LEFT JOIN dups ON dups.new_id = t.doc_id""".stripMargin
    })

  /** Boolean query — the OpenSearch `bool` compound query (must /
    * should with minimum_should_match / must_not), the composition
    * layer every real search request wraps its term queries in
    * (kinesis2elastic's downstream consumers query the index exactly
    * this way). Here: must contain "spark", must not contain "slow",
    * and match at least 2 of {"join","window","sort"}; output reports
    * how many should-terms matched (the coordination factor ES folds
    * into the score).
    *
    * Scale shape: a single codegen map pass — each clause is an
    * `array_contains` on the per-row token array, so there is NO token
    * explode, no join, and no shuffle at any corpus size; the clause
    * count is fixed at query-plan time, exactly how a search engine
    * compiles a bool query into per-document bitset tests. All
    * arithmetic is integer — no float parity risk. */
  private val boolMust = "spark"
  private val boolMustNot = "slow"
  private val boolShould = Seq("join", "window", "sort")
  private val boolMsm = 2
  val boolQueryOp = QueryDef(
    "ns_search_bool", {
      (s, dir) =>
        val shouldCnt = boolShould
          .map(t => when(array_contains(col("t"), t), 1).otherwise(0))
          .reduce(_ + _)
        docs(s, dir)
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .filter(array_contains(col("t"), boolMust) &&
            !array_contains(col("t"), boolMustNot))
          .withColumn("n_should", shouldCnt.cast("long"))
          .filter(col("n_should") >= boolMsm)
          .select(col("doc_id"), col("n_should"))
    },
    Some {
      val shouldSql = boolShould
        .map(t => s"CASE WHEN list_contains(t, '$t') THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents)
         |SELECT doc_id, CAST($shouldSql AS BIGINT) AS n_should
         |FROM d
         |WHERE list_contains(t, '$boolMust')
         |  AND NOT list_contains(t, '$boolMustNot')
         |  AND $shouldSql >= $boolMsm""".stripMargin
    })

  /** Highlighting — the OpenSearch `highlight` feature: for documents
    * matching a term query, return a fragment of ±`hlCtx` tokens around
    * the FIRST occurrence with the matched token wrapped in <em> tags,
    * plus the total hit count. Token-window fragments (not raw char
    * offsets) are what analyzed-field highlighters actually emit.
    *
    * Scale shape: one codegen map pass per document — `array_position`
    * finds the first hit, the fragment assembles from a ≤(2·ctx+1)-slice
    * of the token array, and non-matching documents are filtered before
    * any string assembly. No explode, no join, no shuffle. */
  private val hlTerm = "window"
  private val hlCtx = 3
  val highlightOp = QueryDef(
    "ns_search_highlight", {
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .withColumn("i", array_position(col("t"), hlTerm))
          .filter(col("i") > 0)
          .select(col("doc_id"),
            expr(s"CAST(size(filter(t, x -> x = '$hlTerm')) AS BIGINT)").as("n_hits"),
            expr(s"""array_join(transform(
                    |  sequence(greatest(i - $hlCtx, 1L), least(i + $hlCtx, CAST(size(t) AS BIGINT))),
                    |  j -> IF(j = i, concat('<em>', element_at(t, CAST(j AS INT)), '</em>'),
                    |          element_at(t, CAST(j AS INT)))), ' ')""".stripMargin).as("snippet"))
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |m AS (SELECT doc_id, t, list_position(t, '$hlTerm') AS i FROM d
           |  WHERE coalesce(list_position(t, '$hlTerm'), 0) > 0)
           |SELECT doc_id,
           |  CAST(len(list_filter(t, x -> x = '$hlTerm')) AS BIGINT) AS n_hits,
           |  array_to_string(list_transform(
           |    generate_series(greatest(i - $hlCtx, 1), least(i + $hlCtx, len(t))),
           |    j -> CASE WHEN j = i THEN '<em>' || t[j] || '</em>' ELSE t[j] END), ' ') AS snippet
           |FROM m""".stripMargin))

  // --------------------------------------------------------------------- dsir
  /** DSIR-style importance resampling (Data Selection via Importance
    * Resampling, Xie et al. 2023): select raw-corpus documents whose
    * unigram statistics look like the TARGET domain, with probability
    * proportional to the importance weight p_target/p_raw — the
    * principled upgrade over hard domain filters for pretraining-mix
    * construction. Target here = the `lang = 'en'` slice; both LMs are
    * Laplace-smoothed unigram models over the raw vocabulary.
    *
    * Determinism: each token's log-ratio rounds to integer MICROS
    * before the per-doc sum (the bigram_logprob rule — data-dependent
    * term sets forbid fixed-order float addition), and the resampling
    * is Gumbel top-k with DETERMINISTIC noise: u(doc) from the md5
    * bucket primitive, key = logw − ln(−ln u) — reproducible across
    * runs and engines, tie-broken by doc_id. The noise term rounds to
    * integer MICROS on its own before combining with lw_micros, so the
    * selection key is an exact long in both engines — one libm ln
    * evaluation is the only float step, and it is never chained
    * through divisions before the rounding boundary (a 1-ulp JVM vs
    * DuckDB libm difference on a chained double key could otherwise
    * flip top-k membership at a rounding boundary).
    *
    * Scale shape: both count tables are persisted buildOnce artifacts
    * (vocab-bounded, corpus-size-independent); the scoring plan's only
    * documents scan is the probe-side token explode (the unigram
    * discipline); V/N_raw/N_target are one-row broadcasts; selection
    * is a TakeOrderedAndProject — no global sort survives. */
  private def unigramFreqTarget(s: SparkSession, dir: String): DataFrame =
    Artifacts.buildOnce(s, s"$dir/documents.parquet", "unigram_freq_target") {
      path =>
        Par.spread(s, docs(s, dir), col("doc_id"))
          .filter(col("lang") === "en")
          .select(explode(split(trim(col("text")), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("ct"))
          .coalesce(1)  // dim-bounded: token-vocabulary cardinality
          .write.mode("overwrite").parquet(path)
    }
  private val dsirK = 50
  /** Shared per-token micros text: ln smoothed target prob − ln smoothed
    * raw prob, ×1e6, rounded — identical text both engines. */
  private val dsirTermMicros: String =
    "CAST(round((ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1) / (nt + v)) - " +
      "ln((CAST(cr AS DOUBLE) + 1) / (nr + v))) * 1000000, 0) AS BIGINT)"
  /** Gumbel key over the exact micros sum and the doc's md5 uniform:
    * the ln(−ln u) noise quantizes to micros BEFORE combining, so the
    * key itself is exact long arithmetic — identical text both
    * engines. */
  private val dsirKeyMicrosText: String =
    "lw_micros - CAST(round(ln(-ln((CAST(ub AS DOUBLE) + 0.5) / 1000000)) * 1000000, 0) AS BIGINT)"
  val sampleDsirOp = QueryDef(
    "ns_sample_dsir", {
      (s, dir) =>
        val raw = unigramFreq(s, dir).withColumnRenamed("cnt", "cr")
        val tgt = unigramFreqTarget(s, dir)
        val stats = raw.agg(count(lit(1)).as("v"), sum(col("cr")).as("nr"))
          .crossJoin(broadcast(tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))))
        val toks = Par.spread(s, docs(s, dir), col("doc_id"))
          .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
        toks.join(raw, "tok")
          .join(tgt, Seq("tok"), "left")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), expr(dsirTermMicros).as("m"))
          .groupBy("doc_id")
          .agg(sum(col("m")).as("lw_micros"), count(lit(1)).as("n_toks"))
          .withColumn("ub", expr(hashBucketOn("doc_id", 1000000)))
          .withColumn("gkey_micros", expr(dsirKeyMicrosText))
          .withColumn("gkey", round(col("gkey_micros").cast("double") / 1000000, 6))
          .withColumn("logw", round(col("lw_micros").cast("double") / 1000000, 6))
          .orderBy(col("gkey_micros").desc, col("doc_id"))
          .limit(dsirK)
          .select("doc_id", "n_toks", "logw", "gkey")
    },
    Some(s"""WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
       |  FROM documents),
       |raw AS (SELECT tok, count(*) AS cr FROM toks GROUP BY 1),
       |tgt AS (SELECT tok, count(*) AS ct
       |  FROM (SELECT unnest(string_split(trim(text), ' ')) AS tok
       |        FROM documents WHERE lang = 'en') GROUP BY 1),
       |st AS (SELECT (SELECT count(*) FROM raw) AS v,
       |    (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS nr,
       |    (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tgt) AS nt),
       |term AS (SELECT doc_id, $dsirTermMicros AS m
       |  FROM toks JOIN raw USING (tok) LEFT JOIN tgt USING (tok), st),
       |d AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS lw_micros, count(*) AS n_toks
       |  FROM term GROUP BY 1),
       |k AS (SELECT doc_id, n_toks,
       |    round(CAST(lw_micros AS DOUBLE) / 1000000, 6) AS logw,
       |    $dsirKeyMicrosText AS gkey_micros
       |  FROM (SELECT *, ${hashBucketSqlOn("doc_id", 1000000)} AS ub FROM d))
       |SELECT doc_id, n_toks, logw,
       |  round(CAST(gkey_micros AS DOUBLE) / 1000000, 6) AS gkey FROM k
       |ORDER BY gkey_micros DESC, doc_id LIMIT $dsirK""".stripMargin))

  def entries: Seq[QueryDef] = Seq(
    dedupExactOp, dedupMinhashOp, dedupSimhashOp, dedupNgramOp,
    dedupSubstringOp,
    textStatsOp, tokenCountOp, langIdOp, qualityScoreOp, entropyOp, fingerprintOp,
    collocationsOp, percolateOp, fuzzyMatchOp, phraseMatchOp, phrasePrefixOp,
    spanNearOp, spanOrOp, spanNotOp, spanContainingOp, spanWithinOp, spanMultiOp,
    rankEvalOp, collapseOp, significantTermsOp, bm25Op,
    topHitsOp, multiMatchOp, combinedFieldsOp, functionScoreOp, scriptScoreOp,
    mltOp, suggestOp,
    phraseSuggestOp, completionSuggestOp, completionFuzzyOp, explainOp, rareTermsOp,
    boolQueryOp, highlightOp,
    unigramLogprobOp, bigramLogprobOp, perplexityFilterOp,
    sampleStratifiedOp, sampleMixtureOp,
    sampleTemperatureOp, sampleDomainCapOp, sampleDsirOp,
    splitTrainTestOp,
    splitLeakageSafeOp, splitLeakageNearOp, textNormalizeOp, dedupClusterOp,
    dedupPipelineOp, dedupIncrementalOp, piiScrubOp, decontaminateOp,
    decontaminateBloomOp,
    textRepetitionOp, textChunkOp, textPackOp, shardOrderOp, filterFunnelOp,
    selectBudgetOp, dedupReportOp)
}
