package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

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

  /** Exact dedup: hash-groupBy on normalized text (map-side combine →
    * one shuffle on the 128-bit key). */
  val dedupExactOp = QueryDef(
    "ns_dedup_exact",
    (s, dir) => docs(s, dir)
      .withColumn("text_hash", md5(lower(col("text")).cast("binary")))
      .groupBy("text_hash")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies")),
    Some("""SELECT md5(lower(text)) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
           |FROM documents GROUP BY 1""".stripMargin))

  // MinHash: word 3-shingles, 8 hash functions (min over md5('<b>:'||shingle)),
  // banded 4×2 → candidate pairs share ≥1 band. Min over hex strings is a
  // valid minhash (lexicographic order on a uniform hash).
  private val nHashes = 8
  private val bandWidth = 2

  val dedupMinhashOp = QueryDef(
    "ns_dedup_minhash", {
      (s, dir) =>
        val toks = docs(s, dir)
          .withColumn("toks", split(trim(col("text")), " "))
          .filter(size(col("toks")) >= 3)
          .withColumn("shingles", expr(
            "transform(sequence(1, size(toks)-2), i -> concat(element_at(toks,i), ' ', element_at(toks,i+1), ' ', element_at(toks,i+2)))"))
        val withMh = (0 until nHashes).foldLeft(toks) { (df, b) =>
          df.withColumn(s"mh$b", expr(s"array_min(transform(shingles, x -> md5(concat('$b:', x))))"))
        }
        val bands = withMh.select(
          col("doc_id"),
          posexplode(array((0 until nHashes / bandWidth).map { g =>
            concat((0 until bandWidth).map(i => col(s"mh${g * bandWidth + i}")): _*)
          }: _*)))
          .select(col("doc_id"), col("pos").as("band"), col("col").as("sig"))
        val a = bands.as("a")
        val b = bands.as("b")
        a.join(b, expr("a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
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
         |bands AS ($bandSelects)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
         |FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |GROUP BY 1, 2""".stripMargin
    })

  /** SimHash: 16-bit signature from per-bit majority vote over token
    * hashes (first 8 md5 hex chars → 32-bit int; bits 0..15 used). */
  val dedupSimhashOp = QueryDef(
    "ns_dedup_simhash",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
      .withColumn("h", expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)"))
      .select(col("doc_id"), col("h"), explode(expr("sequence(0, 15)")).as("j"))
      .groupBy("doc_id", "j")
      .agg(sum(expr("CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END")).as("w"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN w >= 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END")).as("simhash")),
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
           |h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT AS BIGINT) AS h FROM tok),
           |bits AS (SELECT doc_id, j, CAST(sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS w
           |  FROM h, (SELECT unnest(generate_series(0, 15)) AS j) js GROUP BY doc_id, j)
           |SELECT doc_id, CAST(sum(CASE WHEN w >= 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS simhash
           |FROM bits GROUP BY doc_id""".stripMargin))

  /** Token-set Jaccard similarity join via the SSJoin/PPJoin prefix
    * filter: under any fixed total order on tokens, two sets with
    * J ≥ t must share a token within each set's first
    * n − ceil(t·n) + 1 tokens — so only those prefix tokens are join
    * keys, and candidates are verified with the exact Jaccard. Tokens
    * are ordered by ascending document frequency (rarest first), which
    * makes prefix join keys the rarest tokens a doc has: per-key bucket
    * sizes track the df of rare tokens, not of stopwords, so no block
    * goes quadratic on boilerplate the way substring blocking does.
    * The result is the EXACT similarity join (no candidate misses), so
    * the oracle can generate candidates the naive-complete way (any
    * shared token) without mirroring the prefix machinery. */
  private val ngramT = 0.95
  val dedupNgramOp = QueryDef(
    "ns_dedup_ngram", {
      (s, dir) =>
        val d = docs(s, dir).select(
          col("doc_id"),
          array_distinct(split(trim(col("text")), " ")).as("toks"))
        val tok = d.select(col("doc_id"), explode(col("toks")).as("tok"))
        val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
        val prefix = tok.join(dfreq, "tok")
          .groupBy("doc_id")
          .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("sorted"))
          .select(col("doc_id"),
            expr(s"slice(transform(sorted, x -> x.tok), 1, " +
              s"size(sorted) - CAST(ceil($ngramT * size(sorted)) AS INT) + 1)").as("ptoks"))
          .select(col("doc_id"), explode(col("ptoks")).as("ptok"))
        val cand = prefix.as("a")
          .join(prefix.as("b"), expr("a.ptok = b.ptok AND a.doc_id < b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        cand
          .join(d.select(col("doc_id").as("doc_a"), col("toks").as("ta")), "doc_a")
          .join(d.select(col("doc_id").as("doc_b"), col("toks").as("tb")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            expr("round(CAST(size(array_intersect(ta, tb)) AS DOUBLE) / size(array_union(ta, tb)), 6)").as("jaccard"))
          .filter(col("jaccard") >= ngramT)
    },
    Some(s"""WITH d AS (SELECT doc_id, list_distinct(string_split(trim(text), ' ')) AS toks
           |    FROM documents),
           |tok AS (SELECT doc_id, unnest(toks) AS tok FROM d),
           |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |    FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id),
           |j AS (SELECT c.doc_a, c.doc_b,
           |    round(CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE)
           |          / len(list_distinct(list_concat(da.toks, db.toks))), 6) AS jaccard
           |  FROM cand c JOIN d da ON da.doc_id = c.doc_a JOIN d db ON db.doc_id = c.doc_b)
           |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= $ngramT""".stripMargin))

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

  /** Language ID: stopword-marker n-gram heuristic with a fixed argmax
    * tie order (en > de > fr > es > zh). */
  private val langMarkers = Seq(
    "en" -> "\\b(the|a|of|and|to|is)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|la|les|et|est)\\b",
    "es" -> "\\b(el|la|los|y|es)\\b",
    // \x{h..h} escape form: valid in BOTH Java regex (Spark) and RE2
    // (DuckDB); RE2 rejects the \uXXXX form.
    "zh" -> "[\\x{4e00}-\\x{9fff}]")

  val langIdOp = QueryDef(
    "ns_lang_id", {
      (s, dir) =>
        val scored = langMarkers.foldLeft(docs(s, dir)) { case (df, (l, rx)) =>
          df.withColumn(s"s_$l", regexp_count(col("text"), lit(rx)).cast("long"))
        }
        scored.select(
          col("doc_id"), col("lang"),
          col("s_en"), col("s_de"), col("s_fr"), col("s_es"), col("s_zh"),
          expr("""CASE
                 | WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
                 | WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
                 | WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                 | WHEN s_es >= s_zh THEN 'es'
                 | ELSE 'zh' END""".stripMargin).as("pred_lang"))
    },
    Some {
      val scoreCols = langMarkers.map { case (l, rx) =>
        s"CAST(len(regexp_extract_all(text, '$rx')) AS BIGINT) AS s_$l"
      }.mkString(", ")
      s"""WITH scored AS (SELECT doc_id, lang, $scoreCols FROM documents)
         |SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh,
         |  CASE
         |   WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
         |   WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
         |   WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
         |   WHEN s_es >= s_zh THEN 'es'
         |   ELSE 'zh' END AS pred_lang
         |FROM scored""".stripMargin
    })

  /** Quality scoring: length score + stopword ratio, fixed formula. */
  val qualityScoreOp = QueryDef(
    "ns_quality_score",
    (s, dir) => docs(s, dir)
      .withColumn("n_tokens", size(split(trim(col("text")), " ")).cast("long"))
      .withColumn("n_stop", regexp_count(col("text"), lit("\\b(the|a|of|and|to|is)\\b")).cast("long"))
      .select(
        col("doc_id"),
        expr("round(0.5 * least(CAST(length(text) AS DOUBLE) / 500, 1.0) + 0.5 * (CAST(n_stop AS DOUBLE) / n_tokens), 6)").as("quality")),
    Some("""WITH q AS (SELECT doc_id, text,
           |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           |    CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|is)\b')) AS BIGINT) AS n_stop
           |  FROM documents)
           |SELECT doc_id,
           |  round(0.5 * least(CAST(length(text) AS DOUBLE) / 500, 1.0) + 0.5 * (CAST(n_stop AS DOUBLE) / n_tokens), 6) AS quality
           |FROM q""".stripMargin))

  /** Document fingerprint: md5 of whitespace-normalized text plus a
    * 60-bit integer prefix for compact storage/joins. */
  val fingerprintOp = QueryDef(
    "ns_fingerprint",
    (s, dir) => docs(s, dir)
      .withColumn("norm", expr("regexp_replace(trim(lower(text)), '\\\\s+', ' ')"))
      .select(
        col("doc_id"),
        md5(col("norm").cast("binary")).as("fp_hex"),
        expr("CAST(conv(substring(md5(norm), 1, 15), 16, 10) AS BIGINT)").as("fp_long")),
    Some("""WITH n AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm FROM documents)
           |SELECT doc_id, md5(norm) AS fp_hex,
           |  CAST(('0x' || substr(md5(norm), 1, 15))::UBIGINT AS BIGINT) AS fp_long
           |FROM n""".stripMargin))

  def entries: Seq[QueryDef] = Seq(
    dedupExactOp, dedupMinhashOp, dedupSimhashOp, dedupNgramOp,
    textStatsOp, tokenCountOp, langIdOp, qualityScoreOp, fingerprintOp)
}
