package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Tokenizer-level corpus preparation: the operators a training-data
  * pipeline runs between raw text and a token budget — applying a BPE
  * merge table, LEARNING one (the distributed pair-count loop), a
  * fasttext-style linear quality classifier, and embedding whitening.
  * These sit beside ops/TextOps.scala's dedup/sampling family; they are
  * the pieces that produce the numbers those operators consume
  * (token counts for ns_text_pack / ns_select_budget, quality scores
  * for ns_filter_funnel, normalized embeddings for the ANN family).
  *
  * BPE state is a flat string, not a nested array: every symbol is
  * TRAILED by `|` (`the` → `t|h|e|`), so a merge is one codegen
  * `replace(s, "t|h|", "th|")` — left-to-right non-overlapping in both
  * engines, and adjacent merge sites share no boundary character (the
  * classic space-separated encoding breaks there: the first match
  * consumes the space the next match needs). Word boundaries need no
  * special casing because the space character is itself a symbol
  * (`' |'`) no merge pair contains — a merge can never cross it.
  */
object Corpus {
  private def q(name: String, oracle: String,
      liveness: Seq[(String, String)] = Nil)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle), liveness)

  private def docs(s: SparkSession, dir: String): DataFrame =
    Par.spread(s, Tables.documents(s, dir), col("doc_id"))

  /** text → the trailing-`|` symbol string. The regex is intentionally
    * identical in both engines; DuckDB needs the explicit 'g' flag. */
  private val symSparkSql = """regexp_replace(trim(text), '(.)', '$1|')"""
  private val symDuckSql  = """regexp_replace(trim(text), '(.)', '\1|', 'g')"""

  // ---------------------------------------------------------------- bpe apply
  /** Apply a FIXED BPE merge table (the serving side of a trained
    * tokenizer: the merge list ships with the model; the pipeline's job
    * is applying it at corpus scale). Each merge is one `replace` over
    * the symbol string — the whole tokenizer is a chain of codegen
    * string ops: no UDF, no explode, no per-word loop, one corpus scan.
    *
    * Output per doc: symbol count before merges (= chars), BPE token
    * count after (spaces excluded — they are word separators, not
    * vocabulary), and the compression ratio in exact integer permille.
    */
  private[graft] val bpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("a", "n"), ("i", "n"), ("o", "r"),
    ("s", "t"), ("e", "r"), ("th", "e"), ("an", "d"))
  private def mergedSql(base: String): String =
    bpeMerges.foldLeft(base) { case (acc, (l, r)) =>
      s"replace($acc, '$l|$r|', '$l$r|')"
    }
  val bpeApplyOp: QueryDef = q(
    "ns_text_bpe",
    s"""SELECT doc_id,
       |  length(s0) - length(replace(s0, '|', '')) AS n_symbols,
       |  (length(s1) - length(replace(s1, '|', '')))
       |    - (length(s1) - length(replace(s1, ' ', ''))) AS n_bpe_tokens,
       |  ((length(s1) - length(replace(s1, '|', '')))
       |    - (length(s1) - length(replace(s1, ' ', '')))) * 1000
       |    // (length(s0) - length(replace(s0, '|', ''))) AS permille
       |FROM (SELECT doc_id, s0, ${mergedSql("s0")} AS s1
       |  FROM (SELECT doc_id, $symDuckSql AS s0 FROM documents))""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .withColumn("s0", expr(symSparkSql))
      .withColumn("s1", expr(mergedSql("s0")))
      .withColumn("n_symbols", length(col("s0")) - length(regexp_replace(col("s0"), "\\|", "")))
      .withColumn("n_bpe_tokens",
        (length(col("s1")) - length(regexp_replace(col("s1"), "\\|", ""))) -
          (length(col("s1")) - length(regexp_replace(col("s1"), " ", ""))))
      .select(col("doc_id"), col("n_symbols").cast("long").as("n_symbols"),
        col("n_bpe_tokens").cast("long").as("n_bpe_tokens"),
        floor(col("n_bpe_tokens").cast("long") * 1000 / col("n_symbols")).as("permille"))
  }

  // ------------------------------------------------------------ bpe fertility
  /** Tokenizer FERTILITY per language — tokens produced per whitespace
    * word, the standard multilingual tokenizer-evaluation metric (a
    * tokenizer trained on English spends more tokens per word on
    * other scripts; fertility quantifies that budget tax per corpus
    * slice). Rides the same one-scan codegen merge chain as
    * ns_text_bpe; the ratio is exact integer permille (div, no float
    * division reaches the result). */
  val bpeFertilityOp: QueryDef = q(
    "ns_bpe_fertility",
    s"""SELECT lang,
       |  CAST(sum(n_words) AS BIGINT) AS n_words,
       |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(n_bpe) * 1000 // greatest(sum(n_words), 1) AS BIGINT)
       |    AS fertility_permille
       |FROM (SELECT lang,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(string_split(trim(text), ' ')) END AS n_words,
       |    (length(s1) - length(replace(s1, '|', '')))
       |      - (length(s1) - length(replace(s1, ' ', ''))) AS n_bpe
       |  FROM (SELECT lang, text, ${mergedSql("s0")} AS s1
       |    FROM (SELECT lang, text, $symDuckSql AS s0 FROM documents)))
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .withColumn("s0", expr(symSparkSql))
      .withColumn("s1", expr(mergedSql("s0")))
      .withColumn("n_words",
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(trim(col("text")), " ")).cast("long")))
      .withColumn("n_bpe",
        ((length(col("s1")) - length(regexp_replace(col("s1"), "\\|", ""))) -
          (length(col("s1")) - length(regexp_replace(col("s1"), " ", "")))).cast("long"))
      .groupBy("lang")
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_bpe")).as("n_bpe_tokens"),
        expr("CAST(sum(n_bpe) * 1000 div greatest(sum(n_words), 1) AS BIGINT)")
          .as("fertility_permille"))
  }

  // ---------------------------------------------------------------- bpe train
  /** LEARN the merge table: `bpeTrainRounds` rounds of the canonical
    * BPE training loop — count all adjacent symbol pairs across the
    * corpus, take the most frequent (count DESC, then lexicographic —
    * the deterministic tie-break), apply it everywhere, repeat. This is
    * the honest distributed shape: each round is ONE aggregation pass
    * (pairs collapse map-side to |vocab|² counts), the argmax row —
    * and only that row — comes to the driver (the trainer's merge
    * table IS driver state), and the merge application is a codegen
    * `replace` on the next round's scan. At 100 TB each round stays a
    * single shuffle of a vocabulary-bounded pair table.
    *
    * Space pairs are excluded (word-internal BPE, the GPT-2 convention
    * of never merging across whitespace). */
  private val bpeTrainRounds = 3
  private val bpeTrainOracle: String = {
    // round k's corpus CTE rK applies merge k picked by scalar
    // subqueries against mK — the same (count DESC, pair ASC) argmax
    // the Spark side collects.
    val ctes = new StringBuilder
    ctes ++= s"WITH r0 AS (SELECT doc_id, $symDuckSql AS s FROM documents)"
    for (k <- 1 to bpeTrainRounds) {
      ctes ++=
        s""",
           |p$k AS (SELECT struct_extract(z, 1) AS l, struct_extract(z, 2) AS r, count(*) AS n
           |  FROM (SELECT unnest(list_zip(y[1:len(y) - 1], y[2:len(y)])) AS z
           |    FROM (SELECT string_split(s, '|') AS y FROM r${k - 1}))
           |  WHERE struct_extract(z, 1) <> '' AND struct_extract(z, 2) <> ''
           |    AND struct_extract(z, 1) <> ' ' AND struct_extract(z, 2) <> ' '
           |  GROUP BY 1, 2),
           |m$k AS (SELECT l, r, n FROM p$k ORDER BY n DESC, l, r LIMIT 1),
           |r$k AS (SELECT doc_id, replace(s,
           |    (SELECT l FROM m$k) || '|' || (SELECT r FROM m$k) || '|',
           |    (SELECT l FROM m$k) || (SELECT r FROM m$k) || '|') AS s
           |  FROM r${k - 1})""".stripMargin
    }
    ctes ++= "\n" + (1 to bpeTrainRounds).map { k =>
      s"SELECT CAST($k AS BIGINT) AS rank, l, r, n FROM m$k"
    }.mkString("\nUNION ALL ")
    ctes.result()
  }
  /** Checkpoint cadence for the trainer: each merge round chains one
    * more regexp_replace onto the working corpus' lineage, so at real
    * vocab sizes (30k merges) unbounded lineage would blow plan
    * compile time and stack depth long before the data is the
    * problem. Every K rounds the working corpus is re-materialized
    * via eager localCheckpoint (executor-local blocks — no lineage,
    * no driver traffic), bounding the chain at K replaces between
    * materializations. K trades recompute-on-loss against
    * plan-compile overhead; 2 here so the declared 3-round query
    * crosses a checkpoint (CorpusSpec pins checkpointed ≡
    * unchackpointed output). */
  private[graft] val bpeCheckpointEvery = 2

  /** The training loop behind ns_bpe_train, exposed for CorpusSpec:
    * `checkpointEvery` rounds between lineage re-materializations
    * (Int.MaxValue = never). */
  private[graft] def bpeTrain(s: SparkSession, dir: String, rounds: Int,
                              checkpointEvery: Int): DataFrame = {
    // Par.spread (r21, guide §2.5): EVERY training round re-runs the
    // pair explode+count over the working corpus, and the local
    // single-row-group scan ran all of it in ONE task (~400 ms/round
    // single-threaded — ProfileBench: 1.41 s construct, 3 rounds). The
    // spread parallelizes every round's map side; pair counts are
    // order-independent and the argmax tie-break is total, so the
    // learned merges are unchanged. Passthrough on wide scans at scale.
    var corpus = Par.spread(s, docs(s, dir), col("doc_id"))
      // a doc whose trimmed text is empty yields a 1-element split —
      // without the filter the pair slice length goes negative and the
      // whole query fails at runtime (the engine models empty docs
      // elsewhere: ns_cat_indices' docs_empty)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), expr(symSparkSql).as("s"))
      // materialize the ROUND-0 working corpus (r21): symbolization is
      // a per-CHARACTER regexp_replace, and every round's collect
      // re-derived it from parquet until the first cadence checkpoint
      // (rounds 1..checkpointEvery paid it repeatedly). This is the
      // same working-state materialization the checkpointEvery cadence
      // below already endorses, applied at round 0; CorpusSpec pins
      // checkpointed ≡ unchackpointed output.
      .localCheckpoint(true)
    val learned = (1 to rounds).map { k =>
      val syms = split(col("s"), "\\|")
      val top = corpus
        .select(explode(arrays_zip(
          slice(syms, lit(1), greatest(size(syms) - 2, lit(0))).as("l"),
          slice(syms, lit(2), greatest(size(syms) - 2, lit(0))).as("r"))).as("z"))
        .select(col("z.l").as("l"), col("z.r").as("r"))
        .filter(col("l") =!= "" && col("r") =!= "" && col("l") =!= " " && col("r") =!= " ")
        .groupBy("l", "r").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect()(0) // the trainer's merge table is driver state: ONE row per round
      val (l, r) = (top.getAs[String]("l"), top.getAs[String]("r"))
      corpus = corpus.withColumn("s",
        regexp_replace(col("s"), // replace() via regexp with quoting-free literals:
          lit(java.util.regex.Pattern.quote(s"$l|$r|")), lit(s"$l$r|")))
      if (k % checkpointEvery == 0 && k < rounds)
        corpus = corpus.localCheckpoint(true)
      Row(k.toLong, l, r, top.getAs[Long]("n"))
    }
    s.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(learned).asJava),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField("l", StringType, nullable = false),
        StructField("r", StringType, nullable = false),
        StructField("n", LongType, nullable = false))))
  }

  val bpeTrainOp: QueryDef = QueryDef(
    "ns_bpe_train",
    (s, dir) => bpeTrain(s, dir, bpeTrainRounds, bpeCheckpointEvery),
    Some(bpeTrainOracle))

  // -------------------------------------------------------- quality classifier
  /** A fasttext-style linear quality classifier: integer features ×
    * fixed integer micro-weights → an exact-long logit and a keep
    * decision at a fixed threshold. Real pipelines run a learned
    * (fasttext / logistic) model whose weights ship as constants — the
    * at-scale shape is exactly this: one codegen projection per row, no
    * shuffle until the decision histogram. The logit stays an exact
    * long (no sigmoid in the gated output — a transcendental there
    * would put cross-engine ulp risk in the hash), and the decision is
    * an integer comparison.
    *
    * Features: word count, stopword hits, repeated-word excess
    * (words − distinct words), and mean word length in permille. */
  private val qcStopSql = "x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'in' OR x = 'to'"

  /** The keep-side overlay (r20 gate-liveness audit): the synthetic
    * corpus's logits sit at −1.7M…−2.2M at every SF, so `keep` was the
    * constant false and the threshold branch never fired (the
    * ns_except vacuity class). One deterministic stopword-saturated
    * doc (42 words, 42 stop hits, 36 dups, wlen 2166‰ → logit
    * +813,800) replayed in BOTH engines puts a genuine keep=true row
    * in the gate at every SF. */
  private val qcKeepText = ("the of and in to a " * 7).trim

  val qualityClassifierOp: QueryDef = q(
    "ns_quality_classifier",
    s"""WITH src AS (SELECT doc_id, text FROM documents
       |  UNION ALL SELECT (SELECT max(doc_id) + 1 FROM documents),
       |    trim(repeat('the of and in to a ', 7))),
       |f AS (SELECT doc_id,
       |    len(t) AS n_words,
       |    len(list_filter(t, x -> $qcStopSql)) AS n_stop,
       |    len(t) - len(list_distinct(t)) AS n_dup,
       |    length(replace(array_to_string(t, ''), ' ', '')) * 1000 // len(t) AS wlen_pm
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM src))
       |SELECT doc_id,
       |  CAST(-2500000 + 12000 * n_words + 90000 * n_stop
       |    - 45000 * n_dup + 300 * wlen_pm AS BIGINT) AS logit_micros,
       |  (-2500000 + 12000 * n_words + 90000 * n_stop
       |    - 45000 * n_dup + 300 * wlen_pm) >= 0 AS keep
       |FROM f""".stripMargin,
    liveness = Seq(
      "both_decision_branches_live" ->
        ("SELECT count(CASE WHEN keep THEN 1 END) > 0 AND " +
          "count(CASE WHEN NOT keep THEN 1 END) > 0 FROM r"))) { (s, dir) =>
    import s.implicits._
    val t = split(trim(col("text")), " ")
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val keepRow = Seq((1L, qcKeepText)).toDF("ord", "text")
      .crossJoin(broadcast(base.agg(max(col("doc_id")).as("mx"))))
      .select((col("mx") + col("ord")).as("doc_id"), col("text"))
    base.unionByName(keepRow)
      .withColumn("n_words", size(t).cast("long"))
      .withColumn("n_stop", size(filter(t, x =>
        x === "the" || x === "a" || x === "of" || x === "and" || x === "in" || x === "to"))
        .cast("long"))
      .withColumn("n_dup", (size(t) - size(array_distinct(t))).cast("long"))
      .withColumn("wlen_pm",
        floor(length(regexp_replace(array_join(t, ""), " ", "")) * lit(1000L) / size(t)))
      .withColumn("logit_micros",
        lit(-2500000L) + lit(12000L) * col("n_words") + lit(90000L) * col("n_stop")
          - lit(45000L) * col("n_dup") + lit(300L) * col("wlen_pm"))
      .select(col("doc_id"), col("logit_micros"), (col("logit_micros") >= 0L).as("keep"))
  }

  // ---------------------------------------------------------- embedding whiten
  /** Per-dimension embedding standardization (z-scoring) — the whiten
    * step run before quantization/ANN indexing so no dimension
    * dominates the metric. Moments accumulate over the ×1000-quantized
    * integer components (the established embedding-parity quantization,
    * native QuantizeVec), so the per-dim sums are exact longs and
    * order-free; each z-score is ONE shared double derivation
    * (long-exact numerator, sqrt is IEEE-correctly-rounded), round(6).
    *
    * Scale shape: the stats pass slices to the dims under inspection
    * BEFORE exploding, collapses map-side to |dims| rows, and the
    * |dims|-row moment table broadcasts back onto the second pass —
    * corpus never shuffles. */
  private val whitenDims = 8
  val embeddingWhitenOp: QueryDef = q(
    "ns_embedding_whiten",
    s"""WITH eq AS (SELECT vec_id, i AS d,
       |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000, 0) AS BIGINT) AS q
       |  FROM embeddings, (SELECT unnest(generate_series(0, ${whitenDims - 1})) AS i)),
       |m AS (SELECT d, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS sq,
       |    CAST(sum(q * q) AS BIGINT) AS qq
       |  FROM eq GROUP BY 1)
       |SELECT vec_id, d,
       |  round((q * n - sq) / sqrt(CAST(n AS DOUBLE) * qq - CAST(sq AS DOUBLE) * sq), 6) AS z_r
       |FROM eq JOIN m USING (d)""".stripMargin) { (s, dir) =>
    val emb = Par.spread(s, Tables.embeddings(s, dir), col("vec_id"))
    val eq = emb.select(col("vec_id"),
      posexplode(slice(graft.expr.VecFunctions.quantize_vec(col("embedding")), 1, whitenDims)))
      .select(col("vec_id"), col("pos").cast("long").as("d"), col("col").as("q"))
    val m = eq.groupBy("d").agg(
      count(lit(1)).as("n"), sum(col("q")).as("sq"), sum(col("q") * col("q")).as("qq"))
    eq.join(broadcast(m), "d")
      .select(col("vec_id"), col("d"),
        expr("round((q * n - sq) / sqrt(CAST(n AS DOUBLE) * qq - CAST(sq AS DOUBLE) * sq), 6)")
          .as("z_r"))
  }

  // ------------------------------------------------------------ gopher rules
  /** The published Gopher document-quality rules (Rae et al. 2021,
    * §A1.1 — the rule set most large-corpus pipelines start from):
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    * alphabetic-word fraction, and the minimum-stop-word requirement.
    * Every rule is evaluated in EXACT INTEGER arithmetic — "mean word
    * length in [3,10]" is 300·n_words ≤ 100·n_wchars ≤ 1000·n_words,
    * "≥80% alphabetic" is 5·n_alpha ≥ 4·n_words — so no division ever
    * reaches a comparison and both engines agree bit-exactly. One
    * codegen corpus pass: counts come from length/replace/regexp_count,
    * stop-word presence from substring search on the padded text; no
    * explode, no UDF, no shuffle at all (verdict is per-document). */
  private val gopherStops = Seq("the", "of", "to", "and", "a", "in", "is", "that")

  /** Rule-violating overlays (r20 gate-liveness audit): the synthetic
    * corpus passes r_mwl, r_alpha and r_sym for EVERY document at
    * every SF, so those three Gopher rejection rules never fired
    * (constant-1 columns — the generic liveness check). Three
    * deterministic violators, replayed in BOTH engines via repeat()
    * (identical semantics in Spark and DuckDB), make each rule reject
    * at least once everywhere: short-words (mean word length 2 < 3),
    * numeric words (alpha fraction ≪ 80%), and a #-dense doc
    * (10·n_sym > n_words). */
  private val gopherOverlay = Seq(
    (1L, ("ab " * 60) + "the of"),
    (2L, ("12345 " * 55) + "the of"),
    (3L, ("graft# engine works fine today " * 12).trim)
  )
  private val gopherOverlaySql =
    """UNION ALL SELECT (SELECT max(doc_id) FROM documents) + v.ord, v.text
      |  FROM (VALUES (1, repeat('ab ', 60) || 'the of'),
      |               (2, repeat('12345 ', 55) || 'the of'),
      |               (3, trim(repeat('graft# engine works fine today ', 12))))
      |    AS v(ord, text)""".stripMargin

  val gopherOp: QueryDef = q(
    "ns_quality_gopher",
    s"""WITH src AS (SELECT doc_id, text FROM documents
       |  $gopherOverlaySql),
       |c AS (SELECT doc_id, trim(text) AS t FROM src),
       |n AS (SELECT doc_id,
       |    CAST(len(str_split(t, ' ')) AS BIGINT) AS n_words,
       |    CAST(length(replace(t, ' ', '')) AS BIGINT) AS n_wchars,
       |    CAST(len(regexp_extract_all(' ' || t, ' [^ ]*[a-zA-Z]')) AS BIGINT) AS n_alpha,
       |    CAST(length(t) - length(replace(t, '#', ''))
       |      + 3 * len(regexp_extract_all(t, '\\.\\.\\.')) AS BIGINT) AS n_sym,
       |    CAST(${gopherStops.map(w =>
              s"(CASE WHEN position(' $w ' IN ' ' || t || ' ') > 0 THEN 1 ELSE 0 END)")
              .mkString(" + ")} AS BIGINT) AS n_stop
       |  FROM c)
       |SELECT doc_id, n_words, n_wchars, n_alpha, n_stop,
       |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_words,
       |  CAST(CASE WHEN 300 * n_words <= 100 * n_wchars
       |    AND 100 * n_wchars <= 1000 * n_words THEN 1 ELSE 0 END AS BIGINT) AS r_mwl,
       |  CAST(CASE WHEN 5 * n_alpha >= 4 * n_words THEN 1 ELSE 0 END AS BIGINT) AS r_alpha,
       |  CAST(CASE WHEN 10 * n_sym <= n_words THEN 1 ELSE 0 END AS BIGINT) AS r_sym,
       |  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
       |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000
       |    AND 300 * n_words <= 100 * n_wchars AND 100 * n_wchars <= 1000 * n_words
       |    AND 5 * n_alpha >= 4 * n_words
       |    AND 10 * n_sym <= n_words
       |    AND n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS pass
       |FROM n""".stripMargin,
    liveness = Seq(
      "every_gopher_rule_rejects_and_accepts" ->
        ("SELECT min(r_words) < max(r_words) AND min(r_mwl) < max(r_mwl) AND " +
          "min(r_alpha) < max(r_alpha) AND min(r_sym) < max(r_sym) AND " +
          "min(r_stop) < max(r_stop) AND min(pass) < max(pass) FROM r"))) { (s, dir) =>
    import s.implicits._
    val t = trim(col("text"))
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val violators = gopherOverlay.toDF("ord", "text")
      .crossJoin(broadcast(base.agg(max(col("doc_id")).as("mx"))))
      .select((col("mx") + col("ord")).as("doc_id"), col("text"))
    val counted = base.unionByName(violators).select(
      col("doc_id"),
      size(split(t, " ")).cast("long").as("n_words"),
      length(regexp_replace(t, " ", "")).cast("long").as("n_wchars"),
      regexp_count(concat(lit(" "), t), lit(" [^ ]*[a-zA-Z]")).cast("long").as("n_alpha"),
      (length(t) - length(regexp_replace(t, "#", ""))
        + lit(3) * regexp_count(t, lit("\\.\\.\\."))).cast("long").as("n_sym"),
      gopherStops.map(w =>
        when(instr(concat(lit(" "), t, lit(" ")), s" $w ") > 0, 1L).otherwise(0L))
        .reduce(_ + _).as("n_stop"))
    val rWords = col("n_words").between(50L, 100000L)
    val rMwl = lit(300) * col("n_words") <= lit(100) * col("n_wchars") &&
      lit(100) * col("n_wchars") <= lit(1000) * col("n_words")
    val rAlpha = lit(5) * col("n_alpha") >= lit(4) * col("n_words")
    val rSym = lit(10) * col("n_sym") <= col("n_words")
    val rStop = col("n_stop") >= 2L
    def flag(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
    counted.select(col("doc_id"), col("n_words"), col("n_wchars"), col("n_alpha"), col("n_stop"),
      flag(rWords).as("r_words"), flag(rMwl).as("r_mwl"), flag(rAlpha).as("r_alpha"),
      flag(rSym).as("r_sym"), flag(rStop).as("r_stop"),
      flag(rWords && rMwl && rAlpha && rSym && rStop).as("pass"))
  }

  // --------------------------------------------------------------- url dedup
  /** Crawl-style URL deduplication — the step every web-corpus pipeline
    * (CommonCrawl/RefinedWeb lineage) runs before content dedup: URLs
    * normalize (query string and tracking suffixes stripped, case
    * folded) and collapse to one canonical row carrying the occurrence
    * count, distinct-user reach, and the FIRST fetch (min over the
    * unique ms·2^20+event_id key — the crawl's keep-first rule). One
    * codegen normalize pass + one hash aggregate on the normalized key;
    * at 100 TB the shuffle carries one row per distinct URL, not per
    * fetch (map-side combine collapses repeats early). */
  val urlDedupOp: QueryDef = QueryDef(
    "ns_url_dedup",
    (s, dir) => Synth.accessLog(s, dir)
      .select(
        lower(regexp_replace(split(col("url"), "\\?").getItem(0), "\\.html$", ""))
          .as("path_norm"),
        col("user_id"),
        (col("ts_ms") * 1048576L + col("event_id")).as("ok"))
      .groupBy("path_norm")
      .agg(count(lit(1)).as("n_fetches"),
        countDistinct(col("user_id")).as("n_users"),
        shiftright(min(col("ok")), 20).as("first_ms")),
    Some(Synth.withAccessLog(
      """SELECT lower(regexp_replace(str_split(url, '?')[1], '\.html$', '')) AS path_norm,
        |  count(*) AS n_fetches,
        |  count(DISTINCT user_id) AS n_users,
        |  min(epoch_ms(ts) * 1048576 + event_id) // 1048576 AS first_ms
        |FROM access_log GROUP BY 1""".stripMargin)))

  def entries: Seq[QueryDef] = Seq(
    bpeApplyOp, bpeFertilityOp, bpeTrainOp, qualityClassifierOp,
    embeddingWhitenOp, gopherOp, urlDedupOp)
}
