package graft.ops

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The OpenSearch aggregation residue beyond ops/Relational.scala: the
  * bucket/metric aggs a Kibana dashboard over the reference's ES
  * downstream (docker-compose.yml:1-55, axway-ingest.json) still reaches
  * for — `filters`, `multi_terms`, `auto_date_histogram`, `rate`,
  * `sampler`/`diversified_sampler`, `string_stats`,
  * `median_absolute_deviation`, `boxplot`, `t_test`.
  *
  * Shared determinism discipline (FIXTURES.md): every accumulated moment
  * is an exact integer (cents / cents² on the DECIMAL(38) guard,
  * character counts, epoch-ms), and each double emerges from ONE shared
  * derivation text both engines evaluate; transcendental-fed folds run in
  * a sorted fixed order so accumulation order can never diverge.
  */
object AggsExt {
  private def q(name: String, oracle: String,
      liveness: Seq[(String, String)] = Nil)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle), liveness)

  // ---------------------------------------------------------------- filters
  /** The OpenSearch `filters` aggregation: named, possibly-overlapping
    * predicate buckets plus the `other_bucket` of rows matching none —
    * the "errors vs big-ticket vs everything else" dashboard row.
    *
    * Scale shape: ONE codegen pass conditional-summing every named
    * bucket's count and cents sum in a single aggregate (the
    * adjacency_matrix discipline, diagonal only) — no per-filter scan,
    * no union of branches — then a constant-size stack() unpivot into
    * ES's bucket rows. Shuffle carries one wide row per map task. */
  private val filterDefs: Seq[(String, Column, String)] = Seq(
    ("errors", col("event_type") === "error", "event_type = 'error'"),
    ("big_value", col("value") >= 200, "value >= 200"),
    ("purchases", col("event_type") === "purchase", "event_type = 'purchase'"),
    ("other", col("event_type") =!= "error" && col("event_type") =!= "purchase" &&
      col("value") < 200,
      "event_type <> 'error' AND event_type <> 'purchase' AND value < 200"))
  val filtersAgg: QueryDef = q(
    "ns_agg_filters",
    s"""WITH m AS (SELECT
       |  ${filterDefs.zipWithIndex.map { case ((_, _, sql), i) =>
             s"count(*) FILTER (WHERE $sql) AS n$i,\n  CAST(coalesce(sum(${sqlCents("value")}) FILTER (WHERE $sql), 0) AS BIGINT) AS s$i"
           }.mkString(",\n  ")}
       |  FROM events)
       |${filterDefs.zipWithIndex.map { case ((name, _, _), i) =>
             s"SELECT '$name' AS bucket, n$i AS doc_count, s$i AS sum_value_c FROM m"
           }.mkString("\nUNION ALL ")}""".stripMargin,
    // every named filter bucket — including the catch-all other — takes
    // documents
    liveness = Seq(
      "every_filter_bucket_populated" ->
        s"SELECT min(doc_count) > 0 AND count(*) = ${filterDefs.size} FROM r")) { (s, dir) =>
    val aggCols = filterDefs.zipWithIndex.flatMap { case ((_, c, _), i) =>
      Seq(sum(when(c, 1L).otherwise(0L)).as(s"n$i"),
        sum(when(c, cents(col("value"))).otherwise(0L)).as(s"s$i"))
    }
    val stackArgs = filterDefs.zipWithIndex
      .map { case ((name, _, _), i) => s"'$name', n$i, s$i" }.mkString(", ")
    Tables.events(s, dir)
      .agg(aggCols.head, aggCols.tail: _*)
      .select(expr(s"stack(${filterDefs.size}, $stackArgs) AS (bucket, doc_count, sum_value_c)"))
  }

  // ------------------------------------------------------------ multi_terms
  /** The OpenSearch `multi_terms` aggregation: buckets keyed by a
    * composite of two fields, ordered by doc count, top-N — the
    * "top (type, cohort) combinations" table. The deterministic
    * tie-break (count desc, then both keys asc) is part of the
    * contract; the N-row cutoff compiles to TakeOrderedAndProject over
    * the aggregated bucket table, never a global sort. */
  val multiTermsAgg: QueryDef = q(
    "ns_agg_multi_terms",
    s"""SELECT event_type, user_id % 10 AS cohort, count(*) AS doc_count,
       |  ${sqlSum(sqlCents("value"))} AS sum_value_c
       |FROM events GROUP BY 1, 2
       |ORDER BY doc_count DESC, event_type, cohort LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"), (col("user_id") % 10).as("cohort"))
      .agg(count(lit(1)).as("doc_count"), sum(cents(col("value"))).as("sum_value_c"))
      .orderBy(col("doc_count").desc, col("event_type"), col("cohort"))
      .limit(10)
  }

  // ---------------------------------------------------- auto_date_histogram
  /** The OpenSearch `auto_date_histogram`: the engine picks the bucket
    * interval from a fixed ladder so the bucket count stays at or under
    * the target (40 here) — the "just show me a sensible time axis"
    * agg. Interval choice is pure integer epoch-ms arithmetic off the
    * data's min/max, so both engines pick identically; bucket keys are
    * epoch-aligned `(ts_ms div iv) * iv` — exact.
    *
    * Scale shape: one bounds aggregate (a single row — at real scale
    * this is parquet footer min/max stats), broadcast onto the corpus
    * pass; the output is ≤ target buckets BY CONSTRUCTION at any SF —
    * the whole point of the agg. Two scans total, both pruned to
    * (ts, value). */
  private val adhLadderMs = Seq(3600000L, 10800000L, 43200000L, 86400000L,
    604800000L, 2592000000L)
  private val adhTarget = 40
  private def adhPickSql(span: String): String =
    adhLadderMs.init.map { iv =>
      s"WHEN $span <= ${iv * adhTarget} THEN $iv"
    }.mkString("CASE ", " ", s" ELSE ${adhLadderMs.last} END")
  val autoDateHistogramAgg: QueryDef = q(
    "ns_agg_auto_date_histogram",
    s"""WITH b AS (SELECT min(epoch_ms(ts)) AS lo, max(epoch_ms(ts)) AS hi FROM events),
       |p AS (SELECT ${adhPickSql("hi - lo")} AS iv_ms FROM b)
       |SELECT (epoch_ms(ts) // iv_ms) * iv_ms AS bucket_ms, iv_ms,
       |  count(*) AS n, ${sqlSum(sqlCents("value"))} AS sum_value_c
       |FROM events, p GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    val pick = e.agg(min(col("ts_ms")).as("lo"), max(col("ts_ms")).as("hi"))
      .select(expr(adhPickSql("hi - lo")).as("iv_ms"))
    e.crossJoin(broadcast(pick))
      .groupBy(expr("(ts_ms div iv_ms) * iv_ms").as("bucket_ms"), col("iv_ms"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
  }

  // ------------------------------------------------------------------- rate
  /** The OpenSearch `rate` aggregation inside a date_histogram: bucket
    * sums rescaled to a per-`unit` rate (unit=hour under day buckets →
    * ÷24). The division is the single shared derivation over exact
    * integer bucket moments. */
  val rateAgg: QueryDef = q(
    "ns_agg_rate",
    s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       |  count(*) AS n,
       |  round(CAST(count(*) AS DOUBLE) / 24, 6) AS docs_per_hour,
       |  round(CAST(${sqlSum(sqlCents("value"))} AS DOUBLE) / 100 / 24, 6) AS value_per_hour
       |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
      .select(col("day"), col("event_type"), col("n"),
        round(col("n").cast("double") / 24, 6).as("docs_per_hour"),
        round(col("sum_c").cast("double") / 100 / 24, 6).as("value_per_hour"))
  }

  // ---------------------------------------------------------------- sampler
  /** The OpenSearch `sampler` aggregation: restrict sub-aggs to the
    * best `shard_size` documents (here: longest, doc_id tie-break —
    * the deterministic stand-in for score order), then aggregate the
    * sample. The cutoff compiles to TakeOrderedAndProject — k·tasks
    * rows move, never a global sort — and the terms sub-agg runs over
    * ≤ 200 rows at any SF. */
  private val samplerK = 200
  val samplerAgg: QueryDef = q(
    "ns_agg_sampler",
    s"""WITH s AS (SELECT source, n_chars FROM documents
       |  ORDER BY n_chars DESC, doc_id LIMIT $samplerK)
       |SELECT source, count(*) AS n, ${sqlSum("n_chars")} AS sum_chars
       |FROM s GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(samplerK)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
  }

  /** The `diversified_sampler` twin: at most `maxPerKey` docs per
    * diversity key (lang) before the sub-agg — the "don't let one
    * language swamp the sample" guard. The per-key cutoff runs through
    * the bounded TopKByScoreAgg (≤ k entries per key per map task,
    * row_number-identical order), NOT a row_number window — no giant
    * per-key sort partitions form at scale. The selected-id set
    * (≤ k·|langs| rows) broadcasts back onto the corpus scan. */
  private val diversifiedK = 40
  val diversifiedSamplerAgg: QueryDef = q(
    "ns_agg_diversified_sampler",
    s"""WITH r AS (SELECT doc_id, source, n_chars,
       |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM documents)
       |SELECT source, count(*) AS n, ${sqlSum("n_chars")} AS sum_chars
       |FROM r WHERE rn <= $diversifiedK GROUP BY 1""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir)
    val sel = d.groupBy("lang")
      .agg(graft.expr.VecFunctions.topk_by_score(
        col("doc_id"), col("n_chars").cast("double"), diversifiedK).as("top"))
      .select(explode(col("top.id")).as("doc_id"))
    d.join(broadcast(sel), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
  }

  // ------------------------------------------------------------ string_stats
  /** The OpenSearch `string_stats` aggregation (per lang over `source`):
    * count, min/max/avg length, and the Shannon character entropy.
    *
    * Determinism: lengths and character counts accumulate as exact
    * longs; entropy's Σ c·log2(c) — the one transcendental-fed sum —
    * folds over the SORTED count list (sort_array + a left-fold
    * `aggregate` in Spark, list_sort + list_reduce in DuckDB), so both
    * engines add identical terms in identical order; H = log2(N) − S/N
    * is one shared derivation, round(6).
    *
    * Scale shape: the char explode amplifies by avg value length
    * (bounded — it's a keyword field), then collapses immediately into
    * (bucket, char) counts via map-side partials; the per-bucket fold
    * runs over ≤ |alphabet| elements. One corpus pass for lengths, one
    * for chars. */
  val stringStatsAgg: QueryDef = q(
    "ns_agg_string_stats",
    """WITH ch AS (SELECT lang, unnest(string_split(source, '')) AS c FROM documents),
      |cc AS (SELECT lang, c, count(*) AS cnt FROM ch WHERE c <> '' GROUP BY 1, 2),
      |ent AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS nch,
      |    list_reduce(list_prepend(0.0, list_transform(list_sort(list(cnt)),
      |      x -> CAST(x AS DOUBLE) * log2(CAST(x AS DOUBLE)))), (a, b) -> a + b) AS sterm
      |  FROM cc GROUP BY 1),
      |base AS (SELECT lang, count(*) AS n, min(length(source)) AS min_length,
      |    max(length(source)) AS max_length,
      |    CAST(sum(length(source)) AS BIGINT) AS total_chars
      |  FROM documents GROUP BY 1)
      |SELECT base.lang, n, min_length, max_length,
      |  round(CAST(total_chars AS DOUBLE) / n, 6) AS avg_length,
      |  round(log2(CAST(nch AS DOUBLE)) - sterm / nch, 6) AS entropy
      |FROM base JOIN ent ON base.lang = ent.lang""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir)
    val base = d.groupBy("lang").agg(
      count(lit(1)).as("n"),
      min(length(col("source"))).as("min_length"),
      max(length(col("source"))).as("max_length"),
      sum(length(col("source")).cast("long")).as("total_chars"))
    val ent = d.select(col("lang"), explode(split(col("source"), "")).as("c"))
      .filter(col("c") =!= "")
      .groupBy("lang", "c").agg(count(lit(1)).as("cnt"))
      .groupBy("lang").agg(
        sum(col("cnt")).as("nch"),
        aggregate(sort_array(collect_list(col("cnt"))), lit(0.0),
          (acc, c) => acc + c.cast("double") * log2(c.cast("double"))).as("sterm"))
    base.join(ent, "lang")
      .select(col("lang"), col("n"), col("min_length"), col("max_length"),
        round(col("total_chars").cast("double") / col("n"), 6).as("avg_length"),
        round(log2(col("nch").cast("double")) - col("sterm") / col("nch"), 6).as("entropy"))
  }

  // ---------------------------------------------- median_absolute_deviation
  /** The OpenSearch `median_absolute_deviation`: median of |x − median|
    * per bucket — the robust dispersion metric. Exactness: values live
    * in DOUBLED cents, so the interpolated median of integers (k or
    * k+0.5 → integer in the 2× domain) and every |c2 − med2| deviation
    * are exactly-representable integer-valued doubles; only the final
    * ÷200 is a derivation, shared by both engines.
    *
    * Scale shape: two sort-based percentile aggregates with the tiny
    * per-bucket median table broadcast back between them — the exact
    * twin; `ns_agg_percentile_approx` is the declared sketch path at
    * 100 TB. */
  val madAgg: QueryDef = q(
    "ns_agg_median_absolute_deviation",
    s"""WITH c AS (SELECT event_type, ${sqlCents("value")} * 2 AS c2 FROM events),
       |m AS (SELECT event_type, quantile_cont(c2, 0.5) AS med2 FROM c GROUP BY 1),
       |d AS (SELECT c.event_type, med2, abs(c2 - med2) AS dev2
       |  FROM c JOIN m ON c.event_type = m.event_type)
       |SELECT event_type, round(min(med2) / 200, 6) AS median,
       |  round(quantile_cont(dev2, 0.5) / 200, 6) AS mad
       |FROM d GROUP BY 1""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("event_type"), (cents(col("value")) * 2).as("c2"))
    val med = e.groupBy("event_type").agg(expr("percentile(c2, 0.5D)").as("med2"))
    e.join(broadcast(med), "event_type")
      .withColumn("dev2", abs(col("c2") - col("med2")))
      .groupBy("event_type")
      .agg(round(min(col("med2")) / 200, 6).as("median"),
        round(expr("percentile(dev2, 0.5D)") / 200, 6).as("mad"))
  }

  // ---------------------------------------------------------------- boxplot
  /** The OpenSearch `boxplot` aggregation: min/max/q1/q2/q3 + IQR per
    * bucket. Quartiles interpolate over exact integer cents (one
    * value-multiset buffer serves all three — the ns_agg_percentile
    * discipline); each emitted double is one shared ÷100 derivation. */
  val boxplotAgg: QueryDef = q(
    "ns_agg_boxplot",
    s"""SELECT event_type, min(value) AS min_value, max(value) AS max_value,
       |  round(quantile_cont(${sqlCents("value")}, 0.25) / 100, 6) AS q1,
       |  round(quantile_cont(${sqlCents("value")}, 0.5) / 100, 6) AS q2,
       |  round(quantile_cont(${sqlCents("value")}, 0.75) / 100, 6) AS q3,
       |  round((quantile_cont(${sqlCents("value")}, 0.75)
       |       - quantile_cont(${sqlCents("value")}, 0.25)) / 100, 6) AS iqr
       |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("c", cents(col("value")))
      .groupBy("event_type")
      .agg(min(col("value")).as("min_value"), max(col("value")).as("max_value"),
        expr("percentile(c, array(0.25D, 0.5D, 0.75D))").as("ps"))
      .select(col("event_type"), col("min_value"), col("max_value"),
        round(col("ps").getItem(0) / 100, 6).as("q1"),
        round(col("ps").getItem(1) / 100, 6).as("q2"),
        round(col("ps").getItem(2) / 100, 6).as("q3"),
        round((col("ps").getItem(2) - col("ps").getItem(0)) / 100, 6).as("iqr"))
  }

  // ----------------------------------------------------------------- t_test
  /** The OpenSearch `t_test` aggregation (heteroscedastic / Welch):
    * is the click-value mean different from the error-value mean, per
    * cohort? All five moments per side (n, Σc, Σc² — squares on the
    * DECIMAL(38) guard) accumulate exactly in ONE conditional-sum pass
    * (the adjacency_matrix/filters discipline — no per-sample scan),
    * and the t statistic is a single shared derivation text. */
  private val tTestDerive: String =
    """round((CAST(sa_c AS DOUBLE) / na - CAST(sb_c AS DOUBLE) / nb) /
      | sqrt((CAST(na AS DOUBLE) * qa_c2 - CAST(sa_c AS DOUBLE) * sa_c)
      |         / (CAST(na AS DOUBLE) * na - na) / na
      |     + (CAST(nb AS DOUBLE) * qb_c2 - CAST(sb_c AS DOUBLE) * sb_c)
      |         / (CAST(nb AS DOUBLE) * nb - nb) / nb), 6)""".stripMargin.replace("\n", " ")
  val tTestAgg: QueryDef = q(
    "ns_agg_t_test",
    s"""WITH m AS (SELECT user_id % 3 AS cohort,
       |  count(*) FILTER (WHERE event_type = 'click') AS na,
       |  CAST(coalesce(sum(${sqlCents("value")}) FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS sa_c,
       |  CAST(coalesce(sum(CAST(${sqlCents("value")} AS HUGEINT) * ${sqlCents("value")})
       |    FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS qa_c2,
       |  count(*) FILTER (WHERE event_type = 'error') AS nb,
       |  CAST(coalesce(sum(${sqlCents("value")}) FILTER (WHERE event_type = 'error'), 0) AS BIGINT) AS sb_c,
       |  CAST(coalesce(sum(CAST(${sqlCents("value")} AS HUGEINT) * ${sqlCents("value")})
       |    FILTER (WHERE event_type = 'error'), 0) AS BIGINT) AS qb_c2
       |FROM events GROUP BY 1)
       |SELECT cohort, na, nb, $tTestDerive AS t FROM m""".stripMargin) { (s, dir) =>
    val c = cents(col("value"))
    val isA = col("event_type") === "click"
    val isB = col("event_type") === "error"
    Tables.events(s, dir)
      .groupBy((col("user_id") % 3).as("cohort"))
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("na"),
        sumExact(when(isA, c).otherwise(0L)).as("sa_c"),
        sumExact(when(isA, c * c).otherwise(0L)).as("qa_c2"),
        sum(when(isB, 1L).otherwise(0L)).as("nb"),
        sumExact(when(isB, c).otherwise(0L)).as("sb_c"),
        sumExact(when(isB, c * c).otherwise(0L)).as("qb_c2"))
      .select(col("cohort"), col("na"), col("nb"), expr(tTestDerive).as("t"))
  }

  // --------------------------------------------------------- pipeline aggs
  // The ES pipeline-agg family beyond ns_date_histogram_pipeline's
  // derivative/moving-avg/cumsum: every one of these computes over the
  // AGGREGATED daily bucket table (series × days rows — dashboard-sized
  // at any SF), never raw events, with windows partitioned per series.

  /** `bucket_script`: a per-bucket metric derived from sibling
    * aggregations — the error-rate panel (errors ÷ total per day).
    * Sibling metrics are exact conditional longs from ONE corpus pass
    * (the filters discipline); the ratio is the single shared
    * derivation. */
  val bucketScriptAgg: QueryDef = q(
    "ns_agg_bucket_script",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |  count(*) AS n,
      |  count(*) FILTER (WHERE event_type = 'error') AS n_err,
      |  round(CAST(count(*) FILTER (WHERE event_type = 'error') AS DOUBLE)
      |        / count(*), 6) AS error_rate
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
      .select(col("day"), col("n"), col("n_err"),
        round(col("n_err").cast("double") / col("n"), 6).as("error_rate"))
  }

  /** `bucket_selector`: drop buckets failing a metric predicate — the
    * "only show days where purchases underperformed" HAVING clause.
    * The predicate runs on exact integer bucket moments, above the
    * aggregate (a filter over |buckets| rows, free at any SF). */
  val bucketSelectorAgg: QueryDef = q(
    "ns_agg_bucket_selector",
    s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       |  count(*) AS n, ${sqlSum(sqlCents("value"))} AS sum_value_c
       |FROM events GROUP BY 1, 2
       |HAVING ${sqlSum(sqlCents("value"))} < 100 * count(*) * 100""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      // avg value < 100, phrased as an exact integer comparison
      .filter(col("sum_value_c") < lit(100L) * col("n") * 100L)
  }

  /** `bucket_sort`: order sibling buckets by a metric and keep the top
    * page — "the 5 busiest days". Over the aggregated table the cutoff
    * compiles to TakeOrderedAndProject, the same heap the raw-row topk
    * uses; deterministic day tie-break. */
  val bucketSortAgg: QueryDef = q(
    "ns_agg_bucket_sort",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
      |FROM events GROUP BY 1
      |ORDER BY n DESC, day LIMIT 5""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("day"))
      .limit(5)
  }

  /** `serial_diff` (lag 7): week-over-week change per series — the
    * seasonality-removing twin of the lag-1 derivative already in
    * ns_date_histogram_pipeline. Exact long subtraction over the
    * bucket table, window partitioned per event_type. */
  val serialDiffAgg: QueryDef = q(
    "ns_agg_serial_diff",
    """WITH b AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type, n,
      |  n - lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS wow
      |FROM b""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day")
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("wow", col("n") - lag("n", 7).over(w))
  }

  /** The `derivative` pipeline aggregation — serial_diff's named lag-1
    * sibling, WITH the `unit` option ES adds: the per-bucket change
    * and the unit-scaled rate (here per-hour, via exact milli-rate
    * integers: 1000·Δ/24h stays a rounded long both engines compute
    * identically). Same span-bounded shape: the window orders the
    * |days|×|types| bucket table, never raw events. */
  val derivativeAgg: QueryDef = q(
    "ns_agg_derivative",
    s"""WITH b AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       |    ${sqlSum(sqlCents("value"))} AS v
       |  FROM events GROUP BY 1, 2)
       |SELECT day, event_type, v,
       |  v - lag(v) OVER (PARTITION BY event_type ORDER BY day) AS deriv,
       |  CAST(round(CAST((v - lag(v) OVER (PARTITION BY event_type ORDER BY day))
       |    AS DOUBLE) * 1000 / 24, 0) AS BIGINT) AS rate_per_hour_milli
       |FROM b""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day")
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"), col("event_type"))
      .agg(sum(cents(col("value"))).as("v"))
      .withColumn("deriv", col("v") - lag("v", 1).over(w))
      .withColumn("rate_per_hour_milli",
        round(col("deriv").cast("double") * 1000 / 24, 0).cast("long"))
  }

  /** `cumulative_cardinality`: distinct users seen up to each day —
    * the "total unique users over time" growth curve.
    *
    * Scale shape: the naive form (count-distinct inside an expanding
    * window) rescans history per bucket; the at-scale identity is
    * FIRST-SEEN attribution — one shuffle by user for min(day), a
    * |days|-bounded first-seen histogram, and a running sum over that
    * tiny table. The one unpartitioned window orders |days| rows. */
  val cumulativeCardinalityAgg: QueryDef = q(
    "ns_agg_cumulative_cardinality",
    """WITH fs AS (SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS day
      |  FROM events GROUP BY 1),
      |d AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1)
      |SELECT day, new_users,
      |  CAST(sum(new_users) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM d""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wc = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(min(date_trunc("day", col("tsu")).cast("date")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum("new_users").over(wc))
  }

  /** The ES `normalize` pipeline agg, method percent_of_sum: each
    * bucket's share of its day's total. The ratio is exact-long ÷
    * exact-long once per bucket; the window runs over the |days ×
    * types| bucket table, partitioned per day. */
  val bucketNormalizeAgg: QueryDef = q(
    "ns_agg_bucket_normalize",
    """WITH b AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type, n,
      |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY day), 6) AS pct_of_day
      |FROM b""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("pct_of_day",
        round(col("n").cast("double") / sum("n").over(Window.partitionBy("day")), 6))
  }

  /** The ES `stats_bucket` sibling-pipeline agg: min/max/avg/sum/count
    * OVER the daily buckets (one output row). The second aggregate
    * reads |days| rows — free at any SF. */
  val statsBucketAgg: QueryDef = q(
    "ns_agg_stats_bucket",
    """WITH b AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1)
      |SELECT count(*) AS n_buckets, CAST(min(n) AS BIGINT) AS min_n,
      |  CAST(max(n) AS BIGINT) AS max_n, CAST(sum(n) AS BIGINT) AS sum_n,
      |  round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS avg_n
      |FROM b""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets"), min("n").as("min_n"), max("n").as("max_n"),
        sum("n").as("sum_n"))
      .select(col("n_buckets"), col("min_n"), col("max_n"), col("sum_n"),
        round(col("sum_n").cast("double") / col("n_buckets"), 6).as("avg_n"))
  }

  /** `cumulative_sum` — the running-total pipeline agg (the second most
    * common pipeline agg after derivative): per-day counts accumulated
    * over the bucket axis. The one unpartitioned window orders the
    * |days|-bounded BUCKET table, never the corpus (the pipeline-agg
    * discipline every sibling here follows). */
  val cumulativeSumAgg: QueryDef = q(
    "ns_agg_cumulative_sum",
    """WITH b AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1)
      |SELECT day, n,
      |  CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
      |FROM b""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum_n", sum(col("n")).over(w))
  }

  /** `extended_stats_bucket` — stats_bucket plus the second-moment
    * outputs (sum_of_squares, population variance, std deviation).
    * Moments accumulate as EXACT longs (n and n² sums); the
    * variance/std doubles derive once from those longs via the same
    * formula text in both engines. */
  val extendedStatsBucketAgg: QueryDef = q(
    "ns_agg_extended_stats_bucket",
    """WITH b AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1)
      |SELECT count(*) AS n_buckets, CAST(sum(n) AS BIGINT) AS sum_n,
      |  CAST(sum(n * n) AS BIGINT) AS sum_of_squares,
      |  round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS avg_n,
      |  round(CAST(sum(n * n) AS DOUBLE) / count(*)
      |    - (CAST(sum(n) AS DOUBLE) / count(*)) * (CAST(sum(n) AS DOUBLE) / count(*)), 6)
      |    AS variance,
      |  round(sqrt(CAST(sum(n * n) AS DOUBLE) / count(*)
      |    - (CAST(sum(n) AS DOUBLE) / count(*)) * (CAST(sum(n) AS DOUBLE) / count(*))), 6)
      |    AS std_deviation
      |FROM b""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets"), sum("n").as("sum_n"),
        sum(col("n") * col("n")).as("sum_of_squares"))
      .select(col("n_buckets"), col("sum_n"), col("sum_of_squares"),
        round(col("sum_n").cast("double") / col("n_buckets"), 6).as("avg_n"),
        round(col("sum_of_squares").cast("double") / col("n_buckets")
          - (col("sum_n").cast("double") / col("n_buckets"))
            * (col("sum_n").cast("double") / col("n_buckets")), 6).as("variance"),
        round(sqrt(col("sum_of_squares").cast("double") / col("n_buckets")
          - (col("sum_n").cast("double") / col("n_buckets"))
            * (col("sum_n").cast("double") / col("n_buckets"))), 6).as("std_deviation"))
  }

  /** `reverse_nested` — from inside a nested bucket, jump BACK to the
    * parent-document context and aggregate parent attributes: per
    * nested query-param key, how many distinct PARENT requests per
    * method. The parent columns ride the same explode row (no second
    * scan, no join back) — reverse_nested is free when the nested
    * explode keeps its parent columns, which is exactly how ES stores
    * the parent pointer. */
  val reverseNestedAgg: QueryDef = q(
    "ns_agg_reverse_nested",
    Synth.withAccessLog(
      """SELECT k, method, count(DISTINCT event_id) AS nd_parents
        |FROM (
        |  SELECT event_id, method,
        |    string_split(kv, '=')[1] AS k
        |  FROM (SELECT event_id, method,
        |      unnest(string_split(string_split(url, '?')[2], '&')) AS kv
        |    FROM access_log))
        |GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    Par.spread(s, Synth.accessLog(s, dir), col("event_id"))
      .select(col("event_id"), col("method"),
        explode(split(element_at(split(col("url"), "\\?"), 2), "&")).as("kv"))
      .select(col("event_id"), col("method"),
        element_at(split(col("kv"), "="), 1).as("k"))
      .groupBy("k", "method")
      .agg(countDistinct(col("event_id")).as("nd_parents"))
  }

  /** The ES `variable_width_histogram`: buckets that follow the data's
    * natural clusters instead of a fixed interval. ES clusters online
    * per shard; the deterministic distributed equivalent is LARGEST-GAP
    * splitting — sort the distinct values, cut at the (buckets−1)
    * widest gaps. All arithmetic is exact integer cents, so both
    * engines cut identically (gap ties break toward the lower value).
    *
    * Scale shape: the gap scan runs over the DISTINCT-value table
    * (domain-bounded, not corpus-bounded — |values| ≤ value-span in
    * cents at any SF), the chosen boundaries broadcast back as a tiny
    * sorted array, and each row finds its bucket with a B−1-term chain
    * of codegen comparisons (`get` + CASE, the ns_agg_range
    * discipline) — NOT an array HOF: ArrayFilter is CodegenFallback
    * and would forfeit the corpus stage's whole-stage codegen
    * (PlanSpec locks this). One corpus pass + one distinct shuffle. */
  private val vwhBuckets = 5
  val variableWidthHistogramAgg: QueryDef = q(
    "ns_agg_variable_width_histogram",
    s"""WITH dv AS (SELECT DISTINCT ${sqlCents("value")} AS c FROM events),
       |g AS (SELECT c, c - lag(c) OVER (ORDER BY c) AS gap FROM dv),
       |cuts AS (SELECT c FROM g WHERE gap IS NOT NULL
       |  ORDER BY gap DESC, c LIMIT ${vwhBuckets - 1}),
       |b AS (SELECT list_sort(list(c)) AS bs FROM cuts)
       |SELECT len(list_filter(bs, x -> x <= c)) AS bucket,
       |  count(*) AS n, round(min(value), 2) AS min_value,
       |  round(max(value), 2) AS max_value
       |FROM (SELECT ${sqlCents("value")} AS c, value FROM events), b
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).select(cents(col("value")).as("c"), col("value"))
    val dv = e.select("c").distinct()
    val cuts = dv
      .withColumn("gap", col("c") - lag("c", 1).over(Window.orderBy("c")))
      .filter(col("gap").isNotNull)
      .orderBy(col("gap").desc, col("c"))
      .limit(vwhBuckets - 1)
    val bounds = cuts.agg(sort_array(collect_list(col("c"))).as("bs"))
    // bucket = #cuts ≤ c, unrolled to B−1 codegen terms; `get` is the
    // null-safe (non-ANSI-throwing) element access and the coalesce
    // sentinel makes a short cut list (fewer distinct values than
    // buckets) count as "no cut here".
    val bucket = (0 until vwhBuckets - 1).map { j =>
      when(coalesce(get(col("bs"), lit(j)), lit(Long.MaxValue)) <= col("c"), lit(1L))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    e.crossJoin(broadcast(bounds))
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"))
  }

  // ----------------------------------------------------- bucket_correlation
  /** The ES `bucket_correlation` pipeline aggregation (the correlation
    * ML module's workhorse): Pearson correlation BETWEEN two bucket
    * metric series — here the daily event count vs the daily value
    * total, i.e. "does volume drive revenue day-over-day". Distinct
    * from `ns_agg_matrix_stats`, which correlates per-DOCUMENT fields:
    * this one runs over the time-bucketed series, the sibling-pipeline
    * position in ES's agg tree.
    *
    * Scale shape: the bucket table is span-bounded (|days|), so the
    * correlation pass is dashboard-sized at any SF; the only
    * corpus-bounded work is the one date_histogram aggregation.
    * Determinism: all five moments accumulate as EXACT integers —
    * second moments in DECIMAL(38) (Spark) / HUGEINT (DuckDB) because
    * Σy² scales with SF² and would overflow a long near sf1 — and r
    * emerges from ONE shared formula over those exact moments, each
    * cast to double only at the final step. */
  val bucketCorrelationAgg: QueryDef = q(
    "ns_agg_bucket_correlation",
    s"""WITH b AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |    count(*) AS x, CAST(sum(${sqlCents("value")}) AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |m AS (SELECT count(*) AS nb, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(y AS HUGEINT) * y) AS syy,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM b)
       |SELECT nb AS n_buckets,
       |  round(CAST(nb * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
       |    sqrt(CAST(nb * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) *
       |         CAST(nb * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 6) AS r
       |FROM m""".stripMargin) { (s, dir) =>
    val dec = "decimal(38,0)"
    val b = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"))
      .agg(count(lit(1)).as("x"), sumExact(cents(col("value"))).as("y"))
    b.agg(count(lit(1)).as("nb"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"))
      .select(col("nb").as("n_buckets"),
        round((col("nb") * col("sxy") - col("sx").cast(dec) * col("sy")).cast("double") /
          sqrt((col("nb") * col("sxx") - col("sx").cast(dec) * col("sx")).cast("double") *
               (col("nb") * col("syy") - col("sy").cast(dec) * col("sy")).cast("double")),
          6).as("r"))
  }

  // --------------------------------------------------------- categorize_text
  /** The `categorize_text` aggregation — ES's log-pattern miner: strip
    * the variable pieces out of semi-structured messages and group by
    * the surviving template ("GET /v1/view/item?.html?limit=?&page=?").
    * ES uses a drain-style tree; the deterministic re-expression is the
    * standard masking normalizer — digit runs collapse to `?` — which
    * on machine-generated urls/log lines recovers the emitting format
    * string exactly.
    *
    * Scale shape: one codegen regexp_replace per row (RegExpReplace is
    * codegen, not a UDF), then a plain hash agg keyed by template —
    * |templates|-bounded shuffle (the point of the agg: templates
    * number in the hundreds when raw messages number in the billions).
    * doc_count/nd_variants exact longs; the example is min(url), exact. */
  val categorizeTextAgg: QueryDef = q(
    "ns_agg_categorize_text",
    Synth.withAccessLog(
      """SELECT regexp_replace(concat(method, ' ', url), '[0-9]+', '?', 'g') AS template,
        |  count(*) AS doc_count, count(DISTINCT url) AS nd_variants,
        |  min(url) AS example
        |FROM access_log
        |GROUP BY 1""".stripMargin)) { (s, dir) =>
    Par.spread(s, Synth.accessLog(s, dir), col("event_id"))
      .groupBy(regexp_replace(concat_ws(" ", col("method"), col("url")),
        "[0-9]+", "?").as("template"))
      .agg(count(lit(1)).as("doc_count"),
        countDistinct(col("url")).as("nd_variants"),
        min(col("url")).as("example"))
  }

  // ----------------------------------------------------- frequent_item_sets
  /** The `frequent_item_sets` aggregation — ES's market-basket miner
    * (Eclat), scoped to pairs over the event-type vocabulary: "which
    * event kinds co-occur in the same user's history more often than
    * the support floor". Baskets are users; items are the SMALL FIXED
    * type vocabulary, so the at-scale shape is the adjacency_matrix
    * discipline, not a pair join: pass 1 collapses events to one
    * flag-vector row per user (map-side combining max()), pass 2
    * conditional-sums all C(5,2) co-occurrence cells + the basket count
    * in ONE global aggregate — no self-join, no explode, no window; a
    * constant-width row crosses the final shuffle. Support is exact
    * integer; the floor is the ES default 10% cross-multiplied. */
  private val fisItems = Seq("click", "error", "purchase", "signup", "view")
  val frequentItemSetsAgg: QueryDef = q(
    "ns_agg_frequent_item_sets", {
      val flags = fisItems.zipWithIndex.map { case (t, i) =>
        s"max(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS f$i"
      }.mkString(",\n    ")
      val pairs = fisItems.indices.combinations(2).toSeq
      val cells = pairs.map { case Seq(i, j) =>
        s"CAST(sum(f$i * f$j) AS BIGINT) AS c${i}_$j"
      }.mkString(",\n    ")
      val arms = pairs.map { case Seq(i, j) =>
        s"SELECT '${fisItems(i)}' AS item_a, '${fisItems(j)}' AS item_b, c${i}_$j AS support, n_users FROM m"
      }.mkString("\nUNION ALL ")
      s"""WITH f AS (SELECT user_id,
         |    $flags
         |  FROM events GROUP BY 1),
         |m AS (SELECT count(*) AS n_users,
         |    $cells
         |  FROM f)
         |SELECT item_a, item_b, support,
         |  round(CAST(support AS DOUBLE) / n_users, 6) AS support_pct
         |FROM ($arms)
         |WHERE support * 10 >= n_users""".stripMargin
    }) { (s, dir) =>
    val flagCols = fisItems.zipWithIndex.map { case (t, i) =>
      max(when(col("event_type") === t, 1L).otherwise(0L)).as(s"f$i")
    }
    val pairs = fisItems.indices.combinations(2).toSeq
    val cellCols = pairs.map { case Seq(i, j) =>
      sum(col(s"f$i") * col(s"f$j")).as(s"c${i}_$j")
    }
    val baskets = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(flagCols.head, flagCols.tail: _*)
    val cells = baskets
      .agg(count(lit(1)).as("n_users"), cellCols: _*)
    val stackArgs = pairs
      .map { case Seq(i, j) => s"'${fisItems(i)}', '${fisItems(j)}', c${i}_$j" }
      .mkString(", ")
    cells
      .select(expr(s"stack(${pairs.size}, $stackArgs) AS (item_a, item_b, support)"),
        col("n_users"))
      .filter(col("support") * 10 >= col("n_users"))
      .select(col("item_a"), col("item_b"), col("support"),
        round(col("support").cast("double") / col("n_users"), 6).as("support_pct"))
  }

  // ------------------------------------------------------------ change_point
  /** The `change_point` aggregation — ES's step-change detector over a
    * metric series: the split of the daily error-count series that
    * maximizes the between-segment contrast, scored by the CUSUM-style
    * k·(n−k)·(meanL − meanR)² (the constant-variance log-likelihood
    * reduction of a single mean shift).
    *
    * Scale shape: raw events collapse to the |days|-bounded bucket
    * table first; the prefix-sum window and the argmax run over THAT
    * (the serial_diff discipline — dashboard-sized at any SF, the
    * single-partition window bounded by the time span, never corpus
    * rows). Determinism: prefix sums are exact longs; every double
    * derives from one shared formula text (+,×,÷ exact-rounded, no
    * transcendental), so the argmax needs no epsilon; day breaks
    * exact-score ties. */
  private val cpScore =
    "CAST(k AS DOUBLE) * (n_days - k) " +
      "* (CAST(sk AS DOUBLE) / k - CAST(s_tot - sk AS DOUBLE) / (n_days - k)) " +
      "* (CAST(sk AS DOUBLE) / k - CAST(s_tot - sk AS DOUBLE) / (n_days - k))"
  val changePointAgg: QueryDef = q(
    "ns_agg_change_point",
    s"""WITH b AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS c
       |  FROM events WHERE event_type = 'error' GROUP BY 1),
       |p AS (SELECT day, c,
       |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
       |    CAST(sum(c) OVER (ORDER BY day) AS BIGINT) AS sk,
       |    CAST(sum(c) OVER () AS BIGINT) AS s_tot,
       |    CAST(count(*) OVER () AS BIGINT) AS n_days
       |  FROM b)
       |SELECT day AS change_point, round($cpScore, 4) AS score,
       |  round(CAST(sk AS DOUBLE) / k, 6) AS mean_before,
       |  round(CAST(s_tot - sk AS DOUBLE) / (n_days - k), 6) AS mean_after
       |FROM p WHERE k < n_days
       |ORDER BY $cpScore DESC, day LIMIT 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val b = Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"))
      .agg(count(lit(1)).as("c"))
    // totals come from an unbounded frame over the SAME |days|-bounded
    // window pass — never a second aggregation of raw events
    val w = Window.orderBy("day")
    val wAll = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    b.withColumn("k", row_number().over(w).cast("long"))
      .withColumn("sk", sum("c").over(w))
      .withColumn("s_tot", sum("c").over(wAll))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .filter(col("k") < col("n_days"))
      .withColumn("score0", expr(cpScore))
      .orderBy(col("score0").desc, col("day"))
      .limit(1)
      .select(col("day").as("change_point"), round(col("score0"), 4).as("score"),
        round(col("sk").cast("double") / col("k"), 6).as("mean_before"),
        round((col("s_tot") - col("sk")).cast("double") / (col("n_days") - col("k")), 6)
          .as("mean_after"))
  }

  // --------------------------------------------------------- scripted_metric
  /** The `scripted_metric` aggregation — ES's escape hatch for custom
    * per-bucket folds (init/map/combine/reduce scripts). The canonical
    * class of use is an ORDER-DEPENDENT fold no built-in agg expresses;
    * the declarative re-expression here computes one: each user's
    * longest strictly-increasing value run in event-time order.
    *
    * Scale shape: the ordered fold becomes lag + running-sum windows
    * PARTITIONED PER USER (the ns_window_lag_lead discipline — state
    * bounded per key, no global sort), then two hash aggs; unlike the
    * ES original, the fold is deterministic under any shard layout
    * because the window order (ts, event_id) is total. Values compare
    * as exact integer cents — no float epsilon in the run breaks. */
  val scriptedMetricAgg: QueryDef = q(
    "ns_agg_scripted_metric",
    s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
       |    ${sqlCents("value")} AS v FROM events),
       |d AS (SELECT user_id, ts_ms, event_id,
       |    CASE WHEN v > lag(v) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
       |         THEN 0 ELSE 1 END AS brk
       |  FROM e),
       |r AS (SELECT user_id,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
       |                   ROWS UNBOUNDED PRECEDING) AS run_id
       |  FROM d),
       |g AS (SELECT user_id, run_id, count(*) AS len FROM r GROUP BY 1, 2)
       |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_inc_run,
       |  count(*) AS n_runs
       |FROM g GROUP BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        cents(col("value")).as("v"))
      .withColumn("brk",
        when(col("v") > lag("v", 1).over(w), 0L).otherwise(1L))
      .withColumn("run_id", sum("brk").over(w))
      .groupBy("user_id", "run_id").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("longest_inc_run"), count(lit(1)).as("n_runs"))
  }

  // ------------------------------------------------------ percentiles_bucket
  /** The `percentiles_bucket` pipeline aggregation: quantiles OF the
    * sibling buckets' values (not of raw docs) — "what does a typical
    * day look like". Raw events collapse to the |days|-bounded bucket
    * table first (the stats_bucket discipline); the one value-multiset
    * percentile buffer then holds |days| longs, dashboard-sized at any
    * SF. Spark's interpolating percentile() and DuckDB's quantile_cont
    * agree under round(6). */
  val percentilesBucketAgg: QueryDef = q(
    "ns_agg_percentiles_bucket",
    """WITH b AS (SELECT date_trunc('day', ts) AS day, count(*) AS c
      |  FROM events GROUP BY 1)
      |SELECT round(quantile_cont(c, 0.25), 6) AS p25,
      |  round(quantile_cont(c, 0.5), 6) AS p50,
      |  round(quantile_cont(c, 0.75), 6) AS p75,
      |  round(quantile_cont(c, 0.9), 6) AS p90
      |FROM b""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).as("day"))
      .agg(count(lit(1)).as("c"))
      .agg(expr("percentile(c, array(0.25D, 0.5D, 0.75D, 0.9D))").as("ps"))
      .select(round(col("ps").getItem(0), 6).as("p25"),
        round(col("ps").getItem(1), 6).as("p50"),
        round(col("ps").getItem(2), 6).as("p75"),
        round(col("ps").getItem(3), 6).as("p90"))
  }

  // --------------------------------------------------------------- moving_fn
  /** The `moving_fn` pipeline aggregation — the generalized sliding
    * window over sibling buckets (date_histogram_pipeline covers
    * movavg/derivative/cumsum; this is the max/min pair — "7-day
    * rolling peak/floor"). Windows run over the series × days bucket
    * table partitioned per series, never raw events; exact longs. */
  val movingFnAgg: QueryDef = q(
    "ns_agg_moving_fn",
    """WITH b AS (SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(epoch_ms(day) AS BIGINT) AS day_ms, c,
      |  CAST(max(c) OVER w AS BIGINT) AS mov_max7,
      |  CAST(min(c) OVER w AS BIGINT) AS mov_min7
      |FROM b
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("tsu")).as("day"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), unix_millis(col("day")).as("day_ms"), col("c"),
        max("c").over(w).as("mov_max7"), min("c").over(w).as("mov_min7"))
  }

  // ------------------------------------------------------------------ nested
  /** The `nested` + `reverse_nested` aggregation pair: bucket by a
    * field of the INNER objects (here the url's query parameters — the
    * nested docs a real mapping would hold), then jump back to parent
    * scope for the distinct-parent count. One explode of the bounded
    * per-row parameter list (≤ 2 params/url — never corpus-side state),
    * one hash agg; |param-keys|-bounded shuffle. */
  val nestedAgg: QueryDef = q(
    "ns_agg_nested",
    Synth.withAccessLog(
      """SELECT k, count(*) AS doc_count, count(DISTINCT v) AS nd_values,
        |  count(DISTINCT event_id) AS nd_parents
        |FROM (
        |  SELECT event_id,
        |    string_split(kv, '=')[1] AS k, string_split(kv, '=')[2] AS v
        |  FROM (SELECT event_id, unnest(string_split(string_split(url, '?')[2], '&')) AS kv
        |        FROM access_log))
        |GROUP BY 1""".stripMargin)) { (s, dir) =>
    Par.spread(s, Synth.accessLog(s, dir), col("event_id"))
      .select(col("event_id"),
        explode(split(element_at(split(col("url"), "\\?"), 2), "&")).as("kv"))
      .select(col("event_id"),
        element_at(split(col("kv"), "="), 1).as("k"),
        element_at(split(col("kv"), "="), 2).as("v"))
      .groupBy("k")
      .agg(count(lit(1)).as("doc_count"),
        countDistinct(col("v")).as("nd_values"),
        countDistinct(col("event_id")).as("nd_parents"))
  }

  // -------------------------------------------------------------- date_range
  /** The `date_range` aggregation — range's calendar sibling: explicit
    * from-to date bands with ES's `*-to` / `from-to` / `from-*` keys,
    * inside the enclosing request's query-scope time window (ES
    * aggregates over the QUERY's document set; every real request
    * carries a time range). The window binds to the date-partitioned
    * twin's `dt` partition column — day-granular, so it is EXACT, and
    * it prunes 20/30 day partitions at file-listing time
    * (PlanSpec-locked). The band key is a codegen CASE over the raw
    * timestamp (epoch-ms comparisons, no formatting in the hot path),
    * map-side partials into ≤ |bands| groups — one pass, constant
    * shuffle. */
  private val dateRangeScope = ("2024-01-05", "2024-01-24") // inclusive days
  private val dateRangeBands: Seq[(String, Option[String], Option[String])] = Seq(
    ("*-2024-01-10", None, Some("2024-01-10")),
    ("2024-01-10-2024-01-20", Some("2024-01-10"), Some("2024-01-20")),
    ("2024-01-20-*", Some("2024-01-20"), None))
  private val dateRangeCase: String = {
    val arms = dateRangeBands.map { case (key, from, to) =>
      val cond = (from.map(f => s"ts_ms >= epoch_ms(TIMESTAMP '$f 00:00:00')") ++
        to.map(t => s"ts_ms < epoch_ms(TIMESTAMP '$t 00:00:00')")).mkString(" AND ")
      s"WHEN $cond THEN '$key'"
    }
    s"CASE ${arms.mkString(" ")} END"
  }
  val dateRangeAgg: QueryDef = q(
    "ns_agg_date_range",
    s"""SELECT $dateRangeCase AS band, count(*) AS doc_count,
       |  ${sqlSum(sqlCents("value"))} AS sum_value_c
       |FROM (SELECT epoch_ms(ts) AS ts_ms, value FROM events
       |  WHERE ts >= TIMESTAMP '${dateRangeScope._1} 00:00:00'
       |    AND ts < TIMESTAMP '2024-01-25 00:00:00')
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    // Spark epoch_ms equivalent: unix_millis(timestamp) — keep the CASE
    // text identical modulo that one dialect call
    val sparkCase = dateRangeCase.replace("epoch_ms(", "unix_millis(")
    Tables.eventsDt(s, dir)
      .filter(col("dt") >= lit(java.sql.Date.valueOf(dateRangeScope._1)) &&
        col("dt") <= lit(java.sql.Date.valueOf(dateRangeScope._2)))
      .select(col("ts_ms"), col("value"))
      .groupBy(expr(sparkCase).as("band"))
      .agg(count(lit(1)).as("doc_count"),
        sumExact(cents(col("value"))).as("sum_value_c"))
  }

  // ------------------------------------------------- normalize (pipeline)
  /** The ES `normalize` pipeline aggregation: rescale a sibling bucket
    * metric within its parent — the two most-used methods, `range`
    * (min-max onto [0,1]; a degenerate series where max = min yields
    * null) and `percent_of_sum`. Runs over the AGGREGATED day×series
    * bucket table (dashboard-sized at any SF), windows partitioned by
    * series — never a global single-partition window, never raw rows. */
  val normalizeAgg: QueryDef = q(
    "ns_agg_normalize",
    """WITH b AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type, n,
      |  round(CAST(n - min(n) OVER w AS DOUBLE)
      |    / nullif(CAST(max(n) OVER w - min(n) OVER w AS DOUBLE), 0), 6) AS range_norm,
      |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER w AS DOUBLE), 6) AS pct_sum
      |FROM b
      |WINDOW w AS (PARTITION BY event_type)""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("range_norm",
        round((col("n") - min("n").over(w)).cast("double") /
          nullif((max("n").over(w) - min("n").over(w)).cast("double"), lit(0.0)), 6))
      .withColumn("pct_sum",
        round(col("n").cast("double") / sum("n").over(w).cast("double"), 6))
  }

  // ----------------------------------------------------------------- missing
  /** The `missing` aggregation — exists' complement: how many docs per
    * bucket LACK the field (here, messages that don't parse to a JSON
    * object carrying `k` — the reference's parse-else-wrap residue).
    * One conditional-sum pass next to the total, the filters
    * discipline. */
  val missingAgg: QueryDef = q(
    "ns_agg_missing",
    Synth.withMsg(
      """SELECT event_type,
        |  count(*) FILTER (WHERE (CASE WHEN json_valid(msg)
        |    THEN json_extract_string(msg, '$.k') END) IS NULL) AS n_missing,
        |  count(*) AS n_total
        |FROM ev GROUP BY 1""".stripMargin),
    // the missing and present sides BOTH carry documents in every run
    liveness = Seq(
      "missing_and_present_sides_live" ->
        "SELECT sum(n_missing) > 0 AND sum(n_total - n_missing) > 0 FROM r")) { (s, dir) =>
    // Par.spread (r21): the per-row JSON probe ran in one scan task
    // locally; passthrough on a wide scan at scale.
    Par.spread(s, Synth.eventsWithMsg(s, dir), col("event_id"))
      .groupBy("event_type")
      .agg(sum(when(get_json_object(col("msg"), "$.k").isNull, 1L).otherwise(0L))
          .as("n_missing"),
        count(lit(1)).as("n_total"))
  }

  // --------------------------------------------------------------- children
  /** The ES `children` aggregation (join-field): per PARENT bucket,
    * aggregate over the CHILD documents — "per order priority, how many
    * lines, how much quantity". The at-scale shape: children pre-
    * aggregate per parent KEY first (count + exact cents sum collapse
    * before the join, one row per parent crosses the shuffle), the
    * parent side joins projected to (key, bucket), and the final
    * aggregate reads |parents| rows grouped to |priorities|. n_parents
    * is free — every pre-aggregated row IS one distinct parent. */
  val childrenAgg: QueryDef = q(
    "ns_agg_children",
    s"""WITH c AS (SELECT l_orderkey, count(*) AS n,
       |    CAST(sum(${sqlCents("l_quantity")}) AS BIGINT) AS qty_c
       |  FROM lineitem GROUP BY 1)
       |SELECT o_orderpriority, CAST(sum(n) AS BIGINT) AS n_children,
       |  count(*) AS n_parents, CAST(sum(qty_c) AS BIGINT) AS sum_qty_c
       |FROM orders JOIN c ON o_orderkey = l_orderkey
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    // Par.spread (r21, guide §2.5): the per-parent partial aggregation
    // ran inside the ONE scan task of the local single-row-group file
    // (ProfileBench: 620 ms exec on 7 tasks); the groupBy(l_orderkey)
    // REUSES the spread's hashpartitioning(l_orderkey) exchange, so no
    // extra shuffle appears. Passthrough on wide scans at scale.
    val perParent = Par.spread(s, Tables.lineitem(s, dir), col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), sumExact(cents(col("l_quantity"))).as("qty_c"))
    Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      .join(perParent, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("n")).as("n_children"), count(lit(1)).as("n_parents"),
        sum(col("qty_c")).as("sum_qty_c"))
  }

  // ----------------------------------------------------------------- global
  /** The ES `global` aggregation: a bucket that ESCAPES the query filter
    * — the "matching vs ALL documents" comparison every relevance
    * dashboard needs. One codegen pass: rollup(event_type) carries the
    * per-type buckets AND the grand-total `_all` row, with the query-
    * context count as a conditional sum riding the same aggregate — no
    * second scan for the global side. The total row is labeled via
    * GROUPING(), not by coalescing the value: a genuine NULL
    * event_type bucket must stay distinct from `_all` (ES global-agg
    * semantics), which a value-coalesce would silently merge —
    * identically in both engines, so the gate could never catch it. */
  val globalAgg: QueryDef = q(
    "ns_agg_global",
    """SELECT CASE WHEN GROUPING(event_type) = 1 THEN '_all' ELSE event_type END AS bucket,
      |  CAST(sum(CASE WHEN value >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_query,
      |  count(*) AS n_global
      |FROM events GROUP BY ROLLUP(event_type)""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .rollup("event_type")
      .agg(grouping(col("event_type")).as("g"),
        sum(when(col("value") >= 150, 1L).otherwise(0L)).as("n_in_query"),
        count(lit(1)).as("n_global"))
      .select(when(col("g") === 1, lit("_all")).otherwise(col("event_type")).as("bucket"),
        col("n_in_query"), col("n_global"))
  }

  // ----------------------------------------------------- moving_percentiles
  /** The `moving_percentiles` pipeline agg: sliding-window quantiles of
    * the daily bucket metric (trailing 7 buckets) — the smoothed-band
    * chart around a latency/volume series. Runs over the |days|-bounded
    * bucket table (the moving_fn discipline), so the window sort is
    * dashboard-sized at any SF. Quantiles interpolate linearly over
    * exact longs in both engines; round(6) absorbs the last-ulp
    * formula-order difference. */
  val movingPercentilesAgg: QueryDef = q(
    "ns_agg_moving_percentiles",
    """WITH b AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1)
      |SELECT day, n,
      |  round(quantile_cont(n, 0.5) OVER w, 6) AS p50_7d,
      |  round(quantile_cont(n, 0.9) OVER w, 6) AS p90_7d
      |FROM b
      |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("tsu")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p50_7d", round(percentile(col("n"), lit(0.5)).over(w), 6))
      .withColumn("p90_7d", round(percentile(col("n"), lit(0.9)).over(w), 6))
  }

  // ------------------------------------------------------------------ parent
  /** The ES `parent` aggregation — `children`'s inverse: bucket by a
    * CHILD field, aggregate over the distinct PARENT documents ("per
    * return flag, how many orders and how much order value"). The
    * dedup-to-parent step is the semantic core (a parent with many
    * qualifying lines counts once) and the at-scale shape: the child
    * side collapses to DISTINCT (bucket, parent key) before the join,
    * so the parent row is fetched once per bucket membership, never
    * once per child line. */
  val parentAgg: QueryDef = q(
    "ns_agg_parent",
    s"""WITH k AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem)
       |SELECT l_returnflag, count(*) AS n_parents,
       |  CAST(sum(${sqlCents("o_totalprice")}) AS BIGINT) AS sum_totalprice_c
       |FROM k JOIN orders ON o_orderkey = l_orderkey
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    // Par.spread (r21, guide §2.5): the dedup-to-parent distinct ran in
    // the single scan task (ProfileBench: 749 ms exec on 7 tasks);
    // hashpartitioning(l_orderkey) satisfies the distinct's clustered
    // distribution on (l_returnflag, l_orderkey) — subset key — so the
    // spread exchange is the ONLY one below the join. Passthrough at
    // scale.
    Par.spread(s, Tables.lineitem(s, dir).select("l_returnflag", "l_orderkey"),
        col("l_orderkey")).distinct()
      .join(Tables.orders(s, dir).select("o_orderkey", "o_totalprice"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_parents"),
        sumExact(cents(col("o_totalprice"))).as("sum_totalprice_c"))
  }

  // ---------------------------------------------------------- random_sampler
  /** ES 8's `random_sampler` aggregation: aggregate over a probability
    * sample and scale the estimate back up — the "fast dashboards over
    * petabytes" agg. The sample membership is the deterministic
    * md5-bucket primitive (the ns_split_train_test recipe — identical
    * text both engines, reproducible across runs), p = 5% → the
    * inverse-probability estimate is an exact ×20 on longs. A pure
    * pushdown-friendly filter: any worker decides membership
    * independently; no shuffle before the aggregate. */
  private val rsInvP = 20L // p = 1/20
  private val rsBucket = // the TextOps.hashBucketOn recipe, on event_id
    "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"
  private val rsBucketSql =
    "('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 100"
  val randomSamplerAgg: QueryDef = q(
    "ns_agg_random_sampler",
    s"""SELECT event_type, count(*) AS n_sampled,
       |  count(*) * $rsInvP AS est_total,
       |  CAST(sum(${sqlCents("value")}) AS BIGINT) AS sum_value_c_sampled,
       |  CAST(sum(${sqlCents("value")}) * $rsInvP AS BIGINT) AS est_sum_value_c
       |FROM events WHERE $rsBucketSql < ${100 / rsInvP}
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(expr(rsBucket) < 100L / rsInvP)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sampled"),
        (count(lit(1)) * rsInvP).as("est_total"),
        sumExact(cents(col("value"))).as("sum_value_c_sampled"),
        (sumExact(cents(col("value"))) * rsInvP).as("est_sum_value_c"))
  }

  // ------------------------------------------------------------- time_series
  /** The ES TSDB `time_series` aggregation's `rate` on a COUNTER field
    * — the metric that makes time-series indices a distinct mode:
    * counters increase monotonically but RESET on restart, and the rate
    * must count a reset as "the counter restarted from zero" (delta =
    * new value), never as a negative increase. The testdata carries no
    * counter column, so — the geo-dim discipline — one is DERIVED
    * deterministically: each user's cumulative exact-cents total mod
    * 2^20, whose wraps are genuine resets the logic must absorb.
    *
    * Scale shape: TSDB semantics are per-SERIES sequential, and the
    * plan matches — one shuffle partitions by series key (user), each
    * series folds in one ordered pass (cumsum + lag share the same
    * window frame sort), then a |days|-bounded re-aggregation. The
    * counter stays a bounded long BY CONSTRUCTION (the mod is the
    * counter's own domain), so no decimal guard is needed at any SF;
    * per-series state never leaves the executor. */
  private val tsCounterMod = 1048576L
  val timeSeriesAgg: QueryDef = q(
    "ns_agg_time_series",
    s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
       |    CAST(date_trunc('day', ts) AS DATE) AS day,
       |    ${sqlCents("value")} AS c FROM events),
       |s AS (SELECT user_id, event_id, ms, day,
       |    CAST(sum(c) OVER (PARTITION BY user_id ORDER BY ms, event_id
       |      ROWS UNBOUNDED PRECEDING) % $tsCounterMod AS BIGINT) AS counter
       |  FROM e),
       |d AS (SELECT day, counter,
       |    lag(counter) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
       |  FROM s)
       |SELECT day, count(*) AS n_samples,
       |  ${sqlSum("CASE WHEN prev IS NULL THEN 0 WHEN counter >= prev THEN counter - prev ELSE counter END")} AS increase_c,
       |  ${sqlSum("CASE WHEN prev IS NOT NULL AND counter < prev THEN 1 ELSE 0 END")} AS n_resets
       |FROM d GROUP BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val series = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms").as("ms"),
        date_trunc("day", col("tsu")).cast("date").as("day"),
        cents(col("value")).as("c"))
      .withColumn("counter",
        (sum(col("c")).over(series.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          % tsCounterMod))
      .withColumn("prev", lag("counter", 1).over(series))
      .groupBy("day")
      .agg(count(lit(1)).as("n_samples"),
        sum(when(col("prev").isNull, 0L)
          .when(col("counter") >= col("prev"), col("counter") - col("prev"))
          .otherwise(col("counter"))).as("increase_c"),
        sum(when(col("prev").isNotNull && col("counter") < col("prev"), 1L)
          .otherwise(0L)).as("n_resets"))
  }

  // --------------------------------------------------- terms + shard error
  /** The DISTRIBUTED `terms` aggregation with its honesty contract:
    * `doc_count_error_upper_bound`. ES's terms agg is approximate —
    * each shard returns only its local top `shard_size` terms, so a
    * term's merged count misses shards where it fell below the local
    * cutoff, and ES reports the worst case it can prove: the sum of the
    * cutoff counts (each non-reporting shard's k-th term count) over
    * shards that didn't return the term. This op reproduces that exact
    * protocol over deterministic shards (user_id % 8 — Spark partitions
    * aren't stable identities, a simulated shard key is): per-shard
    * top-5 lists, merged counts, per-term error bounds, final top-5.
    *
    * Scale shape: one map-side-combined shuffle to the (shard, term)
    * count table; every later step — ranks, cutoffs, presence joins —
    * runs over ≤ |shards|·|terms| bucket rows, dashboard-sized at any
    * SF. This is the agg that explains WHY the engine's exact
    * alternatives (composite pagination) exist: the error bound is the
    * price of single-pass distributed top-k. */
  private val tseShards = 8
  private val tseK = 5
  val termsShardErrorAgg: QueryDef = q(
    "ns_agg_terms_shard_error",
    s"""WITH c AS (SELECT user_id % $tseShards AS shard,
       |    concat('t', user_id % 53) AS term, count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |k AS (SELECT shard, term, n,
       |    row_number() OVER (PARTITION BY shard ORDER BY n DESC, term) AS rk FROM c),
       |topk AS (SELECT * FROM k WHERE rk <= $tseK),
       |kth AS (SELECT shard, min(n) AS kth_n FROM topk GROUP BY 1),
       |terms AS (SELECT term, ${sqlSum("n")} AS doc_count FROM topk GROUP BY 1),
       |err AS (SELECT t.term,
       |    CAST(COALESCE(sum(CASE WHEN p.term IS NULL THEN kth.kth_n END), 0) AS BIGINT)
       |      AS doc_count_error_upper_bound
       |  FROM terms t CROSS JOIN kth
       |  LEFT JOIN topk p ON p.shard = kth.shard AND p.term = t.term
       |  GROUP BY 1)
       |SELECT t.term, t.doc_count, e.doc_count_error_upper_bound
       |FROM terms t JOIN err e ON t.term = e.term
       |ORDER BY t.doc_count DESC, t.term LIMIT $tseK""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(s, dir)
      .groupBy((col("user_id") % tseShards).as("shard"),
        concat(lit("t"), col("user_id") % 53).as("term"))
      .agg(count(lit(1)).as("n"))
    // everything below runs on the |shards|x|terms| bucket table
    val topk = c.withColumn("rk",
        row_number().over(Window.partitionBy("shard").orderBy(col("n").desc, col("term"))))
      .filter(col("rk") <= tseK)
    val kth = topk.groupBy("shard").agg(min(col("n")).as("kth_n"))
    val terms = topk.groupBy("term").agg(sum(col("n")).as("doc_count"))
    val err = terms.select("term").crossJoin(broadcast(kth))
      .join(topk.select(col("shard").as("p_shard"), col("term").as("p_term")),
        col("p_shard") === col("shard") && col("p_term") === col("term"), "left")
      .groupBy("term")
      .agg(coalesce(sum(when(col("p_term").isNull, col("kth_n"))), lit(0L))
        .as("doc_count_error_upper_bound"))
    terms.join(err, "term")
      .orderBy(col("doc_count").desc, col("term"))
      .limit(tseK)
      .select("term", "doc_count", "doc_count_error_upper_bound")
  }

  // -------------------------------------------------------------- downsample
  /** The ES `_downsample` API: roll a TSDB index into one document per
    * (time series, bucket) carrying the pre-aggregated shape queries
    * need later — count/min/max/sum for gauge metrics, last-value for
    * counters (ES stores the last sample so downsampled counters still
    * rate() correctly). The series identity (_tsid) is the dimension
    * tuple; here (user_id-derived host, event_type) with 1-hour buckets
    * as exact epoch-ms longs. In Spark the whole job is ONE map-side-
    * combined hash aggregate — no window, no shuffle beyond the group
    * keys, which is why the same plan holds at 100 TB: partial rows per
    * input partition are bounded by series×buckets, not samples.
    * last-value uses the transform discipline: max_by over the unique
    * ms·2^20+event_id key, so the argmax never ties. */
  val downsampleAgg: QueryDef = q(
    "ns_agg_downsample",
    s"""SELECT user_id % 16 AS host, event_type,
       |  epoch_ms(ts) - epoch_ms(ts) % 3600000 AS bucket_ms,
       |  count(*) AS n,
       |  min(${sqlCents("value")}) AS v_min,
       |  max(${sqlCents("value")}) AS v_max,
       |  ${sqlSum(sqlCents("value"))} AS v_sum,
       |  arg_max(${sqlCents("value")}, epoch_ms(ts) * 1048576 + event_id) AS v_last
       |FROM events GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select((col("user_id") % 16).as("host"), col("event_type"),
        (col("ts_ms") - col("ts_ms") % 3600000L).as("bucket_ms"),
        cents(col("value")).as("c"),
        (col("ts_ms") * 1048576L + col("event_id")).as("ok"))
      .groupBy("host", "event_type", "bucket_ms")
      .agg(count(lit(1)).as("n"), min(col("c")).as("v_min"), max(col("c")).as("v_max"),
        sum(col("c")).as("v_sum"), expr("max_by(c, ok)").as("v_last"))
  }

  // --------------------------------------------------------------- transform
  /** The ES `_transform` API (continuous pivot): materialize an
    * ENTITY-CENTRIC index from an event stream — per user: event count,
    * exact value total, distinct behaviors, last-seen time and the type
    * of the last event. This is the feature ES ships for "turn the log
    * into a user table"; in Spark it is one map-side-combined shuffle
    * by entity where even "latest event type" is an ordinary aggregate
    * (max_by over a UNIQUE long ordering key — ms·2^20 + event_id, so
    * the argmax can never tie and both engines agree bit-exactly).
    * The continuous variant is the same plan under readStream with the
    * output upserted per trigger; the batch form here is what each
    * checkpoint computes. */
  val transformPivotAgg: QueryDef = q(
    "ns_transform_pivot",
    s"""SELECT user_id, count(*) AS n_events,
       |  ${sqlSum(sqlCents("value"))} AS sum_value_c,
       |  count(DISTINCT event_type) AS nd_types,
       |  max(epoch_ms(ts)) AS last_ms,
       |  arg_max(event_type, epoch_ms(ts) * 1048576 + event_id) AS last_type
       |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("sum_value_c"),
        countDistinct(col("event_type")).as("nd_types"),
        max(col("ts_ms")).as("last_ms"),
        expr("max_by(event_type, ts_ms * 1048576 + event_id)").as("last_type"))
  }

  /** The `_transform` API's OTHER mode: `latest` — keep each entity's
    * most recent full document (the "current state" table every ops
    * dashboard is built on). Same plan as the pivot: one hash
    * aggregate, every column an ordinary max_by over the UNIQUE
    * ms·2^20+event_id ordering key, so the whole row is internally
    * consistent (all fields come from the same winning event) and
    * both engines agree bit-exactly. */
  val transformLatestAgg: QueryDef = q(
    "ns_transform_latest",
    s"""SELECT user_id,
       |  arg_max(event_id, epoch_ms(ts) * 1048576 + event_id) AS event_id,
       |  arg_max(event_type, epoch_ms(ts) * 1048576 + event_id) AS event_type,
       |  arg_max(${sqlCents("value")}, epoch_ms(ts) * 1048576 + event_id) AS value_c,
       |  max(epoch_ms(ts)) AS ts_ms
       |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("ok", col("ts_ms") * 1048576L + col("event_id"))
      .withColumn("vc", cents(col("value")))
      .groupBy("user_id")
      .agg(expr("max_by(event_id, ok)").as("event_id"),
        expr("max_by(event_type, ok)").as("event_type"),
        expr("max_by(vc, ok)").as("value_c"),
        max(col("ts_ms")).as("ts_ms"))
  }

  def entries: Seq[QueryDef] = Seq(
    bucketNormalizeAgg, statsBucketAgg, cumulativeSumAgg, extendedStatsBucketAgg,
    reverseNestedAgg, variableWidthHistogramAgg, timeSeriesAgg,
    termsShardErrorAgg, transformPivotAgg, transformLatestAgg, downsampleAgg,
    bucketScriptAgg, bucketSelectorAgg, bucketSortAgg, serialDiffAgg, derivativeAgg,
    cumulativeCardinalityAgg, bucketCorrelationAgg,
    filtersAgg, multiTermsAgg, autoDateHistogramAgg, rateAgg, samplerAgg,
    diversifiedSamplerAgg, stringStatsAgg, madAgg, boxplotAgg, tTestAgg,
    categorizeTextAgg, frequentItemSetsAgg, changePointAgg, scriptedMetricAgg,
    percentilesBucketAgg, movingFnAgg, nestedAgg, dateRangeAgg, missingAgg,
    normalizeAgg,
    childrenAgg, globalAgg, movingPercentilesAgg, parentAgg, randomSamplerAgg)
}
