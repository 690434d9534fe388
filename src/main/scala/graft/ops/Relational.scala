package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Exact, QueryDef, Tables}

/** North-star relational operator set (SURVEY.md §2.5): hash/broadcast
  * joins, semi/anti joins, hash aggregation, distinct aggregation,
  * rollup, window functions, top-k, and set operations over the TPC-H-ish
  * testdata. The reference itself has no relational engine (its one join
  * is the geoip enrich, see Enrich.scala); these queries establish that
  * the Spark rebuild offers the full relational surface a 100 TB
  * deployment needs.
  *
  * Scale notes (local[32] is the test rig; the design targets a cluster):
  *   - big⋈big joins (orders⋈lineitem) shuffle on the join key and rely
  *     on AQE for skew/coalesce; no driver-side collection anywhere.
  *   - dimension joins (nation, region) are explicitly `broadcast()`.
  *   - aggregates are partial (map-side combine) by construction; money
  *     is converted to integer cents BEFORE aggregation (Exact.scala) so
  *     results are order-independent and bit-identical to the oracle.
  *   - top-k compiles to TakeOrderedAndProject (no global sort).
  */
object Relational {
  import Exact._

  private def q(name: String, oracle: String,
      liveness: Seq[(String, String)] = Nil)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle), liveness)

  /** TPC-H Q1-style hash aggregation with exact cents arithmetic. */
  val aggHash: QueryDef = q(
    "ns_agg_hash",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum(sqlCents("l_quantity"))} AS sum_qty_c,
       |  ${sqlSum(sqlCents("l_extendedprice"))} AS sum_base_c,
       |  ${sqlSum(sqlCents4("l_extendedprice*(1-l_discount)"))} AS sum_disc_c,
       |  ${sqlSum(sqlCents6("(l_extendedprice*(1-l_discount))*(1+l_tax)"))} AS sum_charge_c,
       |  count(*) AS n
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    // Par.spread (r21, guide §2.6/§1): the local single-row-group scan
    // ran the whole cents/decimal partial aggregation in ONE task
    // (measured 0.83 s single-threaded at sf0.1); spreading costs one
    // narrow-row shuffle locally and is a PASSTHROUGH on a many-split
    // scan at scale. Shipdate filter stays pushed at the scan, below
    // the repartition.
    Par.spread(s, Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00"))),
      col("l_orderkey"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        // money sums ride the DECIMAL(38) accumulator (Exact.sumExact):
        // cents4/cents6 row terms reach 1e9-1e11, overflowing an int64
        // sum near 1e10 rows — a handful of return-flag groups can hold
        // that many at the target scale
        sumExact(cents(col("l_extendedprice"))).as("sum_base_c"),
        sumExact(cents4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_c"),
        sumExact(cents6((col("l_extendedprice") * (lit(1) - col("l_discount"))) * (lit(1) + col("l_tax")))).as("sum_charge_c"),
        count(lit(1)).as("n"))
  }

  /** Kibana-style date_histogram with a terms split — THE dashboard
    * query the reference's downstream (OpenSearch + Kibana over log
    * events) exists to serve: a two-week time window (every Kibana
    * request carries one), calendar-day buckets × event_type series,
    * each carrying count/sum/avg/min/max stats. Reads the
    * date-partitioned twin (Tables.eventsDt — the ES time-index
    * layout), so the window prunes whole day partitions at file-listing
    * time: PlanSpec asserts non-empty PartitionFilters and 14/30
    * partitions read — the at-scale discipline where the other 16 days
    * of files are never even listed. Bucket count is bounded by the
    * time span (days), never the event count, so the aggregate output
    * stays dashboard-sized at any SF; the group-by partial-aggregates
    * map-side and shuffles only (day, type) groups — and the bucket key
    * IS the partition column (day == dt), zero recomputation. Exact
    * parity discipline: value sums in integer cents (Exact.scala), avg
    * derived from the exact cents sum by one double division, min/max
    * of doubles are accumulation-order independent as-is. */
  private[graft] val histoFrom = "2024-01-08"
  private[graft] val histoTo = "2024-01-21" // inclusive day bounds, 14 days
  val dateHistogram: QueryDef = q(
    "ns_date_histogram",
    s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       |  count(*) AS n,
       |  ${sqlSum(sqlCents("value"))} AS sum_value_c,
       |  round(CAST(${sqlSum(sqlCents("value"))} AS DOUBLE) / 100.0 / count(*), 6) AS avg_value,
       |  min(value) AS min_value,
       |  max(value) AS max_value
       |FROM events
       |WHERE ts >= TIMESTAMP '$histoFrom 00:00:00'
       |  AND ts < TIMESTAMP '2024-01-22 00:00:00'
       |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.eventsDt(s, dir)
      .filter(col("dt") >= lit(java.sql.Date.valueOf(histoFrom)) &&
        col("dt") <= lit(java.sql.Date.valueOf(histoTo)))
      .groupBy(col("dt").as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents(col("value"))).as("sum_value_c"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .withColumn("avg_value",
        round(col("sum_value_c").cast("double") / 100.0 / col("n"), 6))
      .select("day", "event_type", "n", "sum_value_c", "avg_value",
        "min_value", "max_value")
  }

  /** Kibana pipeline aggregations over the date-histogram buckets:
    * derivative (day-over-day delta), 7-bucket moving average, and
    * cumulative sum per event_type series — the second-order dashboard
    * layer (trend/smoothing/running-total) OpenSearch computes from a
    * parent date_histogram, applied WITHIN the request's time range
    * (the parent histogram's same two-week window), reading the
    * date-partitioned twin so the window prunes day partitions exactly
    * like the parent (PlanSpec-locked). The windows run over the
    * AGGREGATED bucket table — series × days rows, dashboard-sized at
    * any SF — never raw events, and partition by event_type so no
    * global single-partition sort exists in the plan. Determinism:
    * bucket counts are exact longs; the moving average divides an
    * exact long window sum by the window row count once, identically
    * in both engines. */
  val dateHistogramPipeline: QueryDef = q(
    "ns_date_histogram_pipeline",
    s"""WITH b AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       |    count(*) AS n
       |  FROM events
       |  WHERE ts >= TIMESTAMP '$histoFrom 00:00:00'
       |    AND ts < TIMESTAMP '2024-01-22 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT day, event_type, n,
       |  n - lag(n) OVER w AS dn,
       |  round(CAST(sum(n) OVER wf AS DOUBLE) / count(*) OVER wf, 6) AS ma7,
       |  CAST(sum(n) OVER wc AS BIGINT) AS cum
       |FROM b
       |WINDOW
       |  w AS (PARTITION BY event_type ORDER BY day),
       |  wf AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       |  wc AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("event_type").orderBy("day")
    val wf = w.rowsBetween(-6, Window.currentRow)
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.eventsDt(s, dir)
      .filter(col("dt") >= lit(java.sql.Date.valueOf(histoFrom)) &&
        col("dt") <= lit(java.sql.Date.valueOf(histoTo)))
      .groupBy(col("dt").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dn", col("n") - lag("n", 1).over(w))
      .withColumn("ma7",
        round(sum("n").over(wf).cast("double") / count(lit(1)).over(wf), 6))
      .withColumn("cum", sum("n").over(wc))
  }

  /** The OpenSearch `range` aggregation: documents bucketed by explicit
    * value bounds (the latency/price-band breakdown every ops dashboard
    * carries), with per-bucket stats. Bucket labels follow the ES
    * `from-to` naming (`*-50.0`, `50.0-150.0`, …).
    *
    * Scale shape: the bucket label is a per-row codegen CASE over one
    * scan — no join against a bounds table — and the aggregate
    * partial-aggregates map-side into at most |ranges| groups, so the
    * shuffle carries ≤ 4 rows per map task at any SF. Value sums in
    * exact integer cents (Exact.scala); min/max of doubles are
    * order-independent as-is. */
  val rangeAgg: QueryDef = q(
    "ns_agg_range",
    s"""SELECT CASE WHEN value < 50 THEN '*-50.0'
       |    WHEN value < 150 THEN '50.0-150.0'
       |    WHEN value < 250 THEN '150.0-250.0'
       |    ELSE '250.0-*' END AS bucket,
       |  count(*) AS n,
       |  ${sqlSum(sqlCents("value"))} AS sum_value_c,
       |  min(value) AS min_value, max(value) AS max_value
       |FROM events GROUP BY 1""".stripMargin,
    // all four range buckets — both open ends included — materialize
    liveness = Seq(
      "all_four_range_buckets_populated" ->
        "SELECT count(*) = 4 AND min(n) > 0 FROM r")) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(
        when(col("value") < 50, "*-50.0")
          .when(col("value") < 150, "50.0-150.0")
          .when(col("value") < 250, "150.0-250.0")
          .otherwise("250.0-*").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("sum_value_c"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
  }

  /** The OpenSearch numeric `histogram` aggregation: fixed-interval
    * buckets keyed at floor(value/interval)·interval (interval 25 here),
    * count + exact cents sum per bucket. ES's min_doc_count=0
    * empty-bucket fill is presentation-layer (a bounded
    * sequence(min,max) dim, never a data pass) — this op compares the
    * occupied buckets; ns_agg_histogram_dense below IS that fill.
    *
    * Scale shape: identical to ns_agg_range — per-row codegen key, one
    * scan, map-side partials, bucket-count-bounded shuffle (value
    * span / interval rows). The bucket key is pinned BIGINT in both
    * engines: Spark's floor() yields LONG while DuckDB's yields
    * DOUBLE, so the oracle casts — same discipline as Exact.sqlSum. */
  private val histInterval = 25
  val histogramAgg: QueryDef = q(
    "ns_agg_histogram",
    s"""SELECT CAST(floor(value / $histInterval) * $histInterval AS BIGINT) AS bucket,
       |  count(*) AS n,
       |  ${sqlSum(sqlCents("value"))} AS sum_value_c
       |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy((floor(col("value") / histInterval) * histInterval)
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("sum_value_c"))
  }

  /** ns_agg_histogram's `min_doc_count: 0` twin — the dense histogram
    * ES renders, every interval between the observed min and max
    * bucket present with zeroed stats where no docs landed.
    *
    * Scale shape: the proof of the "empty-bucket fill is presentation-
    * layer" claim above — the fill derives from the OCCUPIED-bucket
    * aggregate (bucket-count-sized), via one sequence() explode over a
    * single bounds row left-joined back to the occupied dim. ONE
    * corpus pass total; the dense axis costs (value span / interval)
    * rows however large the corpus is. */
  val histogramDenseAgg: QueryDef = q(
    "ns_agg_histogram_dense",
    s"""WITH occ AS (
       |  SELECT CAST(floor(value / $histInterval) * $histInterval AS BIGINT) AS bucket,
       |    count(*) AS n, ${sqlSum(sqlCents("value"))} AS sum_value_c
       |  FROM events GROUP BY 1),
       |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM occ),
       |d AS (SELECT unnest(generate_series(lo, hi, $histInterval)) AS bucket FROM b)
       |SELECT d.bucket, coalesce(n, 0) AS n, coalesce(sum_value_c, 0) AS sum_value_c
       |FROM d LEFT JOIN occ USING (bucket)""".stripMargin) { (s, dir) =>
    val occ = Tables.events(s, dir)
      .groupBy((floor(col("value") / histInterval) * histInterval)
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("sum_value_c"))
    val dense = occ.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(histInterval.toLong))).as("bucket"))
    dense.join(occ, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value_c"), lit(0L)).as("sum_value_c"))
  }

  /** The OpenSearch `extended_stats` aggregation: count/sum/min/max/avg
    * plus variance and standard deviation per bucket. Determinism
    * discipline: moments accumulate as EXACT integer cents (sum) and
    * cents² (sum of squares) longs — order-independent partial
    * aggregation — and variance/std derive from those exact integers
    * by one identical double computation per bucket in both engines:
    * var = (n·Σx² − (Σx)²) / n² in cents², std = sqrt. One codegen
    * pass, map-side partials, |buckets| output rows. The squared-cents
    * accumulator runs in DECIMAL(38)/HUGEINT — a per-row square is
    * ~1e9 cents², so a long Σx² overflows around 1e10 rows, inside
    * 100 TB territory; the 38-digit accumulator does not (the emitted
    * column pins back to int64, exact at the compared scales). */
  val extendedStatsAgg: QueryDef = q(
    "ns_agg_extended_stats",
    s"""WITH m AS (SELECT event_type, count(*) AS n,
       |    ${sqlSum(sqlCents("value"))} AS sum_c,
       |    CAST(SUM(CAST(${sqlCents("value")} AS HUGEINT) * ${sqlCents("value")}) AS BIGINT) AS sumsq_c2,
       |    min(value) AS min_value, max(value) AS max_value
       |  FROM events GROUP BY 1)
       |SELECT event_type, n, sum_c, min_value, max_value,
       |  round(CAST(sum_c AS DOUBLE) / 100.0 / n, 6) AS avg_value,
       |  round((CAST(n AS DOUBLE) * sumsq_c2 - CAST(sum_c AS DOUBLE) * sum_c)
       |        / (CAST(n AS DOUBLE) * n) / 10000.0, 6) AS variance,
       |  round(sqrt((CAST(n AS DOUBLE) * sumsq_c2 - CAST(sum_c AS DOUBLE) * sum_c)
       |        / (CAST(n AS DOUBLE) * n)) / 100.0, 6) AS std_dev
       |FROM m""".stripMargin) { (s, dir) =>
    val c = cents(col("value"))
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(c).as("sum_c"),
        Exact.toLongChecked(
          sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 0)) * c))
          .as("sumsq_c2"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("event_type"), col("n"), col("sum_c"), col("min_value"), col("max_value"),
        round(col("sum_c").cast("double") / 100.0 / col("n"), 6).as("avg_value"),
        round((col("n").cast("double") * col("sumsq_c2") - col("sum_c").cast("double") * col("sum_c"))
          / (col("n").cast("double") * col("n")) / 10000.0, 6).as("variance"),
        round(sqrt((col("n").cast("double") * col("sumsq_c2") - col("sum_c").cast("double") * col("sum_c"))
          / (col("n").cast("double") * col("n"))) / 100.0, 6).as("std_dev"))
  }

  /** The OpenSearch `matrix_stats` aggregation — the multi-field
    * statistics module: per bucket, each field's mean/variance plus the
    * COVARIANCE and CORRELATION between fields ("does latency move with
    * payload size"). Fields here: x = value in exact cents, y = user_id.
    *
    * Scale/determinism shape (the extended_stats discipline): all five
    * moments (Σx, Σy, Σx², Σy², Σxy) accumulate as exact integers —
    * order-independent map-side partials, the cross/squared sums riding
    * the DECIMAL(38) accumulator against int64 overflow at 100 TB row
    * counts — and every double derivation (mean, variance, covariance,
    * correlation) is ONE identical fixed-order expression both engines
    * evaluate on the same exact integer inputs. One codegen pass,
    * |buckets| output rows. */
  val matrixStatsAgg: QueryDef = q(
    "ns_agg_matrix_stats",
    s"""WITH m AS (SELECT event_type, count(*) AS n,
       |    ${sqlSum(sqlCents("value"))} AS sx,
       |    ${sqlSum("user_id")} AS sy,
       |    CAST(SUM(CAST(${sqlCents("value")} AS HUGEINT) * ${sqlCents("value")}) AS BIGINT) AS sxx,
       |    CAST(SUM(CAST(user_id AS HUGEINT) * user_id) AS BIGINT) AS syy,
       |    CAST(SUM(CAST(${sqlCents("value")} AS HUGEINT) * user_id) AS BIGINT) AS sxy
       |  FROM events GROUP BY 1)
       |SELECT event_type, n,
       |  round(CAST(sx AS DOUBLE) / n / 100.0, 6) AS mean_value,
       |  round(CAST(sy AS DOUBLE) / n, 6) AS mean_user,
       |  round((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
       |        / (CAST(n AS DOUBLE) * n) / 10000.0, 6) AS var_value,
       |  round((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
       |        / (CAST(n AS DOUBLE) * n), 6) AS var_user,
       |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       |        / (CAST(n AS DOUBLE) * n) / 100.0, 6) AS cov_xy,
       |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       |        / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
       |           * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS corr_xy
       |FROM m""".stripMargin) { (s, dir) =>
    val x = cents(col("value"))
    val y = col("user_id")
    val dec = (c: org.apache.spark.sql.Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sumExact(x).as("sx"),
        sumExact(y).as("sy"),
        Exact.toLongChecked(sum(dec(x) * x)).as("sxx"),
        Exact.toLongChecked(sum(dec(y) * y)).as("syy"),
        Exact.toLongChecked(sum(dec(x) * y)).as("sxy"))
      .select(col("event_type"), col("n"),
        round(col("sx").cast("double") / col("n") / 100.0, 6).as("mean_value"),
        round(col("sy").cast("double") / col("n"), 6).as("mean_user"),
        round((col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx"))
          / (col("n").cast("double") * col("n")) / 10000.0, 6).as("var_value"),
        round((col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy"))
          / (col("n").cast("double") * col("n")), 6).as("var_user"),
        round((col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy"))
          / (col("n").cast("double") * col("n")) / 100.0, 6).as("cov_xy"),
        round((col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy"))
          / (sqrt(col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx"))
            * sqrt(col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy"))), 6)
          .as("corr_xy"))
  }

  /** The OpenSearch `percentile_ranks` aggregation — the inverse of
    * percentiles: for fixed values, the fraction of documents at or
    * below each ("what share of requests beat the 50/100/200 SLO").
    * Exact long conditional counts per bucket (order-independent
    * partials), one double division per rank — no sort anywhere,
    * unlike the forward percentile which must order values. */
  val percentileRanksAgg: QueryDef = q(
    "ns_agg_percentile_ranks",
    """SELECT event_type, count(*) AS n,
      |  round(CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS pr_50,
      |  round(CAST(sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS pr_100,
      |  round(CAST(sum(CASE WHEN value <= 200 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS pr_200
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    def below(x: Double) = sum(when(col("value") <= x, 1L).otherwise(0L))
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        below(50).as("b50"), below(100).as("b100"), below(200).as("b200"))
      .select(col("event_type"), col("n"),
        round(col("b50").cast("double") / col("n"), 6).as("pr_50"),
        round(col("b100").cast("double") / col("n"), 6).as("pr_100"),
        round(col("b200").cast("double") / col("n"), 6).as("pr_200"))
  }

  /** The OpenSearch `weighted_avg` aggregation: Σ(v·w)/Σ(w) per bucket
    * — value weighted by a per-doc weight (here 1 + user_id % 5, a
    * deterministic stand-in for a confidence/boost field). Numerator
    * in exact integer cents·weight, denominator an exact long sum; one
    * double division per bucket. */
  val weightedAvgAgg: QueryDef = q(
    "ns_agg_weighted_avg",
    s"""SELECT event_type,
       |  ${sqlSum(s"${sqlCents("value")} * (1 + user_id % 5)")} AS wsum_c,
       |  ${sqlSum("1 + user_id % 5")} AS wtotal,
       |  round(CAST(${sqlSum(s"${sqlCents("value")} * (1 + user_id % 5)")} AS DOUBLE)
       |        / ${sqlSum("1 + user_id % 5")} / 100.0, 6) AS weighted_avg
       |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    val w = lit(1L) + pmod(col("user_id"), lit(5L))
    Tables.events(s, dir)
      .groupBy("event_type")
      // wsum_c through the DECIMAL(38) accumulator like the other money
      // sums: a cents·weight term carries ~5× less int64 headroom than
      // the plain cents sums it sits next to
      .agg(Exact.sumExact(cents(col("value")) * w).as("wsum_c"),
        sum(w).as("wtotal"))
      .select(col("event_type"), col("wsum_c"), col("wtotal"),
        round(col("wsum_c").cast("double") / col("wtotal") / 100.0, 6).as("weighted_avg"))
  }

  /** The OpenSearch `top_metrics` aggregation: the metric values of the
    * LATEST document per bucket (sort on the time field, size 1) — the
    * "current reading per series" dashboard primitive. Implemented as
    * max over a (ts, tiebreak, metrics…) struct: struct ordering IS
    * the sort + tie-break, a single map-side-combining aggregate — no
    * per-bucket window sort of the events, no shuffle beyond the
    * |buckets| groups. The oracle's arg-max mirrors it with the same
    * (ts_ms, event_id) keyset via a window over the tiny residual. */
  val topMetricsAgg: QueryDef = q(
    "ns_agg_top_metrics",
    s"""SELECT event_type, ts_ms AS top_ms, event_id AS top_event_id,
       |  ${sqlCents("value")} AS top_value_c
       |FROM (SELECT event_type, epoch_ms(ts) AS ts_ms, event_id, value,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rk
       |  FROM events)
       |WHERE rk = 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(max(struct(col("ts_ms"), col("event_id"),
        cents(col("value")).as("vc"))).as("m"))
      .select(col("event_type"),
        col("m.ts_ms").as("top_ms"),
        col("m.event_id").as("top_event_id"),
        col("m.vc").as("top_value_c"))
  }

  /** The OpenSearch `prefix` query (keyword-field edition) with a terms
    * roll-up of the matches — `source: src1*` covering src1, src10–19.
    *
    * Scale shape: the reason prefix (unlike wildcard/regexp) is cheap
    * at 100 TB — a string prefix is a RANGE predicate, so
    * StringStartsWith pushes into the parquet scan as PushedFilters
    * and row-group min/max stats skip non-matching groups entirely;
    * the scan reads only (doc_id, source). PlanSpec locks the
    * pushdown. */
  val prefixQuery: QueryDef = q(
    "ns_search_prefix",
    """SELECT source, count(*) AS n, min(doc_id) AS first_doc
      |FROM documents WHERE starts_with(source, 'src1')
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .filter(col("source").startsWith("src1"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
  }

  /** ES wildcard pattern → SQL LIKE: `*` is any run, `?` one char; SQL
    * specials escaped so a literal `%`/`_` in the pattern stays literal. */
  private def wildcardToLike(p: String): String =
    p.flatMap {
      case '*' => "%"
      case '?' => "_"
      case c @ ('%' | '_' | '\\') => s"\\$c"
      case c => c.toString
    }

  /** The literal prefix before the first wildcard — the pushdown-able
    * residue of a wildcard pattern. */
  private def wildcardPrefix(p: String): String = p.takeWhile(c => c != '*' && c != '?')

  /** The OpenSearch `wildcard` query — the second-most-typed Kibana
    * search-box operator after prefix (`source: src*2`). The honest
    * 100 TB contrast with ns_search_prefix: an INNER wildcard is not a
    * range predicate, so the match itself can never push into the
    * parquet scan or skip row groups — the discipline is (a) derive the
    * longest literal PREFIX of the pattern and push THAT down as
    * StringStartsWith (row-group stats skip everything outside the
    * prefix range) and (b) evaluate the residual LIKE as a codegen
    * filter over only the prefix-surviving rows. A pattern with no
    * literal prefix (`*foo*`) degrades to a full keyword-column scan —
    * the same cliff ES documents for leading-wildcard queries. */
  private val wildcardPattern = "src*2"
  val wildcardQuery: QueryDef = q(
    "ns_search_wildcard",
    s"""SELECT source, count(*) AS n, min(doc_id) AS first_doc
       |FROM documents
       |WHERE starts_with(source, '${wildcardPrefix(wildcardPattern)}')
       |  AND source LIKE '${wildcardToLike(wildcardPattern)}'
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      // the derived-prefix conjunct is the ONLY part the scan can use;
      // it must stay a separate startsWith so it reaches PushedFilters
      .filter(col("source").startsWith(wildcardPrefix(wildcardPattern)))
      .filter(col("source").like(wildcardToLike(wildcardPattern)))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
  }

  /** The OpenSearch `regexp` query — ES semantics are ANCHORED (the
    * pattern must match the WHOLE term), so the Spark rlike and the
    * oracle both pin `^...$` explicitly; `src[0-9]{2}` matches exactly
    * the two-digit sources. Scale posture: like wildcard, a regex can
    * never push into the scan — the plan is a pruned (doc_id, source)
    * scan + a codegen rlike filter, and the honest guidance at 100 TB
    * is to route every regex with a literal prefix through the
    * wildcard/prefix pushdown first. */
  private val regexpPattern = "src[0-9]{2}"
  val regexpQuery: QueryDef = q(
    "ns_search_regexp",
    s"""SELECT source, count(*) AS n, min(doc_id) AS first_doc
       |FROM documents WHERE regexp_matches(source, '^$regexpPattern$$')
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .filter(col("source").rlike(s"^$regexpPattern$$"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
  }

  /** The OpenSearch `adjacency_matrix` aggregation: named filters and
    * the doc counts of every filter AND every pairwise intersection —
    * the co-occurrence matrix behind segment-overlap dashboards
    * ("how many purchase events are ALSO high-value ALSO even-user").
    *
    * Scale shape: ES evaluates each doc against all filters once; here
    * that is ONE codegen pass computing the three booleans and
    * conditional-summing all six cells in a single aggregate — no
    * explode, no self-join of filter streams, no per-cell pass. The
    * single-row result unpivots via stack() into ES's (key, doc_count)
    * bucket rows, with the `A&B` key naming the intersection exactly
    * as the agg does. Always 6 rows: cell counts, including empty
    * cells, are the matrix contract both engines agree on. */
  val adjacencyMatrixAgg: QueryDef = q(
    "ns_agg_adjacency_matrix",
    """WITH f AS (SELECT event_type = 'purchase' AS a, value >= 150 AS b,
      |    user_id % 2 = 0 AS c FROM events),
      |s AS (SELECT
      |  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ka,
      |  CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS kb,
      |  CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS kc,
      |  CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS kab,
      |  CAST(sum(CASE WHEN a AND c THEN 1 ELSE 0 END) AS BIGINT) AS kac,
      |  CAST(sum(CASE WHEN b AND c THEN 1 ELSE 0 END) AS BIGINT) AS kbc
      |FROM f)
      |SELECT 'A' AS key, ka AS doc_count FROM s
      |UNION ALL SELECT 'B', kb FROM s
      |UNION ALL SELECT 'C', kc FROM s
      |UNION ALL SELECT 'A&B', kab FROM s
      |UNION ALL SELECT 'A&C', kac FROM s
      |UNION ALL SELECT 'B&C', kbc FROM s""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(
        (col("event_type") === "purchase").as("a"),
        (col("value") >= 150).as("b"),
        (pmod(col("user_id"), lit(2)) === 0).as("c"))
      .agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("ka"),
        sum(when(col("b"), 1L).otherwise(0L)).as("kb"),
        sum(when(col("c"), 1L).otherwise(0L)).as("kc"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("kab"),
        sum(when(col("a") && col("c"), 1L).otherwise(0L)).as("kac"),
        sum(when(col("b") && col("c"), 1L).otherwise(0L)).as("kbc"))
      .select(expr(
        "stack(6, 'A', ka, 'B', kb, 'C', kc, 'A&B', kab, 'A&C', kac, 'B&C', kbc) AS (key, doc_count)"))
  }

  /** Keyset pagination — the OpenSearch `search_after` pattern, the
    * at-scale replacement for deep OFFSET paging: the page is defined
    * by a predicate on the (sort key, tiebreak id) keyset of the last
    * row already served — where OFFSET N reads and discards all N
    * earlier rows on every page. The filter is the production two-part
    * shape: a RAW-COLUMN bound (`ts >= boundary`, typed to the file's
    * native encoding via Tables.tsLiteral, a superset of
    * the keyset) that PUSHES INTO the parquet scan (PushedFilters +
    * row-group stats skip everything already paged; the exact keyset
    * test references derived/tiebreak columns and cannot push), plus
    * the exact keyset residual on the micros view both engines share.
    * The page itself plans as TakeOrderedAndProject (per-partition
    * heaps of pageSize rows), and the (ts, event_id) total order makes
    * the page's row SET deterministic in both engines. */
  private val pageAfterMicros = 1705276800000000L // 2024-01-15T00:00:00Z
  private val pageSize = 100
  val searchAfter: QueryDef = q(
    "ns_search_after",
    s"""SELECT event_id, ts, event_type FROM events
       |WHERE ts > make_timestamp($pageAfterMicros)
       |   OR (ts = make_timestamp($pageAfterMicros) AND event_id > 0)
       |ORDER BY ts, event_id LIMIT $pageSize""".stripMargin) { (s, dir) =>
    // scans the date-partitioned twin: the cursor's raw-ts superset
    // bound mirrors onto the dt partition column, so a deep page lists
    // only the day directories at-or-after the cursor (16 of 30 here;
    // PlanSpec locks the PartitionFilters + exact partitionCount) —
    // row-identical to the flat table, so the oracle stays valid
    val ev = Tables.eventsDt(s, dir)
    val tsMicros = Tables.tsMicros(ev)
    ev
      .filter(col("ts") >= Tables.tsLiteral(ev, pageAfterMicros)) // pushable bound (native ts)
      .filter(col("dt") >= lit(Tables.microsDay(pageAfterMicros))) // day-partition bound
      .filter(tsMicros > pageAfterMicros ||
        (tsMicros === pageAfterMicros && col("event_id") > 0L))
      .select(col("event_id"), col("tsu").as("ts"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .limit(pageSize)
  }

  /** Composite aggregation — the OpenSearch `composite` agg with
    * after-key pagination, the at-scale way to ENUMERATE all buckets of
    * a high-cardinality aggregation (a plain terms agg caps at
    * `size` buckets and degrades; composite streams them in key order,
    * page by page). Sources here: terms(event_type) × date day buckets.
    *
    * The scale insight composite exists for: the after-key is a
    * predicate on the GROUP KEYS, and group keys are row attributes —
    * so the page filter applies BEFORE aggregation, at the scan. Rows
    * of already-served buckets are never read (raw-column superset
    * bound `event_type >= after.type` reaches PushedFilters; the exact
    * (type, day) keyset residual runs in codegen above it), the agg
    * shuffles only surviving groups, and the page plans as
    * TakeOrderedAndProject over bucket rows (series × days, dashboard-
    * sized at any SF). Value sums in exact integer cents. */
  private val compAfterType = "error"
  private val compAfterDay = "2024-01-20"
  private val compPageSize = 25
  val compositeAgg: QueryDef = q(
    "ns_agg_composite",
    s"""WITH f AS (
       |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, value
       |  FROM events
       |  WHERE event_type > '$compAfterType'
       |     OR (event_type = '$compAfterType'
       |         AND CAST(date_trunc('day', ts) AS DATE) > DATE '$compAfterDay'))
       |SELECT event_type, day, count(*) AS n, ${sqlSum(sqlCents("value"))} AS sum_value_c
       |FROM f GROUP BY 1, 2
       |ORDER BY event_type, day LIMIT $compPageSize""".stripMargin) { (s, dir) =>
    val day = date_trunc("day", col("tsu")).cast("date")
    Tables.events(s, dir)
      .filter(col("event_type") >= compAfterType) // pushable bound (raw column)
      .filter(col("event_type") > compAfterType ||
        (col("event_type") === compAfterType && day > lit(java.sql.Date.valueOf(compAfterDay))))
      .groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .orderBy(col("event_type"), col("day"))
      .limit(compPageSize)
  }

  /** Exact distinct aggregation (expand + two-phase hash agg in Spark). */
  val aggDistinct: QueryDef = q(
    "ns_agg_distinct",
    s"""SELECT event_type,
       |  count(DISTINCT user_id) AS nd_users,
       |  count(*) AS n,
       |  ${sqlSum(sqlCents("value"))} AS sum_value_c
       |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("nd_users"),
        count(lit(1)).as("n"),
        sum(cents(col("value"))).as("sum_value_c"))
  }

  /** ROLLUP over a dimension join (grouping-sets aggregation). */
  val rollupAgg: QueryDef = q(
    "ns_rollup",
    s"""SELECT n_name, count(*) AS n, ${sqlSum(sqlCents("c_acctbal"))} AS sum_bal_c
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY ROLLUP(n_name)""".stripMargin) { (s, dir) =>
    // Aliased join sides: Spark 4's ambiguous-self-join check otherwise
    // trips on the rollup's re-resolved n_name attribute.
    Tables.customer(s, dir).as("c")
      .join(broadcast(Tables.nation(s, dir).as("n")),
        col("c.c_nationkey") === col("n.n_nationkey"))
      .rollup(col("n.n_name").as("n_name"))
      .agg(count(lit(1)).as("n"), sum(cents(col("c_acctbal"))).as("sum_bal_c"))
  }

  /** CUBE over two dimensions — all four grouping sets in one pass
    * (Spark plans one Expand + single shuffle, not four scans). */
  val cubeAgg: QueryDef = q(
    "ns_cube",
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       |  ${sqlSum(sqlCents("l_quantity"))} AS sum_qty_c
       |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) {
    (s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(cents(col("l_quantity"))).as("sum_qty_c"))
  }

  /** Explicit GROUPING SETS — the general form rollup/cube specialize:
    * an arbitrary set list ((flag, status), (status), ()) in ONE pass.
    * Spark plans a single Expand + one shuffle for all three sets —
    * never one scan per set — the same 100 TB shape as ns_cube. */
  val groupingSetsAgg: QueryDef = q(
    "ns_grouping_sets",
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       |  ${sqlSum(sqlCents("l_quantity"))} AS sum_qty_c
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin,
    // all three grouping levels materialize: the grand-total row, the
    // one-dim rows, and the full (flag, status) rows
    liveness = Seq(
      "all_three_grouping_levels_present" ->
        ("SELECT count(CASE WHEN l_returnflag IS NULL AND l_linestatus IS NULL THEN 1 END) = 1 AND " +
          "count(CASE WHEN l_returnflag IS NULL AND l_linestatus IS NOT NULL THEN 1 END) > 0 AND " +
          "count(CASE WHEN l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL THEN 1 END) > 0 FROM r"))) {
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(cents(col("l_quantity"))).as("sum_qty_c"))
  }

  /** Pivot: event counts per user bucket × event_type. The oracle uses
    * portable conditional aggregation (FILTER), which is exactly the
    * plan Spark lowers pivot to (one pass, no per-column scans). */
  val pivotAgg: QueryDef = {
    val types = Seq("view", "click", "signup", "purchase", "refund")
    q(
      "ns_pivot",
      s"""SELECT user_id % 10 AS bucket,
         |  ${types.map(t => s"count(*) FILTER (event_type = '$t') AS n_$t").mkString(", ")}
         |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy((col("user_id") % 10).as("bucket"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("bucket") +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
    }
  }

  /** As-of join — for every event, the user's most recent purchase at
    * or before it. Spark has no native as-of join; the scalable
    * re-expression is the union-tag trick: tag dim rows 0 and probe
    * rows 1, sort within each key by (ts, tag) — dim first at equal ts
    * gives the inclusive <= — and carry the last non-null dim value
    * with a running `last(..., ignoreNulls)` window. ONE shuffle + one
    * sort, both on the join key: no range join, no per-row scan of the
    * dim — the plan a 100 TB time-series join needs. The oracle is
    * DuckDB's native ASOF LEFT JOIN. */
  val joinAsof: QueryDef = q(
    "ns_join_asof",
    """WITH p AS (SELECT user_id, epoch_ms(ts) AS p_ms, min(event_id) AS p_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ms,
      |  p.p_id AS prior_purchase_id, p.p_ms AS prior_purchase_ms
      |FROM events e ASOF LEFT JOIN p
      |  ON e.user_id = p.user_id AND epoch_ms(e.ts) >= p.p_ms""".stripMargin,
    // both ASOF branches: events with a prior purchase carry it, events
    // before their user's first purchase carry the left-join null
    liveness = Seq(
      "matched_and_unmatched_asof_rows" ->
        ("SELECT count(CASE WHEN prior_purchase_id IS NOT NULL THEN 1 END) > 0 AND " +
          "count(CASE WHEN prior_purchase_id IS NULL THEN 1 END) > 0 FROM r"))) {
    (s, dir) =>
      val ev = Tables.events(s, dir)
      // one dim row per (user, ts): ASOF picks a unique row per ts
      val dim = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_ms").as("ms"))
        .agg(min(col("event_id")).as("p_id"))
        .select(col("user_id"), col("ms"), col("p_id"),
          lit(0).as("tag"), lit(null).cast("long").as("event_id"))
      val probe = ev.select(col("user_id"), col("ts_ms").as("ms"),
        lit(null).cast("long").as("p_id"), lit(1).as("tag"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy(col("ms"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dim.unionByName(probe)
        .withColumn("prior_purchase_id", last(col("p_id"), ignoreNulls = true).over(w))
        .withColumn("prior_purchase_ms",
          last(when(col("tag") === 0, col("ms")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("ms"),
          col("prior_purchase_id"), col("prior_purchase_ms"))
  }

  /** Big⋈big shuffle join: orders⋈lineitem, revenue per priority. */
  val joinHash: QueryDef = q(
    "ns_join_hash",
    s"""SELECT o_orderpriority,
       |  ${sqlSum(sqlCents4("l_extendedprice*(1-l_discount)"))} AS revenue_c,
       |  count(*) AS n_items,
       |  count(DISTINCT o_orderkey) AS n_orders
       |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    // r21 (guide §2.3/§3.3): aggregate lineitem to ONE row per order
    // BEFORE the join — the join then moves |orders| pre-summed rows
    // instead of |lineitem| raw rows (6–7× fewer bytes at TPC-H fan-out,
    // the dominant shuffle at 100 TB), and the countDistinct disappears:
    // each pre-aggregated row IS one distinct order, so n_orders is a
    // plain count and the expand-based distinct aggregation (a second
    // full-width shuffle) is gone. Exact parity: per-order cents4 sums
    // ride the same DECIMAL(38) accumulator and re-sum exactly (integer
    // units, sum-of-sums ≡ sum); an order has bounded line count so the
    // per-order long cannot overflow. Par.spread parallelizes the local
    // single-split partial aggregation (passthrough at scale).
    val perOrder = Par.spread(s, Tables.lineitem(s, dir), col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        sumExact(cents4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_c"),
        count(lit(1)).as("n"))
    Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      .join(perOrder, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sumExact(col("rev_c")).as("revenue_c"),
        sum(col("n")).as("n_items"),
        count(lit(1)).as("n_orders"))
  }

  /** Star-schema dimension join with explicit broadcast hints. */
  val joinBroadcast: QueryDef = q(
    "ns_join_broadcast",
    s"""SELECT r_name, count(*) AS n_cust, ${sqlSum(sqlCents("c_acctbal"))} AS sum_bal_c
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_cust"), sum(cents(col("c_acctbal"))).as("sum_bal_c"))
  }

  /** Left-semi (EXISTS) and left-anti (NOT EXISTS) joins. The probed
    * relation is urgent-priority orders — the ns_except discipline
    * (r20 liveness): this testdata's orders cover EVERY custkey, so
    * the original any-order form had anti ≡ 0 at every SF and the
    * left-anti operator under test never emitted a row. Against the
    * urgent cut both branches are live everywhere (sf0.001: 132/18,
    * sf0.01: 1297/203, sf0.1: 13014/1986). */
  val semiAnti: QueryDef = q(
    "ns_semi_anti",
    """SELECT 'semi' AS kind, count(*) AS n FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |UNION ALL
      |SELECT 'anti' AS kind, count(*) AS n FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin,
    liveness = Seq(
      "both_join_branches_emit" -> "SELECT min(n) > 0 AND count(*) = 2 FROM r")) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("semi").as("kind"), col("n"))
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("anti").as("kind"), col("n"))
    semi.unionAll(anti)
  }

  /** row_number ranking within user partitions (top-3 events per user).
    * Ordering key (micros timestamp, event_id) is fully deterministic. */
  val windowRank: QueryDef = q(
    "ns_window_rank",
    """SELECT user_id, event_id, event_type, rn FROM (
      |  SELECT user_id, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events) WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id", "event_type", "rn")
  }

  /** Sliding frame aggregation (3-row moving sum per user). */
  val windowFrame: QueryDef = q(
    "ns_window_frame",
    s"""SELECT event_id, user_id,
       |  CAST(sum(${sqlCents("value")}) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS run_c
       |FROM events""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        sum(cents(col("value"))).over(w).as("run_c"))
  }

  /** lag/lead offsets: per-user inter-arrival gaps — one window sort
    * serves both offsets (and the windowFrame/windowRank specs share
    * its (user, time) clustering, so a multi-window query would reuse
    * the exchange). */
  val windowLagLead: QueryDef = q(
    "ns_window_lag_lead",
    """SELECT event_id, user_id,
      |  epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_prev_ms,
      |  lead(epoch_ms(ts)) OVER w - epoch_ms(ts) AS gap_next_ms
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    // both offset branches: interior rows carry real gaps, partition
    // boundaries carry the null the offset functions define there
    liveness = Seq(
      "boundary_nulls_and_interior_gaps" ->
        ("SELECT count(CASE WHEN gap_prev_ms IS NULL THEN 1 END) > 0 AND " +
          "count(CASE WHEN gap_prev_ms IS NOT NULL THEN 1 END) > 0 AND " +
          "count(CASE WHEN gap_next_ms IS NULL THEN 1 END) > 0 FROM r"))) {
    (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          (col("ts_ms") - lag(col("ts_ms"), 1).over(w)).as("gap_prev_ms"),
          (lead(col("ts_ms"), 1).over(w) - col("ts_ms")).as("gap_next_ms"))
  }

  /** Top-k: compiles to TakeOrderedAndProject (per-partition top-k +
    * merge on the driver side of the exchange — no global sort). */
  val topK: QueryDef = q(
    "ns_topk",
    s"""SELECT o_orderkey, ${sqlCents("o_totalprice")} AS price_c
       |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
  }

  /** UNION (distinct) of two customer segments. */
  val unionOp: QueryDef = q(
    "ns_union",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT c_custkey FROM customer WHERE c_acctbal > 7500""".stripMargin,
    // both input legs live AND the distinct actually collapses overlap
    // (result < sum of legs) — UNION-vs-UNION-ALL discriminating; the
    // segments overlap at every shipped SF (sf0.001: 4 … sf0.1: 736)
    liveness = Seq(
      "both_legs_live_and_overlap_collapsed" ->
        ("SELECT (SELECT count(*) FROM customer WHERE c_mktsegment = 'BUILDING') > 0 AND " +
          "(SELECT count(*) FROM customer WHERE c_acctbal > 7500) > 0 AND " +
          "(SELECT count(*) FROM r) < (SELECT count(*) FROM customer WHERE c_mktsegment = 'BUILDING') + " +
          "(SELECT count(*) FROM customer WHERE c_acctbal > 7500)"))) { (s, dir) =>
    val c = Tables.customer(s, dir)
    c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .union(c.filter(col("c_acctbal") > 7500).select("c_custkey"))
      .distinct()
  }

  /** EXCEPT: building-segment customers minus those with an URGENT
    * order. The right side is priority-restricted because this
    * testdata's orders cover EVERY custkey — the original
    * minus-any-order form returned the empty set at every SF, and the
    * r19 oracle-mutant audit flagged exactly that (negating the WHERE
    * changed nothing: an empty-vs-empty compare can't see the EXCEPT
    * logic at all). The urgent cut keeps both directions live: most
    * BUILDING customers are removed, a deterministic remainder
    * survives (sf0.01: 39 of 302). */
  val exceptOp: QueryDef = q(
    "ns_except",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    // the r19 catch as a standing probe: a non-empty remainder STRICTLY
    // below the left side proves both EXCEPT directions do work (rows
    // survive AND rows are subtracted) — the empty-vs-empty form can
    // never pass this
    liveness = Seq(
      "remainder_nonempty_and_subtraction_bites" ->
        ("SELECT (SELECT count(*) FROM r) > 0 AND (SELECT count(*) FROM r) < " +
          "(SELECT count(DISTINCT c_custkey) FROM customer WHERE c_mktsegment = 'BUILDING')"))) { (s, dir) =>
    Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .except(Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey")))
  }

  /** Salted skew join: when a shuffle join's key distribution is heavy
    * (here ~75% of the fact lands on one key by construction) and the
    * dimension is too large to broadcast, the hot key's rows all hash to
    * one reduce task. Salting fans the fact out over S sub-keys
    * (deterministic hash of the row id) and replicates each dim row S
    * times, so the hot key spreads across S tasks; the join result is
    * identical to the unsalted join — which is exactly what the DuckDB
    * oracle runs. The shuffle_hash hint forces the shuffled-join regime
    * the technique targets (AQE would otherwise broadcast the small test
    * dim). AQE's skew-join split solves the same problem adaptively for
    * sort-merge joins; salting is the plan-level form that also covers
    * hash joins and stateful streaming joins. */
  val joinSkewSalted: QueryDef = {
    val S = 8
    q(
      "ns_join_skew_salted",
      """WITH fact AS (SELECT event_id,
        |    CASE WHEN user_id % 4 < 3 THEN 0 ELSE user_id % 25 END AS nk FROM events),
        |j AS (SELECT f.event_id, n.n_name FROM fact f JOIN nation n ON n.n_nationkey = f.nk)
        |SELECT n_name, count(*) AS n_events FROM j GROUP BY 1""".stripMargin) {
      (s, dir) =>
        val fact = Tables.events(s, dir)
          .select(col("event_id"),
            when(col("user_id") % 4 < 3, lit(0))
              .otherwise(col("user_id") % 25).cast("int").as("nk"))
          .withColumn("salt", pmod(hash(col("event_id")), lit(S)))
        val dim = Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"),
            explode(expr(s"sequence(0, ${S - 1})")).as("salt"))
        fact
          .join(dim.hint("shuffle_hash"),
            fact("nk") === dim("n_nationkey") && fact("salt") === dim("salt"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_events"))
    }
  }

  /** Exact interpolated percentiles per group: Spark's `percentile` and
    * DuckDB's `quantile_cont` share the same definition (sort + linear
    * interpolation), so the values hash-match at 6 dp. Spark plans this
    * as a partial/final ObjectHashAggregate — distributed sort-free
    * exact percentiles; the approximate path at extreme scale is
    * `percentile_approx` (not oracle-matchable: different sketches). */
  val aggPercentile: QueryDef = q(
    "ns_agg_percentile",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
      |FROM lineitem GROUP BY 1""".stripMargin) {
    (s, dir) =>
      // one percentile(col, array(...)) call: a single value-multiset
      // aggregation buffer serves all three quantiles, not three.
      // Par.spread (r21): the multiset buffering ran in ONE scan task
      // locally (1.1–1.8 s); spread parallelizes the partial buffers,
      // passthrough on a wide scan at scale.
      Par.spread(s, Tables.lineitem(s, dir), col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("ps"))
        .select(col("l_returnflag"),
          round(col("ps").getItem(0), 6).as("p25"),
          round(col("ps").getItem(1), 6).as("p50"),
          round(col("ps").getItem(2), 6).as("p75"))
  }

  /** percentile_approx accuracy: rank error ≤ n/accuracy. */
  val approxAccuracy = 10000

  /** Bounded-memory percentile sketch — the production default at
    * 100 TB. ns_agg_percentile's exact path holds each group's value
    * multiset in its aggregation buffer (memory-bound per group at
    * corpus scale); percentile_approx's quantile summary is bounded by
    * the accuracy parameter instead. The sketch is engine-specific so
    * no cross-engine oracle exists (rows-only check); PercentileSpec
    * asserts the sketch's rank-error contract against the data. */
  val aggPercentileApprox: QueryDef = QueryDef(
    "ns_agg_percentile_approx",
    (s, dir) => Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(expr(s"percentile_approx(l_extendedprice, array(0.25D, 0.5D, 0.75D), $approxAccuracy)").as("ps"))
      .select(col("l_returnflag"),
        col("ps").getItem(0).as("p25"),
        col("ps").getItem(1).as("p50"),
        col("ps").getItem(2).as("p75")),
    None)

  /** Bounded-memory distinct-count sketch (HyperLogLog++) — the
    * production twin of ns_agg_distinct, whose exact expand + second
    * shuffle is the costly path at corpus scale. Engine-specific sketch
    * → rows-only check; PercentileSpec asserts the relative-error
    * contract against the exact count. */
  val aggApproxDistinct: QueryDef = QueryDef(
    "ns_agg_approx_distinct",
    (s, dir) => Tables.events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        count(lit(1)).as("n")),
    None)

  /** Mergeable distinct-count sketches — the INCREMENTAL-stats shape at
    * 100 TB: each ingestion batch aggregates its own DataSketches HLL
    * per group (here: two deterministic halves standing in for two
    * batches), the small sketch rows persist, and the corpus-wide
    * distinct count is a union over sketches — history is never
    * rescanned. Sketch registers under union of same-lgK sketches equal
    * the direct single-pass build's exactly, so the two paths are
    * estimate-IDENTICAL (SketchSpec asserts it), not merely close.
    * Engine-specific binary → rows-only check, like the other two
    * sketch twins. */
  val aggSketchPartial: QueryDef = QueryDef(
    "ns_agg_sketch_partial",
    (s, dir) => Tables.events(s, dir)
      .withColumn("half", col("event_id") % 2)
      .groupBy("event_type", "half")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users")),
    None)

  /** Log-volume anomaly detection — the alerting question the
    * reference's ES/Kibana downstream exists to answer ("this log
    * group's hourly volume just spiked"): per event_type, flag hours
    * whose count deviates from that type's mean by more than 3σ.
    *
    * Exactness discipline: the 3σ test runs ENTIRELY in integer
    * arithmetic — with per-type hour count n, Σc = s, Σc² = q, the
    * population z-test |c−μ| > 3σ is equivalent to
    * (n·c − s)² > 9·(n·q − s²), all longs, so both engines agree
    * bit-exactly with no float threshold drift (a float z-score
    * compared against 3.0 can flip on the last ulp; the cross-
    * multiplied form cannot). The reported z itself is derived from
    * the same exact longs by one division + sqrt, round-6. Long
    * arithmetic is exact to ~3e9 events/hour over day-scale spans; a
    * deployment aggregating beyond that lifts s/q to decimal(38,0) in
    * the same plan shape.
    *
    * Scale shape: one corpus scan → map-side-combined (type, hour)
    * count whose output is bounded by the time span, never the event
    * count; the per-type stats re-aggregate the HOURLY table (the
    * ns_significant_terms discipline — identical subtrees so the scan
    * executes once) and broadcast back onto it. Output is only the
    * anomalous rows. */
  val anomalyZscore: QueryDef = q(
    "ns_anomaly_zscore",
    """WITH h AS (SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS hr_ms,
      |    count(*) AS c FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, count(*) AS n,
      |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
      |  FROM h GROUP BY 1)
      |SELECT event_type, hr_ms, c AS cnt,
      |  round(CAST(n * c - s AS DOUBLE) / sqrt(CAST(n * q - s * s AS DOUBLE)), 6) AS z
      |FROM h JOIN st USING (event_type)
      |WHERE (n * c - s) * (n * c - s) > 9 * (n * q - s * s)""".stripMargin) { (s, dir) =>
    val h = Tables.events(s, dir)
      .groupBy(col("event_type"), unix_millis(date_trunc("hour", col("tsu"))).as("hr_ms"))
      .agg(count(lit(1)).as("c"))
    val st = h.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))
    h.join(broadcast(st), "event_type")
      .withColumn("num", col("n") * col("c") - col("s"))
      .withColumn("den", col("n") * col("q") - col("s") * col("s"))
      .filter(col("num") * col("num") > lit(9L) * col("den"))
      .select(col("event_type"), col("hr_ms"), col("c").as("cnt"),
        round(col("num").cast("double") / sqrt(col("den").cast("double")), 6).as("z"))
  }

  def entries: Seq[QueryDef] = Seq(
    aggHash, aggDistinct, dateHistogram, dateHistogramPipeline, searchAfter,
    rangeAgg, histogramAgg, histogramDenseAgg, prefixQuery, wildcardQuery,
    regexpQuery, adjacencyMatrixAgg,
    extendedStatsAgg, matrixStatsAgg, weightedAvgAgg, topMetricsAgg,
    percentileRanksAgg,
    compositeAgg, rollupAgg, cubeAgg, groupingSetsAgg, pivotAgg, joinHash,
    joinBroadcast, semiAnti, joinAsof, windowRank, windowFrame,
    windowLagLead, topK, unionOp, exceptOp, joinSkewSalted,
    aggPercentile, aggPercentileApprox, aggApproxDistinct, aggSketchPartial,
    anomalyZscore)
}
