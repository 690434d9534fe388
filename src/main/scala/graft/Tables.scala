package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's read-only testdata (TESTDATA.md).
  *
  * `events.ts` has shipped under two parquet encodings across testdata
  * generations: TIMESTAMP(NANOS) — unreadable natively by Spark
  * (PARQUET_TYPE_ILLEGAL), surfaced as a nanosecond LONG via
  * `spark.sql.legacy.parquet.nanosAsLong` — and plain `timestamp[us]`,
  * which Spark reads as TIMESTAMP_NTZ (or TIMESTAMP when the file is
  * UTC-adjusted). The loader branches on the RESOLVED dtype so both
  * encodings (and any future regeneration) present one stable contract:
  *
  *   - `ts`    — the file's native column, untouched (filters on it
  *               still reach the parquet scan's PushedFilters);
  *   - `ts_ms` — epoch millis, LONG (floored, matching DuckDB
  *               `epoch_ms(ts)` which sees the file at micro precision);
  *   - `tsu`   — TIMESTAMP at micro precision (the instant DuckDB sees).
  */
object Tables {
  /** Session-scoped CATALOG of resolved table frames (r21, guide §1/§6):
    * `spark.read.parquet` pays file listing + a footer schema read +
    * full analysis on EVERY call — measured 40–60 ms per table access,
    * which at 339 queries × several passes was ~15–20% of the whole
    * bench (ProfileBench: even `ns_topk`'s construct was 57 ms against
    * 46 ms of execution). A real deployment holds exactly this in its
    * metastore/catalog: the schema and file index are table METADATA,
    * resolved once per session, while every execution still scans the
    * parquet bytes themselves — nothing here memoizes results or data
    * (the noop-sink pass reads the files each time; regenerated
    * testdata misses the key via the size+mtime component, the
    * Artifacts.buildOnce discipline). Keyed by the session object so a
    * stopped test session can never leak its plans into the next one. */
  private val catalog =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** `statName` names the parquet file whose (size, mtime) keys the
    * entry — derived views pass their SOURCE table so a regenerated
    * file invalidates the derived plan too. */
  private[graft] def cached(spark: SparkSession, dir: String, name: String,
                            statName: String = null)(build: => DataFrame): DataFrame = {
    val f = new java.io.File(s"$dir/${Option(statName).getOrElse(name)}.parquet")
    val key = (spark, s"$dir|$name|${f.length()}|${f.lastModified()}")
    // get + putIfAbsent, NOT computeIfAbsent: a derived view's build
    // itself resolves its base tables through this SAME map (accessLog
    // → events), and a recursive computeIfAbsent landing in the same
    // hash bin throws IllegalStateException("Recursive update") —
    // nondeterministically, since it depends on bin collision. The
    // benign race here (two threads building the same plan once each)
    // costs one redundant analysis, never correctness.
    val existing = catalog.get(key)
    if (existing != null) existing
    else {
      val built = build
      val prev = catalog.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cached(spark, dir, name)(spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** True when this events frame carries `ts` as a raw nanosecond LONG
    * (the legacy TIMESTAMP(NANOS) encoding read via nanosAsLong). */
  def tsIsNanosLong(df: DataFrame): Boolean = df.schema("ts").dataType == LongType

  /** A literal comparable (and parquet-pushable) against the native `ts`
    * column of `df`, for the given epoch-micros instant. Keyset-pagination
    * bounds build on this so the raw-column filter keeps reaching
    * PushedFilters whichever encoding the file uses. */
  def tsLiteral(df: DataFrame, epochMicros: Long): Column =
    df.schema("ts").dataType match {
      case LongType         => lit(epochMicros * 1000L) // raw nanos
      case TimestampNTZType =>
        lit(java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(epochMicros, 1000000L),
          (Math.floorMod(epochMicros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC))
      case _ =>
        lit(java.time.Instant.ofEpochSecond(
          Math.floorDiv(epochMicros, 1000000L),
          Math.floorMod(epochMicros, 1000000L) * 1000L))
    }

  /** UTC day of an epoch-micros instant — the `dt` partition value of
    * `eventsDt` that instant lives in. Keyset/date bounds mirror onto
    * the partition column through this so they prune at FILE-LISTING
    * time (a coarse day-granular superset of the precise ts bound —
    * row sets are untouched). */
  def microsDay(epochMicros: Long): java.sql.Date =
    java.sql.Date.valueOf(java.time.Instant.ofEpochSecond(
      Math.floorDiv(epochMicros, 1000000L)).atZone(java.time.ZoneOffset.UTC).toLocalDate)

  /** Epoch-micros LONG expression over the native `ts` column of `df`. */
  def tsMicros(df: DataFrame): Column =
    df.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _        => unix_micros(col("ts").cast(TimestampType))
    }

  /** events with the native `ts` plus derived `ts_ms` (epoch millis, LONG)
    * and `tsu` (TIMESTAMP truncated to micros — DuckDB's view of the file). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime-settable SQL conf; harmless against timestamp[us] files and
    // required to read the legacy TIMESTAMP(NANOS) encoding at all. Set
    // defensively in case the calling session (driver-owned in
    // Verify/Bench) was built without it. Set BEFORE the catalog lookup
    // so the first (building) call resolves under it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the derived projection is itself catalog-cached (r21): the three
    // timestamp variants re-analyzed on every access cost ~10 ms × the
    // ~170 events-based keys × passes
    cached(spark, dir, "events#derived", statName = "events")(eventsBuild(spark, dir))
  }

  private def eventsBuild(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // legacy: ts = epoch nanos
        raw.withColumn("ts_ms", expr("ts div 1000000"))
          .withColumn("tsu", expr("timestamp_micros(ts div 1000)"))
      case TimestampType | TimestampNTZType =>
        // Cast NTZ→TIMESTAMP is instant-preserving under the UTC session
        // every entrypoint (Verify/Bench/specs) pins; keeps tsu's output
        // type identical across encodings.
        raw.withColumn("ts_ms", unix_millis(col("ts").cast(TimestampType)))
          .withColumn("tsu", col("ts").cast(TimestampType))
      case other: DataType =>
        throw new IllegalStateException(
          s"events.ts has unsupported parquet type $other — expected LONG (nanos) or TIMESTAMP[_NTZ]")
    }
  }

  /** Date-partitioned twin of `events` — the ES time-index layout
    * (`logs-2026.08.*` ≈ one partition per UTC day, `dt=YYYY-MM-DD`).
    * At 100 TB this layout is THE scan discipline for date-bounded
    * queries: a dashboard's two-week window must prune 14/30 day
    * partitions at FILE-LISTING time (PartitionFilters), not merely
    * skip row groups after opening every file (PushedFilters). The
    * twin is built once per source snapshot (Artifacts.buildOnce
    * keyed by the source file identity) with the scan's natural write
    * parallelism, then only ever scanned; `dt` comes back as a DATE
    * partition column via partition discovery. Row set and every
    * non-dt column are byte-identical to `events`, so oracles over the
    * flat table stay valid. PlanSpec asserts the date-bounded keys
    * read this twin with non-empty PartitionFilters and a pruned
    * partition count. */
  def eventsDt(spark: SparkSession, dir: String): DataFrame =
    ops.Artifacts.buildOnce(spark, s"$dir/events.parquet", "events_dt") { path =>
      events(spark, dir)
        .withColumn("dt", to_date(col("tsu")))
        .write.partitionBy("dt").mode("overwrite").parquet(path)
    }
}
