package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.expr.GzipFunctions.try_gunzip
import graft.ops.Decode

/** The reference service as a Structured Streaming job.
  *
  * The reference is a streaming HTTP ingester: Firehose POSTs batches
  * (reference main.go:248–365), records decode/explode into documents,
  * and a bulk indexer flushes every 5 s with exponential-backoff retry on
  * HTTP 429/502/503/504 (reference main.go:399–451, RetryOnStatus at
  * main.go:412, FlushInterval at main.go:436). Firehose itself redelivers
  * whole batches on failure (at-least-once) and archives everything to S3
  * under SUCCESS/ / ERROR/ prefixes
  * (reference cloudformation-template.yaml:160–171).
  *
  * Spark-first re-expression: `readStream` micro-batches are the bulk
  * indexer's flush buffer (Trigger.ProcessingTime(5s) = FlushInterval);
  * `foreachBatch` is the flush callback, wrapping each channel's write in
  * the same retry/backoff envelope; the SUCCESS/ERROR prefixes become two
  * sink directories routed by envelope-parse outcome; checkpointing +
  * idempotent batch ids give the same at-least-once-with-replay contract,
  * and `dropDuplicatesWithinWatermark` is the replay dedup that contract
  * implies. The decode chain itself is `Decode.decodeFrame`, unchanged
  * between batch and streaming — the point of keeping it declarative.
  *
  * At 100 TB/day posture: the only stateful operators (windowed agg,
  * dedup) are watermark-bounded so state stores stay finite; everything
  * else is per-record projection that scales with executor count.
  */
object Pipeline {

  /** Transient sink failure carrying the would-be HTTP status. */
  final case class TransientSinkError(status: Int)
      extends RuntimeException(s"transient sink error: HTTP $status")

  /** Statuses worth retrying (reference main.go:412 RetryOnStatus). */
  val retryOnStatus: Set[Int] = Set(429, 502, 503, 504)

  /** Exponential-backoff retry envelope (reference main.go:400–412 wraps
    * every bulk flush in backoff.NewExponentialBackOff). Non-transient
    * errors and exhausted attempts propagate — under checkpointed
    * `foreachBatch` that fails the batch, which re-runs on restart: the
    * reference's whole-batch Firehose retry, re-expressed. */
  def withRetry[A](maxAttempts: Int = 5, baseBackoffMs: Long = 50,
                   sleep: Long => Unit = Thread.sleep)(f: => A): A = {
    var attempt = 1
    var delayMs = baseBackoffMs
    var result: Option[A] = None
    while (result.isEmpty) {
      try result = Some(f)
      catch {
        case TransientSinkError(status)
            if retryOnStatus(status) && attempt < maxAttempts =>
          sleep(delayMs)
          delayMs *= 2
          attempt += 1
      }
    }
    result.get
  }

  /** Per-record decode with encoding sniff. The reference decides
    * gzip-vs-plain per REQUEST by sniffing the body even when the header
    * claims otherwise (main.go:109–113, errEncodingMismatch); here the
    * decision is per RECORD, by the 1F8B gzip magic on the base64-decoded
    * bytes — one micro-batch can mix plain and gzip records freely, and
    * only true garbage dead-letters. try_gunzip, not gunzip: corrupt
    * gzip must dead-letter the row, not throw — a throwing expression
    * fails the micro-batch, which checkpoint recovery replays forever
    * (poison-record wedge).
    *
    * The envelope is parsed ONCE, with the pruned schema (the inflate +
    * JSON parse dominate per-record cost on this hot path); both
    * delivery channels derive from this frame — see sinkBatch, which
    * persists it so neither channel re-decodes. `err` is null iff the
    * record routes to documents; a parseable envelope with an EMPTY
    * logEvents array dead-letters as "empty logEvents" rather than
    * silently vanishing in the explode — the reference's S3 archival
    * contract accounts for every input record. */
  def decoded(frame: DataFrame): DataFrame = {
    val bin = unbase64(col("data"))
    // request-id propagation with the "manual" fallback (reference
    // main.go:260–266): the HTTP front-end stamps each landed record
    // with its batch's X-Amz-Firehose-Request-Id; sources without the
    // column (MemoryStream tests, pre-existing drop files) fall back the
    // same way an absent header does.
    val withReq =
      if (frame.columns.contains("request_id"))
        frame.withColumn("requestId",
          coalesce(nullif(col("request_id"), lit("")), lit("manual")))
      else frame.withColumn("requestId", lit("manual"))
    // per-record access key for sink auth isolation (reference
    // main.go:422–424 builds the indexer per request — each batch
    // indexes under ITS key); "" = none, sink falls back to its
    // static/provider auth
    val withKey =
      if (withReq.columns.contains("access_key")) withReq
      else withReq.withColumn("access_key", lit(""))
    withKey
      .withColumn("rawBody",
        when(upper(hex(substring(bin, 1, 2))) === "1F8B", try_gunzip(bin))
          .otherwise(bin).cast("string"))
      .withColumn("env", from_json(col("rawBody"), StructType.fromDDL(Decode.cwSchemaPruned)))
      .withColumn("err",
        when(col("rawBody").isNull, "undecodable record data (corrupt gzip)")
          .when(col("env").isNull || col("env.logEvents").isNull,
            "unparseable CloudWatch envelope")
          .when(size(col("env.logEvents")) === 0, "empty logEvents"))
  }

  /** Flatten already-decoded routable rows into documents (X2 explode +
    * F4 json-or-text + F6/F8 projection), straight from the parsed `env`
    * — no re-decode of the raw data. */
  private def flatten(ok: DataFrame): DataFrame =
    ok.select(
      col("event_id"), col("batch_ms"), col("requestId"), col("access_key"),
      col("env.logGroup").as("logGroup"), col("env.logStream").as("logStream"),
      explode(col("env.logEvents")).as("ev"))
      .select(
        col("event_id"), col("batch_ms"), col("requestId"), col("access_key"),
        col("logGroup"), col("logStream"),
        col("ev.id").as("event_ref"),
        col("ev.timestamp").as("event_ms"),
        Decode.jsonOrText(col("ev.message")).as("message"))

  /** Dead-letter rows keep the payload inspectable: rawBody is null when
    * try_gunzip failed, so fall back to the original base64 `data` — the
    * reference's S3 archival contract keeps the raw record for forensics
    * (cloudformation-template.yaml:170–171). */
  private def deadLetter(bad: DataFrame): DataFrame =
    bad.select(col("event_id"), col("batch_ms"), col("requestId"),
      coalesce(col("rawBody"), col("data")).as("body"), col("err"))

  /** Decode + route one envelope frame into the two delivery channels:
    * (documents, dead-letter). Encoding is sniffed per record — see
    * `decoded`. */
  def route(frame: DataFrame): (DataFrame, DataFrame) = {
    val d = decoded(frame)
    (flatten(d.filter(col("err").isNull)), deadLetter(d.filter(col("err").isNotNull)))
  }

  /** One micro-batch flush: decode once, persist, then write each
    * channel from the persisted frame under its own retry envelope — the
    * inflate + JSON parse run once per record, not once per channel.
    * Writers are injectable so tests can inject 429s; each writer
    * receives the batchId so it can be idempotent under replay (see
    * channelWriter). `enrich` runs on the documents channel before its
    * writer — the in-engine stand-in for the ES-side ingest pipeline the
    * reference triggers per request (main.go:437; see IngestPipeline). */
  def sinkBatch(writeOk: (DataFrame, Long) => Unit,
                writeErr: (DataFrame, Long) => Unit,
                enrich: DataFrame => DataFrame = identity,
                maxAttempts: Int = 5, baseBackoffMs: Long = 50,
                sleep: Long => Unit = Thread.sleep,
                metrics: Option[ServiceMetrics] = None,
                alerts: Option[((DataFrame, Long) => Unit, Seq[(Long, String)])] = None,
                persistDocs: Boolean = false)(batch: Dataset[Row], batchId: Long): Unit = {
    val d = decoded(batch.toDF()).persist()
    try {
      // docs feeds multiple plans whenever alerting is on (SUCCESS
      // probe + write, ALERTS probe + write) or the writer itself is a
      // composite (runHttp's archive + bulk POST set persistDocs) —
      // persist so the enrich chain (regex scrub, geoip broadcast
      // join) runs once per batch, not once per consumer
      val multi = alerts.isDefined || persistDocs
      val docs0 = enrich(flatten(d.filter(col("err").isNull)))
      val docs = if (multi) docs0.persist() else docs0
      try {
        withRetry(maxAttempts, baseBackoffMs, sleep)(writeOk(docs, batchId))
        // in-stream alerting (the OpenSearch percolate/watcher role):
        // the registered queries match each micro-batch's documents
        // AFTER enrich — alerts see what the index sees (e.g.
        // post-PII-scrub). The match surface is the message's .text
        // payload when present, else the raw message with JSON
        // punctuation space-normalized (a structured log like
        // {"msg":"slow spark join"} must tokenize to its words, not to
        // '{"msg":"slow'). Keyed by (event_id, event_ref): event_ref
        // alone is only unique within one envelope record, and pooling
        // two different events' tokens under one key would fire
        // conjunctions no single document satisfies.
        alerts.foreach { case (w, queries) =>
          // the normalization wraps ONLY the raw-JSON fallback branch:
          // an extracted .text payload is already running text whose
          // own punctuation ("deploy:canary") is part of the match
          // surface and must survive
          // the .text extraction rides the enrich stage's bound variant
          // when present (parse once); identity-enrich frames fall back
          // to the string path
          val textCol =
            if (docs.columns.contains("message_v"))
              expr("try_variant_get(message_v, '$.text', 'string')")
            else get_json_object(col("message"), "$.text")
          // rules are full query_string expressions (percolateDsl), so
          // the whole rule set rides one codegen pass over the batch —
          // no token explode or join per micro-batch. The match surface
          // carries only doc_id/text, so field-scoped clauses are a
          // registration error here (compile fails fast, like ES with
          // lenient:false).
          val matches = graft.ops.SearchExt.percolateDsl(docs.select(
            concat_ws("/", col("event_id"), col("event_ref")).as("doc_id"),
            coalesce(
              textCol,
              regexp_replace(col("message"), "[{}\\[\\]\",:]+", " ")).as("text")),
            queries, keywordFields = Map.empty)
            .withColumnRenamed("rule_id", "query_id")
          withRetry(maxAttempts, baseBackoffMs, sleep)(w(matches, batchId))
        }
      } finally if (multi) docs.unpersist()
      withRetry(maxAttempts, baseBackoffMs, sleep)(
        writeErr(deadLetter(d.filter(col("err").isNotNull)), batchId))
      // channel totals ride the writes themselves: the writers attach
      // observe() nodes (ServiceMetrics harvests them on action success)
      // so a flush costs zero extra count() jobs and the counted frame
      // is exactly the written one
      metrics.foreach(_.batchesTotal.incrementAndGet())
    } finally d.unpersist()
  }

  /** Idempotent channel writer: each micro-batch lands in its own
    * `batch=<id>` subdirectory with overwrite mode, so a replayed
    * batchId (checkpoint recovery under the at-least-once contract)
    * rewrites the same path instead of appending duplicates — plain
    * append would double rows on every replay. An EMPTY frame writes
    * only when `batch=<id>` already exists (the stale-replay case —
    * skipping there would leave an earlier attempt's rows in place);
    * a fresh empty batch writes nothing, so a long-running stream does
    * not mint one near-empty parquet directory per trigger per channel
    * (~17k/day at the 5 s cadence, mostly on ERROR). The emptiness
    * probe runs against sinkBatch's persisted decode, not a re-decode.
    * Readers of the channel directory see `batch` as a partition
    * column. */
  /** `observeAs`: name an observe() node in the write plan so the row
    * count rides the write action itself (harvested by ServiceMetrics'
    * listener) — attached AFTER the emptiness probe, whose limit-1
    * action must not feed the counter. */
  def channelWriter(dir: String, observeAs: Option[String] = None): (DataFrame, Long) => Unit =
    (df0, batchId) => {
      // the access key is transport auth, not payload — a credential
      // must never land in the archived parquet channels
      val df = df0.drop("access_key")
      val path = new org.apache.hadoop.fs.Path(s"$dir/batch=$batchId")
      val fs = path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(path) || !df.isEmpty)
        observeAs.fold(df)(n => df.observe(n, count(lit(1)).as("rows")))
          .write.mode("overwrite").parquet(path.toString)
    }

  /** Render a documents frame as OpenSearch `_bulk` NDJSON — one
    * `{"index":{"_index":...,"_id":...}}` action line and one source
    * line per document (reference main.go:546–560 builds exactly this
    * pair per record; outgoing/elasticOutput.go the source shape). The
    * `_id` is the exploded log event's id, which makes Firehose
    * whole-batch redelivery idempotent at the index (same contract the
    * reference gets from ES versioning on id). Returned as a
    * `Dataset[String]` so a `foreachBatch` sink can POST partitions
    * directly as request bodies. */
  def toBulkNdjson(docs: DataFrame, index: String): Dataset[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    toBulkNdjsonKeyed(docs, index).select("lines").as[String]
  }

  /** `toBulkNdjson` plus the per-record sink credential as a separate
    * `access_key` column ("" = none): the action/source lines never
    * contain the key (it is transport auth, not document payload), and
    * the bulk writer groups POST bodies by it so each batch indexes
    * under its own key (reference main.go:422–424). */
  def toBulkNdjsonKeyed(docs: DataFrame, index: String): DataFrame = {
    // message_v is the typed VARIANT twin of the raw `message` wire
    // field (IngestPipeline binds it once for in-engine extraction and
    // the SUCCESS store) — serializing both would duplicate the payload
    // in every source line
    val dataCols = docs.columns.filterNot(c => c == "access_key" || c == "message_v")
    val key =
      if (docs.columns.contains("access_key")) coalesce(col("access_key"), lit(""))
      else lit("")
    docs.select(
      key.as("access_key"),
      concat(
        to_json(struct(struct(
          lit(index).as("_index"),
          col("event_ref").as("_id")).as("index"))),
        lit("\n"),
        to_json(struct(dataCols.map(col).toSeq: _*))).as("lines"))
  }

  /** Start the full ingest stream over a source of (event_id, batch_ms,
    * data) envelope rows: decode (per-record encoding sniff) → route →
    * SUCCESS/ + ERROR/ parquet channels (reference
    * cloudformation-template.yaml:170–171), 5 s micro-batches (reference
    * main.go:436), checkpointed for restart recovery. */
  /** `alertQueries = Some(qs)` adds the in-stream percolation stage
    * with that registered rule set (qs: (query_id, query_string) rows —
    * each rule is a FULL Lucene query_string expression compiled by
    * QueryStringParser: phrases, negation, prefix wildcards, grouping —
    * what real Watcher/Kibana alert rules register, not just
    * conjunctive term sets): matches land in
    * `outDir/ALERTS/batch=<id>` under the same overwrite-idempotent
    * channelWriter discipline as the delivery channels, counted on
    * `/metrics` as alerts_matched. */
  def run(source: DataFrame, outDir: String, checkpointDir: String,
          trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
          enrich: DataFrame => DataFrame = identity,
          metrics: Option[ServiceMetrics] = None,
          alertQueries: Option[Seq[(Long, String)]] = None): StreamingQuery =
    source.writeStream
      .foreachBatch(sinkBatch(
        channelWriter(s"$outDir/SUCCESS",
          metrics.map(_.indexedMetric)),
        channelWriter(s"$outDir/ERROR",
          metrics.map(_.deadLetterMetric)),
        enrich, metrics = metrics,
        alerts = alertQueries.map(qs =>
          (channelWriter(s"$outDir/ALERTS", metrics.map(_.alertsMetric)), qs))) _)
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Offline file-drop source (SURVEY §2.1 S1): landed Firehose batches
    * as JSON-lines files dropped into `dir` — the zero-egress stand-in
    * for the Kinesis/HTTP push source. One instance of the pluggable
    * source seam: see `SourceConfig` for the envelope contract and the
    * spool's knobs (maxFilesPerTrigger, cleanSource). */
  def fileDropSource(spark: SparkSession, dir: String,
                     maxFilesPerTrigger: Int = 16,
                     cleanSource: Option[String] = None): DataFrame =
    SourceConfig.fileDrop(dir, maxFilesPerTrigger, cleanSource).open(spark)

  /** `run` with the HTTP `_bulk` transport as the delivery channel:
    * documents POST per partition to `esUrl` (HttpBulk) AND archive to
    * `outDir/SUCCESS` parquet (Firehose S3BackupMode AllData,
    * cloudformation-template.yaml:162–171 — delivered documents keep an
    * archive copy, the replay store if the index is lost); dead letters
    * land in `outDir/ERROR`, per-item bulk rejections in
    * `outDir/ERROR_ITEMS`. The archive runs first and is
    * overwrite-idempotent, so even a permanently failing sink leaves a
    * complete replay store, and bulk retries re-archive the same
    * `batch=<id>` path instead of duplicating. Both writes read the one
    * persisted decode (sinkBatch) — nothing re-inflates. */
  /** `authProvider` is re-read at every micro-batch flush (driver side):
    * a seam for rotating the STATIC fallback credential (config/secret
    * store) without a stream restart. Per-tenant keys never come from
    * here — each record carries its own access_key through the spool and
    * posts under it (reference main.go:321–324, 422–424 build the
    * indexer per request), and a keyless record falls back only to this
    * static credential, never to another request's captured key.
    *
    * `pipelineParam` echoes the reference's per-request ingest-pipeline
    * binding (main.go:437 stamps `pipeline=<name>` on the bulk request)
    * as a query param on the `_bulk` URL — wire parity for an ES-side
    * pipeline, while `enrich` is the same chain run in-engine. */
  /** `flushBytes` / `bulkMaxAttempts` / `bulkBackoffMs` surface the
    * transport's tuning knobs (the reference's flushBytes at main.go:46
    * and backoff envelope at main.go:400–412 are likewise config):
    * POST-body budget per flush and the transient-retry schedule. */
  def runHttp(source: DataFrame, esUrl: String, index: String,
              outDir: String, checkpointDir: String,
              auth: Option[String] = None,
              authProvider: () => Option[String] = () => None,
              trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
              enrich: DataFrame => DataFrame = identity,
              pipelineParam: Option[String] = None,
              metrics: Option[ServiceMetrics] = None,
              alertQueries: Option[Seq[(Long, String)]] = None,
              flushBytes: Int = HttpBulk.defaultFlushBytes,
              bulkMaxAttempts: Int = 5,
              bulkBackoffMs: Long = 50): StreamingQuery = {
    val effUrl = pipelineParam.fold(esUrl)(p =>
      esUrl + (if (esUrl.contains("?")) "&" else "?") + "pipeline=" + p)
    // the bulk POST counts documents_indexed (one observe in its lines
    // plan); the archive writes the same rows unobserved — one count per
    // delivered document, not two
    val archive = channelWriter(s"$outDir/SUCCESS")
    val bulk = HttpBulk.bulkWriter(effUrl, index, s"$outDir/ERROR_ITEMS", auth,
      flushBytes = flushBytes,
      maxAttempts = bulkMaxAttempts, baseBackoffMs = bulkBackoffMs,
      authProvider = authProvider,
      rejectionCounter = metrics.map(_.bulkItemRejections),
      observeDocsAs = metrics.map(_.indexedMetric))
    source.writeStream
      .foreachBatch(sinkBatch(
        (docs, batchId) => { archive(docs, batchId); bulk(docs, batchId) },
        channelWriter(s"$outDir/ERROR",
          metrics.map(_.deadLetterMetric)),
        enrich, metrics = metrics,
        alerts = alertQueries.map(qs =>
          (channelWriter(s"$outDir/ALERTS", metrics.map(_.alertsMetric)), qs)),
        persistDocs = true) _)
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** The Firehose HTTP response contract (reference main.go:358–363,
    * structs at main.go:58–69): 200 echoes the REQUEST's id and
    * timestamp; an error response carries the same pair plus
    * `errorMessage`. Service plumbing rather than dataflow, but it
    * completes the endpoint contract for anyone fronting `run` with an
    * HTTP listener. */
  def firehoseResponse(requestId: String, timestampMs: Long,
                       errorMessage: Option[String] = None): String = {
    def js(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val base = s""""requestId":${js(requestId)},"timestamp":$timestampMs"""
    errorMessage match {
      case Some(m) => s"""{$base,"errorMessage":${js(m)}}"""
      case None => s"""{$base}"""
    }
  }

  /** Event-time tumbling counts with a 10-minute watermark: events later
    * than the watermark are dropped, and window state is reclaimed — the
    * bounded-state form of StreamOps.tumblingOp (SURVEY §2.5). */
  def tumblingCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("logGroup"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("logGroup"), col("n"))

  /** Hopping twin of tumblingCounts: 1-hour windows sliding every 30
    * minutes — each event feeds two open windows; watermark close and
    * late-data drop semantics are identical per window. */
  def hoppingCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour", "30 minutes"), col("logGroup"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("logGroup"), col("n"))

  /** Stream-stream attribution join: each purchase matches the same
    * user's views within the preceding `windowMinutes`. Schemas:
    * views(user_id, view_id, view_ms), purchases(user_id, purchase_id,
    * purchase_ms). Both sides are watermarked and the range condition is
    * on the EVENT-TIME columns, so the streaming symmetric hash join can
    * expire state: a buffered view is dropped once the purchase-side
    * watermark passes view_time + window — state tracks the attribution
    * window's width, never the stream's history (the bounded-state
    * requirement at 100 TB/day). A range condition on the raw ms longs
    * instead would run with unbounded state. On batch frames the
    * watermarks are no-ops and the same plan is an equi-join on user_id
    * with a residual range filter — StreamOps.streamJoinOp oracle-checks
    * that form. */
  def attributeJoin(views: DataFrame, purchases: DataFrame,
                    windowMinutes: Int = 30,
                    joinType: String = "inner"): DataFrame = {
    val v = views
      .withColumn("view_time", timestamp_millis(col("view_ms")))
      .withWatermark("view_time", "10 minutes")
    val p = purchases
      .withColumnRenamed("user_id", "p_user_id")
      .withColumn("purchase_time", timestamp_millis(col("purchase_ms")))
      .withWatermark("purchase_time", "10 minutes")
    // joinType "left_outer" is the funnel's other half — "views that
    // never converted": the streaming runtime holds the null-padded row
    // until the watermark proves no in-window purchase can still arrive,
    // then emits it exactly once (StreamingSpec drives the expiry).
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_time") >= col("view_time") &&
        col("purchase_time") < col("view_time") + expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      .select(col("view_id"), col("purchase_id"))
  }

  /** Replay dedup on the upstream record id: Firehose redelivers whole
    * batches (at-least-once, cloudformation-template.yaml:160–161), so
    * duplicates share `event_ref`; the watermark bounds how long each id
    * is remembered, keeping dedup state finite at 100 TB/day. */
  def dedupReplays(docs: DataFrame): DataFrame =
    docs
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("event_ref")

  /** One event of a keyed stream, for custom sessionization. The
    * event_time column must ride along — Spark requires the watermarked
    * column to reach the stateful operator. */
  final case class KeyedEvent(stream: String, event_ms: Long,
                              event_time: java.sql.Timestamp)

  /** One sequenced event of a keyed stream, for throttling: `seq` is
    * the deterministic within-timestamp tie-break (the upstream record
    * id). */
  final case class ThrottleEvent(stream: String, event_ms: Long, seq: Long,
                                 event_time: java.sql.Timestamp)

  /** Per-key admission counters, one per still-live event-time window. */
  final case class ThrottleState(windowStarts: Seq[Long], admitted: Seq[Long])

  /** An admit/deny decision for one event. */
  final case class ThrottleOut(stream: String, window_ms: Long, seq: Long,
                               event_ms: Long, admitted: Boolean)

  /** Per-key event-rate limiting: admit at most `maxPerWindow` events
    * per key per event-time window, in (event_ms, seq) order — the
    * ingest-protection / notification-dedup shape every alerting
    * downstream runs (Watcher throttle_period, per-tenant ingest caps).
    * A windowed count can say a key EXCEEDED its budget only after the
    * window closes; the throttle must decide per event AT ARRIVAL, so
    * it is custom state: one counter per (key, live window), carried
    * across micro-batches via `flatMapGroupsWithState` and pruned to
    * windows the watermark can still touch — state tracks live windows
    * per active key, never stream history (the bounded-state
    * requirement at 100 TB/day). In batch mode each key's full history
    * arrives as one sorted group and the same code computes the exact
    * semantics the StreamOps oracle checks (row_number ≤ N per key ×
    * window). */
  def throttle(events: DataFrame, windowMs: Long, maxPerWindow: Long): Dataset[ThrottleOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def onGroup(key: String, evs: Iterator[ThrottleEvent],
                state: GroupState[ThrottleState]): Iterator[ThrottleOut] = {
      // EventTimeTimeout: a key that went idle fires here with no
      // events once the watermark passes its horizon — drop its state
      // entirely (without this, every key ever seen keeps an (empty)
      // state entry forever: unbounded key-cardinality growth over
      // weeks of stream uptime)
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var counts: Map[Long, Long] = state.getOption
        .map(s => s.windowStarts.zip(s.admitted).toMap)
        .getOrElse(Map.empty)
      val out = evs.toSeq.sortBy(e => (e.event_ms, e.seq)).map { e =>
        val w = Math.floorDiv(e.event_ms, windowMs) * windowMs
        val c = counts.getOrElse(w, 0L)
        val admit = c < maxPerWindow
        if (admit) counts = counts.updated(w, c + 1)
        ThrottleOut(key, w, e.seq, e.event_ms, admit)
      }
      // Keep only windows a within-watermark event could still land in.
      // In batch mode the runtime refuses the watermark accessor
      // (watermarks are no-ops there); nothing needs pruning because
      // batch state dies with the job.
      val wmOpt = scala.util.Try(state.getCurrentWatermarkMs()).toOption
      val horizon = wmOpt.getOrElse(Long.MinValue + windowMs) - windowMs
      val live = counts.filter { case (w, _) => w >= horizon }
      state.update(ThrottleState(live.keys.toSeq.sorted,
        live.keys.toSeq.sorted.map(live)))
      // Streaming only: time the state out once the watermark passes
      // the point where every currently-live window is beyond reach
      // (w < wm − windowMs dies in the prune above, so maxW + 2·window
      // covers the last live window plus the pruning slack).
      wmOpt.foreach { _ =>
        val maxW = if (live.isEmpty) horizon + windowMs else live.keys.max
        state.setTimeoutTimestamp(maxW + 2 * windowMs)
      }
      out.iterator
    }

    events
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", "10 minutes")
      .select(col("logStream").as("stream"), col("event_ms"), col("seq"), col("event_time"))
      .as[ThrottleEvent]
      .groupByKey(_.stream)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onGroup)
  }

  /** Open-session state carried between micro-batches. */
  final case class SessionAgg(startMs: Long, endMs: Long, n: Long)

  /** A closed session: `closedBy` = "gap" (a later event arrived beyond
    * the gap) or "timeout" (the watermark passed end + gap with no
    * successor — the stream went quiet). */
  final case class SessionClosed(stream: String, startMs: Long, endMs: Long,
                                 n: Long, closedBy: String)

  /** Custom stateful sessionization via `flatMapGroupsWithState`:
    * gap-based sessions that emit ONLY on close, tagged with why they
    * closed — semantics `session_window` cannot express (it emits every
    * finalized window, untagged, and cannot distinguish gap-split from
    * quiescence). State is one `SessionAgg` per active key, expired by
    * `EventTimeTimeout` at end + gap, so state size tracks the number of
    * concurrently-active streams, not history — the bounded-state
    * requirement at 100 TB/day. Late events (behind the watermark) are
    * dropped by the runtime before reaching the state function. */
  def sessionize(docs: DataFrame, gapMs: Long): Dataset[SessionClosed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def onGroup(key: String, events: Iterator[KeyedEvent],
                state: GroupState[SessionAgg]): Iterator[SessionClosed] =
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionClosed(key, s.startMs, s.endMs, s.n, "timeout"))
      } else {
        val closed = Seq.newBuilder[SessionClosed]
        var cur = state.getOption
        events.toSeq.sortBy(_.event_ms).foreach { e =>
          cur = cur match {
            case Some(s) if e.event_ms - s.endMs <= gapMs =>
              // min on start: a within-watermark out-of-order event can
              // precede the current session start in a later micro-batch
              Some(SessionAgg(math.min(s.startMs, e.event_ms),
                math.max(s.endMs, e.event_ms), s.n + 1))
            case Some(s) =>
              closed += SessionClosed(key, s.startMs, s.endMs, s.n, "gap")
              Some(SessionAgg(e.event_ms, e.event_ms, 1))
            case None =>
              Some(SessionAgg(e.event_ms, e.event_ms, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.endMs + gapMs)
        }
        closed.result().iterator
      }

    docs
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", "10 minutes")
      .select(col("logStream").as("stream"), col("event_ms"), col("event_time"))
      .as[KeyedEvent]
      .groupByKey(_.stream)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onGroup)
  }
}
