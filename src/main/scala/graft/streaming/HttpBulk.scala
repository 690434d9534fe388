package graft.streaming

import java.net.{HttpURLConnection, URL}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.DataFrame

/** HTTP transport for the OpenSearch `_bulk` sink (reference
  * main.go:399–451: esutil.BulkIndexer with numWorkers, flushBytes,
  * RetryOnStatus + backoff; main.go:546–584: enqueue with per-item
  * OnSuccess/OnFailure callbacks).
  *
  * Spark-first shape: the documents frame renders to `_bulk` NDJSON
  * action/source pairs (Pipeline.toBulkNdjson), and each PARTITION posts
  * its lines in flushBytes-bounded chunks under the shared
  * retry/backoff envelope — partitions are the reference's worker
  * goroutines, chunking is its flushBytes threshold, and Spark task
  * retries layer on top for node loss. Per-item failures from the bulk
  * response (the OnFailure callback, main.go:566–571) come back as rows
  * and land idempotently under `errDir/batch=<id>` so replays overwrite
  * rather than duplicate. Nothing collects to the driver; each executor
  * talks to the endpoint directly, which is the only transport topology
  * that scales to 1000 executors.
  *
  * Auth passthrough (reference main.go:321–324, 414: the
  * X-Amz-Firehose-Access-Key header becomes ES Basic auth) is the
  * optional `auth` header value, stamped on every request.
  */
object HttpBulk {

  /** Reference flushBytes (main.go:46): one POST body per ≤5 MB of
    * NDJSON, so executor memory per flush is bounded regardless of
    * partition size. */
  val defaultFlushBytes: Int = 5000000

  /** OpenSearch index mapping generated from the documents frame's
    * schema — the index-bootstrap step ahead of the first `_bulk` (the
    * reference leans on ES dynamic mapping, which guesses; a real
    * deployment pins the mapping so e.g. epoch-ms longs index as
    * dates and ids stay keyword-exact). Conventions: STRING → `text`
    * with a `.raw` keyword subfield (the standard search+aggregate
    * dual), `*_ms`/`*_at`-suffixed longs and TIMESTAMP → `date`,
    * struct → `object` with nested properties, ARRAY maps as its
    * element (ES fields are multi-valued natively). PUT the returned
    * JSON to `<es>/<index>` before the first bulk. */
  def mappingJson(schema: org.apache.spark.sql.types.StructType): String = {
    import org.apache.spark.sql.types._
    def field(name: String, dt: DataType): String = dt match {
      case st: StructType => obj(st)
      case ArrayType(et, _) => field(name, et)
      case StringType =>
        """{"type":"text","fields":{"raw":{"type":"keyword","ignore_above":1024}}}"""
      case LongType if name.endsWith("_ms") || name.endsWith("_at") =>
        """{"type":"date","format":"epoch_millis"}"""
      case TimestampType | DateType => """{"type":"date"}"""
      case LongType | IntegerType | ShortType => """{"type":"long"}"""
      case DoubleType | FloatType | (_: DecimalType) => """{"type":"double"}"""
      case BooleanType => """{"type":"boolean"}"""
      case BinaryType => """{"type":"binary"}"""
      case _ => """{"type":"keyword"}"""
    }
    // field names come from a parquet schema and may contain any
    // character — escape for JSON, never interpolate raw
    def js(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    def obj(st: StructType): String =
      st.fields.map(f => s""""${js(f.name)}":${field(f.name, f.dataType)}""")
        .mkString("""{"properties":{""", ",", "}}")
    s"""{"mappings":${obj(schema)}}"""
  }

  /** One HTTP PUT of a JSON body — index creation with the pinned
    * mapping (`PUT <es>/<index>`). Returns (status, response body). */
  def put(url: String, json: String, auth: Option[String]): (Int, String) =
    request("PUT", "application/json", url, json.getBytes("UTF-8"), auth)

  /** One HTTP request with a body. Returns (status, response body).
    * Read timeout is generous — bulk indexing latency, not connect
    * latency, dominates. */
  private def request(method: String, contentType: String, url: String,
                      body: Array[Byte], auth: Option[String]): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", contentType)
      auth.foreach(a => conn.setRequestProperty("Authorization", a))
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(30000)
      val os = conn.getOutputStream
      try os.write(body) finally os.close()
      val status = conn.getResponseCode
      val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val respBody =
        if (is == null) "" else try new String(is.readAllBytes(), "UTF-8") finally is.close()
      (status, respBody)
    } finally conn.disconnect()
  }

  /** One `_bulk` POST of NDJSON lines. */
  def post(url: String, body: Array[Byte], auth: Option[String]): (Int, String) =
    request("POST", "application/x-ndjson", url, body, auth)

  /** Per-item failures from a `_bulk` response: (item id, status, error
    * reason) for every item with status ≥ 300 (the ES contract: one
    * response item per action, `error.reason` on rejection). */
  def itemFailures(respBody: String): Iterator[(String, Int, String)] = {
    val root = new ObjectMapper().readTree(respBody)
    val items = root.path("items")
    if (!items.isArray) Iterator.empty
    else {
      val out = Seq.newBuilder[(String, Int, String)]
      items.forEach { wrapper =>
        val item = wrapper.path("index") // action name is always "index" here
        val status = item.path("status").asInt(200)
        if (status >= 300)
          out += ((item.path("_id").asText(""), status,
            item.path("error").path("reason").asText("bulk item rejected")))
      }
      out.result().iterator
    }
  }

  /** Split a partition's NDJSON lines into ≤maxBytes POST bodies. The
    * budget is tracked in actual UTF-8 bytes (not UTF-16 char count,
    * which undercounts multibyte-heavy log content up to 3×), so the
    * bounded-executor-memory-per-flush claim holds; at most one
    * overshooting line per body (check-before-append, like the
    * reference's flushBytes threshold). */
  private[streaming] def chunks(it: Iterator[String], maxBytes: Int): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      def hasNext: Boolean = it.hasNext
      def next(): Array[Byte] = {
        val buf = new java.io.ByteArrayOutputStream
        while (it.hasNext && buf.size < maxBytes) {
          buf.write(it.next().getBytes("UTF-8"))
          buf.write('\n')
        }
        buf.toByteArray
      }
    }

  /** `chunks` with per-key body isolation: lines of different keys never
    * share a POST body, so each Firehose batch's documents index under
    * their own credential even when one partition interleaves tenants.
    * Memory is bounded by (keys in flight) × maxBytes — keys per
    * micro-batch are few (one per posting Firehose stream), and a key's
    * buffer flushes the moment it crosses the byte budget. */
  private[streaming] def chunksByKey(it: Iterator[(String, String)],
                                     maxBytes: Int): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val bufs = new java.util.LinkedHashMap[String, java.io.ByteArrayOutputStream]()
      private val ready = scala.collection.mutable.Queue.empty[(String, Array[Byte])]
      private def fill(): Unit = {
        while (ready.isEmpty && it.hasNext) {
          val (key, line) = it.next()
          val buf = bufs.computeIfAbsent(key, _ => new java.io.ByteArrayOutputStream)
          buf.write(line.getBytes("UTF-8"))
          buf.write('\n')
          if (buf.size >= maxBytes) {
            ready.enqueue((key, buf.toByteArray))
            bufs.remove(key)
          }
        }
        if (ready.isEmpty && !it.hasNext && !bufs.isEmpty) {
          bufs.forEach((k, buf) => if (buf.size > 0) ready.enqueue((k, buf.toByteArray)))
          bufs.clear()
        }
      }
      def hasNext: Boolean = { fill(); ready.nonEmpty }
      def next(): (String, Array[Byte]) = { fill(); ready.dequeue() }
    }

  /** A channel writer (same shape Pipeline.sinkBatch takes) that POSTs
    * the documents frame to `url` as `_bulk` NDJSON and lands per-item
    * rejections under `errDir/batch=<id>`. Transient statuses
    * (429/502/503/504, reference main.go:412) retry with exponential
    * backoff inside the task; non-transient HTTP errors throw, failing
    * the micro-batch for checkpoint replay — the reference's
    * whole-batch-retry contract. */
  /** `observeDocsAs` names an observe() node over the rendered lines
    * (one per document), so documents_indexed rides the POST job itself
    * — see ServiceMetrics. */
  def bulkWriter(url: String, index: String, errDir: String,
                 auth: Option[String] = None,
                 flushBytes: Int = defaultFlushBytes,
                 maxAttempts: Int = 5, baseBackoffMs: Long = 50,
                 authProvider: () => Option[String] = () => None,
                 rejectionCounter: Option[org.apache.spark.util.LongAccumulator] = None,
                 observeDocsAs: Option[String] = None): (DataFrame, Long) => Unit =
    (docs, batchId) => {
      val spark = docs.sparkSession
      import spark.implicits._
      // resolved ONCE per micro-batch on the driver (the provider may
      // close over non-serializable state, e.g. a rotating credential
      // store); the resolved Option[String] is what the partition closure
      // captures. It is only the STATIC fallback for records that landed
      // with no access_key of their own — a keyed record posts under ITS
      // key (reference main.go:414, 422–424 — per-request client,
      // per-request credential), and a keyless record must never inherit
      // another tenant's captured key, so never wire this to a
      // last-seen-request credential.
      val effAuth = authProvider().orElse(auth)
      val keyed = Pipeline.toBulkNdjsonKeyed(docs, index)
      val failed = observeDocsAs
        .fold(keyed)(n => keyed.observe(n, org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows")))
        .as[(String, String)]
        .mapPartitions { rows =>
          chunksByKey(rows, flushBytes).flatMap { case (key, body) =>
            val chunkAuth = if (key.nonEmpty) Some("Basic " + key) else effAuth
            val resp = Pipeline.withRetry(maxAttempts, baseBackoffMs) {
              val (status, rb) = post(url, body, chunkAuth)
              if (Pipeline.retryOnStatus(status)) throw Pipeline.TransientSinkError(status)
              if (status >= 400) throw new java.io.IOException(s"bulk POST rejected: HTTP $status")
              rb
            }
            val failures = itemFailures(resp).toSeq
            // per-item rejection counter (the reference's OnFailure
            // prometheus hook, main.go:566–571) — executor-side, so an
            // accumulator, not a driver AtomicLong
            rejectionCounter.foreach(_.add(failures.size.toLong))
            failures
          }
        }
        .toDF("item_id", "status", "err")
      failed.write.mode("overwrite").parquet(s"$errDir/batch=$batchId")
    }
}
