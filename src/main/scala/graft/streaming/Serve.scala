package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.GraftExtensions

/** Launchable ingest job outside tests: file-drop source → decode/route
  * → SUCCESS/ERROR channels, optionally with the HTTP `_bulk` transport
  * as the delivery sink.
  *
  * Usage:
  *   runMain graft.streaming.Serve <dropDir> <outDir> <checkpointDir>
  *     [<esBulkUrl> <index>]
  *
  * Without the URL args the SUCCESS channel is parquet (the offline /
  * verify topology); with them, documents POST per partition to the
  * endpoint.
  *
  * SPARK_GRAFT_HTTP_PORT=<port> additionally starts the Firehose HTTP
  * push front-end (FirehoseEndpoint) on that loopback port (0 = ephemeral),
  * landing `POST /firehose` batches into `dropDir` — the full reference
  * service topology (main.go:248–365): HTTP push in, bulk out, with the
  * inbound X-Amz-Firehose-Access-Key forwarded to the sink as Basic
  * auth (main.go:321–324, 414). Without it, batches are expected as
  * JSON-lines files dropped into `dropDir` directly — same envelope
  * contract, same downstream dataflow. */
object Serve {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 5,
      "usage: Serve <dropDir> <outDir> <checkpointDir> [<esBulkUrl> <index>]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // RocksDB state store: the default HDFS-backed provider keeps every
      // key in executor heap — at 100 TB/day the sessionize/dedup state
      // (one entry per active stream / in-flight event id) OOMs the JVM;
      // RocksDB spills to local disk and bounds heap. Changelog
      // checkpointing uploads per-batch deltas instead of full snapshots,
      // keeping checkpoint cost proportional to state CHANGE, not size.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .getOrCreate()
    GraftExtensions.install(spark)
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_DRAIN=1: process what's landed and exit (smoke runs /
    // cron-style catch-up); default is the reference's 5 s flush cadence
    val trigger =
      if (sys.env.get("SPARK_GRAFT_DRAIN").contains("1")) Trigger.AvailableNow()
      else Trigger.ProcessingTime("5 seconds")
    // streaming-side counters, served with the handler counters on the
    // endpoint's GET /metrics (reference main.go:216–217 ginprom)
    val metrics = new ServiceMetrics(spark)
    val endpoint = sys.env.get("SPARK_GRAFT_HTTP_PORT")
      .map(p => new FirehoseEndpoint(args(0), p.toInt,
        extraMetrics = () => metrics.snapshot, accessLog = true))
    endpoint.foreach(e => println(s"[serve] firehose endpoint listening on ${e.url}"))

    // delete processed drop files after commit: the service's spool must
    // not grow one file per HTTP request forever
    val source = Pipeline.fileDropSource(spark, args(0), cleanSource = Some("delete"))

    // In-engine ingest pipeline (reference main.go:437 binds
    // pipeline=<name> on every bulk request and ES runs
    // one-pipeline-to-rule-them-all on each doc): ON by default, opt out
    // with SPARK_GRAFT_PIPELINE=none. SPARK_GRAFT_GEODIM=<dir> loads the
    // nation-derived geoip dim from that testdata dir (a real deployment
    // points this at its converted GeoLite2 range table).
    val pipelineName = sys.env.getOrElse("SPARK_GRAFT_PIPELINE", "axway-ingest")
    val geoDim = sys.env.get("SPARK_GRAFT_GEODIM")
      .map(IngestPipeline.geoDimFromNation(spark, _))
    val enrichStage: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      if (pipelineName == "none") identity else IngestPipeline.enrich(_, geoDim)
    // SPARK_GRAFT_SCRUB_PII=1: redact email/IPv4/SSN from messages
    // BEFORE enrichment, indexing, and the SUCCESS archive — raw PII
    // never lands on disk or in the index
    val enrich =
      if (sys.env.get("SPARK_GRAFT_SCRUB_PII").contains("1"))
        (IngestPipeline.scrubPii _).andThen(enrichStage)
      else enrichStage

    // SPARK_GRAFT_ALERTS="1:spark,join;2:slow": in-stream percolation —
    // each `id:term[,term…]` clause registers one conjunctive query;
    // matches land in <outDir>/ALERTS and count as alerts_matched on
    // /metrics. Malformed clauses fail at startup with the variable's
    // name, not mid-stream.
    val alertQueries: Option[Seq[(Long, String)]] =
      sys.env.get("SPARK_GRAFT_ALERTS").map { spec =>
        try {
          val qs = spec.split(";").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { clause =>
            val Array(id, terms) = clause.split(":", 2)
            // trim BEFORE the emptiness filter: a whitespace-only term
            // would otherwise register as "" and corrupt the
            // conjunction count; a clause with no terms at all is a
            // config mistake that must fail here, not register a
            // never-matching query
            val ts = terms.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
            if (ts.isEmpty) throw new IllegalArgumentException(
              s"SPARK_GRAFT_ALERTS clause '$clause' has no terms")
            ts.map(t => id.trim.toLong -> t)
          }
          // an empty/separator-only value would silently enable a
          // zero-query stage: every batch pays a pointless percolate
          // plan while the operator believes alerts are configured
          if (qs.isEmpty) throw new IllegalArgumentException(
            s"SPARK_GRAFT_ALERTS is set but contains no queries: '$spec'")
          qs
        } catch {
          case _: MatchError | _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"SPARK_GRAFT_ALERTS must be 'id:term[,term…][;…]', got '$spec'")
        }
      }

    val query =
      if (args.length == 5)
        Pipeline.runHttp(source, args(3), args(4), args(1), args(2),
          // No authProvider wiring: each record rides its own captured
          // access_key to the sink ("Basic " + key, main.go:414), and a
          // keyless record posts unauthenticated — inheriting the
          // last-seen request's key would cross tenant credentials.
          trigger = trigger, enrich = enrich,
          pipelineParam = Some(pipelineName).filter(_ != "none"),
          metrics = Some(metrics), alertQueries = alertQueries)
      else
        Pipeline.run(source, args(1), args(2), trigger = trigger, enrich = enrich,
          metrics = Some(metrics), alertQueries = alertQueries)
    // SPARK_GRAFT_DEDUP_DIR=<dir>: the staged dedup topology — a SECOND
    // streaming query reads the SUCCESS archive as a file stream and
    // runs the incremental near-dup check against the persisted
    // signature store (<dir>/store), flagging each archived document in
    // <dir>/out. Staging through the archive (not a fork inside the
    // ingest query) keeps the two jobs independently restartable and is
    // how a production pipeline chains stages over object storage. In
    // drain mode the stage starts AFTER the ingest drain completes —
    // AvailableNow snapshots the archive's file listing at start, so a
    // concurrent start would miss files the ingest is still writing.
    @volatile var dedup: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    def startDedup(): Unit = dedup = sys.env.get("SPARK_GRAFT_DEDUP_DIR").map { dir =>
      val successDir = s"${args(1)}/SUCCESS"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(successDir))
      // an ingest REPLAY overwrites its SUCCESS/batch=<id> dir with
      // freshly-named part files — files this source has already listed
      // may vanish mid-read. Skip them instead of wedging the stage on
      // FileNotFound: the replacements re-feed (at-least-once), re-fed
      // docs carry the same deterministic doc_id, the dedup sink
      // filters self-pairs by id, and compact()'s distinct() collapses
      // the redundant signature rows a re-feed appends.
      val archived = spark.readStream
        .schema(DedupStream.pipelineDocsSchema)
        .option("ignoreMissingFiles", "true")
        .parquet(successDir)
      // SPARK_GRAFT_DEDUP_MIN_CHARS / SPARK_GRAFT_DEDUP_MIN_TTR: junk
      // gate ahead of the signature work (off unless set) — gated docs
      // never reach the store or the results channel. Malformed values
      // must fail with the variable's name, not a bare
      // NumberFormatException after a full drain.
      def envNum[T](name: String)(parse: String => T): Option[T] =
        sys.env.get(name).map { v =>
          try parse(v) catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"$name must be a number, got '$v'")
          }
        }
      val gated = DedupStream.qualityGate(
        DedupStream.fromPipelineDocs(archived),
        envNum("SPARK_GRAFT_DEDUP_MIN_CHARS")(_.toInt).getOrElse(0),
        envNum("SPARK_GRAFT_DEDUP_MIN_TTR")(_.toDouble).getOrElse(0.0))
      DedupStream.run(gated,
        s"$dir/store", s"$dir/out", s"$dir/ckpt",
        trigger = trigger, metrics = Some(metrics))
    }
    val drain = sys.env.get("SPARK_GRAFT_DRAIN").contains("1")
    if (!drain) startDedup()

    // graceful shutdown (reference main.go:381–396): SIGTERM/SIGINT stop
    // the queries between micro-batches — the checkpoints commit, so the
    // restart resumes exactly where this run stopped — then close the
    // HTTP front-end
    @volatile var shuttingDown = false
    sys.addShutdownHook {
      shuttingDown = true
      try query.stop() catch { case _: Exception => () }
      dedup.foreach(q => try q.stop() catch { case _: Exception => () })
      endpoint.foreach(_.stop())
      metrics.close()
    }
    try {
      query.awaitTermination()
      // a SIGTERM mid-drain unblocks awaitTermination AFTER the hook has
      // already run its dedup-stop against None — starting the stage now
      // would launch a query on a context being torn down; the drained
      // archive is durable, so the next (drain or live) run picks it up
      if (drain && !shuttingDown) {
        startDedup()
        // the hook may have fired between the check above and the
        // registration inside startDedup (its dedup-stop saw None) —
        // re-check now that the query is registered so ONE side always
        // stops it; q.stop() is idempotent if both do
        if (shuttingDown)
          dedup.foreach(q => try q.stop() catch { case _: Exception => () })
        else dedup.foreach(_.awaitTermination())
      }
    } finally endpoint.foreach(_.stop())
  }
}
