package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Service observability counters (reference main.go:216–217 mounts
  * ginprom on `GET /metrics`; main.go:546–584's bulk callbacks feed the
  * indexed/failed counters the k8s ServiceMonitor scrapes,
  * deploy/manifest.yaml:132–153).
  *
  * Two kinds of counts, matching where the numbers are actually known:
  *  - driver-side `AtomicLong`s for per-micro-batch channel totals
  *    (computed over the persisted decode in `Pipeline.sinkBatch`, so
  *    counting never re-inflates a record);
  *  - a Spark `LongAccumulator` for per-item bulk rejections, which only
  *    the executor-side POST sees (HttpBulk's OnFailure-equivalent,
  *    reference main.go:566–571). Accumulator counts can over-count
  *    under task retries — the standard Spark metrics trade, fine for
  *    monitoring, never used for data.
  *
  * Snapshot as JSON via `toJson` — FirehoseEndpoint serves it on
  * `GET /metrics`.
  */
final class ServiceMetrics(spark: SparkSession) {

  /** Micro-batches flushed (one per foreachBatch invocation). */
  val batchesTotal = new AtomicLong(0L)

  /** Documents routed to the delivery channel (post-explode rows). */
  val documentsIndexed = new AtomicLong(0L)

  /** Records dead-lettered to ERROR/ (undecodable / empty envelopes). */
  val documentsDeadLettered = new AtomicLong(0L)

  /** Per-item `_bulk` rejections (status ≥ 300 in the bulk response). */
  val bulkItemRejections: LongAccumulator =
    spark.sparkContext.longAccumulator("graft.bulk_item_rejections")

  def snapshot: Map[String, Long] = Map(
    "batches_total" -> batchesTotal.get(),
    "documents_indexed" -> documentsIndexed.get(),
    "documents_dead_lettered" -> documentsDeadLettered.get(),
    "bulk_item_rejections" -> bulkItemRejections.value)

  def toJson: String = ServiceMetrics.renderJson(snapshot)
}

object ServiceMetrics {
  /** Deterministic (key-sorted) flat JSON object of counters. */
  def renderJson(counts: Map[String, Long]): String =
    counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")

  /** Content type of the Prometheus text exposition format. */
  val prometheusContentType = "text/plain; version=0.0.4; charset=utf-8"

  /** Prometheus text exposition (version 0.0.4) of the counters — what
    * an off-the-shelf Prometheus scrapes from `GET /metrics` (the
    * reference mounts ginprom, main.go:216–217, and its k8s
    * ServiceMonitor scrapes this format, deploy/manifest.yaml:132–153).
    * Every counter gets the `graft_` namespace and the `_total` suffix
    * the counter convention requires (not doubled when already there). */
  def renderPrometheus(counts: Map[String, Long]): String =
    counts.toSeq.sortBy(_._1).map { case (k, v) =>
      val name = if (k.endsWith("_total")) s"graft_$k" else s"graft_${k}_total"
      s"# TYPE $name counter\n$name $v\n"
    }.mkString
}
