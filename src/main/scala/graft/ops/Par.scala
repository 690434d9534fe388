package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scan-width-aware parallelism spread.
  *
  * The local testdata is one small parquet split per table, so a scan
  * yields 1 partition and any per-row-heavy map (gzip JNI, cosine
  * scoring, grok regex, range probes) runs single-threaded. Real
  * deployments read many splits and get this parallelism for free — an
  * unconditional `repartition` there would force a full shuffle of the
  * corpus before map-only work. So: repartition ONLY when the scan is
  * provably narrower than half the cores; otherwise return the frame
  * untouched. The row set is unchanged either way, so oracle compares
  * are unaffected.
  *
  * Explicit partition count (not `repartition(col)`) because AQE
  * coalesces column-only repartitions of small shuffles back to ~1
  * partition, defeating the point on the local rig.
  */
object Par {

  /** Estimated scan partition count, read off the ANALYZED logical plan —
    * which the Dataset already computed eagerly at construction, so this
    * costs nothing. (The previous `df.rdd.getNumPartitions` probe forced
    * a full physical planning of a lineage that was then discarded: the
    * repartitioned Dataset plans again from scratch — double planning for
    * every spread-wrapped query.) Each file-backed relation contributes
    * ceil(bytes / maxPartitionBytes) splits; non-file relations (memory
    * streams, views) are treated as already-wide so they pass through. */
  private def estScanPartitions(s: SparkSession, df: DataFrame): Long = {
    val maxSplit = math.max(1L, s.sessionState.conf.filesMaxPartitionBytes)
    val perScan = df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          math.max(1L, (fs.location.sizeInBytes + maxSplit - 1) / maxSplit)
        case _ => Long.MaxValue
      }
    }
    if (perScan.isEmpty) Long.MaxValue
    else if (perScan.contains(Long.MaxValue)) Long.MaxValue
    else perScan.sum
  }

  /** Repartition `df` on `key` to defaultParallelism iff its scans are
    * narrower than cores/2. No physical planning, no job. */
  def spread(s: SparkSession, df: DataFrame, key: Column): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    if (estScanPartitions(s, df) < math.max(2, cores / 2)) df.repartition(cores, key)
    else df
  }
}
