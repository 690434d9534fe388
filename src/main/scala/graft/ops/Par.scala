package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Scan-width-aware parallelism spread.
  *
  * The local testdata is one small parquet split per table, so a scan
  * yields 1 partition and any per-row-heavy map (gzip JNI, cosine
  * scoring, grok regex, range probes) runs single-threaded. Real
  * deployments read many splits and get this parallelism for free — an
  * unconditional `repartition` there would force a full shuffle of the
  * corpus before map-only work. So: repartition ONLY when the plan's
  * scan yields fewer partitions than half the cores; otherwise return
  * the frame untouched. The row set is unchanged either way, so oracle
  * compares are unaffected.
  *
  * Explicit partition count (not `repartition(col)`) because AQE
  * coalesces column-only repartitions of small shuffles back to ~1
  * partition, defeating the point on the local rig.
  */
object Par {
  /** Repartition `df` on `key` to defaultParallelism iff its current
    * physical partitioning is narrower than cores/2. Partition count is
    * read off the planned RDD lineage — no job runs. */
  def spread(s: SparkSession, df: DataFrame, key: Column): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, cores / 2)) df.repartition(cores, key)
    else df
  }
}
