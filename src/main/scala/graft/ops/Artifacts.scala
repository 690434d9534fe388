package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once discipline shared by every persisted derived artifact —
  * the IVF centroid dim and posting lists (VectorSearch) and the
  * unigram vocabulary (TextOps): at 100 TB these statistics/indexes are
  * built offline, once, and query plans only ever SCAN them; rebuilding
  * one inside each query replans and re-shuffles the corpus per run.
  *
  * The artifact is keyed by the SOURCE FILE's identity (path + size +
  * mtime — a regenerated corpus rebuilds instead of serving stale data;
  * "sf" prefix because the sanitized path starts with '_' and Spark's
  * file listing treats _-prefixed paths as hidden), built under a
  * `synchronized` _SUCCESS check so concurrent first callers build
  * exactly once.
  */
object Artifacts {
  /** Resolved artifact frames per (session, artifact path) — the
    * Tables.cached discipline (r21): the artifact path already encodes
    * the source file's size+mtime, so the key is staleness-safe; the
    * cached value is only the resolved READ PLAN (schema + file index),
    * never data — every execution still scans the artifact parquet.
    * Re-resolving the read on each of the ~20 artifact-backed keys ×
    * bench passes cost ~40 ms apiece. */
  private val reads =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def buildOnce(s: SparkSession, srcPath: String, artifact: String)
               (build: String => Unit): DataFrame = {
    val src = new java.io.File(srcPath)
    val key = s"sf${srcPath.replaceAll("[^a-zA-Z0-9.]", "_")}_${src.length()}_${src.lastModified()}"
    val path = s"/root/repo/target/$artifact/$key"
    // get + putIfAbsent, NOT computeIfAbsent: an artifact build can
    // resolve ANOTHER artifact through this same map (ivfpq_codes →
    // pq_codebook), and a recursive computeIfAbsent landing in the
    // same hash bin throws IllegalStateException("Recursive update")
    // nondeterministically. The benign same-key race costs one
    // redundant plan resolution; the build itself stays serialized
    // under Artifacts.synchronized.
    val mapKey = (s, path)
    val existing = reads.get(mapKey)
    if (existing != null) existing
    else {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      Artifacts.synchronized {
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_SUCCESS"))) build(path)
      }
      val built = s.read.parquet(path)
      val prev = reads.putIfAbsent(mapKey, built)
      if (prev != null) prev else built
    }
  }
}
