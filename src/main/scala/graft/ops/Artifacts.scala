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
  def buildOnce(s: SparkSession, srcPath: String, artifact: String)
               (build: String => Unit): DataFrame = {
    val src = new java.io.File(srcPath)
    val key = s"sf${srcPath.replaceAll("[^a-zA-Z0-9.]", "_")}_${src.length()}_${src.lastModified()}"
    val path = s"/root/repo/target/$artifact/$key"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    Artifacts.synchronized {
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_SUCCESS"))) build(path)
    }
    s.read.parquet(path)
  }
}
