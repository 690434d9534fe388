package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous `_transform` (pivot mode with continuous checkpoints) —
  * the streaming half of `ns_transform_pivot`: an entity-centric store
  * upserted per micro-batch. The reference's downstream runs exactly
  * this job shape (an ES transform turning the event log into a
  * current-state index); here the aggregate state is MERGEABLE by
  * construction — counts, sums, and argmax over the UNIQUE
  * ms·2^20+event_id ordering key — so each trigger computes only its
  * batch's partial pivot and merges it with prior state, never
  * recomputing from history.
  *
  * Store layout under `storeDir`: `gen=<batchId>/bkt=<b>/` — each
  * trigger writes a new GENERATION holding only the entity buckets its
  * batch touched (`bkt = pmod(hash(user_id), storeBuckets)`); a
  * bucket's current state is its LATEST generation. Properties:
  *
  *  - **Idempotent under checkpoint replay**: a replayed batch reads
  *    each touched bucket's latest generation STRICTLY BEFORE its own
  *    id and overwrites `gen=<id>` — same inputs, same deterministic
  *    merge, same result; nothing double-counts.
  *  - **Per-trigger IO tracks the batch footprint**: only touched
  *    buckets are read and written (the DedupStream bucketed-store
  *    discipline); at 100 TB the entity table is big but a trigger
  *    moves `|touched buckets| / storeBuckets` of it, and the knob
  *    grows with the corpus without changing the plan shape.
  *  - The touched-bucket set is a bounded driver collect (≤
  *    storeBuckets integers — the DedupStream precedent).
  *
  * Input contract: a (streaming or batch) frame with columns
  * `(user_id LONG, event_type STRING, vc LONG, ok LONG)` where `vc` is
  * the exact-cents value and `ok` the unique ordering key. Store rows:
  * `(user_id, n_events, sum_value_c, last_ok, last_type)`.
  */
object TransformStream {

  val storeBuckets = 16

  private def bucketOf(c: Column): Column = pmod(hash(c), lit(storeBuckets))

  /** One batch's partial pivot — the same aggregate the one-shot
    * `ns_transform_pivot` runs, restricted to the batch. */
  def partial(batch: DataFrame): DataFrame =
    batch.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      sum(col("vc")).as("sum_value_c"),
      max(col("ok")).as("last_ok"),
      expr("max_by(event_type, ok)").as("last_type"))

  /** Merge two partial states. Associative and commutative: sums add,
    * the argmax re-decides on the unique key — so any batch split folds
    * to the same store as the one-shot aggregate. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("user_id").agg(
      sum(col("n_events")).as("n_events"),
      sum(col("sum_value_c")).as("sum_value_c"),
      max(col("last_ok")).as("last_ok"),
      expr("max_by(last_type, last_ok)").as("last_type"))

  /** (bucket → latest generation id strictly below `beforeGen`), from a
    * driver-side listing of the generation directories — bounded by
    * generations × buckets directory entries, no data read. */
  private[graft] def latestGens(spark: SparkSession, storeDir: String,
                                beforeGen: Long): Map[Int, Long] = {
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    val gens = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("gen="))
      .map(p => p -> p.getName.stripPrefix("gen=").toLong)
      .filter(_._2 < beforeGen)
    gens.flatMap { case (genPath, gen) =>
      fs.listStatus(genPath).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith("bkt="))
        .map(b => b.stripPrefix("bkt=").toInt -> gen)
    }.groupBy(_._1).map { case (b, gs) => b -> gs.map(_._2).max }
  }

  /** Read the given buckets' current state (their latest generations).
    * Empty bucket set or store → empty frame with the store schema. */
  private[streaming] def readBuckets(spark: SparkSession, storeDir: String,
                                     buckets: Seq[Int], beforeGen: Long): Option[DataFrame] = {
    val latest = latestGens(spark, storeDir, beforeGen)
    val paths = buckets.flatMap(b => latest.get(b).map(g => s"$storeDir/gen=$g/bkt=$b"))
    if (paths.isEmpty) None
    else Some(spark.read.parquet(paths: _*)
      .select("user_id", "n_events", "sum_value_c", "last_ok", "last_type"))
  }

  /** The per-trigger upsert: partial-pivot the batch, read ONLY the
    * touched buckets' prior state, merge, write this generation. */
  def upsertBatch(spark: SparkSession, storeDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val p = partial(batch).withColumn("bkt", bucketOf(col("user_id")))
    if (p.isEmpty) return
    val touched = p.select("bkt").distinct().collect().map(_.getInt(0)).toSeq.sorted
    val merged = readBuckets(spark, storeDir, touched, batchId) match {
      case Some(prev) => merge(prev, p.drop("bkt")).withColumn("bkt", bucketOf(col("user_id")))
      case None => p
    }
    merged.write.mode("overwrite").partitionBy("bkt")
      .parquet(s"$storeDir/gen=$batchId")
  }

  /** Current store state across all buckets. */
  def readStore(spark: SparkSession, storeDir: String): DataFrame =
    readBuckets(spark, storeDir, 0 until storeBuckets, Long.MaxValue)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_events", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sum_value_c", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("last_ok", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("last_type", org.apache.spark.sql.types.StringType)))))

  /** Fold every bucket's current state into the newest generation and
    * drop the older ones — the compaction that bounds both the
    * driver-side generation listing and the per-bucket read fan-in as
    * triggers accumulate (DedupStream's compaction discipline). Safe
    * once the streaming query's checkpoint has committed past the
    * newest generation: a replay of any LATER batch reads generations
    * strictly before itself, which compaction preserves as the single
    * consolidated one. Returns the number of generations removed. */
  def compact(spark: SparkSession, storeDir: String): Int = {
    val latest = latestGens(spark, storeDir, Long.MaxValue)
    if (latest.isEmpty) return 0
    val maxGen = latest.values.max
    val older = latest.filter(_._2 < maxGen)
    if (older.isEmpty) return 0
    // bring every stale bucket's state forward into gen=<maxGen>
    // (the target generation keeps its own buckets — they ARE current)
    val stalePaths = older.map { case (b, g) => s"$storeDir/gen=$g/bkt=$b" }.toSeq
    val carried = spark.read.parquet(stalePaths: _*)
      .select("user_id", "n_events", "sum_value_c", "last_ok", "last_type")
      .withColumn("bkt", bucketOf(col("user_id")))
    carried.write.mode("append").partitionBy("bkt").parquet(s"$storeDir/gen=$maxGen")
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val removed = fs.listStatus(root).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("gen=") &&
        p.getName.stripPrefix("gen=").toLong < maxGen)
    removed.foreach(p => fs.delete(p, true))
    removed.size
  }

  /** Attach the continuous transform to a streaming source. */
  def start(events: DataFrame, storeDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) => upsertBatch(b.sparkSession, storeDir)(b, id) }
      .start()
}
