package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.TextOps

/** Streaming incremental corpus dedup — the continuous-ingestion form of
  * `ns_dedup_incremental`: each micro-batch of documents is near-dup
  * checked against a PERSISTED signature store built by all prior
  * batches (and against itself), dups are flagged with their canonical
  * duplicate, and only the batch's unique documents extend the store —
  * a duplicate never becomes a future dedup target, so the store is the
  * canonical corpus.
  *
  * Store layout under `storeDir` (both idempotent under checkpoint
  * replay — each batch owns its `batch=<id>` partition with overwrite,
  * and reads see only partitions strictly BEFORE the current batch, so
  * a replayed batch never matches its own earlier write):
  *  - `bands/batch=<id>/` — (doc_id, band, sig) MinHash band rows
  *  - `sets/batch=<id>/`  — (doc_id, sh) distinct shingle sets
  *
  * Scale shape: a micro-batch is small and the store is the corpus, so
  * both candidate joins BROADCAST the batch side — the store's band and
  * set scans stay map-side, no corpus shuffle per trigger. Candidate
  * volume is bounded by the LSH bands exactly like the batch ops;
  * verification is exact Jaccard on candidates only. At 100 TB the
  * band store would be bucketed by (band, sig) so the probe prunes
  * buckets instead of scanning; the per-batch plan is unchanged.
  *
  * Documents with fewer than 3 tokens produce no shingles, are always
  * unique, and are not stored (they can never be a dedup target).
  */
object DedupStream {

  /** One micro-batch: flag dups against the store + within-batch, write
    * results to `outDir/batch=<id>`, extend the store with uniques.
    * Expects columns (doc_id BIGINT, text STRING). */
  def sinkBatch(storeDir: String, outDir: String, threshold: Double = 0.5)
               (batch: Dataset[Row], batchId: Long): Unit = {
    val spark = batch.sparkSession
    val docs = batch.toDF().select(col("doc_id"), col("text")).persist()
    // both frames are referenced by candidate generation AND the store
    // write — persisted so the signature pass runs once per batch, not
    // once per reference
    val bands = TextOps.bandSignatures(docs, "doc_id", "text").persist()
    val sets = TextOps.shingleSets(docs, "doc_id", "text").persist()
    try {

      def priorStore(sub: String): Option[DataFrame] = {
        val path = new org.apache.hadoop.fs.Path(s"$storeDir/$sub")
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(path) && fs.listStatus(path).nonEmpty)
          Some(spark.read.parquet(path.toString).filter(col("batch") < batchId))
        else None
      }

      // candidate targets: prior corpus docs (any id) and within-batch
      // docs with a SMALLER id (the within-batch canonical rule of
      // ns_dedup_incremental/ns_dedup_pipeline: min doc_id keeps).
      // dup_of is a matched canonical CANDIDATE — when similarity is
      // not transitive it may itself be flagged against an even earlier
      // doc; chain-chasers resolve through the results channel.
      val batchTargets = bands
        .select(col("doc_id").as("old_id"), col("band"), col("sig"))
        .withColumn("prior", lit(false))
      val targets = priorStore("bands")
        .map(p => p.select(col("doc_id").as("old_id"), col("band"), col("sig"))
          .withColumn("prior", lit(true))
          .unionByName(batchTargets))
        .getOrElse(batchTargets)
      val cand = targets
        .join(broadcast(bands.select(col("doc_id").as("new_id"), col("band"), col("sig"))),
          Seq("band", "sig"))
        .filter(col("prior") || col("old_id") < col("new_id"))
        .filter(col("old_id") =!= col("new_id"))
        .select(col("new_id"), col("old_id"))
        .distinct()

      val batchSets = sets.select(col("doc_id").as("old_id"), col("sh").as("sb"))
      val targetSets = priorStore("sets")
        .map(p => p.select(col("doc_id").as("old_id"), col("sh").as("sb"))
          .unionByName(batchSets))
        .getOrElse(batchSets)
      val dups = targetSets
        .join(broadcast(cand), "old_id")
        .join(broadcast(sets.select(col("doc_id").as("new_id"), col("sh").as("sa"))), "new_id")
        .withColumn("o", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("na", size(col("sa")).cast("long"))
        .withColumn("nb", size(col("sb")).cast("long"))
        .filter(expr(s"CAST(o AS DOUBLE) / (na + nb - o) >= $threshold"))
        .groupBy("new_id").agg(min(col("old_id")).as("dup_of"))

      val results = docs.select(col("doc_id"))
        .join(dups.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("is_unique"))
        .persist()
      try {
        // a micro-batch's output is small by definition — one file per
        // channel per batch, not one per shuffle partition (at a 5 s
        // cadence, 32 files/batch would mint ~550k tiny files/day)
        results.coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        val uniques = results.filter(col("is_unique")).select("doc_id")
        bands.join(broadcast(uniques), "doc_id").coalesce(1)
          .write.mode("overwrite").parquet(s"$storeDir/bands/batch=$batchId")
        sets.join(broadcast(uniques), "doc_id").coalesce(1)
          .write.mode("overwrite").parquet(s"$storeDir/sets/batch=$batchId")
      } finally results.unpersist()
    } finally {
      bands.unpersist()
      sets.unpersist()
      docs.unpersist()
    }
  }

  /** Compact the signature store: fold every `batch=<id>` partition
    * with id < `upTo` into ONE consolidated partition, so a
    * long-running stream's store stays a handful of well-sized files
    * instead of one directory per trigger (directory listing cost grows
    * with trigger count, not corpus size).
    *
    * Crash- and replay-safe by construction:
    *  - The consolidated rows live at a NEGATIVE partition id (-1/-2,
    *    alternating across compactions), strictly before every real
    *    batch id — so any batch's strictly-before read always sees the
    *    consolidated corpus, including a replayed batch whose own rows
    *    were folded in. A replayed batch re-matching its own folded
    *    signatures is harmless: self-pairs are excluded and dup_of
    *    takes the min, so results are identical (at worst its store
    *    partition briefly duplicates rows already in the fold —
    *    candidates are `distinct()`ed, so even that changes nothing).
    *  - The consolidated partition is WRITTEN BEFORE the old ones are
    *    deleted: a crash at any point leaves the store complete
    *    (possibly with duplicate rows until the next compact), never
    *    empty — the delete-then-rename shape would lose the whole
    *    corpus to a crash between the two steps.
    *
    * MUST run while the stream is stopped (between restarts):
    * compaction rewrites directories the running query reads. */
  def compact(spark: org.apache.spark.sql.SparkSession, storeDir: String,
              upTo: Long, targetFiles: Int = 8): Unit = {
    for (sub <- Seq("bands", "sets")) {
      val root = new org.apache.hadoop.fs.Path(s"$storeDir/$sub")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) {
        val olds = fs.listStatus(root).map(_.getPath)
          .filter { p =>
            p.getName.startsWith("batch=") &&
              p.getName.stripPrefix("batch=").toLong < upTo
          }
        if (olds.length > 1) {
          val oldIds = olds.map(_.getName.stripPrefix("batch=").toLong)
          val target = if (oldIds.contains(-1L)) -2L else -1L
          spark.read.parquet(olds.map(_.toString): _*)
            .coalesce(targetFiles)
            .write.mode("overwrite").parquet(s"$storeDir/$sub/batch=$target")
          olds.foreach(fs.delete(_, true))
        }
      }
    }
  }

  /** Wire the per-batch dedup into a streaming query. `source` must
    * deliver (doc_id, text) rows. */
  def run(source: DataFrame, storeDir: String, outDir: String,
          checkpointDir: String,
          trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
          threshold: Double = 0.5): StreamingQuery =
    source.writeStream
      .foreachBatch(sinkBatch(storeDir, outDir, threshold) _)
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .start()
}
