package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.TransformStream

/** Contracts for the continuous `_transform` store (TransformStream):
  * the folded store equals the one-shot pivot, checkpoint replay is
  * idempotent, and per-trigger IO touches only the batch's buckets. */
class TransformStreamSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString

  // (user_id, event_type, vc, ok) rows; ok must be unique
  private def row(u: Long, t: String, vc: Long, ok: Long) = (u, t, vc, ok)

  test("streamed store equals the one-shot pivot after multiple triggers") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long, Long)]
    val storeDir = tmp("ts-store")
    val q = TransformStream.start(
      in.toDF().toDF("user_id", "event_type", "vc", "ok"),
      storeDir, tmp("ts-ckpt"))
    try {
      in.addData(row(1, "view", 100, 10), row(1, "click", 250, 11), row(2, "view", 40, 12))
      q.processAllAvailable()
      in.addData(row(1, "purchase", 999, 13), row(3, "view", 7, 14))
      q.processAllAvailable()
      in.addData(row(2, "click", 60, 9)) // LATE event: ok below user 2's current last
      q.processAllAvailable()
    } finally q.stop()

    val got = TransformStream.readStore(spark, storeDir)
      .as[(Long, Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(got(1L) == ((1L, 3L, 1349L, 13L, "purchase")))
    assert(got(2L) == ((2L, 2L, 100L, 12L, "view"))) // late click adds but does not win
    assert(got(3L) == ((3L, 1L, 7L, 14L, "view")))
  }

  test("checkpoint replay is idempotent: re-upserting a batch converges to the same store") {
    import spark.implicits._
    val storeDir = tmp("ts-idem")
    val b0 = Seq(row(1, "view", 10, 1), row(2, "view", 20, 2))
      .toDF("user_id", "event_type", "vc", "ok")
    val b1 = Seq(row(1, "click", 30, 3)).toDF("user_id", "event_type", "vc", "ok")
    TransformStream.upsertBatch(spark, storeDir)(b0, 0L)
    TransformStream.upsertBatch(spark, storeDir)(b1, 1L)
    val once = TransformStream.readStore(spark, storeDir)
      .orderBy("user_id").collect().toSeq
    // the failure-replay case: batch 1 runs again with the same id
    TransformStream.upsertBatch(spark, storeDir)(b1, 1L)
    val twice = TransformStream.readStore(spark, storeDir)
      .orderBy("user_id").collect().toSeq
    assert(once == twice)
    assert(once.find(_.getLong(0) == 1L).get.getLong(1) == 2L) // n_events NOT doubled
  }

  test("a trigger writes only its batch's buckets; untouched buckets stay at older generations") {
    import spark.implicits._
    val storeDir = tmp("ts-bkt")
    // users 0..15 spread across buckets in gen 0
    val wide = (0L until 16L).map(u => row(u, "view", 1, u + 1))
      .toDF("user_id", "event_type", "vc", "ok")
    TransformStream.upsertBatch(spark, storeDir)(wide, 0L)
    val gensAfter0 = TransformStream.latestGens(spark, storeDir, Long.MaxValue)
    // one user in gen 1 → exactly one bucket advances
    val narrow = Seq(row(5, "click", 2, 100)).toDF("user_id", "event_type", "vc", "ok")
    TransformStream.upsertBatch(spark, storeDir)(narrow, 1L)
    val gensAfter1 = TransformStream.latestGens(spark, storeDir, Long.MaxValue)
    val advanced = gensAfter1.filter { case (b, g) => gensAfter0.get(b).exists(_ < g) }
    assert(advanced.size == 1,
      s"one-user batch must advance one bucket, got $advanced")
    // and the store still reads complete
    assert(TransformStream.readStore(spark, storeDir).count() == 16)
  }

  test("compaction folds all buckets into the newest generation and preserves reads") {
    import spark.implicits._
    val storeDir = tmp("ts-compact")
    // three triggers touching overlapping bucket sets
    TransformStream.upsertBatch(spark, storeDir)(
      (0L until 16L).map(u => row(u, "view", 1, u + 1))
        .toDF("user_id", "event_type", "vc", "ok"), 0L)
    TransformStream.upsertBatch(spark, storeDir)(
      Seq(row(3, "click", 2, 100), row(7, "click", 2, 101))
        .toDF("user_id", "event_type", "vc", "ok"), 1L)
    TransformStream.upsertBatch(spark, storeDir)(
      Seq(row(3, "buy", 4, 200)).toDF("user_id", "event_type", "vc", "ok"), 2L)
    val before = TransformStream.readStore(spark, storeDir)
      .orderBy("user_id").collect().toSeq
    val removed = TransformStream.compact(spark, storeDir)
    assert(removed >= 1, "compaction must drop superseded generations")
    val after = TransformStream.readStore(spark, storeDir)
      .orderBy("user_id").collect().toSeq
    assert(after == before, "compaction changed the store contents")
    // every bucket now resolves to the single surviving generation
    val gens = TransformStream.latestGens(spark, storeDir, Long.MaxValue)
    assert(gens.values.toSet.size == 1, s"expected one generation, got $gens")
    // and a second compact is a no-op
    assert(TransformStream.compact(spark, storeDir) == 0)
  }

  test("randomized interleavings: 50 seeds of schedules × late arrivals × replay × compaction == one-shot pivot after every trigger") {
    // the r16 plan's streaming-store industrialization: the directed
    // contracts above each pin ONE interleaving; here 50 random ones —
    // random trigger cuts (empty batches included), shuffled ordering
    // keys (late events by construction), checkpoint-recovery replays
    // of the just-committed batch (sometimes twice), and mid-stream
    // compactions — must all read back equal to the one-shot pivot of
    // everything ingested so far, after EVERY trigger.
    import spark.implicits._
    val types = Seq("view", "click", "buy", "ship", "ret")
    (1 to 50).foreach { seedI =>
      val rnd = new scala.util.Random(seedI * 7919L)
      val storeDir = tmp(s"ts-rand$seedI")
      val nEvents = 20 + rnd.nextInt(31)
      val oks = rnd.shuffle((1L to nEvents.toLong).toList)
      val events = oks.map(ok => (1L + rnd.nextInt(8),
        types(rnd.nextInt(types.size)), 1L + rnd.nextInt(1000), ok))
      val nBatches = 1 + rnd.nextInt(6)
      val cuts = Seq.fill(nBatches - 1)(rnd.nextInt(nEvents + 1)).sorted
      val bounds = (0 +: cuts) :+ nEvents
      val batches = bounds.zip(bounds.tail).map { case (a, b) => events.slice(a, b) }
      var seen = List.empty[(Long, String, Long, Long)]
      batches.zipWithIndex.foreach { case (batch, bi) =>
        if (bi > 0 && rnd.nextInt(4) == 0) {
          val before = TransformStream.readStore(spark, storeDir)
            .orderBy("user_id").collect().toSeq
          TransformStream.compact(spark, storeDir)
          val after = TransformStream.readStore(spark, storeDir)
            .orderBy("user_id").collect().toSeq
          assert(after == before, s"seed $seedI: compaction changed the store")
        }
        val bdf = batch.toDF("user_id", "event_type", "vc", "ok")
        TransformStream.upsertBatch(spark, storeDir)(bdf, bi.toLong)
        if (rnd.nextInt(3) == 0) // checkpoint-recovery replay, same id
          TransformStream.upsertBatch(spark, storeDir)(bdf, bi.toLong)
        seen = seen ++ batch
        val got = TransformStream.readStore(spark, storeDir)
          .orderBy("user_id").collect().toSeq
        val want = TransformStream.partial(
            seen.toDF("user_id", "event_type", "vc", "ok"))
          .orderBy("user_id").collect().toSeq
        assert(got == want,
          s"seed $seedI after batch $bi: store diverged from the one-shot pivot " +
            s"(batches: ${batches.map(_.size)})")
      }
    }
  }

  test("merge is associative: any batch split folds to the one-shot partial") {
    import spark.implicits._
    val all = Seq(row(1, "a", 1, 1), row(1, "b", 2, 5), row(2, "c", 3, 3),
      row(2, "d", 4, 2), row(3, "e", 5, 4))
      .toDF("user_id", "event_type", "vc", "ok")
    val oneShot = TransformStream.partial(all).orderBy("user_id").collect().toSeq
    for (m <- 2 to 3) {
      val parts = (0 until m).map(i => all.filter(col("ok") % m === i))
      val folded = parts.map(TransformStream.partial).reduce(TransformStream.merge)
        .orderBy("user_id").collect().toSeq
      assert(folded == oneShot, s"fold of $m parts diverged")
    }
  }
}
