package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The testdata CONTRACT, as one focused suite: every table loads, and the
  * events loader's derived columns resolve with the promised types. The
  * driver regenerates /root/testdata between rounds and has already changed
  * `events.ts`'s parquet encoding once (TIMESTAMP(NANOS) → timestamp[us],
  * 2026-08-13) — that regeneration silently broke 47 queries and 14 tests.
  * If it moves again, THIS spec fails with one clear message instead. */
class TablesSpec extends SparkSpec {

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("every testdata table loads and is non-empty at sf0.001") {
    tableNames.foreach { t =>
      val df = Tables.table(spark, sfDir, t)
      assert(df.head(1).nonEmpty, s"table $t is empty — testdata contract broken")
    }
  }

  test("event_id fits the unique-ordering-key multiplier (id < 2^20)") {
    // the transform/downsample/rollover family orders events by the
    // exact long key ms·2^20 + event_id, which is lexicographic
    // (ms, id) ordering ONLY while id < 2^20 — guard the testdata
    // invariant so a regenerated dataset that breaks it fails HERE,
    // not as a silent ordering drift. (At larger id spaces the
    // multiplier grows with the id bound — exact up to ~5·10^6 ids at
    // 2026-epoch milliseconds — beyond which the argmax becomes two
    // exact stages: per-(entity, ms) argmax by id, then by ms.)
    import org.apache.spark.sql.functions._
    val maxId = Tables.events(spark, sfDir).agg(max("event_id")).head().getLong(0)
    assert(maxId < (1L << 20), s"event_id $maxId breaks the 2^20 ordering-key bound")
  }

  test("events loader: ts_ms is LONG epoch millis, tsu is TIMESTAMP micros") {
    val ev = Tables.events(spark, sfDir)
    val schema = ev.schema
    assert(schema("ts_ms").dataType == LongType,
      s"ts_ms must be LONG, got ${schema("ts_ms").dataType} — events.ts encoding moved again?")
    assert(schema("tsu").dataType == TimestampType,
      s"tsu must be TIMESTAMP, got ${schema("tsu").dataType} — events.ts encoding moved again?")
    // Whatever the file encoding, the derived views must AGREE: tsu floored
    // to millis is ts_ms, and both land in a sane epoch range (2000–2100).
    val bad = ev.filter(
      unix_millis(col("tsu")) =!= col("ts_ms") ||
        col("ts_ms") < lit(946684800000L) || col("ts_ms") > lit(4102444800000L))
    assert(bad.head(1).isEmpty,
      s"ts_ms/tsu disagree or out of epoch range: ${bad.head(1).mkString}")
  }

  test("events loader: native ts column still supports a pushable bound") {
    val ev = Tables.events(spark, sfDir)
    val minMs = ev.agg(min(col("ts_ms"))).head.getLong(0)
    // A bound at the observed minimum must keep every row — and because it
    // targets the NATIVE column via tsLiteral it stays parquet-pushable
    // (PlanSpec locks the PushedFilters shape on ns_search_after).
    val total = ev.count()
    val kept = ev.filter(col("ts") >= Tables.tsLiteral(ev, minMs * 1000L)).count()
    assert(kept == total, s"native-ts bound dropped rows: $kept of $total")
    // And tsMicros agrees with ts_ms at milli precision.
    val drift = ev.filter(Tables.tsMicros(ev).divide(1000).cast(LongType) =!= col("ts_ms"))
    assert(drift.head(1).isEmpty, "tsMicros and ts_ms disagree")
  }

  test("catalog cache: recursive resolution through cached() never throws (r21)") {
    // Regression lock for the computeIfAbsent "Recursive update" bug:
    // a derived view's build resolves its BASE table through the same
    // map (accessLog → events), and ConcurrentHashMap.computeIfAbsent
    // throws IllegalStateException when the recursive call lands in
    // the same hash bin — nondeterministically. cached() now uses
    // get + putIfAbsent; this test forces MANY recursive resolutions
    // (every one of which could collide) and asserts both that nothing
    // throws and that repeated resolution returns the identical plan
    // object (the whole point of the catalog).
    (1 to 64).foreach { i =>
      val outer = Tables.cached(spark, sfDir, s"spec#outer$i", statName = "events") {
        // recursive: the build itself resolves another cached entry
        Tables.cached(spark, sfDir, s"spec#inner$i", statName = "events")(
          Tables.events(spark, sfDir)).select(col("event_id"))
      }
      assert(outer ne null)
    }
    val a = Tables.table(spark, sfDir, "events")
    val b = Tables.table(spark, sfDir, "events")
    assert(a eq b, "repeated table resolution must return the cached plan object")
  }

  test("catalog cache: executions still scan the files (no result caching)") {
    // the catalog holds READ PLANS only — two executions of the same
    // cached frame recompute from parquet (different action, same rows)
    val df = Tables.events(spark, sfDir)
    assert(df.count() == df.count())
    assert(df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation => r
    }.isEmpty)
    assert(!df.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
      "cached() must never introduce an InMemoryRelation (that would cache DATA)")
  }

  test("eventsDt twin: same rows, dt is a DATE partition column equal to date(tsu)") {
    val ev = Tables.events(spark, sfDir)
    val twin = Tables.eventsDt(spark, sfDir)
    assert(twin.schema("dt").dataType == DateType,
      s"dt must come back as DATE via partition discovery, got ${twin.schema("dt").dataType}")
    assert(twin.count() == ev.count(), "the partitioned twin lost/duplicated rows")
    // dt is exactly the UTC day of the instant — the invariant that makes
    // day-granular dt windows EXACT (not just coarse) for the oracles
    val bad = twin.filter(col("dt") =!= to_date(col("tsu")))
    assert(bad.head(1).isEmpty, s"dt != date(tsu): ${bad.head(1).mkString}")
    // every event column survives the round trip
    ev.columns.foreach(c => assert(twin.columns.contains(c), s"twin lost column $c"))
  }
}
