package graft

import org.apache.spark.sql.functions._

import graft.ops.Decode

/** Decode-chain semantics pinned against the reference:
  * F4 message normalization (main.go:492–510), X2 fan-out cardinality
  * (main.go:228), and gzip-layer equivalence (the gzip and plain paths
  * must produce identical documents). */
class DecodeSpec extends SparkSpec {

  test("F4 jsonOrText: the reference's four message cases") {
    import spark.implicits._
    // main.go:492–510: valid JSON object → verbatim; valid JSON scalar →
    // verbatim; plain text → {"text": msg}; empty string is not JSON →
    // wrapped too.
    val cases = Seq(
      """{"a":1}""" -> """{"a":1}""",
      "42" -> "42",
      "plain text msg" -> """{"text":"plain text msg"}""",
      "" -> """{"text":""}""")
    val out = cases.map(_._1).toDF("msg")
      .select(col("msg"), Decode.jsonOrText(col("msg")).as("message"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) => assert(out(in) == want, s"case <$in>") }
  }

  test("X2 explode cardinality: documents = sum of |logEvents| (2 per batch)") {
    val nEvents = Tables.events(spark, sfDir).count()
    val docs = Decode.pipeline(spark, sfDir, withGzip = false)
    assert(docs.count() == 2 * nEvents)
  }

  test("per-record gzip layer decodes to identical documents as the plain path") {
    val plain = Decode.pipeline(spark, sfDir, withGzip = false)
    val gz = Decode.pipeline(spark, sfDir, withGzip = true)
    assert(gz.exceptAll(plain).isEmpty && plain.exceptAll(gz).isEmpty)
  }

  test("whole-body gzip binding: 2 records per request, payloads survive the wire") {
    val nEvents = Tables.events(spark, sfDir).count()
    val out = Decode.bodyGzipOp.fn(spark, sfDir)
    assert(out.count() == 2 * nEvents)
    // record 0 carries props (JSON), record 1 carries the event_type word
    val r1 = out.filter(col("rec_pos") === 1).select("payload").distinct().count()
    assert(r1 <= 10) // event_type vocabulary is small
  }
}
