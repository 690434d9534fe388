package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expr.GzipCodec
import graft.expr.GzipFunctions.{gunzip, gzip}

/** Round-trip law for the custom Gunzip/Gzip Catalyst expressions — the
  * only correctness check possible for the oracle-exempt `k2e_gunzip`
  * (DuckDB has no gzip scalar). Covers the static codec, the interpreted
  * eval path, and the codegen path through a real plan. */
class GzipSpec extends SparkSpec {

  private val byteArrays: Gen[Array[Byte]] =
    Gen.chooseNum(0, 8192).flatMap(n => Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))

  test("codec round-trip holds on 200 scalacheck byte arrays (sizes 0..8192)") {
    var seed = Seed(42L)
    (1 to 200).foreach { _ =>
      val bytes = byteArrays.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      assert(GzipCodec.gunzip(GzipCodec.gzip(bytes)).sameElements(bytes))
    }
  }

  test("expression round-trip through a Spark plan (codegen path)") {
    import spark.implicits._
    val strings = Seq("", "a", "hello graft", "x" * 10000, "é中文 mixed")
    val out = strings.toDF("s")
      .select(gunzip(gzip(col("s").cast("binary"))).cast("string").as("rt"))
      .as[String].collect()
    assert(out.toSeq == strings)
  }

  test("gzip output carries the 1f8b magic the sniffer keys on") {
    // reference main.go:74–121 detects gzip by magic bytes
    val gz = GzipCodec.gzip("payload".getBytes("UTF-8"))
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
  }

  test("gunzip of non-gzip bytes fails (reference rejects the batch)") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq("not gzip").toDF("s")
        .select(gunzip(col("s").cast("binary"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("null propagates as null, not a crash") {
    import spark.implicits._
    val out = Seq[Option[String]](None).toDF("s")
      .select(gunzip(col("s").cast("binary")).as("b")).collect()
    assert(out.head.isNullAt(0))
  }

  test("inflation cap: a gzip zero-bomb throws in gunzip and nulls in try_gunzip") {
    // ~80 MiB of zeros compress to ~80 KB; inflating would cross the
    // 64 MiB cap, so strict gunzip aborts instead of OOMing the task
    // and try_gunzip routes the record to dead-letter.
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    val zeros = new Array[Byte](8192)
    (1 to 10240).foreach(_ => gz.write(zeros))
    gz.close()
    val bomb = bos.toByteArray
    assert(bomb.length < (1 << 20), "fixture must be small on the wire")
    val ex = intercept[java.io.IOException](GzipCodec.gunzip(bomb))
    assert(ex.getMessage.contains("inflation cap"))
    assert(GzipCodec.tryGunzip(bomb) == null)
  }

  test("try_gunzip: valid input round-trips, corrupt and null yield null (codegen path)") {
    import graft.expr.GzipFunctions.try_gunzip
    import spark.implicits._
    val rows = Seq(Some("valid"), Some("corrupt"), None).toDF("s")
      .select(col("s"),
        try_gunzip(when(col("s") === "valid", gzip(col("s").cast("binary")))
          .otherwise(col("s").cast("binary"))).cast("string").as("out"))
      .collect()
    assert(rows(0).getString(1) == "valid")   // gunzip(gzip(x)) == x
    assert(rows(1).isNullAt(1))               // non-gzip bytes -> null, no throw
    assert(rows(2).isNullAt(1))               // null in -> null out
  }
}
