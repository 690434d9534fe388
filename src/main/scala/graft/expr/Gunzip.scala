package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{Gunzip, Gzip}

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Gzip compress/decompress of BINARY.
  *
  * The reference gunzips each Firehose record's `data` payload after
  * base64-decode (reference main.go:472–479) and the whole HTTP body when
  * `Content-Encoding: gzip` (reference gzipbinding/binding.go:38–45).
  * Spark has `unbase64` built in but no gzip codec as a scalar function,
  * so this is the one custom scalar the engine needs (SURVEY.md §4).
  *
  * The Catalyst expressions (`UnaryExpression` with `doGenCode`) live in
  * org.apache.spark.sql.graftshim (a legal subpackage for the
  * `private[sql]` types they touch); codegen calls the static methods
  * below, so evaluation stays inside whole-stage codegen.
  */
object GzipCodec {
  /** Per-record inflation cap: a crafted "zero bomb" (a few KB of gzip
    * expanding to GBs) would otherwise OOM an executor task mid-scan.
    * max(64 MiB, 4× input) mirrors the HTTP body layer's guard
    * (FirehoseEndpoint); past the cap strict `gunzip` throws IOException
    * (→ the batch fails loudly) and `try_gunzip` yields null (→ the
    * record dead-letters like any other corrupt payload). */
  val maxInflateBytes: Long = 64L << 20

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val cap = math.max(maxInflateBytes, 4L * bytes.length)
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream(math.max(64, bytes.length * 4))
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size() > cap)
        throw new java.io.IOException(
          s"gunzip output exceeds inflation cap ($cap bytes for ${bytes.length} compressed)")
      n = in.read(buf)
    }
    in.close()
    out.toByteArray
  }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(math.max(64, bytes.length / 2))
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  /** gunzip that yields null on corrupt/non-gzip input instead of
    * throwing — the streaming dead-letter path (graftshim.TryGunzip). */
  def tryGunzip(bytes: Array[Byte]): Array[Byte] =
    try gunzip(bytes)
    catch { case _: java.io.IOException => null }
}

object GzipFunctions {
  import graft.Cols
  def gunzip(c: Column): Column = Cols.column(Gunzip(Cols.expr(c)))
  def gzip(c: Column): Column = Cols.column(Gzip(Cols.expr(c)))
  def try_gunzip(c: Column): Column =
    Cols.column(org.apache.spark.sql.graftshim.TryGunzip(Cols.expr(c)))
}
