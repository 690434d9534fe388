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
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream(math.max(64, bytes.length * 4))
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
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
