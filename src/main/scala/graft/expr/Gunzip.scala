package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Native Catalyst expressions for gzip compress/decompress of BINARY.
  *
  * The reference gunzips each Firehose record's `data` payload after
  * base64-decode (reference main.go:472–479) and the whole HTTP body when
  * `Content-Encoding: gzip` (reference gzipbinding/binding.go:38–45).
  * Spark has `unbase64` built in but no gzip codec as a scalar function,
  * so this is the one custom scalar the engine needs (SURVEY.md §4).
  *
  * Implemented as `UnaryExpression` with `doGenCode` delegating to a
  * static JVM method, so the call stays inside whole-stage codegen
  * (no UDF serialization, no codegen fallback).
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
}

case class Gunzip(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gunzip"
  override protected def nullSafeEval(input: Any): Any =
    GzipCodec.gunzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GzipCodec.gunzip($c)")
  override protected def withNewChildInternal(newChild: Expression): Gunzip =
    copy(child = newChild)
}

case class Gzip(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip"
  override protected def nullSafeEval(input: Any): Any =
    GzipCodec.gzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GzipCodec.gzip($c)")
  override protected def withNewChildInternal(newChild: Expression): Gzip =
    copy(child = newChild)
}

object GzipFunctions {
  import graft.Cols
  def gunzip(c: Column): Column = Cols.column(Gunzip(Cols.expr(c)))
  def gzip(c: Column): Column = Cols.column(Gzip(Cols.expr(c)))
}
