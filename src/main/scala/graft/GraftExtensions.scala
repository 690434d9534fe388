package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graftshim.{BmpDims, BmpWrap, CosineSimilarity, DotProduct, Gunzip, Gzip, NfcNormalize, OrderedPairs, RegExpExtractStruct, SimHashBits, TryGunzip}

/** Registers graft's custom Catalyst expressions as SQL functions, both
  * via `SparkSessionExtensions` (for `.withExtensions` /
  * `spark.sql.extensions=graft.GraftExtensions`) and imperatively for
  * sessions the driver already built (Verify/Bench receive a plain
  * session).
  *
  * Functions: `gunzip(binary)`, `try_gunzip(binary)` (null on corrupt
  * input), `gzip(binary)`, `vec_dot(a,b)`,
  * `vec_cosine(a,b)`, `grok_struct(line, 'rx', 'field', ...)` —
  * single-pass multi-group regex extraction into a struct — and its
  * r12 sibling `dissect_struct(line, 'template', 'field', ...)` (the
  * ES dissect delimiter walk, no regex) —
  * `simhash_bits(tokens)`, `nfc_normalize(s)`,
  * `ordered_pairs(ids, includeDiagonal)`, the media fixtures
  * `bmp_wrap(payload, w, h)` / `bmp_dims(content)` and
  * `wav_wrap(payload, sampleRate, channels)` / `wav_meta(content)`,
  * and the dedup signature pair `word_shingles3(text)` /
  * `minhash_sigs(shingles, n)`; r11 adds the vector/PQ family —
  * `quantize_vec(emb)`, `vec_l2_long(a,b)`, `pq_encode(q,cb)`,
  * `pq_lut(qq,cb)`, `pq_adc(codes,lut)`, `nearest_centroid(q,cents)`,
  * and `geohash_cell(lat, lon, precision)` — the standard geohash
  * encoding (reference/Lucene GeoHashUtils semantics) as one codegen
  * call per row.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(e: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, builder) =>
      e.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          builder))
    }
    e.injectOptimizerRule(_ => graft.plans.EliminateCodecRoundTrips)
  }
}

object GraftExtensions {

  /** Evaluate a grok_struct literal argument at analysis time. The
    * pattern and field names SHAPE THE RESULT TYPE, so they must be
    * foldable non-null strings — anything else gets a proper
    * AnalysisException naming the contract, not an eval()-time NPE. */
  private def grokLiteral(e: Expression, param: String): String = {
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> "`grok_struct`", "paramName" -> s"`$param`",
          "paramType" -> "\"STRING\""))
    val v = e.eval(null)
    if (v == null)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INVALID_PARAMETER_VALUE.NULL",
        messageParameters = Map(
          "parameter" -> s"`$param`", "functionName" -> "`grok_struct`"))
    v.toString
  }

  /** Evaluate ordered_pairs' includeDiagonal argument at registration
    * time: it shapes the expansion, so it must be a foldable non-null
    * boolean — anything else gets a proper AnalysisException, not an
    * unbound-reference error or a silent null→false unboxing. */
  private def boolLiteral(e: Expression, fn: String, param: String): Boolean = {
    if (!e.foldable || e.dataType != org.apache.spark.sql.types.BooleanType)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$fn`", "paramName" -> s"`$param`",
          "paramType" -> "\"BOOLEAN\""))
    e.eval(null) match {
      case b: Boolean => b
      case null =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "INVALID_PARAMETER_VALUE.NULL",
          messageParameters = Map(
            "parameter" -> s"`$param`", "functionName" -> s"`$fn`"))
    }
  }

  /** Evaluate an int-literal argument that shapes a result type or an
    * expansion (so it must fold at analysis time, like boolLiteral). */
  private def intLiteral(e: Expression, fn: String, param: String,
                         min: Int, max: Int): Int = {
    val integral = e.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (!e.foldable || !integral)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$fn`", "paramName" -> s"`$param`",
          "paramType" -> "\"INT\""))
    e.eval(null) match {
      case null =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "INVALID_PARAMETER_VALUE.NULL",
          messageParameters = Map(
            "parameter" -> s"`$param`", "functionName" -> s"`$fn`"))
      case v =>
        val n = v.toString.toLong
        if (n < min || n > max)
          throw new IllegalArgumentException(
            s"$fn: $param must be in [$min, $max], got $n")
        n.toInt
    }
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "gunzip" -> (args => Gunzip(args.head)),
    "try_gunzip" -> (args => TryGunzip(args.head)),
    "gzip" -> (args => Gzip(args.head)),
    "vec_dot" -> (args => DotProduct(args(0), args(1))),
    "vec_cosine" -> (args => CosineSimilarity(args(0), args(1))),
    // grok_struct(line, 'regex', 'field1', 'field2', ...): pattern and
    // field names must be string literals (they shape the result type).
    "grok_struct" -> (args => RegExpExtractStruct(
      args.head,
      grokLiteral(args(1), "pattern"),
      args.drop(2).zipWithIndex.map { case (e, i) => grokLiteral(e, s"field${i + 1}") })),
    // dissect_struct(line, 'template', 'field1', ...): the ES dissect
    // delimiter walk; template and field names are literals (they shape
    // the result type), field order matches the template's captures.
    "dissect_struct" -> (args => org.apache.spark.sql.graftshim.DissectExtract(
      args.head,
      grokLiteral(args(1), "template"),
      args.drop(2).zipWithIndex.map { case (e, i) => grokLiteral(e, s"field${i + 1}") })),
    "simhash_bits" -> (args => SimHashBits(args.head)),
    "nfc_normalize" -> (args => NfcNormalize(args.head)),
    // ordered_pairs(ids, includeDiagonal): the diagonal flag shapes the
    // expansion, so it must be a boolean literal.
    "ordered_pairs" -> (args => OrderedPairs(args.head,
      boolLiteral(args(1), "ordered_pairs", "includeDiagonal"))),
    "bmp_wrap" -> (args => BmpWrap(args(0), args(1), args(2))),
    "bmp_dims" -> (args => BmpDims(args.head)),
    "wav_wrap" -> (args => org.apache.spark.sql.graftshim.WavWrap(args(0), args(1), args(2))),
    "wav_meta" -> (args => org.apache.spark.sql.graftshim.WavMeta(args.head)),
    "word_shingles3" -> (args => org.apache.spark.sql.graftshim.WordShingles3(args.head)),
    // minhash_sigs(shingles, n): n shapes the output vector, so it must
    // be an int literal (1..64 — the cached-prefix range).
    "minhash_sigs" -> (args => org.apache.spark.sql.graftshim.MinHashSigs(args.head,
      intLiteral(args(1), "minhash_sigs", "n", 1, 64))),
    // r11 vector/PQ family: integer quantization, exact long L2, the
    // PQ encode/LUT/ADC chain, and the k-means argmin — all column-arg
    // only, so plain builders
    "quantize_vec" -> (args => org.apache.spark.sql.graftshim.QuantizeVec(args.head)),
    "vec_l2_long" -> (args => org.apache.spark.sql.graftshim.L2DistanceLong(args(0), args(1))),
    "pq_encode" -> (args => org.apache.spark.sql.graftshim.PqEncode(args(0), args(1))),
    "pq_lut" -> (args => org.apache.spark.sql.graftshim.PqLut(args(0), args(1))),
    "pq_adc" -> (args => org.apache.spark.sql.graftshim.PqAdc(args(0), args(1))),
    "nearest_centroid" -> (args => org.apache.spark.sql.graftshim.NearestCentroid(args(0), args(1))),
    // geohash_cell(lat, lon, precision): precision shapes the output
    // length, so it must be an int literal (1..12).
    "geohash_cell" -> (args => org.apache.spark.sql.graftshim.GeohashCell(args(0), args(1),
      intLiteral(args(2), "geohash_cell", "precision", 1, 12))),
    "pcm16_fp" -> (args => org.apache.spark.sql.graftshim.Pcm16Fingerprint(args.head)),
    // Spark's runtime-filter Bloom pair, surfaced as SQL functions: the
    // membership structure a 100 TB decontamination/semi-join pass
    // ships instead of a broadcast hash set (internal registry only
    // upstream — FunctionRegistry.internal — so exposed here)
    "bloom_filter_agg" -> (args =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        args(0), args(1), args(2)).toAggregateExpression()),
    "might_contain" -> (args =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        args(0), args(1))),
  )

  /** Idempotently register the functions on an existing session. */
  def install(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
