package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graftshim.{CosineSimilarity, DotProduct, Gunzip, Gzip, RegExpExtractStruct, TryGunzip}

/** Registers graft's custom Catalyst expressions as SQL functions, both
  * via `SparkSessionExtensions` (for `.withExtensions` /
  * `spark.sql.extensions=graft.GraftExtensions`) and imperatively for
  * sessions the driver already built (Verify/Bench receive a plain
  * session).
  *
  * Functions: `gunzip(binary)`, `try_gunzip(binary)` (null on corrupt
  * input), `gzip(binary)`, `vec_dot(a,b)`,
  * `vec_cosine(a,b)`, and `grok_struct(line, 'rx', 'field', ...)` —
  * single-pass multi-group regex extraction into a struct.
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
      args(1).eval(null).toString,
      args.drop(2).map(_.eval(null).toString))),
  )

  /** Idempotently register the functions on an existing session. */
  def install(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
