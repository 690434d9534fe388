package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.GzipFunctions.{gunzip, gzip}

/** The injected optimizer rule (plans/CodecRules.scala) must remove
  * exact-inverse codec pairs from the optimized plan — and must NOT fire
  * on the non-identity directions. Uses its own session because the rule
  * is registered via SparkSessionExtensions, not on the shared session. */
class CodecRuleSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // Isolate from the shared SparkSpec session: with a default session
    // registered, getOrCreate would return it and silently skip
    // withExtensions (suite-order-dependent flake). The SparkContext is
    // still shared; only the session (and its extensions) is new.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-codec-rule")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    s
  }

  private def optimizedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("gunzip(gzip(x)) and unbase64(base64(x)) are eliminated from the plan") {
    // non-literal input: a literal would constant-fold and mask the rule
    val df = spark.range(3)
      .select(concat(lit("payload"), col("id")).cast("binary").as("s"))
      .select(
        gunzip(gzip(col("s"))).cast("string").as("a"),
        unbase64(base64(col("s"))).cast("string").as("b"))
    val plan = optimizedPlan(df)
    assert(!plan.contains("gunzip") && !plan.contains("gzip"), plan)
    assert(!plan.contains("unbase64(base64"), plan)
    val row = df.orderBy("a").collect().head
    assert(row.getString(0) == "payload0" && row.getString(1) == "payload0")
  }

  test("nested pairs collapse fully") {
    val df = spark.range(1)
      .select(concat(lit("x"), col("id")).cast("binary").as("s"))
      .select(gunzip(gzip(gunzip(gzip(col("s"))))).cast("string").as("a"))
    val plan = optimizedPlan(df)
    assert(!plan.contains("gzip"), plan)
    assert(df.collect().head.getString(0) == "x0")
  }

  test("non-identity directions do not fire") {
    // gzip(gunzip(x)): recompression is not byte-identical — must remain.
    val df = spark.range(1)
      .select(concat(lit("x"), col("id")).cast("binary").as("s"))
      .select(gzip(gunzip(gzip(col("s")))).as("a"))
    val plan = optimizedPlan(df)
    // inner gunzip(gzip(..)) MAY simplify, but an outer gzip must survive.
    assert(plan.contains("gzip"), plan)
  }
}
