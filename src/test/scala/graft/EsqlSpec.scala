package graft

import org.apache.spark.sql.Row
import graft.ops.EsqlParser
import graft.ops.EsqlParser._

/** Grammar + compiler contracts for the ES|QL subset (EsqlParser):
  * every command, expression precedence, IN/LIKE, functions, errors,
  * and end-to-end results on a small in-memory frame. */
class EsqlSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, "alpha", 10L, 1.5),
      (2L, "beta", 20L, 2.5),
      (3L, "alpha", 30L, 3.5),
      (4L, "gamma", 40L, 4.5),
      (5L, "alpha", 50L, 5.5)
    ).toDF("id", "cat", "n", "x")
  }
  private def run(q: String) = EsqlParser.run(q, _ => df)

  test("FROM | WHERE | STATS BY | SORT | LIMIT end-to-end") {
    val got = run(
      """FROM t | WHERE n >= 20 | STATS c = COUNT(*), s = SUM(n) BY cat
        || SORT s DESC | LIMIT 2""".stripMargin).collect()
    assert(got.toSeq == Seq(Row("alpha", 2L, 80L), Row("gamma", 1L, 40L)))
  }

  test("EVAL, RENAME, KEEP, DROP compose in pipeline order") {
    val got = run(
      """FROM t | EVAL d = n * 2 + 1, tag = CONCAT(cat, "_", TO_STRING(id))
        || RENAME d AS doubled | DROP x | KEEP id, doubled, tag
        || WHERE doubled > 50 | SORT id""".stripMargin).collect()
    assert(got.toSeq == Seq(Row(3L, 61L, "alpha_3"), Row(4L, 81L, "gamma_4"),
      Row(5L, 101L, "alpha_5")))
  }

  test("precedence: arithmetic binds over comparison over NOT over AND over OR") {
    // n + 10 > 25 OR cat == "beta" AND NOT n == 50 → (n+10>25) OR ((cat==beta) AND NOT(n==50))
    val got = run(
      """FROM t | WHERE n + 10 > 35 OR cat == "beta" AND NOT n == 50 | SORT id | KEEP id"""
    ).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L, 4L, 5L))
  }

  test("IN and LIKE compile to isin / escaped like") {
    assert(run("""FROM t | WHERE cat IN ("alpha", "gamma") | STATS c = COUNT(*)""")
      .head().getLong(0) == 4L)
    assert(run("""FROM t | WHERE cat LIKE "al*" | STATS c = COUNT(*)""")
      .head().getLong(0) == 3L)
    // a literal % in the pattern is escaped, not a wildcard
    assert(run("""FROM t | WHERE cat LIKE "al%" | STATS c = COUNT(*)""")
      .head().getLong(0) == 0L)
  }

  test("functions: ROUND/ABS/LENGTH/SUBSTRING/TO_LONG/COALESCE") {
    val got = run(
      """FROM t | WHERE id == 1
        || EVAL r = TO_LONG(ROUND(x * 100, 0)), a = ABS(0 - n), l = LENGTH(cat),
        |       s = SUBSTRING(cat, 1, 3), c = COALESCE(cat, "z")
        || KEEP r, a, l, s, c""".stripMargin).head()
    assert(got == Row(150L, 10L, 5L, "alp", "alpha"))
  }

  test("STATS without BY is a global aggregate; COUNT_DISTINCT/MIN/MAX work") {
    val got = run(
      "FROM t | STATS c = COUNT(*), d = COUNT_DISTINCT(cat), lo = MIN(n), hi = MAX(n)")
      .head()
    assert(got == Row(5L, 3L, 10L, 50L))
  }

  test("unnamed aggregates default to the function name") {
    val got = run("FROM t | STATS COUNT(*) BY cat | SORT cat")
    assert(got.columns.toSeq == Seq("cat", "count"))
    assert(got.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("alpha", 3L), ("beta", 1L), ("gamma", 1L)))
  }

  test("parse errors carry positions and name the problem") {
    def err(q: String): String =
      intercept[ParseError](EsqlParser.parse(q)).getMessage
    assert(err("t | WHERE 1").contains("expected from"))
    assert(err("FROM t | FOO 1").contains("unknown command FOO"))
    assert(err("FROM t | WHERE (n > 1").contains("expected ')'"))
    assert(err("FROM t | LIMIT x").contains("LIMIT expects an integer"))
    assert(err("""FROM t | WHERE n LIKE 5""").contains("LIKE expects a string"))
    assert(err("FROM t | STATS AVG(n)").contains("unsupported aggregate AVG"))
    assert(err("""FROM t | WHERE cat == "unterminated""").contains("unterminated string"))
  }

  test("the registry pipelines parse to the expected command shapes") {
    val cmds = EsqlParser.parse(ops.SearchExt.esqlStatsQuery)
    assert(cmds.head == From("events"))
    assert(cmds.collect { case s: Stats => s }.head.by == Seq("event_type"))
    assert(cmds.collect { case l: Limit => l } == Seq(Limit(5)))
    val row = EsqlParser.parse(ops.SearchExt.esqlRowQuery)
    assert(row.collect { case k: Keep => k }.head.cols == Seq("doc_id", "wc", "tag", "chars"))
    assert(row.collect { case r: Rename => r }.head.pairs == Seq("n_chars" -> "chars"))
  }
}
