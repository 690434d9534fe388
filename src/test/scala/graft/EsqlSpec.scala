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

  private def logDf = {
    import spark.implicits._
    Seq(
      (1L, """10.1.2.3 - alice [01/Jan/2026:00:00:00 +0000] "GET /a HTTP/1.1" 200 512 40"""),
      (2L, """10.1.2.4 - - [01/Jan/2026:00:00:01 +0000] "POST /b.html HTTP/1.1" 404 64 9"""),
      (3L, "not an access log line at all")
    ).toDF("id", "line")
  }

  test("DISSECT: literal template extracts string fields; skips and padding consume") {
    val got = EsqlParser.run(
      """FROM logs | DISSECT line "%{ip} %{?dash} %{usr} [%{date}] \"%{req}\" %{status} %{bytes} %{rt}"
        || WHERE status == "200" | KEEP ip, usr, req, bytes""".stripMargin,
      _ => logDf).head()
    assert(got == Row("10.1.2.3", "alice", "GET /a HTTP/1.1", "512"))
    // %{name->} absorbs right padding
    val (rx, keys) = EsqlParser.dissectRegex("%{a->} %{b}")
    assert(keys == Seq("a", "b"))
    import spark.implicits._
    val padded = EsqlParser.run("""FROM t | DISSECT s "%{a->} %{b}" | KEEP a, b""",
      _ => Seq(Tuple1("x    y")).toDF("s")).head()
    assert(padded == Row("x", "y"))
  }

  test("GROK: dictionary substitution, typed captures, unanchored, null on no-match") {
    val got = EsqlParser.run(
      """FROM logs
        || GROK line "%{IP:ip} - %{NOTSPACE:usr} \\[%{HTTPDATE:d}\\] \"%{WORD:m} %{NOTSPACE:u} HTTP/%{NUMBER:v}\" %{INT:st:int} %{INT:b:int} %{INT:rt:int}"
        || KEEP id, ip, m, st, b""".stripMargin,
      _ => logDf).collect()
    assert(got(0) == Row(1L, "10.1.2.3", "GET", 200L, 512L))
    assert(got(1) == Row(2L, "10.1.2.4", "POST", 404L, 64L))
    assert(got(2) == Row(3L, null, null, null, null)) // no match → null fields
    assertThrows[ParseError](EsqlParser.grokRegex("%{NOPE:x}"))
  }

  test("ENRICH: broadcast left join via policy; unmatched rows keep null fields") {
    import spark.implicits._
    val dim = Seq((1L, "one", 10L), (2L, "two", 20L)).toDF("k", "name", "aux")
    val got = EsqlParser.run(
      """FROM t | EVAL k2 = id % 4 | ENRICH p ON k2 WITH name | SORT id | KEEP id, k2, name""",
      _ => df, { case "p" => (dim, "k") }).collect()
    assert(got(0) == Row(1L, 1L, "one"))
    assert(got(2) == Row(3L, 3L, null)) // 3 not in dim → left-join null
    // WITH omitted → all non-match dim columns
    val all = EsqlParser.run("""FROM t | EVAL k2 = id % 4 | ENRICH p ON k2 | SORT id""",
      _ => df, { case "p" => (dim, "k") })
    assert(all.columns.toSeq.takeRight(2) == Seq("name", "aux"))
    assertThrows[ParseError](EsqlParser.run("FROM t | ENRICH nope ON id", _ => df))
  }

  test("BUCKET floors to span-aligned buckets; CASE chains conditions with default") {
    val got = run(
      """FROM t | EVAL b = BUCKET(n, 15), c = CASE(n < 15, "s", n < 35, "m", "l")
        || KEEP id, b, c | SORT id""".stripMargin).collect()
    assert(got.toSeq == Seq(Row(1L, 0L, "s"), Row(2L, 15L, "m"), Row(3L, 30L, "m"),
      Row(4L, 30L, "l"), Row(5L, 45L, "l")))
    // no-default CASE yields null when nothing matches
    val nd = run("""FROM t | EVAL c = CASE(n > 100, "x") | WHERE c IS NULL | STATS k = COUNT(*)""")
    assert(nd.head().getLong(0) == 5L)
  }

  test("KEEP/DROP wildcards expand against the frame; SORT honors NULLS FIRST/LAST") {
    import spark.implicits._
    val got = run("""FROM t | EVAL c2 = n * 2, c3 = n * 3 | KEEP id, c* | SORT id | LIMIT 1""")
    assert(got.columns.toSeq == Seq("id", "cat", "c2", "c3")) // c* hits cat too
    assert(run("""FROM t | DROP c* | LIMIT 1""").columns.toSeq == Seq("id", "n", "x"))
    assertThrows[ParseError](run("""FROM t | KEEP zz*"""))
    val withNulls = Seq((1L, Some(5L)), (2L, None), (3L, Some(1L))).toDF("id", "v")
    def ids(q: String) = EsqlParser.run(q, _ => withNulls).collect().map(_.getLong(0)).toSeq
    assert(ids("FROM t | SORT v ASC NULLS FIRST | KEEP id") == Seq(2L, 3L, 1L))
    assert(ids("FROM t | SORT v DESC NULLS LAST | KEEP id") == Seq(1L, 3L, 2L))
  }

  test("per-aggregate WHERE filters gate each aggregate independently; RLIKE matches regex") {
    val got = run(
      """FROM t | STATS n = COUNT(*), na = COUNT(*) WHERE cat == "alpha",
        |  sa = SUM(n) WHERE cat == "alpha", sb = SUM(n) WHERE cat == "nope"""".stripMargin)
      .head()
    assert(got == Row(5L, 3L, 90L, null)) // empty filtered SUM → null, like FILTER(WHERE)
    assert(run("""FROM t | WHERE cat RLIKE "^(al|ga).*" | STATS c = COUNT(*)""")
      .head().getLong(0) == 4L)
  }

  test("AVG/MEDIAN aggregates and IS [NOT] NULL comparisons") {
    val got = run("FROM t | STATS a = AVG(n), m = MEDIAN(n)").head()
    assert(got == Row(30.0, 30.0))
    import spark.implicits._
    val withNulls = Seq((1L, Some("x")), (2L, None), (3L, Some("y")))
      .toDF("id", "v")
    assert(EsqlParser.run("FROM t | WHERE v IS NULL | STATS c = COUNT(*)",
      _ => withNulls).head().getLong(0) == 1L)
    assert(EsqlParser.run("FROM t | WHERE v IS NOT NULL | STATS c = COUNT(*)",
      _ => withNulls).head().getLong(0) == 2L)
  }

  test("LOOKUP JOIN: left join on the shared field name against a resolved index") {
    import spark.implicits._
    val lu = Seq((1L, "one"), (2L, "two")).toDF("id", "name")
    val got = EsqlParser.run(
      """FROM t | LOOKUP JOIN lu ON id | SORT id | KEEP id, name""",
      { case "t" => df; case "lu" => lu }).collect()
    assert(got(0) == Row(1L, "one"))
    assert(got(1) == Row(2L, "two"))
    assert(got(2) == Row(3L, null)) // unmatched keeps the row, null fields
    assert(intercept[ParseError](EsqlParser.parse("FROM t | LOOKUP x ON id"))
      .getMessage.contains("expected join"))
  }

  test("MV_EXPAND + SPLIT + MV_COUNT: literal-delimiter split, outer expand") {
    import spark.implicits._
    val src = Seq((1L, "a.b.c"), (2L, "d"), (3L, null.asInstanceOf[String])).toDF("id", "s")
    val got = EsqlParser.run(
      """FROM t | EVAL parts = SPLIT(s, "."), np = MV_COUNT(parts)
        || MV_EXPAND parts | SORT id, parts | KEEP id, np, parts""".stripMargin,
      _ => src).collect()
    // "." splits literally (quoted regex), not as wildcard
    assert(got.toSeq == Seq(Row(1L, 3L, "a"), Row(1L, 3L, "b"), Row(1L, 3L, "c"),
      Row(2L, 1L, "d"), Row(3L, null, null)))
  }

  test("parse errors carry positions and name the problem") {
    def err(q: String): String =
      intercept[ParseError](EsqlParser.parse(q)).getMessage
    assert(err("t | WHERE 1").contains("expected from"))
    assert(err("FROM t | FOO 1").contains("unknown command FOO"))
    assert(err("FROM t | WHERE (n > 1").contains("expected ')'"))
    assert(err("FROM t | LIMIT x").contains("LIMIT expects an integer"))
    assert(err("""FROM t | WHERE n LIKE 5""").contains("LIKE expects a string"))
    assert(err("FROM t | STATS VARIANCE(n)").contains("unsupported aggregate VARIANCE"))
    assert(err("""FROM t | WHERE cat == "unterminated""").contains("unterminated string"))
  }

  test("INLINESTATS attaches group aggregates without collapsing; multi-index FROM unions") {
    val got = run(
      """FROM t | INLINESTATS gn = COUNT(*), gs = SUM(n) BY cat
        || WHERE n * gn > gs | KEEP id, gn, gs | SORT id""".stripMargin).collect()
    // alpha group: n in (10,30,50), sum 90 — only n=50 exceeds the mean
    assert(got.toSeq == Seq(Row(5L, 3L, 90L)))
    assert(run("FROM t, t | STATS c = COUNT(*)").head().getLong(0) == 10L)
    assert(intercept[ParseError](run(
      "FROM t | INLINESTATS d = COUNT_DISTINCT(cat)")).getMessage
      .contains("INLINESTATS does not support COUNT_DISTINCT"))
  }

  test("INLINESTATS without BY: one global row attached to every row — no window") {
    val got = run(
      """FROM t | INLINESTATS gn = COUNT(*), gs = SUM(n) | KEEP id, gn, gs | SORT id""")
    assert(got.collect().toSeq ==
      (1L to 5L).map(i => Row(i, 5L, 150L)))
    // the no-BY branch must compile to crossJoin(broadcast(agg)), never
    // a partition-less window funneling the corpus through one task
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no-BY INLINESTATS compiled to a window:\n$plan")
  }

  test("CHANGE_POINT marks the CUSUM argmax row non-collapsing; AS renames") {
    import spark.implicits._
    val series = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 100L), (5L, 100L), (6L, 100L))
      .toDF("k", "v")
    val got = EsqlParser.run(
      "FROM s | CHANGE_POINT v ON k | SORT k", _ => series).collect()
    assert(got.length == 6)
    // the mean shift is after k=3: that row carries the marker
    val marked = got.filter(_.getAs[String]("type") != null)
    assert(marked.map(_.getLong(0)).toSeq == Seq(3L), s"got ${got.mkString(";")}")
    assert(marked.head.getAs[Double]("pvalue") > 0 && marked.head.getAs[Double]("pvalue") < 1)
    assert(got.filter(_.getLong(0) != 3L).forall(r => r.isNullAt(2) && r.isNullAt(3)))
    // AS renames both output columns
    val renamed = EsqlParser.run(
      "FROM s | CHANGE_POINT v ON k AS cpt, cpp", _ => series)
    assert(renamed.columns.toSeq.takeRight(2) == Seq("cpt", "cpp"))
    // a flat series still yields exactly one marker (ties break by key)
    val flat = EsqlParser.run("FROM s | CHANGE_POINT v ON k",
      _ => Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("k", "v")).collect()
    assert(flat.count(_.getAs[String]("type") != null) == 1)
  }

  test("SAMPLE: deterministic membership, ON pins the hash column, bounds checked") {
    val a = run("FROM t | SAMPLE 0.5 ON id | STATS c = COUNT(*)").head().getLong(0)
    val b = run("FROM t | SAMPLE 0.5 ON id | STATS c = COUNT(*)").head().getLong(0)
    assert(a == b, "SAMPLE membership must be reproducible across runs")
    assert(a >= 0 && a <= 5)
    // without ON: whole-row hash, still deterministic
    val c1 = run("FROM t | SAMPLE 0.5 | STATS c = COUNT(*)").head().getLong(0)
    val c2 = run("FROM t | SAMPLE 0.5 | STATS c = COUNT(*)").head().getLong(0)
    assert(c1 == c2)
    assert(intercept[ParseError](run("FROM t | SAMPLE 1.5")).getMessage
      .contains("probability"))
    assert(intercept[ParseError](run("FROM t | SAMPLE 0")).getMessage
      .contains("probability"))
  }

  test("LIKE: ? is the single-char wildcard; \\* and \\? stay literal") {
    import spark.implicits._
    val strs = Seq("cat", "cut", "c*t", "c?t", "coat").toDF("s")
    def hits(pat: String): Seq[String] =
      EsqlParser.run(s"""FROM t | WHERE s LIKE "$pat"""", _ => strs)
        .collect().map(_.getString(0)).toSeq.sorted
    assert(hits("c?t") == Seq("c*t", "c?t", "cat", "cut"))
    assert(hits("c*t") == Seq("c*t", "c?t", "cat", "coat", "cut"))
    // the lexer collapses source "\\\\" to one backslash before likePattern
    assert(hits("c\\\\*t") == Seq("c*t"))
    assert(hits("c\\\\?t") == Seq("c?t"))
    // unit-level: literal % and _ in the pattern never act as wildcards
    assert(EsqlParser.likePattern("a%b_c") == "a\\%b\\_c")
    assert(EsqlParser.likePattern("*?") == "%_")
  }

  test("SORT default null order is the ES|QL dialect: ASC last, DESC first") {
    import spark.implicits._
    val df0 = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (3L, "c"))
      .toDF("n", "s")
    val asc = EsqlParser.run("FROM t | SORT n | KEEP s", _ => df0)
      .collect().map(_.getString(0)).toSeq
    assert(asc == Seq("a", "c", "b"), "ASC must put nulls last")
    val desc = EsqlParser.run("FROM t | SORT n DESC | KEEP s", _ => df0)
      .collect().map(_.getString(0)).toSeq
    assert(desc == Seq("b", "c", "a"), "DESC must put nulls first")
    // explicit NULLS FIRST/LAST still wins
    val forced = EsqlParser.run("FROM t | SORT n NULLS FIRST | KEEP s", _ => df0)
      .collect().map(_.getString(0)).toSeq
    assert(forced == Seq("b", "a", "c"))
  }

  test("ENRICH/LOOKUP JOIN overwrite same-named source columns (ES semantics)") {
    import spark.implicits._
    val src = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("id", "name")
    val dim = Seq((1L, "new1"), (2L, "new2")).toDF("k", "name")
    val enr = EsqlParser.run("FROM t | ENRICH p ON id | SORT id",
      _ => src, { case "p" => (dim, "k") })
    assert(enr.columns.count(_ == "name") == 1, "no duplicate name column")
    assert(enr.collect().map(_.getAs[String]("name")).toSeq ==
      Seq("new1", "new2", null), "enrich fields overwrite, unmatched → null")
    val lu = EsqlParser.run("FROM t | LOOKUP JOIN d ON id | SORT id", {
      case "t" => src
      case "d" => Seq((1L, "lu1"), (3L, "lu3")).toDF("id", "name")
    })
    assert(lu.columns.count(_ == "name") == 1)
    assert(lu.collect().map(_.getAs[String]("name")).toSeq == Seq("lu1", null, "lu3"))
  }

  test("DISSECT: matched-but-empty captures stay \"\"; only no-match rows null") {
    import spark.implicits._
    val lines = Seq("a,,c", "x,y,z", "nomatch").toDF("s")
    val got = EsqlParser.run("""FROM t | DISSECT s "%{p},%{q},%{r}" | KEEP s, p, q, r""",
      _ => lines).collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSet == Set(
      ("a,,c", "a", "", "c"),      // adjacent delimiters → matched EMPTY field
      ("x,y,z", "x", "y", "z"),
      ("nomatch", null, null, null))) // whole-pattern failure → nulls
  }

  test("ROW starts a FROM-less pipeline from a literal one-row source") {
    val got = EsqlParser.run(
      """ROW a = 1, b = "x", c = 2 + 3 | EVAL d = a + c | KEEP a, b, c, d""",
      n => fail(s"ROW must not resolve any index, asked for $n"),
      session = Some(spark)).collect()
    assert(got.toSeq == Seq(Row(1L, "x", 5L, 6L)))
    assert(intercept[ParseError](run("FROM t | ROW a = 1")).getMessage
      .contains("unknown command"))
  }

  test("FORK unions branch sub-pipelines by name with a _fork discriminator") {
    val got = run(
      """FROM t | FORK (WHERE cat == "alpha" | EVAL src = "a")
        |              (WHERE n >= 40)
        || KEEP id, _fork, src | SORT _fork, id""".stripMargin).collect()
    assert(got.toSeq == Seq(
      Row(1L, "fork1", "a"), Row(3L, "fork1", "a"), Row(5L, "fork1", "a"),
      Row(4L, "fork2", null), Row(5L, "fork2", null)))
    assert(intercept[ParseError](run("FROM t | FORK (LIMIT 1)")).getMessage
      .contains("at least two branches"))
  }

  test("FUSE: RRF in exact micros over FORK's ranked pages; both-leg docs win") {
    val got = run(
      """FROM t | FORK (WHERE n >= 20 | SORT n DESC, id ASC | LIMIT 3)
        |              (WHERE cat == "alpha" | SORT n DESC, id ASC | LIMIT 3)
        || FUSE ON id RANK n
        || SORT _score_c DESC, id ASC""".stripMargin).collect()
    // leg1: n in (50,40,30) → ids 5,4,3; leg2: alpha → ids 5,3,1
    // id 5 is rank 1 in both legs: 2·round(1e6/61) = 2·16393
    assert(got.head.getLong(0) == 5L)
    assert(got.head.getAs[Long]("_score_c") == 2L * 16393L)
    assert(got.head.getAs[Long]("n_legs") == 2L)
    // single-leg ids score one term each
    val id4 = got.find(_.getLong(0) == 4L).get
    assert(id4.getAs[Long]("n_legs") == 1L)
  }

  test("full-text functions: MATCH is OR-of-terms; QSTR and KQL reuse their parsers") {
    import spark.implicits._
    val docs0 = Seq(
      (1L, "fast spark join", "en", 100L),
      (2L, "slow windows build", "en", 500L),
      (3L, "quick spark window", "de", 300L)
    ).toDF("id", "text", "lang", "n_chars")
    def ids(q: String): Seq[Long] =
      EsqlParser.run(s"FROM d | WHERE $q | SORT id | KEEP id", _ => docs0)
        .collect().map(_.getLong(0)).toSeq
    assert(ids("""MATCH(text, "fast quick")""") == Seq(1L, 3L))
    assert(ids("""QSTR(text, "spark AND (join OR win*)")""") == Seq(1L, 3L))
    // field:term clauses bind to same-named frame columns
    assert(ids("""QSTR(text, "lang:en AND slow")""") == Seq(2L))
    assert(ids("""KQL(text, "lang:en AND n_chars >= 400")""") == Seq(2L))
    assert(ids("""NOT MATCH(text, "spark")""") == Seq(2L))
  }

  test("scalar function residue: string, math, greatest/least, casts") {
    val r = EsqlParser.run(
      """ROW s = "hello graft"
        || EVAL a = STARTS_WITH(s, "hel"), b = ENDS_WITH(s, "aft"),
        |       c = LOCATE(s, "graft"), d = REPLACE(s, "l+", "L"),
        |       e = LEFT(s, 5), f = RIGHT(s, 5),
        |       g = GREATEST(3, 7, 5), h = LEAST(3, 7, 5),
        |       i = POW(2, 10), j = SQRT(81.0), k = FLOOR(2.7), l = CEIL(2.1),
        |       m = LOG(2, 8), n = LOG10(1000.0),
        |       o = TO_INTEGER("42"), p = TO_DOUBLE("2.5"), q = TO_BOOLEAN("true")
        || DROP s""".stripMargin, _ => fail("ROW"), session = Some(spark)).head()
    assert(r.getAs[Boolean]("a") && r.getAs[Boolean]("b"))
    assert(r.getAs[Long]("c") == 7L)
    assert(r.getAs[String]("d") == "heLo graft")
    assert(r.getAs[String]("e") == "hello" && r.getAs[String]("f") == "graft")
    assert(r.getAs[Long]("g") == 7L && r.getAs[Long]("h") == 3L)
    assert(r.getAs[Double]("i") == 1024.0 && r.getAs[Double]("j") == 9.0)
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("l") == 3L)
    assert(r.getAs[Double]("m") == 3.0 && r.getAs[Double]("n") == 3.0)
    assert(r.getAs[Int]("o") == 42 && r.getAs[Double]("p") == 2.5)
    assert(r.getAs[Boolean]("q"))
  }

  test("multivalue function residue over SPLIT arrays") {
    val r = EsqlParser.run(
      """ROW s = "3,1,2,2"
        || EVAL v = SPLIT(s, ","),
        |       mn = MV_MIN(v), mx = MV_MAX(v),
        |       dd = MV_COUNT(MV_DEDUPE(v)), st = MV_CONCAT(MV_SORT(v), "-"),
        |       sd = MV_CONCAT(MV_SORT(v, "DESC"), "-"),
        |       fi = MV_FIRST(v), la = MV_LAST(v),
        |       sl = MV_CONCAT(MV_SLICE(v, 1, 2), "-"),
        |       ap = MV_COUNT(MV_APPEND(v, v)),
        |       sm = MV_SUM(v), av = MV_AVG(v),
        |       md = MV_MEDIAN(v), pc = MV_PERCENTILE(v, 50),
        |       zp = MV_CONCAT(MV_ZIP(MV_SLICE(v, 0, 1), v, "~"), "|")
        || DROP s, v""".stripMargin, _ => fail("ROW"), session = Some(spark)).head()
    assert(r.getAs[String]("mn") == "1" && r.getAs[String]("mx") == "3")
    assert(r.getAs[Long]("dd") == 3L)
    assert(r.getAs[String]("st") == "1-2-2-3" && r.getAs[String]("sd") == "3-2-2-1")
    assert(r.getAs[String]("fi") == "3" && r.getAs[String]("la") == "2")
    assert(r.getAs[String]("sl") == "1-2")
    assert(r.getAs[Long]("ap") == 8L)
    assert(r.getAs[Double]("sm") == 8.0 && r.getAs[Double]("av") == 2.0)
    // v = [3,1,2,2] → sorted doubles [1,2,2,3]: median (2+2)/2, p50 same
    assert(r.getAs[Double]("md") == 2.0 && r.getAs[Double]("pc") == 2.0)
    // zip pads the shorter side: leftover values pass through bare
    assert(r.getAs[String]("zp") == "3~3|1~1|2|2")
  }

  test("the registry pipelines parse to the expected command shapes") {
    val cmds = EsqlParser.parse(ops.SearchExt.esqlStatsQuery)
    assert(cmds.head == From(Seq("events")))
    assert(cmds.collect { case s: Stats => s }.head.by == Seq("event_type"))
    assert(cmds.collect { case l: Limit => l } == Seq(Limit(5)))
    val row = EsqlParser.parse(ops.SearchExt.esqlRowQuery)
    assert(row.collect { case k: Keep => k }.head.cols == Seq("doc_id", "wc", "tag", "chars"))
    assert(row.collect { case r: Rename => r }.head.pairs == Seq("n_chars" -> "chars"))
    val dis = EsqlParser.parse(ops.SearchExt.esqlDissectQuery)
    assert(dis.collect { case d: Dissect => d }.head.input == "line")
    val grok = EsqlParser.parse(ops.SearchExt.esqlGrokQuery)
    assert(grok.collect { case g: Grok => g }.head.pattern.contains("%{INT:gstatus:int}"))
    val enr = EsqlParser.parse(ops.SearchExt.esqlEnrichQuery)
    assert(enr.collect { case e: Enrich => e }.head ==
      Enrich("nations", "nk", Seq("n_name", "n_regionkey")))
    val mv = EsqlParser.parse(ops.SearchExt.esqlMvExpandQuery)
    assert(mv.collect { case m: MvExpand => m } == Seq(MvExpand("hops")))
    val cp = EsqlParser.parse(ops.SearchExt.esqlChangePointQuery)
    assert(cp.collect { case c: ChangePoint => c } ==
      Seq(ChangePoint("c", "day", "cp_type", "cp_pvalue")))
    val sm = EsqlParser.parse(ops.SearchExt.esqlSampleQuery)
    assert(sm.collect { case s: Sample => s } ==
      Seq(Sample(BigDecimal("0.05"), Some("event_id"))))
  }

  test("RERANK: capped-tf lexical scorer, adjacent repeats counted, unknown reranker rejected") {
    import spark.implicits._
    val d = Seq(
      (1L, "spark spark spark spark spark spark data"), // tf 6 capped at 5, + 1 = 6
      (2L, "data data"),                                // 2
      (3L, "nothing here")                              // 0
    ).toDF("id", "txt")
    val got = EsqlParser.run(
      """FROM t | RERANK "spark data" ON txt | SORT _score DESC, id | KEEP id, _score""",
      _ => d).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 6L), (2L, 2L), (3L, 0L)))
    assert(intercept[ParseError](EsqlParser.run(
      """FROM t | RERANK "x" ON txt WITH llm""", _ => d)).getMessage
      .contains("reranker"))
  }

  test("STATS BY name = expr: inline grouping expressions, incl. BUCKET") {
    val got = run(
      """FROM t | STATS c = COUNT(*), s = SUM(n) BY parity = id % 2, b = BUCKET(n, 25)
        || SORT parity, b""".stripMargin).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L, 1L, 20L), (0L, 25L, 1L, 40L), (1L, 0L, 1L, 10L),
        (1L, 25L, 1L, 30L), (1L, 50L, 1L, 50L)))
    // INLINESTATS accepts the same form, non-collapsing
    val inl = run(
      "FROM t | INLINESTATS c = COUNT(*) BY parity = id % 2 | SORT id | KEEP id, parity, c")
      .collect()
    assert(inl.length == 5 && inl.head.getLong(2) == 3L) // id=1 odd: 3 odds
  }

  test("FROM accepts a trailing-* index pattern; the catalog expands it") {
    import spark.implicits._
    val got = EsqlParser.run(
      "FROM logs* | STATS n = COUNT(*)",
      { case "logs*" => Seq(1L, 2L, 3L).toDF("v")
        case n => fail(s"pattern must pass through verbatim, got $n") }).collect()
    assert(got.head.getLong(0) == 3L)
  }

  test("METADATA _index tags each multi-index row with its source; others rejected") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y")).toDF("id", "v")
    val got = EsqlParser.run(
      "FROM a, b METADATA _index | SORT id | KEEP id, _index",
      { case "a" => a; case "b" => b }).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(intercept[ParseError](EsqlParser.run(
      "FROM a METADATA _id", { case "a" => a })).getMessage.contains("_id"))
  }

  test("ENRICH with a range-typed policy joins value-in-[lo,hi) and overwrites clashes") {
    import spark.implicits._
    val dim = Seq((0L, 10L, "low"), (10L, 100L, "high"))
      .toDF("__range_lo", "__range_hi", "band")
    val got = EsqlParser.run(
      "FROM t | ENRICH bands ON n | SORT id | KEEP id, n, band",
      _ => df, policies = { case "bands" => (dim, "n") }).collect()
    assert(got.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "high"), (2L, "high"), (3L, "high"), (4L, "high"), (5L, "high")))
    // below every interval → null enrichment (left join)
    val low = EsqlParser.run(
      "FROM t | EVAL m = n - 15 | ENRICH bands ON m | SORT id | KEEP m, band",
      _ => df, policies = { case "bands" => (dim, "m") }).collect()
    assert(low.head.getLong(0) == -5L && low.head.isNullAt(1))
    assert(low(1).getLong(0) == 5L && low(1).getString(1) == "low")
  }

  test("date functions: span-literal DATE_TRUNC, DATE_FORMAT, DATE_DIFF trunc-toward-zero") {
    import spark.implicits._
    val d = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-15 13:47:21")),
      (2L, java.sql.Timestamp.valueOf("2024-03-15 03:10:00"))
    ).toDF("id", "t")
    val r = EsqlParser.run(
      """FROM d | EVAL hr4 = DATE_TRUNC(4 hours, t), mo = DATE_TRUNC(1 month, t),
        |  lbl = DATE_FORMAT("yyyy-MM-dd", t),
        |  fwd = DATE_DIFF("hours", t, TO_DATETIME(1710504000000)),
        |  bck = DATE_DIFF("hours", TO_DATETIME(1710504000000), t)
        || SORT id""".stripMargin, _ => d).collect()
    // 2024-03-15 12:00:00 UTC == epoch 1710504000
    assert(r(0).getAs[java.sql.Timestamp]("hr4").toString == "2024-03-15 12:00:00.0")
    assert(r(1).getAs[java.sql.Timestamp]("hr4").toString == "2024-03-15 00:00:00.0")
    assert(r(0).getAs[java.sql.Timestamp]("mo").toString == "2024-03-01 00:00:00.0")
    assert(r(0).getAs[String]("lbl") == "2024-03-15")
    // 13:47:21 → 12:00 is -1h47m: trunc toward zero gives -1 / +1
    assert(r(0).getAs[Long]("fwd") == -1L && r(0).getAs[Long]("bck") == 1L)
    assert(r(1).getAs[Long]("fwd") == 8L) // 03:10 → 12:00 = 8h50m → 8
    // calendar units reject multiples; stray spans reject
    assertThrows[ParseError](EsqlParser.run(
      "FROM d | EVAL x = DATE_TRUNC(2 months, t)", _ => d))
    assertThrows[ParseError](EsqlParser.run(
      "FROM d | EVAL x = 3 days", _ => d))
  }

  test("IP functions: CIDR_MATCH predicate and IP_PREFIX bucketing") {
    import spark.implicits._
    val d = Seq((1L, "10.1.2.3"), (2L, "10.1.2.200"), (3L, "192.168.0.77"),
      (4L, "10.2.0.1")).toDF("id", "ip")
    val m = EsqlParser.run(
      """FROM d | WHERE CIDR_MATCH(ip, "10.1.2.0/25", "192.168.0.0/16")
        || SORT id | KEEP id""".stripMargin, _ => d)
      .collect().map(_.getLong(0)).toSeq
    assert(m == Seq(1L, 3L)) // .200 outside /25; 10.2.* outside both
    val p = EsqlParser.run(
      """FROM d | EVAL net24 = IP_PREFIX(ip, 24, 0), net12 = IP_PREFIX(ip, 12, 0)
        || SORT id | KEEP net24, net12""".stripMargin, _ => d).collect()
    assert(p(0).getString(0) == "10.1.2.0" && p(0).getString(1) == "10.0.0.0")
    assert(p(2).getString(0) == "192.168.0.0" && p(2).getString(1) == "192.160.0.0")
  }

  test("TS: two-level time-series STATS — exact rate, reset handling, plain-agg rewrite") {
    import spark.implicits._
    // two series over one bucket: series a counts 0→10→30 over 2000 ms
    // (increase 30, rate 15/s = 15000 milli); series b wraps 50→10
    // (reset: increase = 10) over 1000 ms → 10/s = 10000 milli
    val ts = Seq(
      ("a", 1000L, 0L, 2L), ("a", 2000L, 10L, 4L), ("a", 3000L, 30L, 6L),
      ("b", 1000L, 50L, 8L), ("b", 2000L, 10L, 10L)
    ).toDF("_tsid", "_ts_ms", "ctr", "g").withColumn("bucket", org.apache.spark.sql.functions.lit(1L))
    val got = EsqlParser.run(
      """TS m | STATS mx = MAX(RATE(ctr)), tot = SUM(RATE(ctr)),
        |  ag = AVG(AVG_OVER_TIME(g)), n = COUNT(*), sg = SUM(g) BY bucket""".stripMargin,
      _ => ts).collect()
    // inner: a → rate 15000, avg_g 4000 milli; b → rate 10000, avg_g 9000 milli
    // outer: max 15000, sum 25000, avg = (4000+9000)*1000/2 = 6500000, n 5, sum_g 30
    assert(got.toSeq == Seq(Row(1L, 15000L, 25000L, 6500000L, 5L, 30L)))
    // non-decomposable plain aggregates are rejected in TS mode
    assertThrows[ParseError](EsqlParser.run(
      "TS m | STATS a = AVG(g) BY bucket", _ => ts).collect())
    assertThrows[ParseError](EsqlParser.run(
      "TS m | STATS a = MAX(RATE(ctr))", _ => ts.drop("_tsid")).collect())
    // TS only as head; FROM frames don't get over-time functions
    assertThrows[ParseError](run("FROM t | TS m"))
  }

  test("COMPLETION routes through the registered endpoint seam; default target; unknown endpoint errors") {
    import spark.implicits._
    val d = Seq((1L, "a b"), (2L, "b c"), (3L, "zz")).toDF("id", "txt")
    // a toy generator: the endpoint receives the prompt column and the
    // target name — echo the last char. Proves the seam contract.
    val echo: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column, String) =>
      org.apache.spark.sql.DataFrame =
      (df, p, t) => df.withColumn(t, org.apache.spark.sql.functions.substring(p, -1, 1))
    val named = EsqlParser.run(
      "FROM d | COMPLETION nxt = txt WITH echo | SORT id | KEEP id, nxt",
      _ => d, completions = { case "echo" => echo }).collect()
    assert(named.map(_.getString(1)).toSeq == Seq("b", "c", "z"))
    // no target → the ES default column name `completion`
    val deflt = EsqlParser.run(
      "FROM d | COMPLETION txt WITH echo | SORT id | KEEP id, completion",
      _ => d, completions = { case "echo" => echo }).collect()
    assert(deflt.map(_.getString(1)).toSeq == Seq("b", "c", "z"))
    // WITH is mandatory (ES requires the inference endpoint)
    assertThrows[ParseError](EsqlParser.run("FROM d | COMPLETION txt", _ => d))
    // unregistered endpoint → catalog error
    assertThrows[ParseError](EsqlParser.run(
      "FROM d | COMPLETION txt WITH nope", _ => d))
  }

  test("scalar-function residue: zero-arg constants, HASH/DATE_EXTRACT validation, string ops") {
    import spark.implicits._
    val d = Seq((1L, "ab c")).toDF("id", "s")
    val r = EsqlParser.run(
      """FROM d | EVAL p = ROUND(PI(), 6), t = ROUND(TAU(), 6), e = ROUND(E(), 6),
        |  rv = REVERSE(s), rp = REPEAT(s, 2), sp = CONCAT(SPACE(2), "x"),
        |  bl = BIT_LENGTH(s), h = MD5(s), b = FROM_BASE64(TO_BASE64(s))
        || KEEP p, t, e, rv, rp, sp, bl, h, b""".stripMargin, _ => d).head()
    assert(r.getDouble(0) == 3.141593 && r.getDouble(1) == 6.283185 &&
      r.getDouble(2) == 2.718282)
    assert(r.getString(3) == "c ba" && r.getString(4) == "ab cab c" &&
      r.getString(5) == "  x")
    assert(r.getLong(6) == 32L)
    assert(r.getString(7).length == 32)
    assert(r.getString(8) == "ab c", "base64 round-trip must be the identity")
    // unknown hash algorithm / chrono field fail at plan time
    assertThrows[ParseError](EsqlParser.run(
      """FROM d | EVAL h = HASH("sha512", s)""", _ => d))
    assertThrows[ParseError](EsqlParser.run(
      """FROM d | EVAL y = DATE_EXTRACT("era", s)""", _ => d))
  }

  test("CIDR_MATCH rejects malformed blocks at parse time (prefix and octet ranges)") {
    import spark.implicits._
    val d = Seq((1L, "10.1.2.3")).toDF("id", "ip")
    def q(c: String) =
      EsqlParser.run(s"""FROM d | WHERE CIDR_MATCH(ip, "$c")""", _ => d)
    // /33 would shift by a negative count (masked mod 64) and silently
    // match wrong rows — must fail at parse time instead
    assertThrows[ParseError](q("10.0.0.0/33"))
    assertThrows[ParseError](q("10.0.0.0/-1"))
    assertThrows[ParseError](q("10.0.256.0/8"))
    assertThrows[ParseError](q("10.0.0/8"))
    assertThrows[ParseError](q("10.0.0.0"))
    assertThrows[ParseError](q("10.0.0.0/x"))
    // trailing-dot addresses and signed octets/prefixes are malformed,
    // not silently tolerated via split()'s dropped empty tail / toLong
    assertThrows[ParseError](q("10.0.0.0./8"))
    assertThrows[ParseError](q("10.0.+1.0/8"))
    assertThrows[ParseError](q("10.0.0.0/+8"))
    // boundary prefixes stay legal
    assert(q("10.1.2.3/32").count() == 1L)
    assert(q("0.0.0.0/0").count() == 1L)
  }

  test("WEIGHTED_AVG skips null-valued rows entirely — their weight leaves the denominator") {
    import spark.implicits._
    val d = Seq((Some(10L), 1L), (Some(30L), 3L), (None, 100L))
      .toDF("v", "w")
    val got = EsqlParser.run("FROM d | STATS wa = WEIGHTED_AVG(v, w)", _ => d)
      .head().getDouble(0)
    // ES drops the null-v document: (10*1 + 30*3) / (1 + 3) = 25.0,
    // not /104
    assert(got == 25.0)
  }

  test("INLINESTATS without BY overwrites a same-named column, like the BY branch") {
    val byBranch = run(
      "FROM t | INLINESTATS n = COUNT(*) BY cat | SORT id | KEEP id, n").collect()
    assert(byBranch.map(_.getLong(1)).toSeq == Seq(3L, 1L, 3L, 1L, 3L))
    val noBy = run(
      "FROM t | INLINESTATS n = COUNT(*) | SORT id | KEEP id, n").collect()
    assert(noBy.map(_.getLong(1)).toSeq == Seq(5L, 5L, 5L, 5L, 5L),
      "the aggregate must replace the source column, not duplicate it")
    // and it overwrites IN PLACE: the no-BY branch keeps the original
    // column order, same as the BY branch's withColumn
    val cols = run("FROM t | INLINESTATS n = COUNT(*)").columns.toSeq
    assert(cols == Seq("id", "cat", "n", "x"),
      s"no-BY INLINESTATS relocated the overwritten column: $cols")
  }

  test("MEDIAN_ABSOLUTE_DEVIATION: exact two-stage MAD, global and BY; INLINESTATS rejects") {
    // x = 1.5, 2.5, 3.5, 4.5, 5.5 → median 3.5, |dev| = 2,1,0,1,2 → MAD 1.0
    val global = run("FROM t | STATS mad = MEDIAN_ABSOLUTE_DEVIATION(x)")
      .collect().head.getDouble(0)
    assert(global == 1.0)
    // per-group: alpha has x = 1.5, 3.5, 5.5 → median 3.5 → MAD 2.0
    val byCat = run(
      "FROM t | STATS mad = MEDIAN_ABSOLUTE_DEVIATION(x) BY cat | SORT cat | KEEP cat, mad")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byCat("alpha") == 2.0)
    assert(byCat("beta") == 0.0) // singleton group: |x - x| = 0
    // next to other aggregates in one STATS
    val mixed = run(
      "FROM t | STATS n = COUNT(*), mad = MEDIAN_ABSOLUTE_DEVIATION(n), s = SUM(n)")
      .collect().head
    assert(mixed.getLong(0) == 5L && mixed.getDouble(1) == 10.0 && mixed.getLong(2) == 150L)
    val e = intercept[EsqlParser.ParseError](
      run("FROM t | INLINESTATS m = MEDIAN_ABSOLUTE_DEVIATION(x)"))
    assert(e.msg.contains("MEDIAN_ABSOLUTE_DEVIATION"))
  }

  test("SHA1/SCALB/TO_IP/MV_PSERIES_WEIGHTED_SUM scalar contracts") {
    val got = EsqlParser.run(
      """ROW s = "abc" | EVAL h = SHA1(s), sc = SCALB(1.5, 3),
        |  ok = TO_IP("192.168.1.10"), hi = TO_IP("10.0.0.999"), junk = TO_IP(s),
        |  ps = MV_PSERIES_WEIGHTED_SUM(SPLIT("4,2", ","), 2.0),
        |  mad = MV_MEDIAN_ABSOLUTE_DEVIATION(SPLIT("1,2,10,20", ","))
        || KEEP h, sc, ok, hi, junk, ps, mad""".stripMargin,
      _ => spark.range(1).toDF(), session = Some(spark)).collect().head
    assert(got.getString(0) == "a9993e364706816aba3e25717850c26c9cd0d89d") // known SHA-1("abc")
    assert(got.getDouble(1) == 12.0)
    assert(got.getString(2) == "192.168.1.10")
    assert(got.isNullAt(3), "octet 999 must fail TO_IP")
    assert(got.isNullAt(4))
    assert(got.getDouble(5) == 4.0 + 2.0 / 4.0) // 4/1² + 2/2²
    assert(got.getDouble(6) == 4.5) // med 6 → devs {5,4,4,14} → 4.5
  }

  test("r15 self-review pins: MAD null bucket, param in IN, negative p, pseries nulls, ST roles") {
    // 1. MAD's two-stage join must keep the null BY bucket (null-safe <=>)
    val madNull = run(
      """FROM t | EVAL g = CASE(n > 30, cat) | STATS mad = MEDIAN_ABSOLUTE_DEVIATION(x),
        |  cnt = COUNT(*) BY g | SORT g | KEEP g, mad, cnt""".stripMargin).collect()
    assert(madNull.length == 3, s"null bucket lost: ${madNull.mkString(";")}")
    val nullBucket = madNull.find(_.isNullAt(0)).get
    assert(nullBucket.getLong(2) == 3L) // n = 10, 20, 30 → g null
    assert(nullBucket.getDouble(1) == 1.0) // x = 1.5, 2.5, 3.5 → MAD 1.0
    // 2. a bound ?param works inside IN lists
    val inParam = EsqlParser.run("FROM t | WHERE n IN (?a, ?b) | SORT id | KEEP id",
      _ => df, params = Map("a" -> EsqlParser.param(20L), "b" -> EsqlParser.param(40L)))
      .collect().map(_.getLong(0)).toSeq
    assert(inParam == Seq(2L, 4L))
    // 3. negative p hits the plan-time validation, not "unsupported function"
    val e = intercept[EsqlParser.ParseError](
      run("""FROM t | EVAL p = MV_PERCENTILE(SPLIT("1,2", ","), -5)"""))
    assert(e.msg.contains("[0, 100]") && e.msg.contains("-5"))
    // 4. pseries drops unparseable elements instead of nulling the sum
    val ps = EsqlParser.run(
      """ROW a = 1 | EVAL ps = MV_PSERIES_WEIGHTED_SUM(SPLIT("4,x,2", ","), 1.0) | KEEP ps""",
      _ => df, session = Some(spark)).collect().head
    assert(ps.getDouble(0) == 4.0 + 2.0 / 2.0, "null element must drop, not poison")
    // 5. ST argument roles: symmetric intersects accepts either order;
    //    directed forms fail with a CLEAR message on the wrong order
    val sym = EsqlParser.run(
      """ROW a = 1 | EVAL p = TO_GEOPOINT("POINT (5 5)"),
        |  s1 = ST_INTERSECTS(TO_GEOSHAPE("ENVELOPE (0, 10, 10, 0)"), p),
        |  s2 = ST_INTERSECTS(p, TO_GEOSHAPE("ENVELOPE (0, 10, 10, 0)"))
        || KEEP s1, s2""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(sym.getBoolean(0) && sym.getBoolean(1))
    val roleErr = intercept[Throwable](EsqlParser.run(
      """ROW a = 1 | EVAL bad = ST_CONTAINS(TO_GEOPOINT("POINT (5 5)"),
        |  TO_GEOSHAPE("ENVELOPE (0, 10, 10, 0)")) | KEEP bad""".stripMargin,
      _ => df, session = Some(spark)).collect())
    assert(roleErr.getMessage.contains("ST_WITHIN"),
      s"wrong-order ST_CONTAINS must name the fix, got: ${roleErr.getMessage}")
  }

  test("spatial functions: WKT parse, point extraction, envelope relations, centroid") {
    val got = EsqlParser.run(
      """ROW a = 1 | EVAL p = TO_GEOPOINT("POINT (103.8 1.5)"),
        |  x = ST_X(p), y = ST_Y(p),
        |  zero = ROUND(ST_DISTANCE(p, p), 2),
        |  bad = ST_X(TO_GEOPOINT("not a point")),
        |  inbox = ST_WITHIN(p, TO_GEOSHAPE("ENVELOPE (100, 110, 5, -5)")),
        |  outbox = ST_CONTAINS(TO_GEOSHAPE("ENVELOPE (0, 10, 5, -5)"), p),
        |  badshape = ST_WITHIN(p, TO_GEOSHAPE("POLYGON ((1 2))"))
        || KEEP x, y, zero, bad, inbox, outbox, badshape""".stripMargin,
      _ => spark.range(1).toDF(), session = Some(spark)).collect().head
    assert(got.getDouble(0) == 103.8 && got.getDouble(1) == 1.5)
    assert(got.getDouble(2) == 0.0)
    assert(got.isNullAt(3), "invalid WKT must yield null, not an error")
    assert(got.getBoolean(4) && !got.getBoolean(5))
    assert(got.isNullAt(6), "non-envelope shape parses to null (documented scope)")
    // centroid over a two-point group: mean of components
    val c = run(
      """FROM t | EVAL p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(n), " ", TO_STRING(id), ")"))
        || STATS c = ST_CENTROID_AGG(p) | EVAL cx = ST_X(c), cy = ST_Y(c) | KEEP cx, cy"""
        .stripMargin).collect().head
    assert(c.getDouble(0) == 30.0 && c.getDouble(1) == 3.0) // mean(10..50), mean(1..5)
  }

  test("division: integer/integer truncates toward zero; fractional operands promote") {
    // the ES|QL arithmetic contract — Spark SQL's `/` is always
    // fractional, so this pins the type-directed EsqlDivide replacement
    val got = EsqlParser.run(
      """ROW a = 5, b = -5 | EVAL q = a / 2, qn = b / 2, f = a / 2.0,
        |  g = 7.0 / 2 | KEEP q, qn, f, g""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(got.getLong(0) == 2L, "5 / 2 must be integer 2")
    assert(got.getLong(1) == -2L, "-5 / 2 must truncate toward zero")
    assert(got.getDouble(2) == 2.5)
    assert(got.getDouble(3) == 3.5)
    // and over a column: n is long, so n / 20 is integral per row
    val byCol = run("FROM t | EVAL q = n / 20 | SORT id | KEEP q")
      .collect().map(_.getLong(0)).toSeq
    assert(byCol == Seq(0L, 1L, 1L, 2L, 2L)) // n = 10,20,30,40,50
  }

  test("IN accepts negative numeric literals (pinned from the differential fuzzer)") {
    // ParserDifferentialSpec round-1 find: parseLit rejected the '-'
    // sign, so `IN (-5, …)` threw "expected literal"
    val got = run("FROM t | EVAL d = n - 15 | WHERE d IN (-5, 35) | SORT id | KEEP id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 5L)) // n=10 → d=-5; n=50 → d=35
  }

  test("DATE_PARSE: pattern parse, null on unparseable input (ES contract), round-trip") {
    val got = run(
      """FROM t | EVAL d = DATE_PARSE("yyyy-MM-dd HH:mm:ss", "2024-03-05 06:07:08"),
        |  bad = DATE_PARSE("yyyy-MM-dd", cat),
        |  rt = DATE_FORMAT("yyyy-MM-dd HH:mm:ss", DATE_PARSE("yyyy-MM-dd HH:mm:ss", "2024-03-05 06:07:08"))
        || SORT id | LIMIT 1 | KEEP d, bad, rt""".stripMargin).collect().head
    assert(got.getTimestamp(0).toInstant == java.time.Instant.parse("2024-03-05T06:07:08Z"))
    assert(got.isNullAt(1), "unparseable input must yield null, not an error")
    assert(got.getString(2) == "2024-03-05 06:07:08")
  }

  test("request parameters: ?name substitutes literals; unbound names fail at parse time") {
    val got = EsqlParser.run(
      "FROM t | WHERE n >= ?lo AND cat == ?which | STATS s = SUM(n)",
      _ => df, params = Map(
        "lo" -> EsqlParser.param(20L), "which" -> EsqlParser.param("alpha")))
      .collect().head
    assert(got.getLong(0) == 80L) // 30 + 50
    val e = intercept[EsqlParser.ParseError](
      EsqlParser.run("FROM t | WHERE n >= ?nope", _ => df))
    assert(e.msg.contains("unbound request parameter ?nope"))
  }

  test("pinned-now span arithmetic: ?now - span in fixed and calendar units") {
    val now = java.time.Instant.parse("2024-01-30T00:00:00Z")
    def cutCount(expr: String): Long = EsqlParser.run(
      s"""ROW ts = DATE_PARSE("yyyy-MM-dd HH:mm:ss", "2024-01-20 00:00:00")
         || EVAL cut = $expr
         || EVAL hit = CASE(ts > cut, 1, 0) | KEEP hit""".stripMargin,
      _ => df, session = Some(spark),
      params = Map("now" -> EsqlParser.param(now))).collect().head.getLong(0)
    assert(cutCount("?now - 1 day") == 0L)     // cut 2024-01-29 > ts
    assert(cutCount("?now - 2 weeks") == 1L)   // cut 2024-01-16 < ts
    assert(cutCount("?now - 1 month") == 1L)   // cut 2023-12-30 < ts
    assert(cutCount("?now - 12 hours") == 0L)  // cut 2024-01-29T12 > ts
    // and the additive direction: ts + 2 weeks lands past the pin
    val fwd = EsqlParser.run(
      """ROW ts = DATE_PARSE("yyyy-MM-dd HH:mm:ss", "2024-01-20 00:00:00")
        || EVAL fut = ts + 2 weeks | KEEP fut""".stripMargin,
      _ => df, session = Some(spark)).collect().head.getTimestamp(0)
    assert(fwd.toInstant == java.time.Instant.parse("2024-02-03T00:00:00Z"))
  }

  test("MV_MEDIAN/MV_PERCENTILE drop null elements; out-of-range p is a ParseError") {
    // "x" casts to null — it must not shift the rank positions
    val got = EsqlParser.run(
      """ROW a = 1 | EVAL v = SPLIT("5,x,1,3", ","),
        |  md = MV_MEDIAN(v), pc = MV_PERCENTILE(v, 50) | KEEP md, pc""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(got.getDouble(0) == 3.0, s"null element skewed the median: ${got.getDouble(0)}")
    assert(got.getDouble(1) == 3.0)
    val e = intercept[EsqlParser.ParseError](
      EsqlParser.run("""ROW a = 1 | EVAL p = MV_PERCENTILE(SPLIT("1,2", ","), 150)""",
        _ => df, session = Some(spark)))
    assert(e.msg.contains("[0, 100]"))
  }

  test("range ENRICH: overlapping intervals yield ONE deterministic match (max_matches=1)") {
    import spark.implicits._
    // [0,100) overlaps [10,40) and [20,30); smallest __range_lo wins
    val dim = Seq((10L, 40L, "mid"), (0L, 100L, "wide"), (20L, 30L, "tight"))
      .toDF("__range_lo", "__range_hi", "band")
    val got = EsqlParser.run(
      "FROM t | ENRICH bands ON n | SORT id | KEEP id, n, band",
      _ => df, policies = { case "bands" => (dim, "n") }).collect()
    // every n (10..50) is covered by [0,100) which has the smallest lo
    assert(got.length == 5, "overlap must not multiply probe rows")
    assert(got.map(_.getString(2)).distinct.toSeq == Seq("wide"))
  }

  test("r16 advice pins: division by zero is null, dateline envelope nulls, ts param in IN") {
    // 1. ES|QL's value-or-null contract for a zero denominator: the
    //    query survives and the cell is null — under this project's
    //    ANSI sessions the raw Spark replacements would THROW on one
    //    data-dependent zero (advice r15 →r16)
    val dz = EsqlParser.run(
      """ROW a = 5 | EVAL zi = a / 0, zd = a / 0.0, zc = a / (a - 5),
        |  zm = a % (a - 5), ok = a / 2, okm = (- 7) % 2
        || KEEP zi, zd, zc, zm, ok, okm""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(dz.isNullAt(0), "int / 0 must be null, not an ANSI error")
    assert(dz.isNullAt(1), "double / 0.0 must be null")
    assert(dz.isNullAt(2), "data-dependent zero denominator must null the cell only")
    assert(dz.isNullAt(3), "x % 0 must be null (EsqlMod, found by the pipeline fuzzer)")
    assert(dz.getLong(4) == 2L)
    assert(dz.getLong(5) == -1L, "% keeps the dividend's sign (truncated division)")
    // 2. an antimeridian-crossing envelope (min_lon > max_lon — valid
    //    ES geo_shape) is outside the bounding-box scope: the parse
    //    nulls so relations yield null, never a wrong false
    val am = EsqlParser.run(
      """ROW a = 1 | EVAL p = TO_GEOPOINT("POINT (179 0)"),
        |  wrap = ST_WITHIN(p, TO_GEOSHAPE("ENVELOPE (170, -170, 5, -5)")),
        |  plain = ST_WITHIN(p, TO_GEOSHAPE("ENVELOPE (170, 180, 5, -5)"))
        || KEEP wrap, plain""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(am.isNullAt(0), "dateline-wrapping envelope must null, not return false")
    assert(am.getBoolean(1))
    // 3. a timestamp-typed ?param binds inside IN lists like any literal
    val t1 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val inTs = EsqlParser.run(
      """FROM t | EVAL d = DATE_PARSE("yyyy-MM-dd", CONCAT("2024-01-0", TO_STRING(id)))
        || WHERE d IN (?t1, ?t3) | SORT id | KEEP id""".stripMargin,
      _ => df, params = Map(
        "t1" -> EsqlParser.param(t1),
        "t3" -> EsqlParser.param(java.time.Instant.parse("2024-01-03T00:00:00Z"))))
      .collect().map(_.getLong(0)).toSeq
    assert(inTs == Seq(1L, 3L), s"timestamp params in IN must bind (got $inTs)")
  }

  test("r16 spatial residue: POLYGON relations — containment, orientation, boundary, roles") {
    val g = EsqlParser.run(
      """ROW a = 1 | EVAL p = TO_GEOPOINT("POINT (0 0)"),
        |  inq = ST_WITHIN(p, TO_GEOSHAPE("POLYGON ((-150 -70, -100 80, 120 75, 150 -60, -150 -70))")),
        |  cw = ST_WITHIN(p, TO_GEOSHAPE("POLYGON ((-150 -70, 150 -60, 120 75, -100 80, -150 -70))")),
        |  tri = ST_CONTAINS(TO_GEOSHAPE("POLYGON ((-10 -10, 10 -10, 0 10, -10 -10))"), p),
        |  edge = ST_INTERSECTS(TO_GEOPOINT("POINT (0 -10)"),
        |    TO_GEOSHAPE("POLYGON ((-10 -10, 10 -10, 0 10, -10 -10))")),
        |  outp = ST_INTERSECTS(TO_GEOSHAPE("POLYGON ((-10 -10, 10 -10, 0 10, -10 -10))"),
        |    TO_GEOPOINT("POINT (179 0)")),
        |  badp = ST_WITHIN(p, TO_GEOSHAPE("POLYGON ((0 0, 1 1))"))
        || KEEP inq, cw, tri, edge, outp, badp""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(g.getBoolean(0), "point inside the quad")
    assert(g.getBoolean(1), "reversed (clockwise) ring must test identically")
    assert(g.getBoolean(2), "ST_CONTAINS(polygon, point) role")
    assert(g.getBoolean(3), "a point ON an edge is inside (boundary included)")
    assert(!g.getBoolean(4), "point outside must be false")
    assert(g.isNullAt(5), "a malformed (unclosed/short) POLYGON parses to null")
    // a valid but NON-CONVEX ring is a plan-time error naming the scope
    val nc = intercept[EsqlParser.ParseError](EsqlParser.run(
      """ROW a = 1 | EVAL bad = ST_WITHIN(TO_GEOPOINT("POINT (1 1)"),
        |  TO_GEOSHAPE("POLYGON ((0 0, 10 0, 10 10, 5 2, 0 10, 0 0))"))""".stripMargin,
      _ => df, session = Some(spark)))
    assert(nc.msg.contains("non-convex"), s"want the convex-scope error, got: ${nc.msg}")
    // wrong argument roles fail with the named fix, like the envelope path
    val role = intercept[EsqlParser.ParseError](EsqlParser.run(
      """ROW a = 1 | EVAL bad = ST_CONTAINS(TO_GEOPOINT("POINT (1 1)"),
        |  TO_GEOSHAPE("POLYGON ((-10 -10, 10 -10, 0 10, -10 -10))"))""".stripMargin,
      _ => df, session = Some(spark)))
    assert(role.msg.contains("ST_WITHIN"))
    // polygon-vs-envelope is the NAMED shape-vs-shape error, not an
    // internal no-such-field crash (r16 self-review)
    val svs = intercept[EsqlParser.ParseError](EsqlParser.run(
      """ROW a = 1 | EVAL bad = ST_INTERSECTS(
        |  TO_GEOSHAPE("POLYGON ((-10 -10, 10 -10, 0 10, -10 -10))"),
        |  TO_GEOSHAPE("ENVELOPE (0, 10, 5, -5)"))""".stripMargin,
      _ => df, session = Some(spark)))
    assert(svs.msg.contains("shape-vs-shape"))
    // WKT spacing variants all parse (r16 self-review: a convex region
    // must not be silently nulled for its comma style)
    val sp = EsqlParser.run(
      """ROW a = 1 | EVAL p = TO_GEOPOINT("POINT (0 0)"),
        |  v1 = ST_WITHIN(p, TO_GEOSHAPE("POLYGON((-10 -10,10 -10,0 10,-10 -10))")),
        |  v2 = ST_WITHIN(p, TO_GEOSHAPE("POLYGON ((-10 -10 , 10 -10 , 0 10 , -10 -10))"))
        || KEEP v1, v2""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(sp.getBoolean(0) && sp.getBoolean(1), "spacing variants must parse, not null")
    // a lat-degenerate envelope (swapped lat args) nulls like the
    // dateline case — never everywhere-false (r16 self-review)
    val ld = EsqlParser.run(
      """ROW a = 1 | EVAL bad = ST_WITHIN(TO_GEOPOINT("POINT (5 0)"),
        |  TO_GEOSHAPE("ENVELOPE (0, 10, -5, 5)")) | KEEP bad""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(ld.isNullAt(0), "lat-swapped envelope must null, not return false")
  }

  test("r16 spatial residue: ST_ENVELOPE and the bounding-box accessors") {
    val g = EsqlParser.run(
      """ROW a = 1 | EVAL p = TO_GEOPOINT("POINT (12 -7)"),
        |  e = TO_GEOSHAPE("ENVELOPE (-60, 60, 45, -45)"),
        |  exmn = ST_XMIN(e), exmx = ST_XMAX(e), eymn = ST_YMIN(e), eymx = ST_YMAX(e),
        |  pxmn = ST_XMIN(p), pymx = ST_YMAX(p),
        |  bx = ST_XMAX(ST_ENVELOPE(p)), by = ST_YMIN(ST_ENVELOPE(p)),
        |  idb = ST_XMIN(ST_ENVELOPE(e)),
        |  nb = ST_ENVELOPE(TO_GEOPOINT("garbage"))
        || KEEP exmn, exmx, eymn, eymx, pxmn, pymx, bx, by, idb, nb""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert((g.getDouble(0), g.getDouble(1), g.getDouble(2), g.getDouble(3))
      == ((-60.0, 60.0, -45.0, 45.0)))
    // a point's bounding box is itself (ES's contract), direct or via ST_ENVELOPE
    assert((g.getDouble(4), g.getDouble(5)) == ((12.0, -7.0)))
    assert((g.getDouble(6), g.getDouble(7)) == ((12.0, -7.0)))
    // ST_ENVELOPE of an envelope is the identity
    assert(g.getDouble(8) == -60.0)
    // a null geometry has a NULL box, not a box of nulls
    assert(g.isNullAt(9))
    // the cartesian point composes with ST_ENVELOPE + accessors too
    // (r16 review: the planar twin must not be an asymmetric hole)
    val c = EsqlParser.run(
      """ROW a = 1 | EVAL cp = TO_CARTESIANPOINT("POINT (3 -4)"),
        |  cbx = ST_XMAX(ST_ENVELOPE(cp)), cby = ST_YMIN(ST_ENVELOPE(cp))
        || KEEP cbx, cby""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert((c.getDouble(0), c.getDouble(1)) == ((3.0, -4.0)))
    // a non-geo argument fails with the named expectation
    val e = intercept[Throwable](EsqlParser.run(
      "ROW a = 1 | EVAL bad = ST_XMIN(a) | KEEP bad",
      _ => df, session = Some(spark)).collect())
    assert(e.getMessage.contains("ST_XMIN expects"), s"got: ${e.getMessage}")
  }

  test("r16 spatial residue: ST_GEOTILE/ST_GEOHASH/ST_GEOHEX grid cells") {
    def cells(lon: Int, lat: Int): (String, String, String) = {
      val r = EsqlParser.run(
        s"""ROW a = 1 | EVAL p = TO_GEOPOINT("POINT ($lon $lat)"),
           |  t = ST_GEOTILE(p, 3), g = ST_GEOHASH(p, 2), h = ST_GEOHEX(p)
           || KEEP t, g, h""".stripMargin,
        _ => df, session = Some(spark)).collect().head
      (r.getString(0), r.getString(1), r.getString(2))
    }
    // independent expected values (geohash pins match the published
    // geohash of these places: w2* Singapore, dr* New York, s0* null island)
    assert(cells(103, 1) == ("3/6/3", "w2", "216/0"))
    assert(cells(-74, 40) == ("3/2/3", "dr", "-144/62"))
    assert(cells(0, 0) == ("3/4/4", "s0", "0/0"))
    // the +180/+90 edge folds into the LAST cell in both grids — the
    // geohash clamp and the geotile [0, 2^z−1] x/y clamp (lat 89 is
    // past the ±85.05° mercator range: unclamped y would be −3)
    assert(cells(180, 89) == ("3/7/0", "zz", "360/186"))
    // zoom/precision validate at plan time
    val ze = intercept[EsqlParser.ParseError](EsqlParser.run(
      """ROW a = 1 | EVAL t = ST_GEOTILE(TO_GEOPOINT("POINT (1 1)"), 30)""",
      _ => df, session = Some(spark)))
    assert(ze.msg.contains("[0, 29]"))
    val pe = intercept[EsqlParser.ParseError](EsqlParser.run(
      """ROW a = 1 | EVAL g = ST_GEOHASH(TO_GEOPOINT("POINT (1 1)"), 7)""",
      _ => df, session = Some(spark)))
    assert(pe.msg.contains("[1, 6]"))
  }

  test("r17 advice pins: star ring rejected, geohash low clamp, EVAL-bound shape error") {
    // a consistently-winding PENTAGRAM passes the turn-sign gate but is
    // self-intersecting — the half-plane test would silently scope to
    // the inner pentagon; must be the NAMED error (r16 advice #1)
    val star = intercept[EsqlParser.ParseError](EsqlParser.run(
      """ROW a = 1 | EVAL bad = ST_WITHIN(TO_GEOPOINT("POINT (0 0)"),
        |  TO_GEOSHAPE("POLYGON ((0 10, -6 -8, 10 3, -10 3, 6 -8, 0 10))"))""".stripMargin,
      _ => df, session = Some(spark)))
    assert(star.msg.contains("self-intersecting"), s"got: ${star.msg}")
    // ST_GEOHASH clamps BOTH sides like ST_GEOTILE: a below-range point
    // folds into cell 0, the same cell as the exact corner — not a
    // negative index minting a garbage string (r16 advice #2)
    val gh = EsqlParser.run(
      """ROW a = 1 | EVAL lo = ST_GEOHASH(TO_GEOPOINT("POINT (-200 -100)"), 2),
        |  corner = ST_GEOHASH(TO_GEOPOINT("POINT (-180 -90)"), 2),
        |  tl = ST_GEOTILE(TO_GEOPOINT("POINT (-200 -100)"), 3)
        || KEEP lo, corner, tl""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(gh.getString(0) == "00" && gh.getString(1) == "00",
      s"below-range must clamp to the corner cell (got ${gh.getString(0)}/${gh.getString(1)})")
    // (tan wraps past the pole, so the unclamped y lands low; the pin
    // is that BOTH coordinates stay in [0, 2^z−1], not the exact cell)
    assert(gh.getString(2) == "3/0/0", "geotile low clamp unchanged")
    // an ENVELOPE bound to an EVAL variable then related to a polygon
    // literal bypasses the syntactic shape guard — the analysis-time
    // RequireGeoPoint guard must still give the NAMED shape-vs-shape
    // error, not a raw no-such-struct-field crash (r16 advice #3)
    val svs = intercept[Throwable](EsqlParser.run(
      """ROW a = 1 | EVAL e = TO_GEOSHAPE("ENVELOPE (0, 10, 5, -5)")
        || EVAL r = ST_INTERSECTS(TO_GEOSHAPE("POLYGON ((-10 -10, 10 -10, 0 10, -10 -10))"), e)
        || KEEP r""".stripMargin,
      _ => df, session = Some(spark)).collect())
    assert(svs.getMessage.contains("shape-vs-shape"), s"got: ${svs.getMessage}")
    // and a point bound via EVAL still relates fine through the guard
    val ok = EsqlParser.run(
      """ROW a = 1 | EVAL p = TO_GEOPOINT("POINT (0 0)")
        || EVAL r = ST_INTERSECTS(TO_GEOSHAPE("POLYGON ((-10 -10, 10 -10, 0 10, -10 -10))"), p)
        || KEEP r""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(ok.getBoolean(0))
  }

  test("r17 review pins: TS mode scopes per FORK branch and does not survive the FORK") {
    import spark.implicits._
    // two series: a = monotone counter (deltas 4, 6 over 2 ms → rate
    // 5e6 milli-units/sec); b = one reset (deltas −2 → +3, +6 →
    // increase 9 over 2 ms → 4.5e6)
    val tsdf = Seq(
      ("a", 1L, 10L), ("a", 2L, 14L), ("a", 3L, 20L),
      ("b", 1L, 5L), ("b", 2L, 3L), ("b", 3L, 9L)
    ).toDF("_tsid", "_ts_ms", "counter")
    // a STATS inside a FORK branch consumes TS mode for ITS branch —
    // the branch's SECOND STATS is an ordinary aggregation over the
    // collapsed frame (pre-fix: ParseError "TS source must carry _tsid")
    val fork = EsqlParser.run(
      """TS m
        || FORK (STATS a0 = MAX(RATE(counter)) | STATS b0 = MAX(a0))
        |       (WHERE _ts_ms > 1)
        || KEEP _fork, b0""".stripMargin,
      { case "m" => tsdf }, session = Some(spark)).collect()
    assert(fork.length == 5, s"1 collapsed row + 4 filtered rows, got ${fork.length}")
    val b0s = fork.filter(_.getString(0) == "fork1").map(_.getLong(1)).toSeq
    assert(b0s == Seq(5000000L), s"branch-local two-level then plain MAX, got $b0s")
    assert(fork.filter(_.getString(0) == "fork2").forall(_.isNullAt(1)),
      "branch-missing column nulls")
    // TS mode does not survive the FORK: the post-FORK STATS is an
    // ordinary aggregation over the unioned frame (pre-fix: demanded
    // _tsid of a frame carrying per-branch nulls)
    val post = EsqlParser.run(
      """TS m
        || FORK (STATS x = SUM(RATE(counter))) (WHERE _ts_ms > 1)
        || STATS y = MAX(x), n = COUNT(*)""".stripMargin,
      { case "m" => tsdf }, session = Some(spark)).collect().head
    assert(post.getLong(0) == 9500000L, s"sum of both series' rates, got ${post.getLong(0)}")
    assert(post.getLong(1) == 5L)
    // RERANK of a NULL field scores null, not the saturation cap:
    // barTf(null) is null and Spark's least() IGNORES nulls, so an
    // ungated Σ least(tf, 3) would rank missing-field docs TOP at
    // 3·|terms| (found planning the r17 rerank fuzzer)
    val rr = EsqlParser.run(
      """ROW a = 1 | EVAL t = CASE(a > 1, "xx")
        || RERANK "xx yy" ON t | KEEP _score""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(rr.isNullAt(0), "a null field must score null, not 3 per term")
  }

  test("r17: multivalue literals and the KNN match function") {
    // bracketed mv literal: array<long> when every element is a
    // point-less whole (the NumLit rule element-wise), array<double>
    // otherwise; negatives are literal elements
    val mv = EsqlParser.run(
      """ROW a = 1 | EVAL xs = [3, 1, -2], s = MV_SUM(xs), d = MV_SUM([0.25, -1])
        || KEEP s, d""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(mv.getDouble(0) == 2.0, s"MV_SUM over the long literal, got ${mv.get(0)}")
    assert(mv.getDouble(1) == -0.75, "a pointed element promotes the literal to doubles")
    val empty = intercept[EsqlParser.ParseError](EsqlParser.run(
      "ROW a = 1 | EVAL xs = []", _ => df, session = Some(spark)))
    assert(empty.msg.contains("empty multivalue"), s"got: ${empty.msg}")

    // KNN end-to-end on a tiny vector frame: prefilter applies BEFORE
    // the k-nearest cut (the filtered-kNN discipline), dyadic values
    // keep the cosine exact, ties break by the frame's first column
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 1f)), (3L, Seq(0f, 1f)),
      (4L, Seq(1f, 0f))).toDF("id", "emb")
    val got = EsqlParser.run(
      """FROM vecs
        || WHERE KNN(emb, [1, 0], 2) AND id < 4
        || KEEP id | SORT id""".stripMargin,
      { case "vecs" => emb }, session = Some(spark)).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L),
      s"top-2 of the PREfiltered subset (cos 1.0, 0.707107; id 4 excluded), got $got")
    // identical-vector tie: ids 1 and 4 both at cos 1.0 → smaller first
    // column wins the last slot
    val tie = EsqlParser.run(
      """FROM vecs | WHERE KNN(emb, [1, 0], 2) | KEEP id | SORT id""",
      { case "vecs" => emb }, session = Some(spark)).collect().map(_.getLong(0)).toSeq
    assert(tie == Seq(1L, 4L), s"ties break by the first column ascending, got $tie")

    // misuse is NAMED: KNN outside WHERE, under OR/NOT, twice, bad k
    val ev = intercept[EsqlParser.ParseError](EsqlParser.run(
      """FROM vecs | EVAL z = KNN(emb, [1, 0], 2)""",
      { case "vecs" => emb }, session = Some(spark)))
    assert(ev.msg.contains("WHERE-level"), s"got: ${ev.msg}")
    val or = intercept[EsqlParser.ParseError](EsqlParser.run(
      """FROM vecs | WHERE id > 1 OR KNN(emb, [1, 0], 2)""",
      { case "vecs" => emb }, session = Some(spark)))
    assert(or.msg.contains("top-level conjunct"), s"got: ${or.msg}")
    val twice = intercept[EsqlParser.ParseError](EsqlParser.run(
      """FROM vecs | WHERE KNN(emb, [1, 0], 2) AND KNN(emb, [0, 1], 2)""",
      { case "vecs" => emb }, session = Some(spark)))
    assert(twice.msg.contains("at most one KNN"), s"got: ${twice.msg}")
    val badK = intercept[EsqlParser.ParseError](EsqlParser.run(
      """FROM vecs | WHERE KNN(emb, [1, 0], 0)""",
      { case "vecs" => emb }, session = Some(spark)))
    assert(badK.msg.contains("positive integer"), s"got: ${badK.msg}")
    // a NEGATIVE k reaches the same named error (it parses as
    // Neg(NumLit) — r17 review: the validation was unreachable for it)
    val negK = intercept[EsqlParser.ParseError](EsqlParser.run(
      """FROM vecs | WHERE KNN(emb, [1, 0], -2)""",
      { case "vecs" => emb }, session = Some(spark)))
    assert(negK.msg.contains("positive integer"), s"got: ${negK.msg}")
    // the two r17 features COMPOSE: a vector built from the numeric mv
    // literal (array<long>) coerces to the cosine's float vector
    val composed = EsqlParser.run(
      """ROW a = 1 | EVAL v = [1, 0] | WHERE KNN(v, [1, 0], 1) | KEEP a""",
      _ => df, session = Some(spark)).collect()
    assert(composed.map(_.getLong(0)).toSeq == Seq(1L))
    // a NON-vector field is the named expectation, not a raw
    // DATATYPE_MISMATCH
    val badField = intercept[Throwable](EsqlParser.run(
      """ROW a = 1 | EVAL s = "xx" | WHERE KNN(s, [1, 0], 1)""",
      _ => df, session = Some(spark)).collect())
    assert(badField.getMessage.contains("numeric vector field"),
      s"got: ${badField.getMessage}")
    // a user column literally named __knn_s survives the cut untouched
    val keepScore = EsqlParser.run(
      """FROM vecs | EVAL __knn_s = id * 10 | WHERE KNN(emb, [1, 0], 2)
        || KEEP id, __knn_s | SORT id""".stripMargin,
      { case "vecs" => emb }, session = Some(spark)).collect()
    assert(keepScore.map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 10L), (4L, 40L)),
      "a pre-existing __knn_s column must not be clobbered by the score")
  }

  test("r18 advice pins: KNN skips null vectors; post-FORK over-time aggs name the FORK") {
    import spark.implicits._
    // ES's knn never matches a doc missing the vector field: with only
    // TWO scored rows surviving the prefilter, k=3 must return 2 rows —
    // null-vector rows may not fill the remaining slot (pre-fix:
    // desc-nulls-last + limit let them through)
    val emb = Seq(
      (1L, Some(Seq(1f, 0f))), (2L, None), (3L, Some(Seq(0f, 1f))),
      (4L, None), (5L, None)).toDF("id", "emb")
    val got = EsqlParser.run(
      """FROM vecs | WHERE KNN(emb, [1, 0], 3) | KEEP id | SORT id""",
      { case "vecs" => emb }, session = Some(spark)).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L),
      s"null-vector rows must not occupy k slots (want the 2 scored rows), got $got")

    // TS mode consumed by a FORK: a later RATE/*_OVER_TIME fails with
    // an error that NAMES the FORK transition (pre-fix: a bare unknown
    // aggregate with no hint what consumed TS mode)
    val ts = Seq(("a", 1L, 10L), ("a", 2L, 14L)).toDF("_tsid", "_ts_ms", "counter")
    val postFork = intercept[EsqlParser.ParseError](EsqlParser.run(
      """TS m | FORK (WHERE _ts_ms > 0) (WHERE counter > 0)
        || STATS x = SUM(RATE(counter))""".stripMargin,
      { case "m" => ts }, session = Some(spark)))
    assert(postFork.msg.contains("FORK") && postFork.msg.contains("RATE"),
      s"the error must name the FORK transition, got: ${postFork.msg}")
    // and the STATS transition names itself the same way
    val postStats = intercept[EsqlParser.ParseError](EsqlParser.run(
      """TS m | STATS x = SUM(RATE(counter)) | STATS y = MAX(RATE(counter))""",
      { case "m" => ts }, session = Some(spark)))
    assert(postStats.msg.contains("STATS") && postStats.msg.contains("collapsed"),
      s"the error must name the STATS transition, got: ${postStats.msg}")
  }

  test("r18 function-audit closures: MATCH_PHRASE / MULTI_MATCH / TERM") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the fast table scan wins", "src1"),
      (2L, "scan table the fast", "src2"), // both words, NOT consecutive
      (3L, "slow merge join", "src3"),
      (4L, "table scan", "src1"), // phrase IS the whole field
      (5L, null.asInstanceOf[String], "src2")
    ).toDF("id", "text", "src")
    def ids(q: String): Seq[Long] =
      EsqlParser.run(q, { case "d" => docs }, session = Some(spark))
        .collect().map(_.getLong(0)).toSeq
    // phrase = consecutive in order; word-set overlap is NOT enough
    assert(ids("""FROM d | WHERE MATCH_PHRASE(text, "table scan") | KEEP id | SORT id""")
      == Seq(1L, 4L))
    // MATCH (OR semantics) would take rows 1, 2 and 4 — pin the contrast
    assert(ids("""FROM d | WHERE MATCH(text, "table scan") | KEEP id | SORT id""")
      == Seq(1L, 2L, 4L))
    // MULTI_MATCH: any field matching carries the row
    assert(ids("""FROM d | WHERE MULTI_MATCH("merge src2", text, src) | KEEP id | SORT id""")
      == Seq(2L, 3L, 5L))
    // TERM: exact un-analyzed token ("tab" matches nothing, "scan" does)
    assert(ids("""FROM d | WHERE TERM(text, "scan") | KEEP id | SORT id""")
      == Seq(1L, 2L, 4L))
    assert(ids("""FROM d | WHERE TERM(text, "tab") | KEEP id""").isEmpty)
    // null text never matches any of the three
    assert(!ids("""FROM d | WHERE MATCH_PHRASE(text, "table scan") | KEEP id""").contains(5L))
  }

  test("r18 function-audit closures: COPY_SIGN and ROUND_TO edges") {
    val got = EsqlParser.run(
      """ROW a = 1
        || EVAL c1 = COPY_SIGN(5, -2), c2 = COPY_SIGN(-5, 3), c3 = COPY_SIGN(5, 0),
        |       c4 = COPY_SIGN(2.5, -1), c5 = COPY_SIGN(5, CASE(a > 1, 2)),
        |       r1 = ROUND_TO(7, 0, 5, 10), r2 = ROUND_TO(-99, 0, 5, 10),
        |       r3 = ROUND_TO(10, 0, 5, 10), r4 = ROUND_TO(4.9, 0.5, 5.0),
        |       r5 = ROUND_TO(CASE(a > 1, 2), 0, 5), r6 = ROUND_TO(3, 7)
        || KEEP c1, c2, c3, c4, c5, r1, r2, r3, r4, r5, r6""".stripMargin,
      _ => df, session = Some(spark)).collect().head
    assert(got.getLong(0) == -5L, "sign of -2 onto |5|")
    assert(got.getLong(1) == 5L, "sign of 3 onto |-5|")
    assert(got.getLong(2) == 5L, "zero sign is non-negative")
    assert(got.getDouble(3) == -2.5)
    assert(got.isNullAt(4), "null sign must null, not default positive")
    assert(got.getLong(5) == 5L, "7 rounds DOWN to 5")
    assert(got.getLong(6) == 0L, "below the smallest point clamps to it")
    assert(got.getLong(7) == 10L, "exact point is itself")
    assert(got.getDouble(8) == 0.5, "double points: 4.9 rounds down to 0.5")
    assert(got.isNullAt(9), "null value must null, not clamp")
    assert(got.getLong(10) == 7L, "a single point always wins")
    // non-literal points are a named error
    val bad = intercept[EsqlParser.ParseError](EsqlParser.run(
      "ROW a = 1 | EVAL r = ROUND_TO(a, a)", _ => df, session = Some(spark)))
    assert(bad.msg.contains("numeric literals"), s"got: ${bad.msg}")
  }

  test("r18 function-audit closures: ST_DISJOINT, ST_EXTENT_AGG, TO_CARTESIANSHAPE") {
    import spark.implicits._
    val pts = Seq(
      (1L, "a", 10.0, 10.0), (2L, "a", 100.0, -50.0),
      (3L, "b", -170.0, 80.0), (4L, "b", 0.0, 0.0)
    ).toDF("id", "g", "qx", "qy")
    // ST_DISJOINT = NOT intersects; a bad geometry stays null (not false)
    val dj = EsqlParser.run(
      """FROM p
        || EVAL pt = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(qx), " ", TO_STRING(qy), ")")),
        |       d = ST_DISJOINT(pt, TO_GEOSHAPE("ENVELOPE (-60, 60, 45, -45)")),
        |       dn = ST_DISJOINT(TO_GEOPOINT(g), TO_GEOSHAPE("ENVELOPE (-60, 60, 45, -45)"))
        || KEEP id, d, dn | SORT id""".stripMargin,
      { case "p" => pts }, session = Some(spark)).collect()
    assert(dj.map(r => (r.getLong(0), r.getBoolean(1))).toSeq
      == Seq((1L, false), (2L, true), (3L, true), (4L, false)))
    assert(dj.forall(_.isNullAt(2)), "unparseable geometry must null through the NOT")
    // ST_EXTENT_AGG: per-group bbox in the ENVELOPE layout — the
    // ST_XMIN…ST_YMAX accessors compose on the aggregate's result
    val ext = EsqlParser.run(
      """FROM p
        || EVAL pt = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(qx), " ", TO_STRING(qy), ")"))
        || STATS e = ST_EXTENT_AGG(pt) BY g
        || EVAL xmn = ST_XMIN(e), xmx = ST_XMAX(e), ymn = ST_YMIN(e), ymx = ST_YMAX(e)
        || DROP e | SORT g""".stripMargin,
      { case "p" => pts }, session = Some(spark)).collect()
    assert(ext.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))).toSeq
      == Seq(("a", 10.0, 100.0, -50.0, 10.0), ("b", -170.0, 0.0, 0.0, 80.0)))
    // TO_CARTESIANSHAPE: planar box — relates against cartesian points,
    // accessors read it, and a mixed-space relate is a NAMED error
    val cart = EsqlParser.run(
      """FROM p
        || EVAL cp = TO_CARTESIANPOINT(CONCAT("POINT (", TO_STRING(qx), " ", TO_STRING(qy), ")")),
        |       box = TO_CARTESIANSHAPE("ENVELOPE (-60, 60, 45, -45)"),
        |       inb = ST_WITHIN(cp, box), xmn = ST_XMIN(box)
        || KEEP id, inb, xmn | SORT id""".stripMargin,
      { case "p" => pts }, session = Some(spark)).collect()
    assert(cart.map(r => (r.getLong(0), r.getBoolean(1))).toSeq
      == Seq((1L, true), (2L, false), (3L, false), (4L, true)))
    assert(cart.forall(_.getDouble(2) == -60.0))
    val mixed = intercept[Throwable](EsqlParser.run(
      """FROM p
        || EVAL pt = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(qx), " ", TO_STRING(qy), ")")),
        |       w = ST_WITHIN(pt, TO_CARTESIANSHAPE("ENVELOPE (-60, 60, 45, -45)"))
        || KEEP id""".stripMargin,
      { case "p" => pts }, session = Some(spark)).collect())
    assert(mixed.getMessage.contains("same coordinate space"),
      s"got: ${mixed.getMessage}")
    // ST_DISJOINT compiles through the intersects mode — its error
    // must still name ST_DISJOINT, not the function the user never wrote
    val mixedDj = intercept[Throwable](EsqlParser.run(
      """FROM p
        || EVAL pt = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(qx), " ", TO_STRING(qy), ")")),
        |       w = ST_DISJOINT(pt, TO_CARTESIANSHAPE("ENVELOPE (-60, 60, 45, -45)"))
        || KEEP id""".stripMargin,
      { case "p" => pts }, session = Some(spark)).collect())
    assert(mixedDj.getMessage.contains("ST_DISJOINT expects both sides"),
      s"got: ${mixedDj.getMessage}")
    // INLINESTATS rejects the struct aggregate by name
    val inl = intercept[EsqlParser.ParseError](EsqlParser.run(
      """FROM p
        || EVAL pt = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(qx), " ", TO_STRING(qy), ")"))
        || INLINESTATS e = ST_EXTENT_AGG(pt)""".stripMargin,
      { case "p" => pts }, session = Some(spark)))
    assert(inl.msg.contains("ST_EXTENT_AGG"), s"got: ${inl.msg}")
  }

  test("TERM: empty value matches exactly the empty-keyword rows; multi-space runs mint no phantom tokens") {
    import spark.implicits._
    val kdf = Seq((1L, ""), (2L, "a  b"), (3L, "x"), (4L, "  "))
      .toDF("id", "kw")
    def ids(q: String): Seq[Long] =
      EsqlParser.run(q, _ => kdf).collect().map(_.getLong(0)).toSeq
    // ES indexes "" as a keyword term: TERM(kw, "") matches the WHOLLY
    // empty row ONLY — never "a  b" (whose space run must not mint a
    // phantom "" token) and never "  " (a whitespace-only field is a
    // DISTINCT indexed keyword from "", r19 advice — the r18 trim-based
    // form collapsed the two)
    assert(ids("""FROM t | WHERE TERM(kw, "") | SORT id | KEEP id""") == Seq(1L))
    assert(ids("""FROM t | WHERE TERM(kw, "b") | KEEP id""") == Seq(2L))
    assert(ids("""FROM t | WHERE TERM(kw, "x") | KEEP id""") == Seq(3L))
    // the whitespace-only field has no tokens at all: nothing matches it
    assert(ids("""FROM t | WHERE TERM(kw, " ") | KEEP id""").isEmpty)
    assert(ids("""FROM t | WHERE TERM(kw, "  ") | KEEP id""").isEmpty)
  }

  test("DATE_FORMAT renders UTC in a non-UTC session; DATE_PARSE∘DATE_FORMAT stays an identity") {
    import spark.implicits._
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ddf = Seq((1L, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-15T12:00:00Z")))).toDF("id", "ts")
      val row = EsqlParser.run(
        """FROM t | EVAL s = DATE_FORMAT("yyyy-MM-dd HH:mm:ss", ts),
          |  rt = DATE_PARSE("yyyy-MM-dd HH:mm:ss", DATE_FORMAT("yyyy-MM-dd HH:mm:ss", ts))
          || KEEP s, rt""".stripMargin, _ => ddf).collect()(0)
      // ES renders in UTC — never 07:00, the session-local wall clock
      assert(row.getString(0) == "2024-01-15 12:00:00", s"got ${row.getString(0)}")
      assert(row.getTimestamp(1).toInstant ==
        java.time.Instant.parse("2024-01-15T12:00:00Z"),
        s"round-trip broke: ${row.getTimestamp(1)}")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("DATE_FORMAT: a ZONE-BEARING pattern prints the UTC zone with the UTC wall-clock in a non-UTC session") {
    import spark.implicits._
    // r20 advice: the zone-free shift trick printed the UTC wall-clock
    // under the SESSION zone's label when the pattern itself renders a
    // zone — e.g. "12:00:00-05:00" for 12:00Z in an America/New_York
    // session. The zone-bearing path is genuinely UTC-pinned.
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ddf = Seq((1L, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-15T12:00:00Z")))).toDF("id", "ts")
      val row = EsqlParser.run(
        """FROM t | EVAL x = DATE_FORMAT("yyyy-MM-dd'T'HH:mm:ssXXX", ts),
          |  z = DATE_FORMAT("yyyy-MM-dd HH:mm:ss z", ts),
          |  o = DATE_FORMAT("HH:mm O", ts)
          || KEEP x, z, o""".stripMargin, _ => ddf).collect()(0)
      assert(row.getString(0) == "2024-01-15T12:00:00Z",
        s"XXX must print the UTC offset label Z, got ${row.getString(0)}")
      assert(row.getString(1) == "2024-01-15 12:00:00 Z" ||
        row.getString(1) == "2024-01-15 12:00:00 UTC",
        s"z must print a UTC zone name, got ${row.getString(1)}")
      assert(row.getString(2) == "12:00 GMT",
        s"O must print GMT (the zero localized offset), got ${row.getString(2)}")
      // quoted zone letters stay literal text — the unquoted scan must
      // NOT push a 'z'-in-quotes pattern onto the UTC-pinned path
      // (both paths agree in field values; this pins the literal)
      val q = EsqlParser.run(
        """FROM t | EVAL s = DATE_FORMAT("HH:mm 'z'", ts) | KEEP s""",
        _ => ddf).collect()(0).getString(0)
      assert(q == "12:00 z", s"quoted z must stay literal, got $q")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("DATE_PARSE: an unzoned pattern parses as UTC (ES's contract), not session-local") {
    import spark.implicits._
    val ddf = Seq((1L, "2024-01-15 12:00:00")).toDF("id", "s")
    val got = EsqlParser.run(
      """FROM t | EVAL ts = DATE_PARSE("yyyy-MM-dd HH:mm:ss", s) | KEEP ts""",
      _ => ddf).collect()(0).getTimestamp(0)
    assert(got.toInstant == java.time.Instant.parse("2024-01-15T12:00:00Z"),
      s"unzoned input must pin UTC, got $got")
  }

  test("TO_VERSION: semver-aware order, prerelease before release, invalid after valid, distinctness") {
    import spark.implicits._
    val vdf = Seq(
      (1L, "1.10.0"), (2L, "1.2.0"), (3L, "1.2.0-beta"), (4L, "1.2.0-alpha"),
      (5L, "2.0.0"), (6L, "10.0.0"), (7L, "9.0.0"), (8L, "1.2"), (9L, "1.10.1"),
      // invalids: non-numeric lead, illegal char, an 11-digit numeral
      // (beyond the padding width — must go invalid, never mis-sort)
      (10L, "v1.2.3"), (11L, "not.a-version!"), (12L, "12345678901.0.0"),
      // r19 (advice): semver 11.4 prerelease-identifier precedence —
      // numeric identifiers compare numerically (beta.2 < beta.11) and
      // sort below every alphanumeric identifier (-1 < -alpha)
      (13L, "1.2.0-beta.2"), (14L, "1.2.0-beta.11"), (15L, "1.2.0-1"),
      // r20 (advice): '-' (0x2D) is a legal identifier char that sorts
      // BELOW the old '.' joiner (0x2E) — semver compares the FIRST
      // identifiers "alpha" < "alpha-1" (prefix), so alpha.1 < alpha-1;
      // the r19 encoding joined with '.' and sorted these backwards
      (16L, "1.2.0-alpha.1"), (17L, "1.2.0-alpha-1")
    ).toDF("id", "s")
    val got = EsqlParser.run(
      "FROM v | EVAL ver = TO_VERSION(s) | SORT ver, id | KEEP s", _ => vdf)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      // numeric order beats lexicographic (1.2 < 1.10; 9 < 10; beta.2 <
      // beta.11), numeric prerelease ids sort below alphanumeric ones,
      // a prefix prerelease precedes its extension (beta < beta.2), the
      // prereleases precede their release, 1.2 and 1.2.0 stay adjacent
      // but distinct, and every invalid sorts after every valid
      // (ordered among themselves by the raw string)
      "1.2.0-1", "1.2.0-alpha", "1.2.0-alpha.1", "1.2.0-alpha-1",
      "1.2.0-beta", "1.2.0-beta.2", "1.2.0-beta.11",
      "1.2", "1.2.0", "1.10.0", "1.10.1",
      "2.0.0", "9.0.0", "10.0.0",
      "12345678901.0.0", "not.a-version!", "v1.2.3"), s"got $got")
    // "1.2" and "1.2.0" sort together but are NOT the same value
    val eq = EsqlParser.run(
      """FROM v | WHERE TO_VERSION(s) == TO_VERSION("1.2.0") | KEEP s""", _ => vdf)
      .collect().map(_.getString(0)).toSeq
    assert(eq == Seq("1.2.0"), s"1.2 must stay distinct from 1.2.0: $eq")
  }

  test("TO_DATE_NANOS: 9-digit fractions exact, optional Z, invalid → null, long passthrough, date leg, named error") {
    import spark.implicits._
    val tdf = Seq(
      (1L, "2024-03-05T10:30:15.123456789Z"),
      (2L, "2024-03-05T10:30:15.123456789"),
      (3L, "2024-03-05T10:30:15.5"),
      (4L, "2024-03-05T10:30:15"),
      (5L, "2024-13-05T10:30:15"), // month out of range: regex passes, parse nulls
      (6L, "not a time"),
      (7L, "2024-03-05T10:30:15.1234567891"), // 10 fraction digits: invalid
      // r19 (advice): numeric offsets are legal date_nanos input; an
      // out-of-range offset passes the regex but nulls on parse
      (8L, "2024-03-05T10:30:15.5+01:00"),
      (9L, "2024-03-05T10:30:15-02:30"),
      (10L, "2024-03-05T10:30:15+99:00")
    ).toDF("id", "s")
    val base = java.time.Instant.parse("2024-03-05T10:30:15Z").getEpochSecond * 1000000000L
    val got = EsqlParser.run(
      "FROM t | EVAL dn = TO_DATE_NANOS(s), dn2 = TO_DATE_NANOS(dn) | SORT id | KEEP dn, dn2",
      _ => tdf).collect().toSeq.map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    val want = Seq(Some(base + 123456789L), Some(base + 123456789L),
      Some(base + 500000000L), Some(base), None, None, None,
      Some(base - 3600L * 1000000000L + 500000000L), // +01:00 is 1h EARLIER
      Some(base + 9000L * 1000000000L),              // -02:30 is 2.5h later
      None)                                          // +99:00: no such offset
    // dn2 (the LONG passthrough leg) must be identical to dn, nulls included
    assert(got == want.map(v => (v, v)), s"got $got")
    // date leg: a TimestampType input converts micros → nanos
    val tsdf = Seq((1L, "2024-03-05 10:30:15.123456")).toDF("id", "raw")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("raw")))
    val gotTs = EsqlParser.run("FROM t | EVAL dn = TO_DATE_NANOS(ts) | KEEP dn",
      _ => tsdf).collect()(0).getLong(0)
    assert(gotTs == base + 123456000L, s"got $gotTs")
    // NTZ leg (r19 advice): a TIMESTAMP_NTZ wall-clock reads as UTC in
    // ANY session zone (Tables.scala produces NTZ in one generation)
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ntzdf = Seq((1L, "2024-03-05 10:30:15.123456")).toDF("id", "raw")
        .withColumn("nts", org.apache.spark.sql.functions.to_timestamp_ntz(
          org.apache.spark.sql.functions.col("raw")))
      val gotNtz = EsqlParser.run("FROM t | EVAL dn = TO_DATE_NANOS(nts) | KEEP dn",
        _ => ntzdf).collect()(0).getLong(0)
      assert(gotNtz == base + 123456000L, s"NTZ must read as UTC, got $gotNtz")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
    // unsupported input type: the NAMED analysis error, not a raw mismatch
    val ddf = Seq((1L, 1.5)).toDF("id", "d")
    val e = intercept[Throwable](EsqlParser.run(
      "FROM t | EVAL dn = TO_DATE_NANOS(d) | KEEP dn", _ => ddf).collect())
    assert(e.getMessage.contains("TO_DATE_NANOS expects"), s"got: ${e.getMessage}")
  }

  test("TO_VERSION fuzz: 300 random versions — engine sort order == plain-Scala semver mirror") {
    import spark.implicits._
    val rnd = new scala.util.Random(318318L)
    def numeral(): String = {
      // lengths cluster at 1–3 but reach the 10-digit boundary and the
      // 11-digit invalid side; leading zeros on purpose (pad-ties)
      val len = rnd.nextInt(12) match {
        case 10 => 10
        case 11 => 11
        case n => n % 3 + 1
      }
      (0 until len).map(_ => ('0' + rnd.nextInt(10)).toChar).mkString match {
        case "" => "0"
        case s => s
      }
    }
    val vstrs = (0 until 300).map { _ =>
      rnd.nextInt(10) match {
        case 0 => "v" + numeral() + "." + numeral() // invalid lead
        case 1 => numeral() + "." + numeral() + "." // trailing dot: invalid
        case 2 => numeral() + "." + numeral() + "-" // empty prerelease: invalid
        case 3 => numeral() + "!" + numeral() // illegal char: invalid
        case _ =>
          val parts = (0 until 1 + rnd.nextInt(3)).map(_ => numeral()).mkString(".")
          // hyphen-bearing identifiers on purpose (r20 advice): '-'
          // (0x2D) sits BELOW '.' (0x2E) in ASCII, so an encoding that
          // joins identifiers with '.' mis-sorts "alpha.1" after
          // "alpha-1" — the pool must generate both shapes
          val pre = if (rnd.nextBoolean()) "" else "-" +
            (0 until 1 + rnd.nextInt(2)).map(_ =>
              Seq("alpha", "beta", "rc", "1", "11", "2", "alpha-1",
                "a-b")(rnd.nextInt(8))).mkString(".")
          parts + pre
      }
    }
    val vrx = "^(\\d{1,10})(?:\\.(\\d{1,10}))?(?:\\.(\\d{1,10}))?(?:-([0-9A-Za-z.\\-]+))?$".r
    // semver 11.4 prerelease ORDER derived from the SPEC's own rules,
    // NOT from the engine's encoding (r20 advice: a mirror that
    // replicates the encoding is blind to an encoding mis-sort — the
    // r19 '.'-joiner bug sat exactly in that blind spot): identifiers
    // compare pairwise — both all-digit (≤10 digits, the engine's
    // stated numeric cap) numerically, numeric below alphanumeric
    // (11.4.3), both alphanumeric in plain ASCII; a shared prefix →
    // fewer identifiers first (11.4.4)
    def preCompare(a: String, b: String): Int = {
      val as = a.split("\\.", -1); val bs = b.split("\\.", -1)
      var i = 0
      while (i < as.length && i < bs.length) {
        val (x, y) = (as(i), bs(i))
        val xn = x.matches("[0-9]{1,10}"); val yn = y.matches("[0-9]{1,10}")
        val c =
          if (xn && yn) java.lang.Long.compare(x.toLong, y.toLong)
          else if (xn) -1
          else if (yn) 1
          else x.compareTo(y)
        if (c != 0) return c
        i += 1
      }
      Integer.compare(as.length, bs.length)
    }
    // the mirror's key: valid → (0, maj, min, pat, 0-if-prerelease, pre, orig);
    // invalid → (1, raw) after every valid; `pre` compares via preCompare
    def key(s: String): (Int, Long, Long, Long, Int, String, String) =
      s match {
        case vrx(maj, minOr, patOr, preOr) =>
          (0, maj.toLong, Option(minOr).fold(0L)(_.toLong),
            Option(patOr).fold(0L)(_.toLong),
            if (preOr == null) 1 else 0, Option(preOr).getOrElse(""), s)
        case _ => (1, 0L, 0L, 0L, 0, "", s)
      }
    def keyCompare(p: (Int, Long, Long, Long, Int, String, String),
                   q: (Int, Long, Long, Long, Int, String, String)): Int = {
      var c = Integer.compare(p._1, q._1)
      if (c == 0) c = java.lang.Long.compare(p._2, q._2)
      if (c == 0) c = java.lang.Long.compare(p._3, q._3)
      if (c == 0) c = java.lang.Long.compare(p._4, q._4)
      if (c == 0) c = Integer.compare(p._5, q._5)
      if (c == 0) c = preCompare(p._6, q._6)
      if (c == 0) c = p._7.compareTo(q._7)
      c
    }
    val want = vstrs.zipWithIndex
      .sortWith { (p, q) =>
        val c = keyCompare(key(p._1), key(q._1))
        if (c != 0) c < 0 else p._2 < q._2
      }.map(_._1)
    val vdf = vstrs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = EsqlParser.run(
      "FROM v | EVAL ver = TO_VERSION(s) | SORT ver, id | KEEP s", _ => vdf)
      .collect().map(_.getString(0)).toSeq
    assert(got == want, {
      val d = got.zip(want).indexWhere { case (a, b) => a != b }
      s"version order diverged at $d: engine=${got.slice(d - 2, d + 3)} mirror=${want.slice(d - 2, d + 3)}"
    })
    val nInvalid = vstrs.count(s => vrx.findFirstIn(s).isEmpty)
    assert(nInvalid >= 60 && nInvalid <= 240, s"generator drifted: $nInvalid invalid of 300")
  }

  test("TO_DATE_NANOS fuzz: 300 random stamps — engine nanos == java.time mirror (null agreement included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(418418L)
    def pad(n: Int, w: Int): String = n.toString.reverse.padTo(w, '0').reverse.mkString
    val stamps = (0 until 300).map { _ =>
      rnd.nextInt(12) match {
        case 0 => "garbage " + rnd.nextInt(100)
        case 1 => // out-of-range calendar/clock fields: regex passes, parse nulls
          s"2024-${pad(13 + rnd.nextInt(80), 2)}-40T25:61:6${rnd.nextInt(10)}:00".take(19)
        case _ =>
          val frac = rnd.nextInt(11) match {
            case 10 => "." + (0 until 10).map(_ => rnd.nextInt(10)).mkString // invalid
            case 0 => ""
            case n => "." + (0 until n).map(_ => rnd.nextInt(10)).mkString
          }
          // r19 (advice): ES date_nanos accepts numeric offsets too —
          // mix bare / Z / ±HH:MM (half-hour zones included) and the
          // out-of-range "+99:00" (regex-valid, must null on parse)
          val z = rnd.nextInt(8) match {
            case 0 | 1 => "Z"
            case 2 | 3 => ""
            case 4 => f"+${rnd.nextInt(15)}%02d:${Seq("00", "30")(rnd.nextInt(2))}"
            case 5 => f"-${rnd.nextInt(15)}%02d:${Seq("00", "30")(rnd.nextInt(2))}"
            case 6 => "+99:00"
            case _ => f"+${rnd.nextInt(15)}%02d:15"
          }
          f"${1970 + rnd.nextInt(80)}%04d-${pad(1 + rnd.nextInt(12), 2)}-${pad(1 + rnd.nextInt(31), 2)}" +
            f"T${pad(rnd.nextInt(24), 2)}:${pad(rnd.nextInt(60), 2)}:${pad(rnd.nextInt(60), 2)}$frac$z"
      }
    }
    val srx = "^(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2})(?:\\.(\\d{1,9}))?(Z|[+-]\\d{2}:\\d{2})?$".r
    def mirror(s: String): Option[Long] = s match {
      case srx(head, frac, zone) =>
        try {
          val ldt = java.time.LocalDateTime.parse(head)
          val off = java.time.ZoneOffset.of(Option(zone).getOrElse("Z"))
          val sec = ldt.toInstant(off).getEpochSecond
          val tail = Option(frac).fold(0L)(f => (f + "0" * (9 - f.length)).toLong)
          Some(sec * 1000000000L + tail)
        } catch { case _: java.time.DateTimeException => None }
      case _ => None
    }
    val want = stamps.map(mirror)
    val sdf = stamps.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = EsqlParser.run(
      "FROM t | EVAL dn = TO_DATE_NANOS(s) | SORT id | KEEP dn", _ => sdf)
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"stamp '${stamps(i)}': engine=$g mirror=$w")
    }
    assert(want.count(_.isEmpty) >= 40, "too few null cases generated")
    assert(want.count(_.isDefined) >= 150, "too few valid cases generated")
  }
}
