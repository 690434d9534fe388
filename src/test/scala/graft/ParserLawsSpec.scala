package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property law for all three search-box languages: any AST, rendered
  * to query text (composites fully parenthesized — the renderer's
  * license; the parser owns precedence), parses back to the IDENTICAL
  * AST. This pins the grammar against regressions the fixed registry
  * queries and hand-picked spec cases can't reach — operator
  * associativity, nesting depth, field scoping, wildcard handling. */
class ParserLawsSpec extends AnyFunSuite {
  import graft.ops.{QueryStringParser => QS, KqlParser => KQL, SimpleQueryString => SQS}

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
    w = cs.mkString if !Set("and", "or", "not").contains(w)
  } yield w
  private val field: Gen[Option[String]] =
    Gen.oneOf(None, Some("lang"), Some("source"))
  private val words2: Gen[Seq[String]] =
    Gen.chooseNum(2, 4).flatMap(n => Gen.listOfN(n, word).map(_.toSeq))

  private def sized[N](leaf: Gen[N], and: (N, N) => N, or: (N, N) => N,
                       not: N => N)(depth: Int): Gen[N] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for { l <- sized(leaf, and, or, not)(depth - 1)
                  r <- sized(leaf, and, or, not)(depth - 1) } yield and(l, r)),
      2 -> (for { l <- sized(leaf, and, or, not)(depth - 1)
                  r <- sized(leaf, and, or, not)(depth - 1) } yield or(l, r)),
      1 -> sized(leaf, and, or, not)(depth - 1).map(not))

  private def check[N](gen: Gen[N], render: N => String, parse: String => N,
                       rounds: Int = 300): Unit = {
    var seed = Seed(7L)
    (1 to rounds).foreach { _ =>
      val ast = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val text = render(ast)
      assert(parse(text) == ast, s"round-trip failed for: $text")
    }
  }

  test("query_string: render→parse round-trips any AST") {
    val leaf: Gen[QS.Node] = Gen.frequency(
      4 -> (for { f <- field; w <- word } yield QS.Term(f, w): QS.Node),
      2 -> (for { f <- field; w <- word } yield QS.Prefix(f, w): QS.Node),
      2 -> (for { f <- field; ws <- words2 } yield QS.Phrase(f, ws): QS.Node))
    val gen = sized[QS.Node](leaf, QS.And.apply, QS.Or.apply, QS.Not.apply)(4)
    def render(n: QS.Node): String = n match {
      case QS.Term(f, w) => f.map(_ + ":").getOrElse("") + w
      case QS.Prefix(f, p) => f.map(_ + ":").getOrElse("") + p + "*"
      case QS.Phrase(f, ws) => f.map(_ + ":").getOrElse("") + "\"" + ws.mkString(" ") + "\""
      case QS.And(l, r) => s"(${render(l)} AND ${render(r)})"
      case QS.Or(l, r) => s"(${render(l)} OR ${render(r)})"
      case QS.Not(x) => s"(NOT ${render(x)})"
    }
    check[QS.Node](gen, render, QS.parse)
  }

  test("kql: render→parse round-trips any AST (terms, wildcards, phrases, ranges)") {
    val wildcardWord: Gen[String] =
      for { w <- word; pos <- Gen.oneOf(0, 1, 2) } yield pos match {
        case 0 => w + "*"
        case 1 => "*" + w
        case _ => w // plain
      }
    val leaf: Gen[KQL.Node] = Gen.frequency(
      4 -> (for { f <- field; w <- wildcardWord } yield KQL.MatchQ(f, w): KQL.Node),
      2 -> (for { f <- field; ws <- words2 } yield KQL.PhraseQ(f, ws): KQL.Node),
      2 -> (for { op <- Gen.oneOf(">", ">=", "<", "<=")
                  n <- Gen.chooseNum(-1000000L, 1000000L) }
              yield KQL.RangeQ("n_chars", op, BigDecimal(n)): KQL.Node))
    val gen = sized[KQL.Node](leaf, KQL.And.apply, KQL.Or.apply, KQL.Not.apply)(4)
    def render(n: KQL.Node): String = n match {
      case KQL.MatchQ(f, v) => f.map(_ + ":").getOrElse("") + v
      case KQL.PhraseQ(f, ws) => f.map(_ + ":").getOrElse("") + "\"" + ws.mkString(" ") + "\""
      case KQL.RangeQ(f, op, num) => s"$f $op $num"
      case KQL.And(l, r) => s"(${render(l)} and ${render(r)})"
      case KQL.Or(l, r) => s"(${render(l)} or ${render(r)})"
      case KQL.Not(x) => s"(not ${render(x)})"
    }
    check[KQL.Node](gen, render, KQL.parse)
  }

  test("simple_query_string: render→parse round-trips any AST; lenient agrees on valid input") {
    val leaf: Gen[QS.Node] = Gen.frequency(
      4 -> word.map(w => QS.Term(None, w): QS.Node),
      2 -> word.map(w => QS.Prefix(None, w): QS.Node),
      2 -> words2.map(ws => QS.Phrase(None, ws): QS.Node))
    val gen = sized[QS.Node](leaf, QS.And.apply, QS.Or.apply, QS.Not.apply)(4)
    def render(n: QS.Node): String = n match {
      case QS.Term(_, w) => w
      case QS.Prefix(_, p) => p + "*"
      case QS.Phrase(_, ws) => "\"" + ws.mkString(" ") + "\""
      case QS.And(l, r) => s"(${render(l)} + ${render(r)})"
      case QS.Or(l, r) => s"(${render(l)} | ${render(r)})"
      case QS.Not(x) => s"(-${render(x)})"
      case other => sys.error(s"unreachable: $other")
    }
    var seed = Seed(13L)
    (1 to 300).foreach { _ =>
      val ast = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val text = render(ast)
      assert(SQS.parse(text) == ast, s"round-trip failed for: $text")
      // on syntactically valid input, the lenient path must agree
      // exactly with the strict parse — degradation is for errors only
      assert(SQS.parseLenient(text).contains(ast), s"lenient diverged on: $text")
    }
  }

  test("esql: render→parse round-trips any WHERE expression AST") {
    import graft.ops.{EsqlParser => E}
    val identG: Gen[E.Expr] = Gen.oneOf("n", "cat", "x", "id").map(E.Ident(_))
    val numG: Gen[E.Expr] = Gen.chooseNum(0L, 1000000L).map(n => E.NumLit(BigDecimal(n)))
    val strG: Gen[E.Expr] = word.map(E.StrLit(_))
    val leaf: Gen[E.Expr] = Gen.frequency(3 -> identG, 2 -> numG, 2 -> strG)
    def sizedE(depth: Int): Gen[E.Expr] =
      if (depth <= 0) leaf
      else Gen.frequency(
        3 -> leaf,
        3 -> (for { op <- Gen.oneOf("or", "and", "==", "!=", ">=", "<=", ">", "<",
                      "+", "-", "*", "/", "%")
                    l <- sizedE(depth - 1); r <- sizedE(depth - 1) } yield E.Bin(op, l, r)),
        1 -> sizedE(depth - 1).map(E.Not(_)),
        1 -> sizedE(depth - 1).map(E.Neg(_)),
        1 -> (for { e <- sizedE(depth - 1); p <- word } yield E.Like(e, p + "*")),
        1 -> (for { e <- sizedE(depth - 1)
                    vs <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n,
                      Gen.oneOf(numG, strG))) } yield E.In(e, vs.toSeq)),
        1 -> (for { fn <- Gen.oneOf("ROUND", "ABS", "LENGTH", "TO_LONG", "TO_STRING")
                    e <- sizedE(depth - 1) } yield E.Func(fn, Seq(e))))
    def render(e: E.Expr): String = e match {
      case E.Ident(n) => n
      case E.NumLit(v) => v.toString
      case E.StrLit(s) => "\"" + s + "\""
      case E.Bin(op, l, r) =>
        val o = op match { case "or" => "OR"; case "and" => "AND"; case x => x }
        s"(${render(l)} $o ${render(r)})"
      case E.Not(x) => s"(NOT ${render(x)})"
      case E.Neg(x) => s"(- ${render(x)})"
      case E.Like(x, p) => s"(${render(x)} LIKE ${"\"" + p + "\""})"
      case E.In(x, vs) => s"(${render(x)} IN (${vs.map(render).mkString(", ")}))"
      case E.Func(fn, args) => s"$fn(${args.map(render).mkString(", ")})"
    }
    def parseWhere(text: String): E.Expr =
      E.parse(s"FROM t | WHERE $text").collect { case E.Where(e) => e }.head
    check[E.Expr](sizedE(4), render, parseWhere)
  }

  test("esql: span literals and source heads (FROM/METADATA/TS) round-trip") {
    import graft.ops.{EsqlParser => E}
    // DATE_TRUNC's span literal: any (n, unit) round-trips, singular or
    // plural surface form, always parsing to the singular AST
    val spanG: Gen[E.Expr] = for {
      n <- Gen.chooseNum(1L, 999L)
      u <- Gen.oneOf(E.spanUnits.toSeq)
    } yield E.Func("DATE_TRUNC", Seq(E.SpanLit(n, u), E.Ident("t")))
    def renderSpan(e: E.Expr): String = e match {
      case E.Func(_, Seq(E.SpanLit(n, u), E.Ident(c))) =>
        val plural = if (n > 1) "s" else ""
        s"DATE_TRUNC($n $u$plural, $c)"
      case other => fail(s"unexpected $other")
    }
    def parseWhere(text: String): E.Expr =
      E.parse(s"FROM t | WHERE $text").collect { case E.Where(e) => e }.head
    check[E.Expr](spanG, renderSpan, parseWhere)
    // source heads: table lists with/without METADATA, and the TS mode
    val headG: Gen[E.Cmd] = for {
      ts <- Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("idx_a", "idx_b", "events")))
      kind <- Gen.oneOf("from", "meta", "ts")
    } yield kind match {
      case "from" => E.From(ts.distinct)
      case "meta" => E.From(ts.distinct, Seq("_index"))
      case "ts" => E.TsFrom(ts.distinct)
    }
    def renderHead(c: E.Cmd): String = c match {
      case E.From(ts, Nil) => s"FROM ${ts.mkString(", ")}"
      case E.From(ts, m) => s"FROM ${ts.mkString(", ")} METADATA ${m.mkString(", ")}"
      case E.TsFrom(ts) => s"TS ${ts.mkString(", ")}"
      case other => fail(s"unexpected $other")
    }
    check[E.Cmd](headG, renderHead, t => E.parse(t).head, rounds = 100)
  }

  test("dissect: extraction recovers the exact values any template was rendered with") {
    import graft.ops.{EsqlParser => E}
    // literals use separator chars the (alphabetic) values can never
    // contain, so lazy captures must recover each value exactly
    val litG: Gen[String] = Gen.chooseNum(1, 3)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(',', ';', '|', '#', ' '))).map(_.mkString)
    val valG: Gen[String] = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val caseG: Gen[(List[String], List[String])] = for {
      k <- Gen.chooseNum(2, 5)
      lits <- Gen.listOfN(k + 1, litG)
      vals <- Gen.listOfN(k, valG)
    } yield (lits, vals)
    var seed = Seed(11L)
    (1 to 300).foreach { _ =>
      val (lits, vals) = caseG.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val template = (0 until vals.size)
        .map(i => lits(i) + s"%{f$i}").mkString + lits.last
      val input = vals.indices.map(i => lits(i) + vals(i)).mkString + lits.last
      val (rx, keys) = E.dissectRegex(template)
      val m = java.util.regex.Pattern.compile(rx).matcher(input)
      assert(m.find(), s"no match: template=$template input=$input rx=$rx")
      val got = keys.indices.map(i => m.group(i + 1))
      assert(got == vals, s"template=$template input=$input got=$got want=$vals")
      // PARITY: the native linear walk (graftshim.DissectExtract's
      // helper) recovers the same values as the regex twin
      import org.apache.spark.sql.graftshim.DissectHelper
      import org.apache.spark.unsafe.types.UTF8String
      val row = DissectHelper.extract(
        UTF8String.fromString(input), DissectHelper.compile(template), keys.size)
      val native = keys.indices.map(i => row.getUTF8String(i).toString)
      assert(native == vals, s"native walk diverged: template=$template input=$input got=$native")
    }
  }

  test("dissect: native walk matches the regex twin on padding and no-match") {
    import org.apache.spark.sql.graftshim.DissectHelper
    import org.apache.spark.unsafe.types.UTF8String
    def native(template: String, input: String, n: Int): Seq[String] = {
      val row = DissectHelper.extract(
        UTF8String.fromString(input), DissectHelper.compile(template), n)
      (0 until n).map(row.getUTF8String(_).toString)
    }
    assert(native("%{a->} %{b}", "x    y", 2) == Seq("x", "y"))
    assert(native("%{a->},%{b}", "x   ,y", 2) == Seq("x", "y"))
    assert(native("%{a} - %{b} [%{c}]", "p - q [r]", 3) == Seq("p", "q", "r"))
    assert(native("%{?skip} %{a}", "ignored kept", 1) == Seq("kept"))
    // no-match → empty strings (the regexp_extract convention)
    assert(native("%{a};%{b}", "no separator here", 2) == Seq("", ""))
    // final literal anchors at the end
    assert(native("%{a}!", "v!x!", 1) == Seq("v!x"))
  }

  test("dissect/grok matched-flag mode: null on no-match, \"\" on matched-empty") {
    import org.apache.spark.sql.graftshim.{DissectHelper, GrokHelper}
    import org.apache.spark.unsafe.types.UTF8String
    def dis(template: String, input: String, n: Int): (Seq[String], Boolean) = {
      val row = DissectHelper.extract(
        UTF8String.fromString(input), DissectHelper.compile(template), n, flag = true)
      ((0 until n).map(i => if (row.isNullAt(i)) null else row.getUTF8String(i).toString),
        row.getBoolean(n))
    }
    // matched-but-empty capture (adjacent delimiters) is "", flag true
    assert(dis("%{a},%{b},%{c}", "x,,z", 3) == (Seq("x", "", "z"), true))
    // whole-pattern failure: all fields null, flag false
    assert(dis("%{a};%{b}", "no separator", 2) == (Seq(null, null), false))
    val p = java.util.regex.Pattern.compile("(\\w+)-(\\w*)")
    def grok(input: String): (Seq[String], Boolean) = {
      val row = GrokHelper.extract(UTF8String.fromString(input), p, 2, flag = true)
      ((0 until 2).map(i => if (row.isNullAt(i)) null else row.getUTF8String(i).toString),
        row.getBoolean(2))
    }
    assert(grok("ab-cd") == (Seq("ab", "cd"), true))
    assert(grok("ab-") == (Seq("ab", ""), true)) // participating empty group → ""
    assert(grok("!!!") == (Seq(null, null), false))
  }

  test("grok: typed dictionary extraction recovers rendered fields") {
    import graft.ops.{EsqlParser => E}
    val wordG: Gen[String] = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val numG: Gen[Long] = Gen.chooseNum(-99999L, 99999L)
    val ipG: Gen[String] = for {
      a <- Gen.chooseNum(0, 255); b <- Gen.chooseNum(0, 255)
      c <- Gen.chooseNum(0, 255); d <- Gen.chooseNum(0, 255)
    } yield s"$a.$b.$c.$d"
    val caseG = for { w <- wordG; n <- numG; ip <- ipG; tail <- wordG } yield (w, n, ip, tail)
    val (rx, keys) = E.grokRegex(
      "%{WORD:w} %{INT:n:int} %{IP:ip} %{GREEDYDATA:rest}")
    assert(keys == Seq("w" -> "string", "n" -> "int", "ip" -> "string", "rest" -> "string"))
    var seed = Seed(13L)
    (1 to 300).foreach { _ =>
      val (w, n, ip, tail) = caseG.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val line = s"$w $n $ip $tail"
      val m = java.util.regex.Pattern.compile(rx).matcher(line)
      assert(m.find(), s"no match: $line")
      assert(Seq(m.group(1), m.group(2), m.group(3), m.group(4)) ==
        Seq(w, n.toString, ip, tail), s"line=$line")
    }
  }

  test("simple_query_string: parseLenient never throws on arbitrary garbage") {
    val garbage: Gen[String] =
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n,
        Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('+', '|', '-', '(', ')', '"', '*', ' ', ':')))
        .map(_.mkString))
    var seed = Seed(99L)
    (1 to 500).foreach { _ =>
      val s = garbage.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      SQS.parseLenient(s) // must not throw, result shape unconstrained
    }
  }
}
