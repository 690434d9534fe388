package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized DIFFERENTIAL fuzzing for the four box languages.
  *
  * ParserLawsSpec pins render→parse round-trips; this suite pins
  * SEMANTICS: for random ASTs, the engine path (render → parse →
  * compile → Spark filter) must select exactly the same document ids
  * as an INDEPENDENT plain-Scala evaluator applied row-by-row to the
  * collected corpus — two implementations of the same spec, written
  * against different substrates, compared on matched-id sets. ≥200
  * seeds per language; any divergence ever found here should be added
  * below as a pinned regression case.
  *
  * The corpus is the real sf0.001 documents table, collected once and
  * re-wrapped as a local DataFrame so each of the ~800 filters runs
  * against a LocalTableScan (the differential exercises the
  * EXPRESSION, not the scan).
  */
class ParserDifferentialSpec extends SparkSpec {
  import graft.ops.{QueryStringParser => QS, KqlParser => KQL, SimpleQueryString => SQS}

  private case class Doc(doc_id: Long, text: String, lang: String,
                         source: String, n_chars: Long)

  private lazy val docs: Seq[Doc] =
    Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  private lazy val local: DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(docs.map(d =>
        Row(d.doc_id, d.text, d.lang, d.source, d.n_chars)): _*), schema)
  }

  private def engineIds(pred: Column): Set[Long] =
    local.filter(pred).select("doc_id").collect().map(_.getLong(0)).toSet

  // ------------------------------------------------------- shared gens
  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
    w = cs.mkString if !Set("and", "or", "not", "in", "like", "is").contains(w)
  } yield w
  // bias toward words that actually occur, or the differential only
  // ever compares empty sets
  private lazy val corpusWord: Gen[String] = {
    val common = docs.flatMap(_.text.trim.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).toSeq.sortBy(-_._2.size).take(40).map(_._1)
    Gen.frequency(3 -> Gen.oneOf(common), 1 -> word)
  }
  private lazy val langVal: Gen[String] =
    Gen.oneOf(docs.map(_.lang).distinct :+ "zz")
  private lazy val sourceVal: Gen[String] =
    Gen.oneOf(docs.map(_.source).distinct :+ "nowhere")
  private val field: Gen[Option[String]] =
    Gen.oneOf(None, Some("lang"), Some("source"))
  private def fieldVal(f: Option[String]): Gen[String] = f match {
    case Some("lang") => langVal
    case Some("source") => sourceVal
    case _ => corpusWord
  }
  private lazy val words2: Gen[Seq[String]] = for {
    n <- Gen.chooseNum(2, 3)
    // adjacent corpus words sometimes form real phrases via doc text
    d <- Gen.oneOf(docs)
    start <- Gen.chooseNum(0, math.max(0, d.text.trim.split(" ", -1).length - 3))
    real <- Gen.oneOf(true, false)
    ws <- Gen.listOfN(n, corpusWord)
  } yield if (real) {
    val toks = d.text.trim.split(" ", -1).toSeq
    toks.slice(start, math.min(start + n, toks.length)) match {
      case s if s.nonEmpty => s
      case _ => ws.toSeq
    }
  } else ws.toSeq

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

  // --------------------------------------- independent QS/SQS evaluator
  private def evalQs(n: QS.Node, d: Doc): Boolean = {
    val toks = d.text.trim.split(" ", -1).toSeq
    val padded = " " + d.text.trim + " "
    def kw(f: String): String = f match {
      case "lang" => d.lang; case "source" => d.source
      case other => sys.error(s"unknown field $other")
    }
    n match {
      case QS.Term(None, w) => toks.contains(w)
      case QS.Term(Some(f), w) => kw(f) == w
      case QS.Prefix(None, p) => toks.exists(_.startsWith(p))
      case QS.Prefix(Some(f), p) => kw(f).startsWith(p)
      case QS.Phrase(None, ws) => padded.contains(" " + ws.mkString(" ") + " ")
      case QS.Phrase(Some(f), ws) => kw(f) == ws.mkString(" ")
      case QS.And(l, r) => evalQs(l, d) && evalQs(r, d)
      case QS.Or(l, r) => evalQs(l, d) || evalQs(r, d)
      case QS.Not(x) => !evalQs(x, d)
    }
  }

  private val kwCols = Map("lang" -> col("lang"), "source" -> col("source"))

  private def qsLeaf: Gen[QS.Node] = Gen.frequency(
    4 -> (for { f <- field; w <- fieldVal(f) } yield QS.Term(f, w): QS.Node),
    2 -> (for { f <- field; w <- fieldVal(f); k <- Gen.chooseNum(1, 3) }
      yield QS.Prefix(f, w.take(k)): QS.Node),
    2 -> (for { f <- field; ws <- words2 } yield QS.Phrase(f, ws): QS.Node))

  private def renderQs(n: QS.Node): String = n match {
    case QS.Term(f, w) => f.map(_ + ":").getOrElse("") + w
    case QS.Prefix(f, p) => f.map(_ + ":").getOrElse("") + p + "*"
    case QS.Phrase(f, ws) => f.map(_ + ":").getOrElse("") + "\"" + ws.mkString(" ") + "\""
    case QS.And(l, r) => s"(${renderQs(l)} AND ${renderQs(r)})"
    case QS.Or(l, r) => s"(${renderQs(l)} OR ${renderQs(r)})"
    case QS.Not(x) => s"(NOT ${renderQs(x)})"
  }

  test("query_string: engine filter and independent evaluator agree on 250 random queries") {
    val gen = sized[QS.Node](qsLeaf, QS.And.apply, QS.Or.apply, QS.Not.apply)(3)
    var seed = Seed(42L)
    var nonEmpty = 0
    (1 to 250).foreach { _ =>
      val ast = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val text = renderQs(ast)
      val got = engineIds(QS.compile(QS.parse(text), col("text"), kwCols))
      val want = docs.filter(evalQs(ast, _)).map(_.doc_id).toSet
      assert(got == want,
        s"query_string diverged on: $text\n missing=${want -- got} extra=${got -- want}")
      if (want.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 50, s"only $nonEmpty queries matched anything — fuzz too weak")
  }

  test("simple_query_string: engine and evaluator agree on 250 random queries") {
    val leaf: Gen[QS.Node] = Gen.frequency(
      4 -> corpusWord.map(w => QS.Term(None, w): QS.Node),
      2 -> (for { w <- corpusWord; k <- Gen.chooseNum(1, 3) }
        yield QS.Prefix(None, w.take(k)): QS.Node),
      2 -> words2.map(ws => QS.Phrase(None, ws): QS.Node))
    val gen = sized[QS.Node](leaf, QS.And.apply, QS.Or.apply, QS.Not.apply)(3)
    def render(n: QS.Node): String = n match {
      case QS.Term(_, w) => w
      case QS.Prefix(_, p) => p + "*"
      case QS.Phrase(_, ws) => "\"" + ws.mkString(" ") + "\""
      case QS.And(l, r) => s"(${render(l)} + ${render(r)})"
      case QS.Or(l, r) => s"(${render(l)} | ${render(r)})"
      case QS.Not(x) => s"(-${render(x)})"
      case other => sys.error(s"unreachable: $other")
    }
    var seed = Seed(43L)
    var nonEmpty = 0
    (1 to 250).foreach { _ =>
      val ast = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val text = render(ast)
      val got = engineIds(QS.compile(SQS.parse(text), col("text"), Map.empty))
      val want = docs.filter(evalQs(ast, _)).map(_.doc_id).toSet
      assert(got == want,
        s"simple_query_string diverged on: $text\n missing=${want -- got} extra=${got -- want}")
      if (want.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 50, s"only $nonEmpty queries matched anything — fuzz too weak")
  }

  // ---------------------------------------------- independent KQL eval
  private def wildcardMatch(pattern: String, v: String): Boolean = {
    val rx = pattern.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
    v.matches(rx)
  }

  private def evalKql(n: KQL.Node, d: Doc): Boolean = {
    val toks = d.text.trim.split(" ", -1).toSeq
    val padded = " " + d.text.trim + " "
    def kw(f: String): String = f match {
      case "lang" => d.lang; case "source" => d.source
      case other => sys.error(s"unknown field $other")
    }
    def textMatch(v: String): Boolean =
      if (v.contains("*")) toks.exists(wildcardMatch(v, _)) else toks.contains(v)
    n match {
      case KQL.MatchQ(None, v) => textMatch(v)
      case KQL.MatchQ(Some("text"), v) => textMatch(v)
      case KQL.MatchQ(Some(f), v) =>
        if (v.contains("*")) wildcardMatch(v, kw(f)) else kw(f) == v
      case KQL.PhraseQ(f, ws) if f.isEmpty || f.contains("text") =>
        padded.contains(" " + ws.mkString(" ") + " ")
      case KQL.PhraseQ(Some(f), ws) => kw(f) == ws.mkString(" ")
      case KQL.RangeQ(_, op, num) => op match {
        case ">" => BigDecimal(d.n_chars) > num
        case ">=" => BigDecimal(d.n_chars) >= num
        case "<" => BigDecimal(d.n_chars) < num
        case "<=" => BigDecimal(d.n_chars) <= num
      }
      case KQL.And(l, r) => evalKql(l, d) && evalKql(r, d)
      case KQL.Or(l, r) => evalKql(l, d) || evalKql(r, d)
      case KQL.Not(x) => !evalKql(x, d)
    }
  }

  test("kql: engine filter and independent evaluator agree on 250 random queries") {
    val wildcardWord: Gen[String] = for {
      w <- corpusWord; pos <- Gen.oneOf(0, 1, 2, 3)
    } yield pos match {
      case 0 => w.take(3) + "*"
      case 1 => "*" + w.drop(math.max(0, w.length - 3))
      case 2 => if (w.length >= 2) w.take(1) + "*" + w.takeRight(1) else w + "*"
      case _ => w
    }
    val nBound: Gen[BigDecimal] = {
      val lo = docs.map(_.n_chars).min
      val hi = docs.map(_.n_chars).max
      Gen.chooseNum(lo - 5, hi + 5).map(BigDecimal(_))
    }
    val leaf: Gen[KQL.Node] = Gen.frequency(
      4 -> (for { f <- Gen.oneOf(None, Some("text"), Some("lang"), Some("source"))
                  v <- if (f.forall(_ == "text")) wildcardWord
                       else fieldVal(f) } yield KQL.MatchQ(f, v): KQL.Node),
      2 -> (for { f <- Gen.oneOf(None, Some("text"), Some("lang"))
                  ws <- words2 } yield KQL.PhraseQ(f, ws): KQL.Node),
      2 -> (for { op <- Gen.oneOf(">", ">=", "<", "<=")
                  n <- nBound } yield KQL.RangeQ("n_chars", op, n): KQL.Node))
    val gen = sized[KQL.Node](leaf, KQL.And.apply, KQL.Or.apply, KQL.Not.apply)(3)
    def render(n: KQL.Node): String = n match {
      case KQL.MatchQ(f, v) => f.map(_ + ":").getOrElse("") + v
      case KQL.PhraseQ(f, ws) => f.map(_ + ":").getOrElse("") + "\"" + ws.mkString(" ") + "\""
      case KQL.RangeQ(f, op, num) => s"$f $op $num"
      case KQL.And(l, r) => s"(${render(l)} and ${render(r)})"
      case KQL.Or(l, r) => s"(${render(l)} or ${render(r)})"
      case KQL.Not(x) => s"(not ${render(x)})"
    }
    var seed = Seed(44L)
    var nonEmpty = 0
    (1 to 250).foreach { _ =>
      val ast = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val text = render(ast)
      val pred = KQL.compile(KQL.parse(text), col("text"), kwCols,
        Map("n_chars" -> col("n_chars")))
      val got = engineIds(pred)
      val want = docs.filter(evalKql(ast, _)).map(_.doc_id).toSet
      assert(got == want,
        s"kql diverged on: $text\n missing=${want -- got} extra=${got -- want}")
      if (want.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 50, s"only $nonEmpty queries matched anything — fuzz too weak")
  }

  // ------------------------------------- independent ES|QL WHERE eval
  // Typed generation: numeric exprs over (n_chars, doc_id, small
  // literals) with +/-/* and % by nonzero literals (ANSI-safe — no /,
  // no overflow at these magnitudes); string exprs over lang/source;
  // comparisons, IN, LIKE, NOT/AND/OR on top. The evaluator is exact
  // Long/String arithmetic — ES|QL and plain Scala must agree.
  import graft.ops.{EsqlParser => E}

  private sealed trait NumExpr
  private case object NChars extends NumExpr
  private case object DocId extends NumExpr
  private case class NumC(v: Long) extends NumExpr
  private case class NumBin(op: String, l: NumExpr, r: NumExpr) extends NumExpr
  private case class NumNeg(x: NumExpr) extends NumExpr
  private case object LenLang extends NumExpr

  private def numGen(depth: Int): Gen[NumExpr] =
    if (depth <= 0) Gen.frequency(
      3 -> Gen.const(NChars), 2 -> Gen.const(DocId),
      3 -> Gen.chooseNum(-100L, 100L).map(NumC.apply),
      1 -> Gen.const(LenLang))
    else Gen.frequency(
      3 -> numGen(0),
      2 -> (for { op <- Gen.oneOf("+", "-", "*")
                  l <- numGen(depth - 1); r <- numGen(depth - 1) } yield NumBin(op, l, r)),
      1 -> (for { l <- numGen(depth - 1); m <- Gen.chooseNum(2L, 50L) }
        yield NumBin("%", l, NumC(m))),
      // nonzero literal divisor (this evaluator computes in plain Long
      // space — EsqlDivide's x/0 → null contract is exercised by the
      // Option-space pipeline fuzzer and the r16 advice pin); integral
      // operands, so this pins EsqlDivide's truncating contract
      1 -> (for { l <- numGen(depth - 1); m <- Gen.chooseNum(2L, 50L) }
        yield NumBin("/", l, NumC(m))),
      1 -> numGen(depth - 1).map(NumNeg.apply))

  private def numToEsql(e: NumExpr): String = e match {
    case NChars => "n_chars"
    case DocId => "doc_id"
    case NumC(v) => if (v < 0) s"(- ${-v})" else v.toString
    case NumBin(op, l, r) => s"(${numToEsql(l)} $op ${numToEsql(r)})"
    case NumNeg(x) => s"(- ${numToEsql(x)})"
    case LenLang => "LENGTH(lang)"
  }

  private def evalNum(e: NumExpr, d: Doc): Long = e match {
    case NChars => d.n_chars
    case DocId => d.doc_id
    case NumC(v) => v
    case NumBin("+", l, r) => evalNum(l, d) + evalNum(r, d)
    case NumBin("-", l, r) => evalNum(l, d) - evalNum(r, d)
    case NumBin("*", l, r) => evalNum(l, d) * evalNum(r, d)
    case NumBin("%", l, r) => evalNum(l, d) % evalNum(r, d)
    case NumBin("/", l, r) => evalNum(l, d) / evalNum(r, d) // integral: truncates like ES|QL
    case NumBin(op, _, _) => sys.error(s"unexpected $op")
    case NumNeg(x) => -evalNum(x, d)
    case LenLang => d.lang.length.toLong
  }

  private sealed trait BoolExpr
  private case class NumCmp(op: String, l: NumExpr, r: NumExpr) extends BoolExpr
  private case class StrCmp(eq: Boolean, f: String, v: String) extends BoolExpr
  private case class StrLikeE(f: String, prefix: String) extends BoolExpr
  private case class NumIn(e: NumExpr, vs: Seq[Long]) extends BoolExpr
  private case class StrIn(f: String, vs: Seq[String]) extends BoolExpr
  private case class BoolBin(and: Boolean, l: BoolExpr, r: BoolExpr) extends BoolExpr
  private case class BoolNot(x: BoolExpr) extends BoolExpr

  private def boolGen(depth: Int): Gen[BoolExpr] = {
    val leaf: Gen[BoolExpr] = Gen.frequency(
      4 -> (for { op <- Gen.oneOf("==", "!=", ">=", "<=", ">", "<")
                  l <- numGen(2); r <- numGen(2) } yield NumCmp(op, l, r)),
      2 -> (for { eq <- Gen.oneOf(true, false); f <- Gen.oneOf("lang", "source")
                  v <- if (f == "lang") langVal else sourceVal }
        yield StrCmp(eq, f, v)),
      1 -> (for { f <- Gen.oneOf("lang", "source")
                  v <- if (f == "lang") langVal else sourceVal
                  k <- Gen.chooseNum(1, 2) } yield StrLikeE(f, v.take(k))),
      1 -> (for { e <- numGen(1); vs <- Gen.listOfN(3, Gen.chooseNum(-50L, 300L)) }
        yield NumIn(e, vs.toSeq)),
      1 -> (for { f <- Gen.oneOf("lang", "source")
                  vs <- Gen.listOfN(2, if (f == "lang") langVal else sourceVal) }
        yield StrIn(f, vs.toSeq)))
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for { and <- Gen.oneOf(true, false)
                  l <- boolGen(depth - 1); r <- boolGen(depth - 1) }
        yield BoolBin(and, l, r)),
      1 -> boolGen(depth - 1).map(BoolNot.apply))
  }

  private def boolToEsql(e: BoolExpr): String = e match {
    case NumCmp(op, l, r) => s"(${numToEsql(l)} $op ${numToEsql(r)})"
    case StrCmp(eq, f, v) => s"($f ${if (eq) "==" else "!="} ${"\"" + v + "\""})"
    case StrLikeE(f, p) => s"($f LIKE ${"\"" + p + "*\""})"
    case NumIn(x, vs) => s"(${numToEsql(x)} IN (${vs.mkString(", ")}))"
    case StrIn(f, vs) => s"($f IN (${vs.map("\"" + _ + "\"").mkString(", ")}))"
    case BoolBin(and, l, r) => s"(${boolToEsql(l)} ${if (and) "AND" else "OR"} ${boolToEsql(r)})"
    case BoolNot(x) => s"(NOT ${boolToEsql(x)})"
  }

  private def evalBool(e: BoolExpr, d: Doc): Boolean = e match {
    case NumCmp(op, l, r) =>
      val (a, b) = (evalNum(l, d), evalNum(r, d))
      op match {
        case "==" => a == b; case "!=" => a != b; case ">=" => a >= b
        case "<=" => a <= b; case ">" => a > b; case "<" => a < b
      }
    case StrCmp(eq, f, v) =>
      val fv = if (f == "lang") d.lang else d.source
      if (eq) fv == v else fv != v
    case StrLikeE(f, p) =>
      (if (f == "lang") d.lang else d.source).startsWith(p)
    case NumIn(x, vs) => vs.contains(evalNum(x, d))
    case StrIn(f, vs) => vs.contains(if (f == "lang") d.lang else d.source)
    case BoolBin(true, l, r) => evalBool(l, d) && evalBool(r, d)
    case BoolBin(false, l, r) => evalBool(l, d) || evalBool(r, d)
    case BoolNot(x) => !evalBool(x, d)
  }

  test("esql WHERE: engine pipeline and independent evaluator agree on 250 random exprs") {
    var seed = Seed(45L)
    var nonEmpty = 0
    var viaParams = 0
    (1 to 250).foreach { round =>
      val ast = boolGen(3).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      // every third round routes the expression's numeric literals
      // through ?request-parameters instead of inline text — the param
      // substitution path must be semantics-invisible
      val useParams = round % 3 == 0
      val bound = scala.collection.mutable.Map.empty[String, E.Expr]
      def litText(v: Long): String = // IN-element form: bare sign, no parens
        if (useParams) {
          val n = s"p${bound.size}"
          bound(n) = E.NumLit(BigDecimal(v))
          s"?$n"
        } else v.toString
      def numText(v: Long): String = // expression form: parenthesized Neg
        if (useParams) litText(v)
        else if (v < 0) s"(- ${-v})" else v.toString
      def numToText(e: NumExpr): String = e match {
        case NChars => "n_chars"
        case DocId => "doc_id"
        case NumC(v) => numText(v)
        case NumBin(op, l, r) => s"(${numToText(l)} $op ${numToText(r)})"
        case NumNeg(x) => s"(- ${numToText(x)})"
        case LenLang => "LENGTH(lang)"
      }
      def boolToText(e: BoolExpr): String = e match {
        case NumCmp(op, l, r) => s"(${numToText(l)} $op ${numToText(r)})"
        case NumIn(x, vs) => s"(${numToText(x)} IN (${vs.map(litText).mkString(", ")}))"
        case StrCmp(eq, f, v) => s"($f ${if (eq) "==" else "!="} ${"\"" + v + "\""})"
        case StrLikeE(f, p) => s"($f LIKE ${"\"" + p + "*\""})"
        case StrIn(f, vs) => s"($f IN (${vs.map("\"" + _ + "\"").mkString(", ")}))"
        case BoolBin(and, l, r) => s"(${boolToText(l)} ${if (and) "AND" else "OR"} ${boolToText(r)})"
        case BoolNot(x) => s"(NOT ${boolToText(x)})"
      }
      val text = boolToText(ast)
      val got = E.run(s"FROM docs | WHERE $text | KEEP doc_id", _ => local,
        params = bound.toMap)
        .collect().map(_.getLong(0)).toSet
      val want = docs.filter(evalBool(ast, _)).map(_.doc_id).toSet
      assert(got == want,
        s"esql diverged on: $text (params=$bound)\n missing=${want -- got} extra=${got -- want}")
      if (want.nonEmpty) nonEmpty += 1
      if (useParams && bound.nonEmpty) viaParams += 1
    }
    assert(nonEmpty >= 50, s"only $nonEmpty exprs matched anything — fuzz too weak")
    assert(viaParams >= 30, s"only $viaParams exprs exercised the params path")
  }

  // -------------------------------------------- r19: fulltext trio fuzz
  // MATCH_PHRASE / MULTI_MATCH / TERM (the r18 function-audit closures)
  // over a corpus built to hit exactly the classes the r18 second
  // review pass caught by hand: multi-space runs, empty and
  // whitespace-only fields, leading/trailing whitespace, empty query
  // values, tab-bearing fields (the analyzers split on SPACES, so a tab
  // is token glue). The mirror re-implements each documented contract
  // in plain Scala. Spark's trim() strips SPACES only — the mirror's
  // spaceTrim matches that, NOT String.trim (which also eats tabs).
  private def spaceTrim(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  /** MATCH: any query term present among the field's single-space
    * tokens (engine: arrays_overlap over split(trim(f), " ")). */
  private def mirMatch(f: String, q: String): Boolean = {
    val terms = q.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    if (terms.isEmpty) false
    else spaceTrim(f).split(" ", -1).toSet.intersect(terms.toSet).nonEmpty
  }
  /** MATCH_PHRASE: the \s+-normalized query terms appear consecutively
    * in the field's LITERAL single-space spelling (space-padded
    * containment — the engine's stated deviation from ES's
    * position-based phrase). */
  private def mirPhrase(f: String, q: String): Boolean = {
    val terms = q.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    if (terms.isEmpty) false
    else (" " + spaceTrim(f) + " ").contains(" " + terms.mkString(" ") + " ")
  }
  /** TERM: the wholly-empty field carries the one "" keyword; any other
    * field's terms are its nonempty space-run tokens, matched verbatim. */
  private def mirTerm(f: String, v: String): Boolean =
    if (f == "") v == ""
    else f.split(" +", -1).filter(_.nonEmpty).contains(v)

  test("r19: 320 random fulltext-trio predicates — engine ids == plain-Scala contract mirror") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(919919L)
    val words = Seq("table", "scan", "vector", "index", "merge", "Scan", "a", "b")
    def field(): String = rnd.nextInt(10) match {
      case 0 => ""
      case 1 => " "
      case 2 => "  "
      case 3 => " " * rnd.nextInt(3) + words(rnd.nextInt(words.size)) + " " * rnd.nextInt(3)
      case 4 => words(rnd.nextInt(words.size)) + "  " + words(rnd.nextInt(words.size))
      case 5 => words(rnd.nextInt(words.size)) + "\t" + words(rnd.nextInt(words.size))
      case _ => (0 until 1 + rnd.nextInt(4))
        .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    }
    val fdocs = (0 until 48).map(i => (i.toLong, field(), field()))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("t1", StringType, nullable = false),
      StructField("t2", StringType, nullable = false)))
    val fdf = spark.createDataFrame(
      java.util.Arrays.asList(fdocs.map(d => Row(d._1, d._2, d._3)): _*), schema)
    def queryVal(): String = rnd.nextInt(8) match {
      case 0 => ""
      case 1 => " "
      case 2 => "  "
      case 3 => words(rnd.nextInt(words.size))
      case 4 => words(rnd.nextInt(words.size)) + " " + words(rnd.nextInt(words.size))
      case 5 => words(rnd.nextInt(words.size)) + "  " + words(rnd.nextInt(words.size))
      case _ => " " + words(rnd.nextInt(words.size)) + " "
    }
    var nonEmpty = 0
    (1 to 320).foreach { i =>
      val q = queryVal()
      val fld = if (rnd.nextBoolean()) "t1" else "t2"
      val (pred, eval) = rnd.nextInt(4) match {
        case 0 => (s"""MATCH($fld, "$q")""",
          (d: (Long, String, String)) => mirMatch(if (fld == "t1") d._2 else d._3, q))
        case 1 => (s"""MATCH_PHRASE($fld, "$q")""",
          (d: (Long, String, String)) => mirPhrase(if (fld == "t1") d._2 else d._3, q))
        case 2 => (s"""MULTI_MATCH("$q", t1, t2)""",
          (d: (Long, String, String)) => mirMatch(d._2, q) || mirMatch(d._3, q))
        case _ => (s"""TERM($fld, "$q")""",
          (d: (Long, String, String)) => mirTerm(if (fld == "t1") d._2 else d._3, q))
      }
      val got = graft.ops.EsqlParser.run(
        s"FROM d | WHERE $pred | KEEP id", { case "d" => fdf },
        session = Some(spark)).collect().map(_.getLong(0)).toSet
      val want = fdocs.filter(eval).map(_._1).toSet
      assert(got == want,
        s"fulltext trio diverged (round $i) on: $pred\n" +
          s" missing=${want -- got} extra=${got -- want}")
      if (want.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 80, s"only $nonEmpty predicates matched anything — fuzz too weak")
  }

  test("r19: MATCH_PHRASE literal-spacing deviation pinned — a multi-space field run does NOT phrase-match") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("t", StringType, nullable = false)))
    val fdf = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "table scan"), Row(2L, "table  scan"), Row(3L, " table scan ")), schema)
    def ids(q: String): Set[Long] = graft.ops.EsqlParser.run(
      q, { case "d" => fdf }, session = Some(spark))
      .collect().map(_.getLong(0)).toSet
    // ES's phrase query is POSITION-based: all three docs would match.
    // This dialect analyzes the field on its literal single-space
    // spelling (stated deviation, EsqlParser MATCH_PHRASE scaladoc):
    // the multi-space run in doc 2 does not phrase-match, while edge
    // whitespace (doc 3) trims away and does.
    assert(ids("""FROM d | WHERE MATCH_PHRASE(t, "table scan") | KEEP id""")
      == Set(1L, 3L))
    // the QUERY side normalizes on \s+, so a multi-space QUERY still
    // matches the single-space field
    assert(ids("""FROM d | WHERE MATCH_PHRASE(t, "table  scan") | KEEP id""")
      == Set(1L, 3L))
  }
}
