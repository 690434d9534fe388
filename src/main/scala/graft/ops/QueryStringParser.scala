package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Lucene `query_string` mini-language (the Kibana search box the
  * reference's ES downstream serves; OpenSearch query DSL
  * `query_string`), as a recursive-descent parser producing a predicate
  * AST that compiles to Catalyst `Column` expressions.
  *
  * Supported grammar (the operative subset of Lucene syntax):
  * {{{
  *   query   := or
  *   or      := and (OR and)*
  *   and     := unary ((AND)? unary)*        // implicit operator = AND
  *   unary   := (NOT | '-') unary | primary
  *   primary := '(' query ')' | clause
  *   clause  := (field ':')? (word | word'*' | '"' word+ '"')
  * }}}
  *
  * Compilation is Spark-first: every clause becomes a boolean Column —
  * token membership / token prefix / padded-phrase containment on the
  * default text field, equality / prefix on keyword fields — so the
  * whole query stays inside whole-stage codegen and keyword-field
  * predicates remain eligible for scan pushdown. No UDF anywhere.
  */
object QueryStringParser {

  sealed trait Node
  final case class Term(field: Option[String], word: String) extends Node
  final case class Prefix(field: Option[String], prefix: String) extends Node
  final case class Phrase(field: Option[String], words: Seq[String]) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(n: Node) extends Node

  final case class ParseError(msg: String, pos: Int)
    extends IllegalArgumentException(s"query_string parse error at $pos: $msg")

  // ------------------------------------------------------------------ lexer
  private sealed trait Tok { def pos: Int }
  private final case class TWord(s: String, pos: Int) extends Tok
  private final case class TQuoted(s: String, pos: Int) extends Tok
  private final case class TOp(s: String, pos: Int) extends Tok // ( ) : - AND OR NOT

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(' || c == ')' || c == ':' || c == '-') {
        out += TOp(c.toString, i); i += 1
      } else if (c == '"') {
        val end = q.indexOf('"', i + 1)
        if (end < 0) throw ParseError("unterminated phrase quote", i)
        out += TQuoted(q.substring(i + 1, end), i)
        i = end + 1
      } else {
        val start = i
        while (i < q.length && !q.charAt(i).isWhitespace &&
          "():\"-".indexOf(q.charAt(i)) < 0) i += 1
        val w = q.substring(start, i)
        if (w == "AND" || w == "OR" || w == "NOT") out += TOp(w, start)
        else out += TWord(w, start)
      }
    }
    out.result()
  }

  // ----------------------------------------------------------------- parser
  def parse(q: String): Node = {
    val toks = lex(q)
    var i = 0
    def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def pos: Int = peek.map(_.pos).getOrElse(q.length)

    def parseOr(): Node = {
      var l = parseAnd()
      while (peek.exists { case TOp("OR", _) => true; case _ => false }) {
        i += 1; l = Or(l, parseAnd())
      }
      l
    }
    // implicit adjacency = AND (ES default_operator honored as AND here)
    def parseAnd(): Node = {
      var l = parseUnary()
      var cont = true
      while (cont) peek match {
        case Some(TOp("AND", _)) => i += 1; l = And(l, parseUnary())
        case Some(TOp("OR", _)) | Some(TOp(")", _)) | None => cont = false
        case Some(_) => l = And(l, parseUnary())
      }
      l
    }
    def parseUnary(): Node = peek match {
      case Some(TOp("NOT", _)) | Some(TOp("-", _)) => i += 1; Not(parseUnary())
      case _ => parsePrimary()
    }
    def parsePrimary(): Node = peek match {
      case Some(TOp("(", _)) =>
        i += 1
        val n = parseOr()
        peek match {
          case Some(TOp(")", _)) => i += 1; n
          case _ => throw ParseError("expected ')'", pos)
        }
      case Some(_: TWord) | Some(_: TQuoted) => parseClause()
      case other => throw ParseError(s"expected clause, got $other", pos)
    }
    def parseClause(): Node = {
      val field: Option[String] = peek match {
        case Some(TWord(f, _)) if i + 1 < toks.length &&
          toks(i + 1).isInstanceOf[TOp] && toks(i + 1).asInstanceOf[TOp].s == ":" =>
          i += 2; Some(f)
        case _ => None
      }
      peek match {
        case Some(TQuoted(s, p)) =>
          i += 1
          val ws = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
          if (ws.isEmpty) throw ParseError("empty phrase", p)
          if (ws.length == 1) Term(field, ws.head) else Phrase(field, ws)
        case Some(TWord(w, _)) =>
          i += 1
          if (w.endsWith("*") && w.length > 1) Prefix(field, w.dropRight(1))
          else if (w == "*") throw ParseError("bare wildcard not supported", pos)
          else Term(field, w)
        case other => throw ParseError(s"expected term after field, got $other", pos)
      }
    }

    val n = parseOr()
    if (i < toks.length) throw ParseError(s"trailing input ${toks(i)}", pos)
    n
  }

  // --------------------------------------------------------------- compiler
  /** Compile to a boolean Column. `textCol` is the default full-text
    * field (whitespace-tokenized, the corpus convention);
    * `keywordFields` maps field names usable as `field:term` to their
    * columns. Unknown field names fail at compile time, like ES with
    * `lenient: false`. (SimpleQueryString reuses this compiler over
    * the same AST.) */
  def compile(n: Node, textCol: Column, keywordFields: Map[String, Column]): Column = {
    val toks = split(trim(textCol), " ")
    val padded = concat(lit(" "), trim(textCol), lit(" "))
    def kw(f: String): Column = keywordFields.getOrElse(f,
      throw new IllegalArgumentException(s"query_string: unknown field '$f'"))
    def go(n: Node): Column = n match {
      case Term(None, w) => array_contains(toks, w)
      case Term(Some(f), w) => kw(f) === lit(w)
      case Prefix(None, p) => exists(toks, t => t.startsWith(p))
      case Prefix(Some(f), p) => kw(f).startsWith(p)
      case Phrase(None, ws) => padded.contains(" " + ws.mkString(" ") + " ")
      case Phrase(Some(f), ws) => kw(f) === lit(ws.mkString(" "))
      case And(l, r) => go(l) && go(r)
      case Or(l, r) => go(l) || go(r)
      case Not(x) => !go(x)
    }
    go(n)
  }
}

/** The ES `simple_query_string` query — the third search-box language
  * (query_string's user-safe sibling; Lucene SimpleQueryParser):
  * operators are symbols (`+` = AND, `|` = OR, `-` = NOT prefix),
  * quoted phrases and trailing-`*` prefixes as in query_string, bare
  * adjacency is the DEFAULT OPERATOR (OR, the ES default — where
  * query_string's adjacency is AND), there is NO `field:term` syntax
  * (fields come from the request, not the query text), and the parser
  * NEVER throws — ES documents it as "never throws an exception, and
  * discards invalid parts": end-user search boxes feed it raw input.
  *
  * Precedence: `-` > `+` > `|`/adjacency (`a + b | c` = `(a AND b) OR
  * c`). Parses onto QueryStringParser's AST and compiles through its
  * Column compiler, so the whole query is one boolean codegen
  * expression — the discipline is shared, only the surface grammar
  * differs. Leniency: a structurally-invalid query degrades to the OR
  * of its remaining plain words (syntax characters stripped), matching
  * none when no word survives. */
object SimpleQueryString {
  import QueryStringParser._

  private sealed trait Tok { def pos: Int }
  private final case class TWord(s: String, pos: Int) extends Tok
  private final case class TQuoted(s: String, pos: Int) extends Tok
  private final case class TOp(s: String, pos: Int) extends Tok // + | - ( )

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if ("+|-()".indexOf(c) >= 0) { out += TOp(c.toString, i); i += 1 }
      else if (c == '"') {
        val end = q.indexOf('"', i + 1)
        if (end < 0) throw ParseError("unterminated phrase quote", i)
        out += TQuoted(q.substring(i + 1, end), i)
        i = end + 1
      } else {
        val start = i
        while (i < q.length && !q.charAt(i).isWhitespace &&
          "+|-()\"".indexOf(q.charAt(i)) < 0) i += 1
        out += TWord(q.substring(start, i), start)
      }
    }
    out.result()
  }

  /** Strict parse onto the shared AST (throws ParseError on bad
    * syntax; use [[parseLenient]] for the ES contract). */
  def parse(q: String): Node = {
    val toks = lex(q)
    var i = 0
    def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def pos: Int = peek.map(_.pos).getOrElse(q.length)

    // or := and (('|' | adjacency) and)* — bare adjacency is OR, the
    // ES default_operator
    def parseOr(): Node = {
      var l = parseAnd()
      var cont = true
      while (cont) peek match {
        case Some(TOp("|", _)) => i += 1; l = Or(l, parseAnd())
        case Some(TOp(")", _)) | None => cont = false
        case Some(_) => l = Or(l, parseAnd())
      }
      l
    }
    def parseAnd(): Node = {
      var l = parseUnary()
      while (peek.exists { case TOp("+", _) => true; case _ => false }) {
        i += 1; l = And(l, parseUnary())
      }
      l
    }
    def parseUnary(): Node = peek match {
      case Some(TOp("-", _)) => i += 1; Not(parseUnary())
      case _ => parsePrimary()
    }
    def parsePrimary(): Node = peek match {
      case Some(TOp("(", _)) =>
        i += 1
        val n = parseOr()
        peek match {
          case Some(TOp(")", _)) => i += 1; n
          case _ => throw ParseError("expected ')'", pos)
        }
      case Some(TQuoted(s, p)) =>
        i += 1
        val ws = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
        if (ws.isEmpty) throw ParseError("empty phrase", p)
        if (ws.length == 1) Term(None, ws.head) else Phrase(None, ws)
      case Some(TWord(w, _)) =>
        i += 1
        if (w.endsWith("*") && w.length > 1) Prefix(None, w.dropRight(1))
        else if (w == "*") throw ParseError("bare wildcard not supported", pos)
        else Term(None, w)
      case other => throw ParseError(s"expected clause, got $other", pos)
    }

    val n = parseOr()
    if (i < toks.length) throw ParseError(s"trailing input ${toks(i)}", pos)
    n
  }

  /** The ES contract: never throws. Invalid syntax degrades to the OR
    * of the query's surviving plain words; None = nothing parseable
    * (ES matches no documents). */
  def parseLenient(q: String): Option[Node] =
    try Some(parse(q))
    catch {
      case _: ParseError =>
        val words = q.replaceAll("[+|()\"-]", " ").trim
          .split("\\s+").filter(w => w.nonEmpty && w != "*").toSeq
        words.map(w =>
          if (w.endsWith("*") && w.length > 1) Prefix(None, w.dropRight(1))
          else Term(None, w): Node)
          .reduceOption(Or.apply)
    }
}
