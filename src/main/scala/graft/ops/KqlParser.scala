package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** KQL — the Kibana Query Language, the DEFAULT search-bar syntax of
  * the Kibana fronting the reference's OpenSearch downstream (reference
  * docker-compose.yml:33–55; every saved dashboard filter and alert
  * rule's bar query is KQL unless the user opts into Lucene). Distinct
  * from the Lucene `query_string` mini-language (QueryStringParser):
  * keywords are case-insensitive words (`and`/`or`/`not`), there is NO
  * implicit-AND adjacency, values may carry infix `*` wildcards, fields
  * take RANGE comparisons (`field >= 10`), and a field distributes over
  * a value group (`field:(a or b)` ≡ `field:a or field:b`).
  *
  * Supported grammar (the operative subset of KQL):
  * {{{
  *   query   := or
  *   or      := and (OR and)*
  *   and     := not (AND not)*
  *   not     := NOT not | primary
  *   primary := '(' query ')' | clause
  *   clause  := field ':' vexpr            // term / phrase / value group
  *            | field ('>='|'>'|'<='|'<') number
  *            | value                      // bare → default text field
  *   vexpr   := '(' vor ')' | value
  *   vor     := vand (OR vand)*
  *   vand    := vnot (AND vnot)*
  *   vnot    := NOT vnot | value
  *   value   := word (optional '*' wildcards) | '"' word+ '"'
  * }}}
  *
  * Compilation is Spark-first, the QueryStringParser discipline: every
  * clause becomes a boolean codegen Column. Keyword-field terms are
  * equality; wildcards become a codegen LIKE (`*` → `%`, literal `%`/`_`
  * escaped) whose literal prefix stays pushdown-eligible via Catalyst's
  * LikeSimplification; ranges are plain comparisons on typed columns;
  * default-field / text-field terms are token membership or
  * padded-phrase containment. Unknown fields fail at compile time
  * (lenient: false). No UDF anywhere. */
object KqlParser {

  sealed trait Node
  /** `value` may contain `*` wildcards; `field` None = default field. */
  final case class MatchQ(field: Option[String], value: String) extends Node
  final case class PhraseQ(field: Option[String], words: Seq[String]) extends Node
  final case class RangeQ(field: String, op: String, num: BigDecimal) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(n: Node) extends Node

  final case class ParseError(msg: String, pos: Int)
    extends IllegalArgumentException(s"kql parse error at $pos: $msg")

  // ------------------------------------------------------------------ lexer
  private sealed trait Tok { def pos: Int }
  private final case class TWord(s: String, pos: Int) extends Tok
  private final case class TQuoted(s: String, pos: Int) extends Tok
  private final case class TSym(s: String, pos: Int) extends Tok // ( ) : > >= < <=

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(' || c == ')' || c == ':') { out += TSym(c.toString, i); i += 1 }
      else if (c == '>' || c == '<') {
        if (i + 1 < q.length && q.charAt(i + 1) == '=') { out += TSym(s"$c=", i); i += 2 }
        else { out += TSym(c.toString, i); i += 1 }
      } else if (c == '"') {
        val end = q.indexOf('"', i + 1)
        if (end < 0) throw ParseError("unterminated phrase quote", i)
        out += TQuoted(q.substring(i + 1, end), i)
        i = end + 1
      } else {
        val start = i
        while (i < q.length && !q.charAt(i).isWhitespace &&
          "():\"<>".indexOf(q.charAt(i)) < 0) i += 1
        out += TWord(q.substring(start, i), start)
      }
    }
    out.result()
  }

  private def kw(t: Tok, w: String): Boolean = t match {
    case TWord(s, _) => s.equalsIgnoreCase(w)
    case _ => false
  }

  // ----------------------------------------------------------------- parser
  def parse(q: String): Node = {
    val toks = lex(q)
    var i = 0
    def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def pos: Int = peek.map(_.pos).getOrElse(q.length)

    def parseOr(): Node = {
      var l = parseAnd()
      while (peek.exists(kw(_, "or"))) { i += 1; l = Or(l, parseAnd()) }
      l
    }
    def parseAnd(): Node = {
      var l = parseNot()
      while (peek.exists(kw(_, "and"))) { i += 1; l = And(l, parseNot()) }
      l
    }
    def parseNot(): Node =
      if (peek.exists(kw(_, "not"))) { i += 1; Not(parseNot()) } else parsePrimary()

    def parsePrimary(): Node = peek match {
      case Some(TSym("(", _)) =>
        i += 1
        val n = parseOr()
        peek match {
          case Some(TSym(")", _)) => i += 1; n
          case _ => throw ParseError("expected ')'", pos)
        }
      case Some(TQuoted(s, p)) => i += 1; phraseOrTerm(None, s, p)
      case Some(TWord(w, p)) =>
        if (kw(toks(i), "and") || kw(toks(i), "or"))
          throw ParseError(s"expected clause, got '$w'", p)
        i += 1
        peek match {
          case Some(TSym(":", _)) => i += 1; parseVexpr(w)
          case Some(TSym(op, _)) if op == ">" || op == ">=" || op == "<" || op == "<=" =>
            i += 1
            peek match {
              case Some(TWord(n, np)) if n.nonEmpty && n.forall(c => c.isDigit || c == '.' || c == '-') =>
                i += 1; RangeQ(w, op, BigDecimal(n))
              case _ => throw ParseError(s"expected number after '$op'", pos)
            }
          case _ => MatchQ(None, w) // bare value → default field
        }
      case other => throw ParseError(s"expected clause, got $other", pos)
    }

    /** `field:` value or parenthesized value group (field distributes). */
    def parseVexpr(field: String): Node = {
      def vOr(): Node = {
        var l = vAnd()
        while (peek.exists(kw(_, "or"))) { i += 1; l = Or(l, vAnd()) }
        l
      }
      def vAnd(): Node = {
        var l = vNot()
        while (peek.exists(kw(_, "and"))) { i += 1; l = And(l, vNot()) }
        l
      }
      def vNot(): Node =
        if (peek.exists(kw(_, "not"))) { i += 1; Not(vNot()) } else vPrimary()
      def vPrimary(): Node = peek match {
        case Some(TSym("(", _)) =>
          i += 1
          val n = vOr()
          peek match {
            case Some(TSym(")", _)) => i += 1; n
            case _ => throw ParseError("expected ')'", pos)
          }
        case Some(TQuoted(s, p)) => i += 1; phraseOrTerm(Some(field), s, p)
        case Some(TWord(w, p)) =>
          if (kw(toks(i), "and") || kw(toks(i), "or"))
            throw ParseError(s"expected value, got '$w'", p)
          i += 1; MatchQ(Some(field), w)
        case other => throw ParseError(s"expected value after ':', got $other", pos)
      }
      // a single value or a parenthesized group; without parens, a
      // following or/and returns to the OUTER grammar (no distribution
      // — KQL semantics)
      vPrimary()
    }

    def phraseOrTerm(field: Option[String], s: String, p: Int): Node = {
      val ws = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (ws.isEmpty) throw ParseError("empty phrase", p)
      if (ws.length == 1) MatchQ(field, ws.head) else PhraseQ(field, ws)
    }

    val n = parseOr()
    if (i < toks.length) throw ParseError(s"trailing input ${toks(i)}", pos)
    n
  }

  // --------------------------------------------------------------- compiler
  /** `*`-wildcard value → SQL LIKE pattern (escape literal `%` `_` `\`). */
  private def likePattern(v: String): String =
    v.flatMap {
      case '*' => "%"
      case '%' => "\\%"
      case '_' => "\\_"
      case '\\' => "\\\\"
      case c => c.toString
    }

  /** Compile to a boolean Column. `textCol` is the default analyzed
    * full-text field (whitespace-tokenized, the corpus convention), also
    * addressable by name as `textField`; `keywordFields` /
    * `numericFields` map addressable field names to columns. Unknown
    * field names fail at compile time (KQL is not lenient). */
  def compile(n: Node, textCol: Column,
              keywordFields: Map[String, Column],
              numericFields: Map[String, Column],
              textField: String = "text"): Column = {
    val toks = split(trim(textCol), " ")
    val padded = concat(lit(" "), trim(textCol), lit(" "))
    def kwCol(f: String): Column = keywordFields.getOrElse(f,
      throw new IllegalArgumentException(s"kql: unknown keyword field '$f'"))
    def numCol(f: String): Column = numericFields.getOrElse(f,
      throw new IllegalArgumentException(s"kql: unknown numeric field '$f'"))
    def textMatch(v: String): Column =
      if (v.contains("*")) exists(toks, t => t.like(likePattern(v)))
      else array_contains(toks, v)
    def go(n: Node): Column = n match {
      case MatchQ(None, v) => textMatch(v)
      case MatchQ(Some(f), v) if f == textField => textMatch(v)
      case MatchQ(Some(f), v) =>
        if (v.contains("*")) kwCol(f).like(likePattern(v)) else kwCol(f) === lit(v)
      case PhraseQ(f, ws) if f.isEmpty || f.contains(textField) =>
        padded.contains(" " + ws.mkString(" ") + " ")
      case PhraseQ(Some(f), ws) => kwCol(f) === lit(ws.mkString(" "))
      case RangeQ(f, op, num) =>
        val v = if (num.isWhole) lit(num.toLongExact) else lit(num.toDouble)
        op match {
          case ">" => numCol(f) > v
          case ">=" => numCol(f) >= v
          case "<" => numCol(f) < v
          case "<=" => numCol(f) <= v
        }
      case And(l, r) => go(l) && go(r)
      case Or(l, r) => go(l) || go(r)
      case Not(x) => !go(x)
    }
    go(n)
  }
}
