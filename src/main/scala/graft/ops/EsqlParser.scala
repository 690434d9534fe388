package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES|QL — Elastic's piped query language (the successor surface to the
  * query DSL: `FROM index | WHERE … | STATS … BY …`), which Kibana
  * Discover now exposes as a first-class mode alongside KQL/Lucene. A
  * user of the reference's downstream writes these against the same
  * data this engine serves, so the engine owns a compiler for the
  * operative subset. Unlike the three search-box grammars (boolean
  * predicates over one default field), ES|QL is a full pipeline algebra
  * — which is exactly Spark's: each source command maps 1:1 onto a
  * DataFrame transformation and Catalyst owns optimization (a WHERE
  * after an EVAL still pushes to the scan when it only touches scan
  * columns; STATS becomes a partial-aggregated hash aggregate; SORT +
  * LIMIT fuse into TakeOrderedAndProject).
  *
  * Supported grammar (the operative subset):
  * {{{
  *   query    := (FROM | TS) ident (',' ident)* ('|' command)*  // multi-index union
  *             // TS = time-series mode: STATS aggs may wrap RATE, *_OVER_TIME
  *   command  := WHERE expr
  *             | EVAL ident '=' expr (',' ident '=' expr)*
  *             | STATS agg (',' agg)* [BY ident (',' ident)*]
  *             | INLINESTATS agg (',' agg)* [BY …]  // non-collapsing (window)
  *             | SORT ident [ASC|DESC] [NULLS FIRST|LAST] (',' …)*
  *             | LIMIT int
  *             | KEEP ident['*'] (',' ident['*'])*     // trailing wildcard
  *             | DROP ident['*'] (',' ident['*'])*
  *             | RENAME ident AS ident (',' ident AS ident)*
  *             | DISSECT ident string          // "%{key} lit %{key}…"
  *             | GROK ident string             // "%{IP:name} %{INT:n:int}…"
  *             | ENRICH ident ON ident [WITH ident (',' ident)*]
  *             | LOOKUP JOIN ident ON ident
  *             | MV_EXPAND ident
  *             | CHANGE_POINT ident ON ident [AS ident ',' ident]
  *             | SAMPLE number [ON ident]   // deterministic md5 bucket
  *             | FORK '(' command ('|' command)* ')' …   // ≥ 2 branches
  *             | FUSE ON ident RANK ident   // RRF over FORK pages
  *   query    may also start with `ROW ident '=' expr (',' …)*` — the
  *            literal one-row source (constant pipelines)
  *   agg      := [ident '='] aggfn [WHERE expr]   // per-aggregate filter
  *   aggfn    := COUNT '(' '*' | expr ')' | COUNT_DISTINCT '(' expr ')'
  *             | SUM|MIN|MAX|AVG|MEDIAN '(' expr ')'
  *   expr     := or; or := and (OR and)*; and := unary (AND unary)*
  *   unary    := NOT unary | cmp
  *   cmp      := add (('=='|'!='|'>='|'<='|'>'|'<') add
  *                    | LIKE string | RLIKE string
  *                    | IN '(' lit (',' lit)* ')'
  *                    | IS [NOT] NULL)?
  *   add      := mul (('+'|'-') mul)*; mul := prim (('*'|'/'|'%') prim)*
  *   prim     := '(' expr ')' | '-' prim | number | string | ident
  *             | fn '(' args ')'     // ROUND ABS LENGTH CONCAT SUBSTRING
  *                                   // TO_LONG TO_STRING TO_DOUBLE
  *                                   // TO_INTEGER TO_BOOLEAN COALESCE
  *                                   // SPLIT TO_LOWER TO_UPPER TRIM
  *                                   // BUCKET CASE STARTS_WITH ENDS_WITH
  *                                   // LOCATE REPLACE LEFT RIGHT
  *                                   // GREATEST LEAST POW SQRT FLOOR
  *                                   // CEIL LOG LOG10 EXP SIGNUM
  *                                   // MV_COUNT MV_MIN MV_MAX MV_SUM
  *                                   // MV_AVG MV_DEDUPE MV_SORT
  *                                   // MV_FIRST MV_LAST MV_SLICE
  *                                   // MV_CONCAT MV_APPEND
  *                                   // MATCH QSTR KQL (full-text — the
  *                                   //   engine's own three parsers)
  * }}}
  *
  * The structured-extraction commands each evaluate their pattern ONCE
  * per row behind a Generate barrier (PlanSpec-locked — without it,
  * predicate pushdown inlines the pattern into every referencing
  * predicate and branch): DISSECT runs the NATIVE linear delimiter
  * walk (graftshim DissectExtract — ES dissect's actual indexOf
  * scanner, zero backtracking; `%{?skip}`/`%{}` consume without
  * capturing, `->` right-pads, dissectRegex stays as the semantic twin
  * ParserLawsSpec checks parity against); GROK substitutes a
  * dictionary of named sub-patterns (`%{IP:name}`, with ES's
  * `:int`/`:long`/`:float` type suffixes becoming casts) into what is
  * otherwise a raw regex, unanchored find() like ES, on the one-pass
  * multi-group RegExpExtractStruct. ENRICH is ES's lookup-policy join:
  * a broadcast LEFT join against the policy dimension (unmatched rows
  * keep null enrich fields), exactly how the policy's .enrich index
  * behaves at query time; LOOKUP JOIN is its 8.18 successor keyed on
  * the shared field name. MV_EXPAND is `explode_outer` (null/empty
  * multivalues keep their row, as in ES).
  *
  * Compilation discipline: every expression becomes a codegen Column
  * (LIKE wildcards via the KQL `*`→`%` escape path — literal prefixes
  * stay pushdown-eligible), every agg a built-in aggregate. No UDF
  * anywhere; determinism rides on the same integer-exactness rules as
  * the rest of the registry (the fixed queries aggregate exact longs).
  */
object EsqlParser {

  // ------------------------------------------------------------------- AST
  sealed trait Expr
  final case class Ident(name: String) extends Expr
  final case class NumLit(v: BigDecimal) extends Expr
  final case class StrLit(s: String) extends Expr
  // [1, 2.5, -3] — ES|QL's bracketed MULTIVALUE literal (numeric
  // scope): an array<long> when every element is whole, else
  // array<double>; also the KNN query-vector form
  final case class ArrLit(values: Seq[BigDecimal]) extends Expr
  /** A pinned instant (epoch micros) — the value a `?param` of timestamp
    * type binds to. ES|QL's request parameters are how a client says
    * "now" DETERMINISTICALLY: the coordinator pins the instant once per
    * request (`?_tstart`-style params) and every shard replays the same
    * literal; this engine takes the same stance instead of a wall-clock
    * NOW() whose results could never replay byte-equal. */
  final case class TsLit(epochMicros: Long) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class Like(e: Expr, pattern: String) extends Expr
  final case class RLike(e: Expr, pattern: String) extends Expr
  final case class In(e: Expr, values: Seq[Expr]) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  final case class Func(name: String, args: Seq[Expr]) extends Expr
  /** A time-span literal (`1 day`, `4 hours`) — valid only where a span
    * is expected (DATE_TRUNC's first argument). */
  final case class SpanLit(n: Long, unit: String) extends Expr

  sealed trait Agg
  final case class CountAll(filter: Option[Expr] = None) extends Agg
  // count/sum/min/max/avg/median/count_distinct, each with ES|QL 8.16's
  // optional per-aggregate `WHERE` filter
  final case class AggFn(fn: String, e: Expr, filter: Option[Expr] = None) extends Agg
  /** `TOP(field, k, "asc"|"desc")` — the top-k-values aggregate
    * (repeats included, multivalued result). */
  final case class AggTop(e: Expr, k: Int, desc: Boolean) extends Agg
  /** `PERCENTILE(field, p)` with p in [0, 100] — exact linear
    * interpolation over the sorted values. */
  final case class AggPercentile(e: Expr, p: BigDecimal) extends Agg
  /** `WEIGHTED_AVG(value, weight)`. */
  final case class AggWavg(v: Expr, w: Expr) extends Agg

  sealed trait Cmd
  // FROM idx1[, idx2, …] [METADATA _index] — a multi-index query unions
  // the resolved frames by name (ES's comma-separated index list);
  // METADATA _index attaches each row's source index name — the
  // disambiguator that makes the multi-index union navigable. _id /
  // _version / _score are rejected by name (no doc-store identity here).
  final case class From(tables: Seq[String], metadata: Seq[String] = Nil) extends Cmd
  /** `TS index` — the 9.x time-series source mode: resolves like FROM
    * but marks the pipeline as operating over a TSDB index, enabling
    * the RATE / *_OVER_TIME inner aggregates inside STATS. */
  final case class TsFrom(tables: Seq[String]) extends Cmd
  final case class Where(e: Expr) extends Cmd
  final case class Eval(assigns: Seq[(String, Expr)]) extends Cmd
  // byAssigns: `BY name = expr` grouping expressions (computed before the
  // aggregate — ES|QL's inline grouping form, e.g. BY b = BUCKET(ts, 3600000))
  final case class Stats(aggs: Seq[(String, Agg)], by: Seq[String],
                         byAssigns: Seq[(String, Expr)] = Nil) extends Cmd
  // INLINESTATS — STATS that does NOT collapse: the aggregates attach
  // as new columns on every row of their group (8.16)
  final case class InlineStats(aggs: Seq[(String, Agg)], by: Seq[String],
                               byAssigns: Seq[(String, Expr)] = Nil) extends Cmd
  // (col, ascending, nullsFirst) — nullsFirst None = dialect default
  final case class Sort(keys: Seq[(String, Boolean, Option[Boolean])]) extends Cmd
  final case class Limit(n: Int) extends Cmd
  final case class Keep(cols: Seq[String]) extends Cmd
  final case class Drop(cols: Seq[String]) extends Cmd
  final case class Rename(pairs: Seq[(String, String)]) extends Cmd // (old, new)
  final case class Dissect(input: String, pattern: String) extends Cmd
  final case class Grok(input: String, pattern: String) extends Cmd
  final case class Enrich(policy: String, on: String, withCols: Seq[String]) extends Cmd
  final case class LookupJoin(index: String, on: String) extends Cmd
  final case class MvExpand(column: String) extends Cmd
  // CHANGE_POINT value ON key [AS typeName, pvalueName] — ES|QL 9.x's
  // step-change detector: non-collapsing, the argmax row gains
  // (typeName, pvalueName), every other row gets nulls
  final case class ChangePoint(value: String, on: String,
                               typeName: String = "type",
                               pvalName: String = "pvalue") extends Cmd
  // SAMPLE probability [ON ident] — ES|QL 9.x's row sampling; the ON
  // extension pins membership to a deterministic md5 bucket of the
  // named column (reproducible across runs and engines, unlike ES's
  // seeded RNG); without ON membership hashes the whole row
  final case class Sample(probability: BigDecimal, on: Option[String]) extends Cmd
  // ROW a = 1, b = "x" — the literal one-row source (a FROM-less
  // pipeline start, ES|QL's constant-expression playground)
  final case class RowCmd(assigns: Seq[(String, Expr)]) extends Cmd
  // SHOW INFO — the remaining source command: one deterministic row of
  // engine build facts (a LocalRelation; ES|QL's only other pipeline
  // head next to FROM/TS/ROW)
  final case object ShowInfo extends Cmd
  // FORK (cmds) (cmds) … — ES|QL 9.x's branch command: each branch
  // runs the incoming frame through its own sub-pipeline; results
  // union by name (missing columns null) with a `_fork` discriminator
  final case class Fork(branches: Seq[Seq[Cmd]]) extends Cmd
  // FUSE ON id RANK col — fuse FORK's ranked branches by RRF on the
  // shared id: per-branch rank from the RANK column (desc, id ties),
  // fused score = Σ round(1e6/(60+rank)) in exact micros
  final case class Fuse(id: String, rank: String) extends Cmd
  /** `RERANK "query" ON field [WITH ident]` — 9.x's reranking command.
    * In ES the WITH names an inference endpoint; here it names a
    * reranker the CALLER registers (the ENRICH-policies pattern — the
    * catalog owns model resolution). Omitted WITH = the default
    * reranker. Compiles to one added `_score` column; ordering is the
    * caller's next SORT, as in ES. */
  final case class Rerank(query: String, field: String,
                          reranker: Option[String]) extends Cmd
  /** `COMPLETION [target =] prompt WITH ident` — 9.x's text-generation
    * command. In ES the WITH names an inference endpoint; here it
    * names a generator the CALLER registers (the RERANK seam's
    * pattern — the catalog owns model resolution). Compiles to one
    * added target column (default `completion`); the row set is
    * untouched, as in ES. */
  final case class Completion(target: String, prompt: Expr,
                              endpoint: String) extends Cmd

  final case class ParseError(msg: String, pos: Int)
    extends IllegalArgumentException(s"esql parse error at $pos: $msg")

  // ------------------------------------------------------------------ lexer
  private sealed trait Tok { def pos: Int }
  private final case class TWord(s: String, pos: Int) extends Tok
  private final case class TNum(v: BigDecimal, pos: Int) extends Tok
  private final case class TStr(s: String, pos: Int) extends Tok
  private final case class TSym(s: String, pos: Int) extends Tok

  private val twoCharSyms = Set("==", "!=", ">=", "<=")

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (i + 1 < q.length && twoCharSyms(q.substring(i, i + 2))) {
        out += TSym(q.substring(i, i + 2), i); i += 2
      } else if ("|,()=<>+-*/%?[]".indexOf(c) >= 0) {
        out += TSym(c.toString, i); i += 1
      } else if (c == '"') {
        // \" and \\ escapes so DISSECT/GROK patterns can quote and backslash
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < q.length && !closed) q.charAt(j) match {
          case '\\' if j + 1 < q.length => sb.append(q.charAt(j + 1)); j += 2
          case '"' => closed = true; j += 1
          case ch => sb.append(ch); j += 1
        }
        if (!closed) throw ParseError("unterminated string", i)
        out += TStr(sb.toString, i)
        i = j
      } else if (c.isDigit) {
        val start = i
        while (i < q.length && (q.charAt(i).isDigit || q.charAt(i) == '.')) i += 1
        out += TNum(BigDecimal(q.substring(start, i)), start)
      } else {
        val start = i
        while (i < q.length && (q.charAt(i).isLetterOrDigit ||
          q.charAt(i) == '_' || q.charAt(i) == '.')) i += 1
        if (i == start) throw ParseError(s"unexpected character '$c'", i)
        out += TWord(q.substring(start, i), start)
      }
    }
    out.result()
  }

  /** Convert a request-parameter VALUE to its literal Expr — the JSON
    * value kinds ES|QL params accept (string, number) plus a pinned
    * instant for the deterministic-now idiom. */
  def param(v: Any): Expr = v match {
    case s: String => StrLit(s)
    case i: Int => NumLit(BigDecimal(i))
    case l: Long => NumLit(BigDecimal(l))
    case d: Double => NumLit(BigDecimal(d))
    case b: BigDecimal => NumLit(b)
    case t: java.time.Instant =>
      TsLit(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case e: Expr => e
    case other => throw ParseError(s"unsupported parameter value $other", 0)
  }

  // ----------------------------------------------------------------- parser
  def parse(q: String): Seq[Cmd] = parse(q, Map.empty[String, Expr])

  /** Parse with request parameters: `?name` tokens substitute their
    * bound literal at PARSE time (ES binds params per request before
    * planning), so unknown names fail fast as ParseError and the
    * compiled plan contains plain literals — constant-folded and
    * parquet-pushable like any hand-written bound. */
  def parse(q: String, params: Map[String, Expr]): Seq[Cmd] = {
    val toks = lex(q)
    var i = 0
    def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def pos: Int = peek.map(_.pos).getOrElse(q.length)
    def isKw(t: Tok, w: String): Boolean = t match {
      case TWord(s, _) => s.equalsIgnoreCase(w)
      case _ => false
    }
    def eatKw(w: String): Unit = peek match {
      case Some(t) if isKw(t, w) => i += 1
      case _ => throw ParseError(s"expected $w", pos)
    }
    def eatSym(s: String): Unit = peek match {
      case Some(TSym(`s`, _)) => i += 1
      case _ => throw ParseError(s"expected '$s'", pos)
    }
    def ident(): String = peek match {
      case Some(TWord(w, _)) => i += 1; w
      case _ => throw ParseError("expected identifier", pos)
    }
    def string(what: String): String = peek match {
      case Some(TStr(s, _)) => i += 1; s
      case _ => throw ParseError(s"$what expects a string pattern", pos)
    }

    // ---------------------------------------------------------- expressions
    def parseExpr(): Expr = parseOr()
    def parseOr(): Expr = {
      var l = parseAnd()
      while (peek.exists(isKw(_, "or"))) { i += 1; l = Bin("or", l, parseAnd()) }
      l
    }
    def parseAnd(): Expr = {
      var l = parseUnary()
      while (peek.exists(isKw(_, "and"))) { i += 1; l = Bin("and", l, parseUnary()) }
      l
    }
    def parseUnary(): Expr =
      if (peek.exists(isKw(_, "not"))) { i += 1; Not(parseUnary()) } else parseCmp()
    def parseCmp(): Expr = {
      val l = parseAdd()
      peek match {
        case Some(TSym(op, _)) if Set("==", "!=", ">=", "<=", ">", "<")(op) =>
          i += 1; Bin(op, l, parseAdd())
        case Some(t) if isKw(t, "like") =>
          i += 1
          peek match {
            case Some(TStr(p, _)) => i += 1; Like(l, p)
            case _ => throw ParseError("LIKE expects a string pattern", pos)
          }
        case Some(t) if isKw(t, "rlike") =>
          i += 1
          peek match {
            case Some(TStr(p, _)) => i += 1; RLike(l, p)
            case _ => throw ParseError("RLIKE expects a string pattern", pos)
          }
        case Some(t) if isKw(t, "is") =>
          i += 1
          val neg = peek.exists(isKw(_, "not"))
          if (neg) i += 1
          eatKw("null")
          IsNull(l, neg)
        case Some(t) if isKw(t, "in") =>
          i += 1; eatSym("(")
          val vs = Seq.newBuilder[Expr]
          vs += parseLit()
          while (peek.exists { case TSym(",", _) => true; case _ => false }) {
            i += 1; vs += parseLit()
          }
          eatSym(")")
          In(l, vs.result())
        case _ => l
      }
    }
    def parseLit(): Expr = peek match {
      case Some(TNum(v, _)) => i += 1; NumLit(v)
      case Some(TStr(s, _)) => i += 1; StrLit(s)
      // negative numeric literals are literals too (IN (-5, 10) is
      // valid ES|QL) — found by the differential fuzzer
      case Some(TSym("-", _)) =>
        i += 1
        peek match {
          case Some(TNum(v, _)) => i += 1; NumLit(-v)
          case _ => throw ParseError("expected numeric literal after -", pos)
        }
      // a bound request parameter substitutes anywhere a literal is
      // valid — including IN lists (ES|QL's params contract)
      case Some(TSym("?", p0)) =>
        i += 1
        peek match {
          case Some(TWord(n, _)) =>
            i += 1
            params.getOrElse(n,
              throw ParseError(s"unbound request parameter ?$n", p0))
          case _ => throw ParseError("expected parameter name after ?", p0)
        }
      case _ => throw ParseError("expected literal", pos)
    }
    def parseAdd(): Expr = {
      var l = parseMul()
      var go = true
      while (go) peek match {
        case Some(TSym(op @ ("+" | "-"), _)) => i += 1; l = Bin(op, l, parseMul())
        case _ => go = false
      }
      l
    }
    def parseMul(): Expr = {
      var l = parsePrim()
      var go = true
      while (go) peek match {
        case Some(TSym(op @ ("*" | "/" | "%"), _)) => i += 1; l = Bin(op, l, parsePrim())
        case _ => go = false
      }
      l
    }
    def parsePrim(): Expr = peek match {
      case Some(TSym("(", _)) => i += 1; val e = parseExpr(); eatSym(")"); e
      case Some(TSym("[", p0)) =>
        // bracketed multivalue literal (numeric scope — the ROW/EVAL
        // mv literal and the KNN query-vector form)
        i += 1
        def num(): BigDecimal = peek match {
          case Some(TNum(v, _)) => i += 1; v
          case Some(TSym("-", _)) =>
            i += 1
            peek match {
              case Some(TNum(v, _)) => i += 1; -v
              case _ => throw ParseError("expected numeric literal after -", pos)
            }
          case _ => throw ParseError(
            "multivalue literals take numeric elements ([1, -2.5, 3])", pos)
        }
        val vs = Seq.newBuilder[BigDecimal]
        peek match {
          case Some(TSym("]", _)) =>
            throw ParseError("empty multivalue literal [] has no type", p0)
          case _ =>
            vs += num()
            while (peek.exists { case TSym(",", _) => true; case _ => false }) {
              i += 1; vs += num()
            }
        }
        eatSym("]")
        ArrLit(vs.result())
      case Some(TSym("-", _)) => i += 1; Neg(parsePrim())
      case Some(TSym("?", p0)) =>
        i += 1
        peek match {
          case Some(TWord(n, _)) =>
            i += 1
            params.getOrElse(n,
              throw ParseError(s"unbound request parameter ?$n", p0))
          case _ => throw ParseError("expected parameter name after ?", p0)
        }
      case Some(TNum(v, _)) =>
        i += 1
        // a number followed by a time-unit word is ES|QL's span literal
        peek match {
          case Some(TWord(w, _)) if spanUnits.contains(w.toLowerCase.stripSuffix("s")) &&
              v.isValidLong =>
            i += 1; SpanLit(v.toLong, w.toLowerCase.stripSuffix("s"))
          case _ => NumLit(v)
        }
      case Some(TStr(s, _)) => i += 1; StrLit(s)
      case Some(TWord(w, _)) =>
        i += 1
        peek match {
          case Some(TSym("(", _)) =>
            i += 1
            val args = Seq.newBuilder[Expr]
            if (!peek.exists { case TSym(")", _) => true; case _ => false }) {
              args += parseExpr()
              while (peek.exists { case TSym(",", _) => true; case _ => false }) {
                i += 1; args += parseExpr()
              }
            }
            eatSym(")")
            Func(w.toUpperCase, args.result())
          case _ => Ident(w)
        }
      case _ => throw ParseError("expected expression", pos)
    }

    // ------------------------------------------------------------- commands
    def parseStats(): Stats = {
      def parseAgg(): (String, Agg) = {
        // [name =] fn(...)
        val savedI = i
        val first = ident()
        val named = peek.exists { case TSym("=", _) => true; case _ => false }
        val (name, fnWord) =
          if (named) { i += 1; (first, ident()) }
          else { i = savedI; val f = ident(); (f.toLowerCase, f) }
        val fn = fnWord.toUpperCase
        eatSym("(")
        val agg: Agg = fn match {
          case "COUNT" =>
            peek match {
              case Some(TSym("*", _)) => i += 1; CountAll()
              case _ => AggFn("count", parseExpr())
            }
          case "COUNT_DISTINCT" => AggFn("count_distinct", parseExpr())
          case "SUM" => AggFn("sum", parseExpr())
          case "MIN" => AggFn("min", parseExpr())
          case "MAX" => AggFn("max", parseExpr())
          case "AVG" => AggFn("avg", parseExpr())
          case "MEDIAN" => AggFn("median", parseExpr())
          // MAD: compiles to a TWO-STAGE plan (per-group medians
          // broadcast back, then median of absolute deviations)
          case "MEDIAN_ABSOLUTE_DEVIATION" => AggFn("mad", parseExpr())
          // spatial centroid: struct(avg lon, avg lat) per group
          case "ST_CENTROID_AGG" => AggFn("st_centroid", parseExpr())
          case "ST_EXTENT_AGG" => AggFn("st_extent", parseExpr())
          // VALUES: the distinct-values multivalue aggregate (sorted —
          // deterministic where ES leaves order undefined)
          case "VALUES" => AggFn("values", parseExpr())
          case "STD_DEV" => AggFn("std_dev", parseExpr())
          case "PERCENTILE" =>
            val e = parseExpr()
            eatSym(",")
            val p = peek match {
              case Some(TNum(v, _)) if v >= 0 && v <= 100 => i += 1; v
              case _ => throw ParseError("PERCENTILE expects p in [0, 100]", pos)
            }
            AggPercentile(e, p)
          case "WEIGHTED_AVG" =>
            val v = parseExpr(); eatSym(","); AggWavg(v, parseExpr())
          case "TOP" =>
            val e = parseExpr()
            eatSym(",")
            val k = peek match {
              case Some(TNum(v, _)) if v.isValidInt && v > 0 => i += 1; v.toInt
              case _ => throw ParseError("TOP expects a positive integer limit", pos)
            }
            eatSym(",")
            val desc = string("TOP").toLowerCase match {
              case "desc" => true
              case "asc" => false
              case o => throw ParseError(s"""TOP order must be "asc" or "desc", got $o""", pos)
            }
            AggTop(e, k, desc)
          case other => throw ParseError(s"unsupported aggregate $other", pos)
        }
        eatSym(")")
        // the per-aggregate filter: `fn(...) WHERE cond`
        val filt =
          if (peek.exists(isKw(_, "where"))) { i += 1; Some(parseExpr()) } else None
        val filtered = (agg, filt) match {
          case (a, None) => a
          case (CountAll(_), f) => CountAll(f)
          case (AggFn(n, e, _), f) => AggFn(n, e, f)
          case (AggTop(_, _, _), _) | (AggPercentile(_, _), _) | (AggWavg(_, _), _) =>
            throw ParseError("this aggregate does not take a WHERE filter", pos)
        }
        (name, filtered)
      }
      val aggs = Seq.newBuilder[(String, Agg)]
      aggs += parseAgg()
      while (peek.exists { case TSym(",", _) => true; case _ => false }) {
        i += 1; aggs += parseAgg()
      }
      val ks = Seq.newBuilder[String]
      val assigns = Seq.newBuilder[(String, Expr)]
      if (peek.exists(isKw(_, "by"))) {
        i += 1
        def one(): Unit = {
          val n = ident()
          if (peek.exists { case TSym("=", _) => true; case _ => false }) {
            i += 1; assigns += (n -> parseExpr())
          }
          ks += n
        }
        one()
        while (peek.exists { case TSym(",", _) => true; case _ => false }) {
          i += 1; one()
        }
      }
      Stats(aggs.result(), ks.result(), assigns.result())
    }

    def parseCommand(): Cmd = {
      val w = ident().toUpperCase
      w match {
        case "WHERE" => Where(parseExpr())
        case "EVAL" =>
          val as = Seq.newBuilder[(String, Expr)]
          def one(): Unit = { val n = ident(); eatSym("="); as += (n -> parseExpr()) }
          one()
          while (peek.exists { case TSym(",", _) => true; case _ => false }) { i += 1; one() }
          Eval(as.result())
        case "STATS" => parseStats()
        case "INLINESTATS" =>
          val st = parseStats()
          InlineStats(st.aggs, st.by, st.byAssigns)
        case "SORT" =>
          val ks = Seq.newBuilder[(String, Boolean, Option[Boolean])]
          def one(): Unit = {
            val n = ident()
            val asc =
              if (peek.exists(isKw(_, "desc"))) { i += 1; false }
              else if (peek.exists(isKw(_, "asc"))) { i += 1; true }
              else true
            val nf =
              if (peek.exists(isKw(_, "nulls"))) {
                i += 1
                if (peek.exists(isKw(_, "first"))) { i += 1; Some(true) }
                else if (peek.exists(isKw(_, "last"))) { i += 1; Some(false) }
                else throw ParseError("NULLS expects FIRST or LAST", pos)
              } else None
            ks += ((n, asc, nf))
          }
          one()
          while (peek.exists { case TSym(",", _) => true; case _ => false }) { i += 1; one() }
          Sort(ks.result())
        case "LIMIT" => peek match {
          case Some(TNum(v, _)) if v.isValidInt => i += 1; Limit(v.toInt)
          case _ => throw ParseError("LIMIT expects an integer", pos)
        }
        case "KEEP" | "DROP" =>
          // names may carry a trailing `*` wildcard (KEEP user_*)
          val cs = Seq.newBuilder[String]
          def one(): Unit = {
            var n = ident()
            if (peek.exists { case TSym("*", _) => true; case _ => false }) { i += 1; n += "*" }
            cs += n
          }
          one()
          while (peek.exists { case TSym(",", _) => true; case _ => false }) { i += 1; one() }
          if (w == "KEEP") Keep(cs.result()) else Drop(cs.result())
        case "RENAME" =>
          val ps = Seq.newBuilder[(String, String)]
          def one(): Unit = { val o = ident(); eatKw("as"); ps += (o -> ident()) }
          one()
          while (peek.exists { case TSym(",", _) => true; case _ => false }) { i += 1; one() }
          Rename(ps.result())
        case "DISSECT" => val in = ident(); Dissect(in, string("DISSECT"))
        case "GROK" => val in = ident(); Grok(in, string("GROK"))
        case "ENRICH" =>
          val policy = ident()
          eatKw("on")
          val on = ident()
          val ws = Seq.newBuilder[String]
          if (peek.exists(isKw(_, "with"))) {
            i += 1
            ws += ident()
            while (peek.exists { case TSym(",", _) => true; case _ => false }) { i += 1; ws += ident() }
          }
          Enrich(policy, on, ws.result())
        case "LOOKUP" =>
          eatKw("join")
          val idx = ident()
          eatKw("on")
          LookupJoin(idx, ident())
        case "MV_EXPAND" => MvExpand(ident())
        case "CHANGE_POINT" =>
          val v = ident()
          eatKw("on")
          val k = ident()
          if (peek.exists(isKw(_, "as"))) {
            i += 1
            val tn = ident(); eatSym(","); val pn = ident()
            ChangePoint(v, k, tn, pn)
          } else ChangePoint(v, k)
        case "SAMPLE" =>
          val p0 = peek match {
            case Some(TNum(v, _)) if v > 0 && v < 1 => i += 1; v
            case _ => throw ParseError("SAMPLE expects a probability in (0, 1)", pos)
          }
          val on = if (peek.exists(isKw(_, "on"))) { i += 1; Some(ident()) } else None
          Sample(p0, on)
        case "FORK" =>
          val branches = Seq.newBuilder[Seq[Cmd]]
          def branch(): Unit = {
            eatSym("(")
            val bs = Seq.newBuilder[Cmd]
            bs += parseCommand()
            while (peek.exists { case TSym("|", _) => true; case _ => false }) {
              i += 1; bs += parseCommand()
            }
            eatSym(")")
            branches += bs.result()
          }
          branch()
          while (peek.exists { case TSym("(", _) => true; case _ => false }) branch()
          val bs = branches.result()
          if (bs.size < 2) throw ParseError("FORK needs at least two branches", pos)
          Fork(bs)
        case "FUSE" =>
          eatKw("on"); val id = ident(); eatKw("rank"); val r = ident()
          Fuse(id, r)
        case "RERANK" =>
          val q = string("RERANK")
          eatKw("on")
          val f = ident()
          val rk = if (peek.exists(isKw(_, "with"))) { i += 1; Some(ident()) } else None
          Rerank(q, f, rk)
        case "COMPLETION" =>
          // COMPLETION [target =] prompt WITH endpoint
          val target = (peek, toks.lift(i + 1)) match {
            case (Some(TWord(n, _)), Some(TSym("=", _))) => i += 2; n
            case _ => "completion"
          }
          val prompt = parseExpr()
          eatKw("with")
          Completion(target, prompt, ident())
        case other => throw ParseError(s"unknown command $other", pos)
      }
    }

    // SOURCE-COMMAND dispatch. The `CMD-DISPATCH` markers below are
    // load-bearing: CommandAudit's keyword scrape reads ONLY marked
    // lines (r20 advice — an unanchored isKw/eatKw scrape would let a
    // keyword used merely as an OPERAND elsewhere, e.g. `metadata` or
    // `where`, satisfy the implemented-guard for a same-named command).
    val cmds = Seq.newBuilder[Cmd]
    if (peek.exists(isKw(_, "show"))) { // CMD-DISPATCH
      i += 1; eatKw("info")
      cmds += ShowInfo
    } else if (peek.exists(isKw(_, "row"))) { // CMD-DISPATCH
      i += 1
      val as = Seq.newBuilder[(String, Expr)]
      def one(): Unit = { val n = ident(); eatSym("="); as += (n -> parseExpr()) }
      one()
      while (peek.exists { case TSym(",", _) => true; case _ => false }) { i += 1; one() }
      cmds += RowCmd(as.result())
    } else {
      val isTs = peek.exists(isKw(_, "ts")) // CMD-DISPATCH
      if (isTs) i += 1 else eatKw("from") // CMD-DISPATCH
      val tables = Seq.newBuilder[String]
      // an index name may carry a trailing `*` wildcard (FROM logs*) —
      // the pattern passes through verbatim; the CATALOG (resolve)
      // expands it, exactly like ES's index-pattern resolution
      def table(): Unit = {
        var n = ident()
        if (peek.exists { case TSym("*", _) => true; case _ => false }) { i += 1; n += "*" }
        tables += n
      }
      table()
      while (peek.exists { case TSym(",", _) => true; case _ => false }) {
        i += 1; table()
      }
      val meta = Seq.newBuilder[String]
      if (!isTs && peek.exists(isKw(_, "metadata"))) {
        i += 1
        meta += ident()
        while (peek.exists { case TSym(",", _) => true; case _ => false }) {
          i += 1; meta += ident()
        }
      }
      cmds += (if (isTs) TsFrom(tables.result()) else From(tables.result(), meta.result()))
    }
    while (peek.isDefined) {
      eatSym("|")
      cmds += parseCommand()
    }
    cmds.result()
  }

  // --------------------------------------------------------------- compiler
  /** ES|QL LIKE → SQL LIKE: `*` → `%`, `?` → `_` (the single-char
    * wildcard), `\*`/`\?`/`\\` stay literal (the string lexer has
    * already collapsed source-level `\\` into one backslash), and
    * literal `%`/`_` are escaped so they never act as wildcards. */
  private[graft] def likePattern(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\' && i + 1 < p.length && "*?\\".indexOf(p.charAt(i + 1)) >= 0) {
        p.charAt(i + 1) match {
          case '*' => sb.append('*')
          case '?' => sb.append('?')
          case '\\' => sb.append("\\\\")
        }
        i += 2
      } else {
        c match {
          case '*' => sb.append('%')
          case '?' => sb.append('_')
          case '%' => sb.append("\\%")
          case '_' => sb.append("\\_")
          case '\\' => sb.append("\\\\") // dangling backslash stays literal
          case ch => sb.append(ch)
        }
        i += 1
      }
    }
    sb.toString
  }

  /** Time-span units (singular form) a number may be suffixed with to
    * form a SpanLit. */
  private[graft] val spanUnits = Set("millisecond", "second", "minute",
    "hour", "day", "week", "month", "quarter", "year")

  /** WKT POLYGON literal → open ring vertices, parsed at PLAN time
    * (query geometries are constants — the drawn-region map filter).
    * Returns None for anything that isn't a well-formed closed single
    * ring of ≥3 distinct (lon, lat) vertices — the caller falls through
    * to the envelope path, whose runtime regex then nulls the value
    * (the TO_* conversion contract). A VALID but NON-CONVEX ring is a
    * ParseError instead: the half-plane containment test below (the
    * ns_geo_polygon discipline — cross products against every edge) is
    * only correct for convex rings, and a silent wrong-answer scope
    * would be worse than a named one. */
  private[graft] def parsePolygonWkt(s: String): Option[Seq[(Double, Double)]] = {
    // tolerant of the spacing variants real WKT emitters produce:
    // optional space before the parens, any spacing around the vertex
    // commas — a convex region rejected for its comma style would
    // silently null the user's drawn-region filter
    val rx = "^POLYGON\\s*\\(\\((.+)\\)\\)$".r
    s.trim match {
      case rx(body) =>
        val verts = body.split(",").toSeq.map { v =>
          val parts = v.trim.split("\\s+")
          if (parts.length != 2) return None
          try (parts(0).toDouble, parts(1).toDouble)
          catch { case _: NumberFormatException => return None }
        }
        if (verts.length < 4 || verts.head != verts.last) return None
        val ring = verts.dropRight(1)
        if (ring.distinct.length < 3 || ring.distinct.length != ring.length) return None
        // consecutive-edge cross products: consistent sign = convex
        val crosses = ring.indices.map { i =>
          val (ax, ay) = ring(i)
          val (bx, by) = ring((i + 1) % ring.length)
          val (cx, cy) = ring((i + 2) % ring.length)
          (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        }
        if (crosses.forall(_ == 0.0)) return None // zero area — degenerate
        if (!(crosses.forall(_ >= 0) || crosses.forall(_ <= 0)))
          throw ParseError("non-convex POLYGON ring — the supported scope is " +
            "convex rings (half-plane containment); split the shape or use ENVELOPE", 0)
        // turn-sign consistency alone also passes SELF-INTERSECTING rings
        // that wind consistently (a pentagram star: every turn shares one
        // sign, but the half-plane test would then silently scope to the
        // inner pentagon — r16 advice). A true convex ring additionally
        // has EVERY vertex inside every edge's half-plane; star rings
        // don't. Same exact cross products as pointInPoly below.
        val allInside = ring.indices.forall { i =>
          val (ax, ay) = ring(i)
          val (bx, by) = ring((i + 1) % ring.length)
          val ds = ring.map { case (px, py) =>
            (bx - ax) * (py - ay) - (by - ay) * (px - ax)
          }
          ds.forall(_ >= 0) || ds.forall(_ <= 0)
        }
        if (!allInside)
          throw ParseError("self-intersecting POLYGON ring — the supported scope is " +
            "convex rings (half-plane containment); split the shape or use ENVELOPE", 0)
        Some(ring)
      case _ => None
    }
  }

  /** WKT POINT → coordinate struct, the ONE parser both point types
    * share (invalid WKT → null, the TO_* conversion contract). */
  private def wktPointStruct(c: Column, f1: String, f2: String): Column = {
    val rx = "^POINT \\((-?\\d+(?:\\.\\d+)?) (-?\\d+(?:\\.\\d+)?)\\)$"
    when(c.rlike(rx), struct(
      regexp_extract(c, rx, 1).cast("double").as(f1),
      regexp_extract(c, rx, 2).cast("double").as(f2)))
  }

  /** ONE WKT ENVELOPE parser for the geo and cartesian shape twins
    * (the wktPointStruct principle: a shared grammar can never let the
    * accepted input sets drift apart — review finding). Field names
    * come from the caller; the min<=max / max>=min degenerate gate is
    * the shared contract (for geo it also rejects the antimeridian
    * wrap — min_lon > max_lon is valid WKT there but outside this
    * bounding-box implementation's scope; planar space has no wrap, so
    * for cartesian the same gate is just argument-order validation).
    * Gate failures NULL the parse (the TO_* conversion contract), so
    * downstream relations yield null, never a wrong boolean. */
  private def wktEnvelopeStruct(c: Column, minXf: String, maxXf: String,
                                maxYf: String, minYf: String): Column = {
    val num = "(-?\\d+(?:\\.\\d+)?)"
    val rx = s"^ENVELOPE \\($num, $num, $num, $num\\)$$"
    val minX = regexp_extract(c, rx, 1).cast("double")
    val maxX = regexp_extract(c, rx, 2).cast("double")
    val maxY = regexp_extract(c, rx, 3).cast("double")
    val minY = regexp_extract(c, rx, 4).cast("double")
    when(c.rlike(rx) && minX <= maxX && maxY >= minY, struct(
      minX.as(minXf), maxX.as(maxXf), maxY.as(maxYf), minY.as(minYf)))
  }

  /** Point-in-convex-polygon as pure codegen arithmetic — the
    * ns_geo_polygon half-plane discipline (ops/Enrich.scala:893): one
    * cross product per edge, inside = every product on one side
    * (either orientation; boundary included deterministically). A null
    * point nulls every comparison, so the relation yields null. The
    * point side is guarded at ANALYSIS time (graftshim.RequireGeoPoint):
    * a non-point struct reaching here — an ENVELOPE bound to an EVAL
    * variable, say — gets the named shape-vs-shape error, not a raw
    * no-such-struct-field failure. */
  private def pointInPoly(p0: Column, ring: Seq[(Double, Double)]): Column = {
    val p = graft.Cols.column(org.apache.spark.sql.graftshim.RequireGeoPoint(
      graft.Cols.expr(p0)))
    val px = p.getField("lon")
    val py = p.getField("lat")
    val ds = ring.indices.map { i =>
      val (ax, ay) = ring(i)
      val (bx, by) = ring((i + 1) % ring.length)
      // same term order as the oracle text: (bx−ax)(Y−ay) − (by−ay)(X−ax)
      lit(bx - ax) * (py - lit(ay)) - lit(by - ay) * (px - lit(ax))
    }
    ds.map(_ >= 0).reduce(_ && _) || ds.map(_ <= 0).reduce(_ && _)
  }

  /** Point-vs-shape relation. A plan-time POLYGON literal compiles to
    * the half-plane test directly (role order enforced with the same
    * named errors as the envelope path); everything else resolves
    * argument roles at analysis time (graftshim.GeoEnvelopeRelate,
    * point-vs-ENVELOPE). */
  /** `fn` is the SURFACE function name for error text: ST_DISJOINT
    * compiles as mode "intersects" negated, and its errors must name
    * the function the user actually wrote (review finding). */
  private def geoRelate(x: Expr, y: Expr, mode: String,
                        fn: String = ""): Column = {
    val surface = if (fn.isEmpty) "ST_" + mode.toUpperCase else fn
    def polyOf(e: Expr): Option[Seq[(Double, Double)]] = e match {
      case Func("TO_GEOSHAPE", Seq(StrLit(w))) => parsePolygonWkt(w)
      case _ => None
    }
    // ANY TO_GEOSHAPE call (polygon or not) marks a shape side: a
    // polygon paired with an envelope must fail as shape-vs-shape with
    // the named error, not crash pointInPoly on a struct without lon
    def isShape(e: Expr): Boolean = e match {
      case Func("TO_GEOSHAPE", _) => true
      case _ => false
    }
    (polyOf(x), polyOf(y), mode) match {
      case (Some(_), _, _) | (_, Some(_), _) if isShape(x) && isShape(y) =>
        throw ParseError("shape-vs-shape relations are not supported — one side " +
          "must be a geo_point", 0)
      case (Some(vs), None, "contains" | "intersects") => pointInPoly(compileExpr(y), vs)
      case (None, Some(vs), "within" | "intersects") => pointInPoly(compileExpr(x), vs)
      case (None, Some(_), "contains") =>
        throw ParseError("ST_CONTAINS here supports (shape, point) — for the " +
          "point-in-shape direction use ST_WITHIN(point, shape)", 0)
      case (Some(_), None, "within") =>
        throw ParseError("ST_WITHIN here supports (point, shape) — for the " +
          "shape-contains-point direction use ST_CONTAINS(shape, point)", 0)
      case _ =>
        graft.Cols.column(org.apache.spark.sql.graftshim.GeoEnvelopeRelate(
          graft.Cols.expr(compileExpr(x)), graft.Cols.expr(compileExpr(y)), mode,
          surface))
    }
  }

  /** IPv4 dotted-quad → u32 as pure long arithmetic (codegen);
    * shared with the ingest processors (community_id,
    * network_direction) — one octet-arithmetic implementation. */
  private[graft] def ip4u32(ip: Column): Column =
    (1 to 4).map(i => element_at(split(ip, "\\."), i).cast("long"))
      .reduceLeft((a, b) => a * 256L + b)

  /** "a.b.c.d/p" → (network u32, prefix bits); parsed at plan time.
    * Validated here: an out-of-range prefix (/33) would otherwise feed a
    * negative shift count that Java masks mod 64 and silently match
    * wrong rows. */
  private def parseCidr(c: String): (Long, Int) = {
    // split with limit -1 keeps trailing empty fields: "10.0.0.0./8"
    // must fail as a 5-octet address, not silently drop the empty tail
    val parts = c.split("/", -1)
    if (parts.length != 2)
      throw ParseError(s"malformed CIDR block '$c' (expected a.b.c.d/p)", 0)
    val Array(addr, p) = parts
    val rawOctets = addr.split("\\.", -1)
    // digits only — toLong's tolerance for "+5"-style signs is not a
    // valid dotted-quad octet
    if (rawOctets.length != 4 || rawOctets.exists(!_.matches("\\d{1,3}")))
      throw ParseError(s"malformed CIDR address '$addr'", 0)
    val octets = rawOctets.map(_.toLong)
    if (octets.exists(_ > 255))
      throw ParseError(s"CIDR octets out of range in '$addr'", 0)
    if (!p.matches("\\d{1,2}") || p.toInt > 32)
      throw ParseError(s"CIDR prefix /$p out of range (0..32)", 0)
    (octets.reduceLeft((a, b) => a * 256L + b), p.toInt)
  }

  /** timestamp ± span — the ES|QL datetime-arithmetic idiom (`?now - 1
    * hour`, `ts + 2 weeks`). Fixed-width units stay pure long epoch
    * arithmetic (codegen, session-zone independent — the DATE_TRUNC
    * discipline); calendar units ride a month interval (TimeAdd,
    * codegen). */
  private def spanArith(ts: Column, s: SpanLit, negate: Boolean): Column = {
    val n = if (negate) -s.n else s.n
    val fixedMicros = Map("millisecond" -> 1000L, "second" -> 1000000L,
      "minute" -> 60000000L, "hour" -> 3600000000L, "day" -> 86400000000L,
      "week" -> 604800000000L)
    fixedMicros.get(s.unit) match {
      case Some(w) => timestamp_micros(unix_micros(ts) + lit(n * w))
      case None =>
        val months = s.unit match {
          case "month" => n
          case "quarter" => 3 * n
          case "year" => 12 * n
          case u => throw ParseError(s"unsupported span unit $u in date arithmetic", 0)
        }
        ts + make_interval(lit(0), lit(months.toInt), lit(0), lit(0), lit(0), lit(0), lit(0))
    }
  }

  def compileExpr(e: Expr): Column = e match {
    case Ident(n) => col(n)
    // a literal WRITTEN with a decimal point is a double even when its
    // value is whole (`2.0` is double 2.0, not long 2 — scale > 0
    // records the point); integer-valued, point-less literals are longs.
    // Matters since `/` became type-directed: `x / 10.0` must promote.
    case NumLit(v) =>
      if (v.isValidLong && v.scale <= 0) lit(v.toLong) else lit(v.toDouble)
    case StrLit(s) => lit(s)
    // the bracketed multivalue literal: array<long> when every element
    // is point-less whole (the NumLit rule element-wise), else
    // array<double> — `[1, 2, 3]` groups with MV_SUM as longs,
    // `[0.25, -1]` promotes the whole literal
    case ArrLit(vs) =>
      if (vs.forall(v => v.isValidLong && v.scale <= 0))
        array(vs.map(v => lit(v.toLong)): _*)
      else array(vs.map(v => lit(v.toDouble)): _*)
    case TsLit(us) => timestamp_micros(lit(us))
    case Bin(op @ ("+" | "-"), l, s: SpanLit) =>
      spanArith(compileExpr(l), s, negate = op == "-")
    case Bin("+", s: SpanLit, r) => spanArith(compileExpr(r), s, negate = false)
    case SpanLit(_, u) =>
      throw ParseError(s"span literal ($u) only valid as DATE_TRUNC's first " +
        "argument or a datetime-arithmetic operand", 0)
    case Not(x) => !compileExpr(x)
    case Neg(x) => -compileExpr(x)
    case Like(x, p) => compileExpr(x).like(likePattern(p))
    case RLike(x, p) => compileExpr(x).rlike(p)
    case IsNull(x, neg) =>
      if (neg) compileExpr(x).isNotNull else compileExpr(x).isNull
    case In(x, vs) => compileExpr(x).isin(vs.map {
      case NumLit(v) => if (v.isValidLong && v.scale <= 0) v.toLong else v.toDouble
      case StrLit(s) => s
      // a bound ?param of timestamp type substitutes anywhere a literal
      // is valid — including IN lists (Instant literals carry exact
      // micros, matching the TsLit compile elsewhere)
      case TsLit(us) =>
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      case other => throw ParseError(s"non-literal IN element $other", 0)
    }: _*)
    case Bin(op, l, r) =>
      val (cl, cr) = (compileExpr(l), compileExpr(r))
      op match {
        case "or" => cl || cr
        case "and" => cl && cr
        case "==" => cl === cr
        case "!=" => cl =!= cr
        case ">=" => cl >= cr
        case "<=" => cl <= cr
        case ">" => cl > cr
        case "<" => cl < cr
        case "+" => cl + cr
        case "-" => cl - cr
        case "*" => cl * cr
        // ES|QL's `/`: integer ÷ integer TRUNCATES (5 / 2 == 2) where
        // Spark SQL's `/` is always fractional — type-directed at
        // analysis time (graftshim.EsqlDivide → IntegralDivide/Divide)
        case "/" => graft.Cols.column(
          org.apache.spark.sql.graftshim.EsqlDivide(
            graft.Cols.expr(cl), graft.Cols.expr(cr)))
        // `%` shares `/`'s two contracts (type-directed result, zero
        // modulus → null, not an ANSI error) — graftshim.EsqlMod
        case "%" => graft.Cols.column(
          org.apache.spark.sql.graftshim.EsqlMod(
            graft.Cols.expr(cl), graft.Cols.expr(cr)))
        case other => throw ParseError(s"unknown operator $other", 0)
      }
    case Func(name, args) => (name, args) match {
      case ("ROUND", Seq(x)) => round(compileExpr(x), 0)
      case ("ROUND", Seq(x, NumLit(d))) => round(compileExpr(x), d.toInt)
      case ("ABS", Seq(x)) => abs(compileExpr(x))
      case ("LENGTH", Seq(x)) => length(compileExpr(x)).cast("long")
      case ("CONCAT", xs) if xs.nonEmpty => concat(xs.map(compileExpr): _*)
      case ("SUBSTRING", Seq(x, NumLit(s), NumLit(l))) =>
        substring(compileExpr(x), s.toInt, l.toInt)
      case ("TO_LONG", Seq(x)) => compileExpr(x).cast("long")
      case ("TO_STRING", Seq(x)) => compileExpr(x).cast("string")
      case ("COALESCE", xs) if xs.nonEmpty => coalesce(xs.map(compileExpr): _*)
      case ("TO_LOWER", Seq(x)) => lower(compileExpr(x))
      case ("TO_UPPER", Seq(x)) => upper(compileExpr(x))
      case ("TRIM", Seq(x)) => trim(compileExpr(x))
      // ES SPLIT takes a LITERAL delimiter; Spark's split takes a regex —
      // quote it so "." or "|" delimiters split literally
      case ("SPLIT", Seq(x, StrLit(d))) =>
        split(compileExpr(x), java.util.regex.Pattern.quote(d))
      case ("MV_COUNT", Seq(x)) => size(compileExpr(x)).cast("long")
      // BUCKET(x, span): ES|QL's histogram primitive — x floored to its
      // span-aligned bucket (numeric spans here; epoch-ms for dates)
      case ("BUCKET", Seq(x, NumLit(span))) =>
        val c = compileExpr(x)
        c - (c % lit(span.toLong))
      // CASE(cond1, v1, cond2, v2, …[, default])
      case ("CASE", xs) if xs.size >= 2 =>
        val (pairs, default) =
          if (xs.size % 2 == 0) (xs.grouped(2).toSeq, None)
          else (xs.init.grouped(2).toSeq, Some(xs.last))
        val chained = pairs.foldLeft(Option.empty[Column]) {
          case (acc, Seq(cond, v)) =>
            val w = acc match {
              case None => when(compileExpr(cond), compileExpr(v))
              case Some(c) => c.when(compileExpr(cond), compileExpr(v))
            }
            Some(w)
          case (acc, _) => acc
        }.get
        default.map(d => chained.otherwise(compileExpr(d))).getOrElse(chained)
      // ---------------- scalar residue (the ES|QL function reference)
      case ("STARTS_WITH", Seq(x, StrLit(p))) => compileExpr(x).startsWith(p)
      case ("ENDS_WITH", Seq(x, StrLit(p))) => compileExpr(x).endsWith(p)
      // LOCATE: 1-based position of substring, 0 when absent (ES shape)
      case ("LOCATE", Seq(x, StrLit(sub))) => locate(sub, compileExpr(x)).cast("long")
      // ES|QL REPLACE's pattern arg is a REGEX, not a literal
      case ("REPLACE", Seq(x, StrLit(rx), StrLit(nw))) =>
        regexp_replace(compileExpr(x), rx, nw)
      case ("LEFT", Seq(x, NumLit(n))) => substring(compileExpr(x), 1, n.toInt)
      case ("RIGHT", Seq(x, NumLit(n))) => substring(compileExpr(x), -n.toInt, n.toInt)
      // ---------------- string residue (all codegen string ops)
      case ("REVERSE", Seq(x)) => reverse(compileExpr(x))
      case ("REPEAT", Seq(x, n)) => repeat(compileExpr(x), n match {
        case NumLit(v) => v.toInt
        case other => throw ParseError(s"REPEAT count must be a literal, got $other", 0)
      })
      case ("LTRIM", Seq(x)) => ltrim(compileExpr(x))
      case ("RTRIM", Seq(x)) => rtrim(compileExpr(x))
      case ("SPACE", Seq(NumLit(n))) => lit(" " * n.toInt)
      case ("BIT_LENGTH", Seq(x)) => bit_length(compileExpr(x)).cast("long")
      case ("BYTE_LENGTH", Seq(x)) => octet_length(compileExpr(x)).cast("long")
      // hashing (ES|QL 8.16's HASH + the named shorthands); SHA-1 has
      // no DuckDB twin, so the dialect ships md5/sha256
      case ("MD5", Seq(x)) => md5(compileExpr(x).cast("binary"))
      case ("SHA1", Seq(x)) => sha1(compileExpr(x).cast("binary"))
      case ("SHA256", Seq(x)) => sha2(compileExpr(x).cast("binary"), 256)
      // SCALB(d, n) = d · 2^n (the java.lang.Math.scalb contract)
      // COPY_SIGN (9.1): magnitude of the first argument, sign of the
      // second. Zero-or-positive sign → +|m| (the -0.0 sign bit is out
      // of scope — Spark normalizes -0.0 in comparisons, so a column
      // can't reliably carry it anyway); null sign → null.
      case ("COPY_SIGN", Seq(m0, s0)) =>
        val m = compileExpr(m0)
        val s = compileExpr(s0)
        when(s.isNull, lit(null)).when(s < 0, -abs(m)).otherwise(abs(m))
      // ROUND_TO (9.1): round DOWN to the greatest of the given fixed
      // points that is <= the value; a value below the smallest point
      // takes the smallest point (ES's contract). Points are literals,
      // sorted at plan time — the compiled form is one codegen CASE.
      case ("ROUND_TO", v +: points) if points.nonEmpty =>
        val ps = points.map {
          case NumLit(n) => n
          case Neg(NumLit(n)) => -n
          case other => throw ParseError(
            s"ROUND_TO points must be numeric literals, got $other", 0)
        }.sorted
        val cv = compileExpr(v)
        def plit(n: BigDecimal): Column =
          if (n.isWhole && n.isValidLong) lit(n.toLong) else lit(n.toDouble)
        val desc = ps.reverse
        // whens for every point except the smallest (descending);
        // anything below the second-smallest falls to the smallest
        val body = desc.init.foldRight(plit(ps.head): Column) {
          (p, acc) => when(cv >= plit(p), plit(p)).otherwise(acc)
        }
        when(cv.isNull, lit(null)).otherwise(body)
      case ("SCALB", Seq(d0, n0)) =>
        compileExpr(d0).cast("double") * pow(lit(2.0), compileExpr(n0).cast("double"))
      // TO_IP: format-validated dotted quad — ES's conversion contract
      // is value-or-null-with-warning; the engine's IP representation
      // is the validated string (the CIDR/IP_PREFIX functions parse it
      // to u32 long arithmetic at use sites)
      case ("TO_IP", Seq(x)) =>
        val c = compileExpr(x)
        val octet = "(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])"
        when(c.rlike(s"^($octet\\.){3}$octet$$"), c)
      case ("HASH", Seq(StrLit(alg), x)) => alg.toLowerCase match {
        case "md5" => md5(compileExpr(x).cast("binary"))
        case "sha256" => sha2(compileExpr(x).cast("binary"), 256)
        case other => throw ParseError(s"unsupported HASH algorithm $other (md5, sha256)", 0)
      }
      case ("TO_BASE64", Seq(x)) => base64(compileExpr(x).cast("binary"))
      case ("FROM_BASE64", Seq(x)) => unbase64(compileExpr(x)).cast("string")
      // DATE_EXTRACT(chrono_field, ts) — java.time ChronoField names,
      // ISO day-of-week numbering (Monday = 1)
      case ("DATE_EXTRACT", Seq(StrLit(f), x)) =>
        val c = compileExpr(x)
        f.toLowerCase match {
          case "year" => year(c).cast("long")
          case "month_of_year" => month(c).cast("long")
          case "day_of_month" => dayofmonth(c).cast("long")
          case "day_of_week" => (weekday(c) + lit(1)).cast("long")
          case "day_of_year" => dayofyear(c).cast("long")
          case "hour_of_day" => hour(c).cast("long")
          case "minute_of_hour" => minute(c).cast("long")
          case "second_of_minute" => second(c).cast("long")
          case other => throw ParseError(s"unsupported DATE_EXTRACT field $other", 0)
        }
      case ("GREATEST", xs) if xs.nonEmpty => greatest(xs.map(compileExpr): _*)
      case ("LEAST", xs) if xs.nonEmpty => least(xs.map(compileExpr): _*)
      case ("POW", Seq(a, b)) => pow(compileExpr(a), compileExpr(b))
      case ("SQRT", Seq(x)) => sqrt(compileExpr(x))
      case ("FLOOR", Seq(x)) => floor(compileExpr(x))
      case ("CEIL", Seq(x)) => ceil(compileExpr(x))
      // ES|QL LOG: 1-arg natural, 2-arg LOG(base, value)
      case ("LOG", Seq(x)) => log(compileExpr(x))
      case ("LOG", Seq(NumLit(b), x)) => log(b.toDouble, compileExpr(x))
      case ("LOG10", Seq(x)) => log10(compileExpr(x))
      case ("EXP", Seq(x)) => exp(compileExpr(x))
      case ("SIGNUM", Seq(x)) => signum(compileExpr(x))
      // ---------------- trigonometric / hyperbolic residue (all pure
      // codegen doubles; engine-compared values round through the
      // language's own ROUND per the determinism discipline)
      case ("SIN", Seq(x)) => sin(compileExpr(x))
      case ("COS", Seq(x)) => cos(compileExpr(x))
      case ("TAN", Seq(x)) => tan(compileExpr(x))
      case ("ASIN", Seq(x)) => asin(compileExpr(x))
      case ("ACOS", Seq(x)) => acos(compileExpr(x))
      case ("ATAN", Seq(x)) => atan(compileExpr(x))
      case ("ATAN2", Seq(y, x)) => atan2(compileExpr(y), compileExpr(x))
      case ("SINH", Seq(x)) => sinh(compileExpr(x))
      case ("COSH", Seq(x)) => cosh(compileExpr(x))
      case ("TANH", Seq(x)) => tanh(compileExpr(x))
      case ("CBRT", Seq(x)) => cbrt(compileExpr(x))
      case ("HYPOT", Seq(a, b)) => hypot(compileExpr(a), compileExpr(b))
      case ("PI", Seq()) => lit(math.Pi)
      case ("TAU", Seq()) => lit(2 * math.Pi)
      case ("E", Seq()) => lit(math.E)
      case ("TO_DEGREES", Seq(x)) => degrees(compileExpr(x))
      case ("TO_RADIANS", Seq(x)) => radians(compileExpr(x))
      case ("TO_DOUBLE", Seq(x)) => compileExpr(x).cast("double")
      case ("TO_INTEGER", Seq(x)) => compileExpr(x).cast("int")
      case ("TO_BOOLEAN", Seq(x)) => compileExpr(x).cast("boolean")
      // ---------------- multivalue residue (per-row bounded arrays;
      // the HOF-backed ones — MV_SUM/MV_AVG — run over the row's own
      // multivalue, the bounded-HOF class the plan discipline allows)
      case ("MV_MIN", Seq(x)) => array_min(compileExpr(x))
      case ("MV_MAX", Seq(x)) => array_max(compileExpr(x))
      case ("MV_SUM", Seq(x)) =>
        aggregate(compileExpr(x), lit(0.0), (a, v) => a + v.cast("double"))
      case ("MV_AVG", Seq(x)) =>
        val c = compileExpr(x)
        aggregate(c, lit(0.0), (a, v) => a + v.cast("double")) / size(c)
      case ("MV_DEDUPE", Seq(x)) => array_distinct(compileExpr(x))
      case ("MV_SORT", Seq(x)) => sort_array(compileExpr(x))
      case ("MV_SORT", Seq(x, StrLit(o))) =>
        sort_array(compileExpr(x), asc = !o.equalsIgnoreCase("DESC"))
      case ("MV_FIRST", Seq(x)) => element_at(compileExpr(x), 1)
      case ("MV_LAST", Seq(x)) => element_at(compileExpr(x), -1)
      // MV_SLICE is 0-based inclusive in ES
      case ("MV_SLICE", Seq(x, NumLit(a), NumLit(b))) =>
        slice(compileExpr(x), a.toInt + 1, b.toInt - a.toInt + 1)
      case ("MV_CONCAT", Seq(x, StrLit(d))) => array_join(compileExpr(x), d)
      case ("MV_APPEND", Seq(a, b)) => concat(compileExpr(a), compileExpr(b))
      // numeric multivalue stats: elements cast to double FIRST (the
      // MV_SUM discipline), degenerate elements DROPPED (a null element,
      // or a non-numeric string that casts to null, would sort first and
      // still be counted by size() — silently shifting every rank
      // position), then sorted numerically. MV_MEDIAN averages the
      // middle pair (odd n picks the same middle twice — exact);
      // MV_PERCENTILE is the standard (n−1)·p linear interpolation,
      // DuckDB's quantile_cont formula, with p validated at plan time
      // (an out-of-range p would drive element_at out of bounds — a
      // silent null/ANSI error instead of the ParseError contract).
      case ("MV_MEDIAN", Seq(x)) =>
        val s0 = sort_array(filter(
          transform(compileExpr(x), v => v.try_cast("double")), v => v.isNotNull))
        val n = size(s0)
        when(n === 0, lit(null).cast("double")).otherwise(
          (element_at(s0, ((n + 1) / 2).cast("int")) +
            element_at(s0, (n / 2).cast("int") + 1)) / 2)
      // a negative literal parses as Neg(NumLit) — it must hit the same
      // plan-time validation, not fall through to "unsupported function"
      case ("MV_PERCENTILE", Seq(_, Neg(NumLit(p)))) =>
        throw ParseError(s"MV_PERCENTILE expects p in [0, 100], got -$p", 0)
      case ("MV_PERCENTILE", Seq(x, NumLit(p))) =>
        if (p < 0 || p > 100)
          throw ParseError(s"MV_PERCENTILE expects p in [0, 100], got $p", 0)
        val s0 = sort_array(filter(
          transform(compileExpr(x), v => v.try_cast("double")), v => v.isNotNull))
        val n = size(s0)
        val h = (n - 1).cast("double") * lit(p.toDouble / 100)
        val lo = floor(h).cast("int")
        when(n === 0, lit(null).cast("double")).otherwise(
          element_at(s0, lo + 1) +
            (h - lo.cast("double")) *
            (element_at(s0, least(lo + 2, n)) - element_at(s0, lo + 1)))
      // MV_MEDIAN_ABSOLUTE_DEVIATION: median(|v − median(v)|) over the
      // row's own multivalue — the MV_MEDIAN machinery applied twice
      // (bounded arrays; the same null-drop + try_cast discipline)
      case ("MV_MEDIAN_ABSOLUTE_DEVIATION", Seq(x)) =>
        val s0 = sort_array(filter(
          transform(compileExpr(x), v => v.try_cast("double")), v => v.isNotNull))
        val n = size(s0)
        val med = (element_at(s0, ((n + 1) / 2).cast("int")) +
          element_at(s0, (n / 2).cast("int") + 1)) / 2
        val devs = sort_array(transform(s0, v => abs(v - med)))
        when(n === 0, lit(null).cast("double")).otherwise(
          (element_at(devs, ((n + 1) / 2).cast("int")) +
            element_at(devs, (n / 2).cast("int") + 1)) / 2)
      // MV_PSERIES_WEIGHTED_SUM: Σ v(i) / i^p over the multivalue in
      // its given order (ES 8.16's rank-weighted score reducer).
      // Degenerate elements DROP before weighting (the sibling
      // reducers' null-drop + try_cast discipline — one unparseable
      // element must not null the whole sum; the drop shifts later
      // ranks, same as MV_MEDIAN's positions). Negative p is valid
      // (i^-p weights later elements up), so Neg literals normalize.
      case ("MV_PSERIES_WEIGHTED_SUM", Seq(x, Neg(NumLit(p)))) =>
        compileExpr(Func("MV_PSERIES_WEIGHTED_SUM", Seq(x, NumLit(-p))))
      case ("MV_PSERIES_WEIGHTED_SUM", Seq(x, NumLit(p))) =>
        val arr = filter(
          transform(compileExpr(x), v => v.try_cast("double")), v => v.isNotNull)
        val weighted = zip_with(arr, sequence(lit(1), size(arr)),
          (v, i) => v / pow(i.cast("double"), lit(p.toDouble)))
        when(size(arr) === 0, lit(null).cast("double")).otherwise(
          aggregate(weighted, lit(0.0), (a, v) => a + v))
      // MV_ZIP pairs values with a delimiter; the longer side's excess
      // values pass through bare (zip_with pads with null, concat_ws
      // skips it — exactly ES's contract)
      case ("MV_ZIP", Seq(a, b)) =>
        zip_with(compileExpr(a), compileExpr(b), (x, y) => concat_ws(",", x, y))
      case ("MV_ZIP", Seq(a, b, StrLit(d))) =>
        zip_with(compileExpr(a), compileExpr(b), (x, y) => concat_ws(d, x, y))
      // ---------------- date functions. DATE_TRUNC takes ES|QL's span
      // literal (`1 day`, `4 hours`): calendar units truncate via
      // date_trunc (multiples >1 are rejected — ES's calendar/fixed
      // interval split), fixed-width units floor epoch-micros to the
      // span width in pure long arithmetic (codegen, no session-zone
      // dependence). DATE_DIFF truncates toward zero like ES. NOW() is
      // deliberately absent: a wall-clock read is nondeterministic and
      // the engine's results must replay byte-equal.
      // CATEGORIZE — 9.x's log-template grouping function (STATS … BY
      // cat = CATEGORIZE(message)): the ns_agg_categorize_text
      // normalization (digit runs collapse to `?`) as a grouping
      // expression — one codegen regexp pass per row.
      case ("CATEGORIZE", Seq(x)) =>
        regexp_replace(compileExpr(x), "[0-9]+", "?")
      case ("DATE_TRUNC", Seq(SpanLit(n, u), x)) =>
        val fixedMicros = Map("millisecond" -> 1000L, "second" -> 1000000L,
          "minute" -> 60000000L, "hour" -> 3600000000L, "day" -> 86400000000L)
        fixedMicros.get(u) match {
          case Some(w) =>
            val width = lit(n * w)
            val us = unix_micros(compileExpr(x))
            timestamp_micros(us - pmod(us, width))
          case None =>
            if (n != 1L) throw ParseError(s"DATE_TRUNC: calendar unit $u takes span 1", 0)
            date_trunc(u, compileExpr(x))
        }
      case ("DATE_FORMAT", Seq(StrLit(fmt), x)) =>
        // ES renders dates in UTC regardless of any client setting;
        // Spark's date_format renders in the SESSION zone. For
        // ZONE-FREE patterns, shift the instant by the session offset
        // (to_utc_timestamp = ts − off) so the session-zone renderer
        // shows the UTC field values — DATE_PARSE(fmt, DATE_FORMAT(fmt,
        // ts)) is then an identity in any embedding session (the r18
        // DATE_PARSE pin fixed only half the pair). In a UTC session
        // the shift is zero, so every oracle stays bit-equal. A
        // ZONE-BEARING pattern (z/Z/X/x/O/V/v outside quoted literal
        // sections — the DATE_PARSE scan) cannot ride that trick: the
        // shifted render would print the UTC wall-clock under the
        // SESSION zone's label (r20 advice). It renders through the
        // genuinely UTC-pinned UtcDateFormat expression instead, so
        // the zone field prints UTC with the UTC wall-clock.
        val unquotedF = fmt.replaceAll("'[^']*'", "")
        if (unquotedF.exists(c => "zZXxOVv".contains(c)))
          graft.Cols.column(org.apache.spark.sql.graftshim.UtcDateFormat(
            graft.Cols.expr(compileExpr(x).cast("timestamp")), fmt))
        else
          date_format(to_utc_timestamp(compileExpr(x), current_timezone()), fmt)
      // DATE_PARSE(pattern, string) — DATE_FORMAT's inverse (the weekly
      // log-pipeline hit: a stringly date column back to TIMESTAMP).
      // ES's contract on unparseable input is null-with-warning, not an
      // error — try_to_timestamp, still codegen.
      case ("DATE_PARSE", Seq(StrLit(fmt), x)) =>
        // ES reads unzoned date input as UTC; Spark's parser reads it
        // in the SESSION timezone. When the plan-time pattern carries
        // no zone directive (checked outside quoted literal sections),
        // pin UTC by appending an explicit +0000 to both string and
        // pattern — the TO_DATE_NANOS discipline, applied to the
        // shared string-parse principle (second review pass). A
        // zone-bearing pattern parses as written.
        val unquoted = fmt.replaceAll("'[^']*'", "")
        if (unquoted.exists(c => "zZXxOVv".contains(c)))
          try_to_timestamp(compileExpr(x), lit(fmt))
        else
          try_to_timestamp(concat(compileExpr(x), lit(" +0000")), lit(fmt + " Z"))
      case ("DATE_DIFF", Seq(StrLit(unit), a, b)) =>
        val w = Map("milliseconds" -> 1000L, "seconds" -> 1000000L,
          "minutes" -> 60000000L, "hours" -> 3600000000L, "days" -> 86400000000L)
          .getOrElse(unit, throw ParseError(s"DATE_DIFF: unknown unit $unit", 0))
        // double divide + long cast truncates toward zero — ES's contract
        ((unix_micros(compileExpr(b)) - unix_micros(compileExpr(a)))
          .cast("double") / w).cast("long")
      case ("TO_DATETIME", Seq(x)) => timestamp_millis(compileExpr(x).cast("long"))
      // ---------------- IP functions (IPv4): the u32 form is pure long
      // arithmetic over the dotted octets — one codegen pass, and a
      // CIDR whose bits are a prefix of the scanned column's value
      // domain stays a cheap row filter.
      case ("CIDR_MATCH", ip +: cidrs) if cidrs.nonEmpty =>
        val u = ip4u32(compileExpr(ip))
        cidrs.map {
          case StrLit(c) =>
            val (net, p) = parseCidr(c)
            if (p == 0) lit(true)
            else (shiftright(u, 32 - p) === lit(net >>> (32 - p))): Column
          case _ => throw ParseError("CIDR_MATCH expects literal cidr strings", 0)
        }.reduce(_ || _)
      case ("IP_PREFIX", Seq(ip, NumLit(p), NumLit(_))) =>
        val bits = p.toInt
        if (bits < 0 || bits > 32) throw ParseError("IP_PREFIX: bits in [0,32]", 0)
        val masked =
          if (bits == 0) lit(0L)
          else shiftleft(shiftright(ip4u32(compileExpr(ip)), 32 - bits), 32 - bits)
        concat_ws(".",
          (shiftright(masked, 24) % 256).cast("string"),
          (shiftright(masked, 16) % 256).cast("string"),
          (shiftright(masked, 8) % 256).cast("string"),
          (masked % 256).cast("string"))
      // ---------------- spatial functions (ES|QL 8.14+). The dialect's
      // geo_point is a STRUCT(lon, lat); TO_GEOPOINT parses the WKT
      // POINT form (invalid → null, the conversion contract), ST_X/ST_Y
      // extract, ST_DISTANCE is the engine's shared haversine (meters,
      // same operation order as the ns_geo family so both engines'
      // IEEE steps stay bit-aligned; only the transcendental calls can
      // differ, within 1 ulp, absorbed by the key's ROUND). Shapes:
      // TO_GEOSHAPE supports the WKT ENVELOPE form (minLon, maxLon,
      // maxLat, minLat) — the bounding-box class every dashboard map
      // sends; polygon shapes live in the ns_geo_* operator family.
      // ST_CONTAINS/ST_WITHIN/ST_INTERSECTS implement the point-vs-
      // envelope relations (for a point argument the three coincide up
      // to argument order). All pure codegen arithmetic.
      case ("TO_GEOPOINT", Seq(x)) => wktPointStruct(compileExpr(x), "lon", "lat")
      // ST_X/ST_Y and ST_DISTANCE are TYPE-DIRECTED across both
      // coordinate systems (geo haversine meters / cartesian Euclidean)
      // — graftshim.GeoCoordAccessor / SpatialDistance
      case ("ST_X" | "ST_Y", Seq(p)) => graft.Cols.column(
        org.apache.spark.sql.graftshim.GeoCoordAccessor(
          graft.Cols.expr(compileExpr(p)), name.drop(3).toLowerCase))
      case ("ST_DISTANCE", Seq(a, b)) => graft.Cols.column(
        org.apache.spark.sql.graftshim.SpatialDistance(
          graft.Cols.expr(compileExpr(a)), graft.Cols.expr(compileExpr(b))))
      // cartesian_point: the planar twin ES serves for `point` fields
      // (CAD / floor plans / game worlds — no wrap, no mercator); same
      // WKT POINT form, struct(x, y) — ONE shared parser with the geo
      // twin, so the accepted input set can never diverge between them
      case ("TO_CARTESIANPOINT", Seq(x)) => wktPointStruct(compileExpr(x), "x", "y")
      // TO_CARTESIANSHAPE: the planar ENVELOPE twin — ONE shared box
      // grammar with TO_GEOSHAPE (wktEnvelopeStruct), emitted in the
      // min_x layout the cartesian GeoCoordAccessor reads back
      case ("TO_CARTESIANSHAPE", Seq(x)) =>
        wktEnvelopeStruct(compileExpr(x), "min_x", "max_x", "max_y", "min_y")
      // TO_DATE_NANOS (9.1): date_nanos is CARRIED AS epoch-nanos LONG
      // — the representation Spark itself gives parquet TIMESTAMP(NANOS)
      // (nanosAsLong; the events table ships that encoding), so the
      // micro-precision TimestampType never silently truncates a nanos
      // value. Keyword input: strict ISO with 1–9 fraction digits and
      // an optional Z — the timestamp cast keeps the first 6 fraction
      // digits (micros) and the 7th–9th come back as the nano tail.
      // Date input: micros × 1000; long input: already epoch-nanos.
      // The leg is picked from the RESOLVED input type at analysis
      // time (graftshim.EsqlToDateNanos, the RequireFloatVec pattern).
      // The seconds head parses with an EXPLICIT +0000 so the result
      // is the same instant in any embedding session's timezone — ES
      // reads unzoned date strings as UTC, and a string carrying 'Z'
      // must never be silently reinterpreted as session-local time
      // (review finding). The fraction never reaches the parser: the
      // full 9-digit tail is added as nanos arithmetic.
      case ("TO_DATE_NANOS", Seq(x)) =>
        val c = compileExpr(x)
        // r19 (advice): ES date_nanos keyword input also accepts NUMERIC
        // offsets ("+01:00"), not just Z — group 3 captures the offset
        // and the seconds head parses with it ('XXX' reads both "Z" and
        // "±HH:MM"; an absent offset defaults to Z, ES's unzoned-is-UTC
        // read). An out-of-range offset ("+99:00") passes the regex but
        // nulls in try_to_timestamp — the null-with-warning contract.
        val rx = "^(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2})" +
          "(?:\\.(\\d{1,9}))?(Z|[+-]\\d{2}:\\d{2})?$"
        val frac = regexp_extract(c, rx, 2)
        val nanoTail =
          rpad(when(frac === "", lit("0")).otherwise(frac), 9, "0").cast("long")
        val zone = regexp_extract(c, rx, 3)
        val fromString = when(c.rlike(rx),
          unix_micros(try_to_timestamp(
            concat(regexp_extract(c, rx, 1),
              when(zone === "", lit("Z")).otherwise(zone)),
            lit("yyyy-MM-dd'T'HH:mm:ssXXX"))) * 1000L + nanoTail)
        // NTZ leg (advice): a TIMESTAMP_NTZ is a zoneless wall-clock; ES
        // reads unzoned as UTC, so lift the session-zone cast back by
        // the session offset (from_utc_timestamp = ts + off) — exactly
        // the DATE_FORMAT UTC-pin discipline, inverted. UTC session →
        // zero shift.
        val fromNtz = unix_micros(from_utc_timestamp(
          c.cast("timestamp"), current_timezone())) * 1000L
        graft.Cols.column(org.apache.spark.sql.graftshim.EsqlToDateNanos(
          graft.Cols.expr(c), graft.Cols.expr(fromString),
          graft.Cols.expr(unix_micros(c.cast("timestamp")) * 1000L),
          graft.Cols.expr(fromNtz)))
      // TO_VERSION: ES's version type is a keyword whose ORDER is
      // semver-aware. Carried as an order-preserving ENCODED keyword:
      // zero-padded numeric parts, then "-<prerelease>" or "~" for a
      // release ('-' < '~' in ASCII, so 1.0.0-beta < 1.0.0), then
      // "|" + the original text (distinct inputs stay distinct, e.g.
      // "1.2" vs "1.2.0"). Unparseable versions encode as "~" + input:
      // AFTER every valid version, ordered among themselves by raw
      // string — ES's invalid-after-valid sort contract. Numerals cap
      // at 10 digits (beyond → invalid) so the padding can never
      // truncate-reorder. Prerelease identifiers follow semver's rule
      // 11.4 (r19 advice — r18 compared the whole tag lexically, so
      // "beta.11" mis-sorted before "beta.2"): each dot-identifier
      // encodes as "0" + lpad(10) when all-digits (numeric precedence,
      // and the constant '0' head keeps every numeric below every
      // alphanumeric — 11.4.3) or "1" + id otherwise (ASCII order
      // preserved under the shared '1' head). An all-digit identifier
      // >10 digits falls to the alphanumeric branch (stated cap, the
      // version-core discipline).
      case ("TO_VERSION", Seq(x)) =>
        val c = compileExpr(x)
        val rx = "^(\\d{1,10})(?:\\.(\\d{1,10}))?(?:\\.(\\d{1,10}))?(?:-([0-9A-Za-z.\\-]+))?$"
        def vpart(i: Int): Column = lpad(
          when(regexp_extract(c, rx, i) === "", lit("0"))
            .otherwise(regexp_extract(c, rx, i)), 10, "0")
        val pre = regexp_extract(c, rx, 4)
        // native codegen expression, not a transform() lambda —
        // ArrayTransform is an interpreted fallback and this key's plan
        // is codegen-locked (PlanSpec)
        val preEnc = graft.Cols.column(
          org.apache.spark.sql.graftshim.SemverPreEncode(graft.Cols.expr(pre)))
        // the prerelease terminates with '!' (below every allowed pre
        // char, below SemverPreEncode's ',' identifier joiner, AND
        // below the '|' original-text separator): without it, a
        // prerelease that is a PREFIX of another ("alpha" vs
        // "alpha.1") would compare '|' (0x7C) against ',' (0x2C) and
        // sort AFTER its extension — semver says before
        val enc = concat(vpart(1), lit("."), vpart(2), lit("."), vpart(3),
          when(pre === "", lit("~")).otherwise(concat(lit("-"), preEnc, lit("!"))),
          lit("|"), c)
        when(c.rlike(rx), enc).otherwise(concat(lit("~"), c))
      case ("TO_GEOSHAPE", Seq(x)) =>
        // shared ENVELOPE grammar + gates: see wktEnvelopeStruct (the
        // antimeridian-wrap and lat-degenerate rationale lives there)
        wktEnvelopeStruct(compileExpr(x), "min_lon", "max_lon", "max_lat", "min_lat")
      // argument roles resolve at ANALYSIS time (GeoEnvelopeRelate — the
      // EsqlDivide pattern): ST_INTERSECTS is symmetric; the directed
      // pair enforces its role order with a clear error
      case ("ST_CONTAINS", Seq(x, y)) => geoRelate(x, y, "contains")
      case ("ST_WITHIN", Seq(x, y)) => geoRelate(x, y, "within")
      case ("ST_INTERSECTS", Seq(x, y)) => geoRelate(x, y, "intersects")
      // ST_DISJOINT is intersects' negation by definition (DE-9IM);
      // a null geometry stays null through the NOT, never a wrong bool
      case ("ST_DISJOINT", Seq(x, y)) => !geoRelate(x, y, "intersects", "ST_DISJOINT")
      // 8.18 bounding-box accessors — type-directed at analysis time
      // (point or ENVELOPE; a point's box is itself), each resolving to
      // plain struct-field reads
      case ("ST_ENVELOPE", Seq(x)) => graft.Cols.column(
        org.apache.spark.sql.graftshim.GeoEnvelopeOf(graft.Cols.expr(compileExpr(x))))
      case ("ST_XMIN" | "ST_XMAX" | "ST_YMIN" | "ST_YMAX", Seq(x)) => graft.Cols.column(
        org.apache.spark.sql.graftshim.GeoCoordAccessor(
          graft.Cols.expr(compileExpr(x)), name.drop(3).toLowerCase))
      // ---------------- spatial grid functions (ES|QL 8.16+): bucket a
      // point into a map-grid cell, the scalar twins of the geotile/
      // geohash/geohex AGGREGATIONS (ops/Enrich.scala — same cell math,
      // same margins discipline). Dialect note: ES returns an opaque
      // long cell id plus a *_TO_STRING converter; this dialect returns
      // the display form directly (the value every consumer renders),
      // one codegen projection either way. Zoom/precision must be
      // plan-time literals (they are in every ES|QL example — the grid
      // is the query's resolution, not data).
      case ("ST_GEOTILE", Seq(p, NumLit(z))) =>
        if (!z.isWhole || !z.isValidInt || z < 0 || z > 29)
          throw ParseError(s"ST_GEOTILE zoom must be an integer in [0, 29], got $z", 0)
        val zi = z.toIntExact
        val pc = compileExpr(p)
        val (lon, lat) = (pc.getField("lon"), pc.getField("lat"))
        val n = 1 << zi
        // the geotile web-mercator formula, term-for-term the
        // ns_agg_geotile_grid text (integer-lat inputs sit ≥5.9e-4
        // tiles from every z=3 boundary except exactly-representable
        // lat 0 — 12 orders above transcendental ulp risk); x and y
        // CLAMP to [0, 2^z−1] like ES's GeoTileUtils — lon +180 and
        // poles beyond the ±85.05° mercator range fold into the edge
        // tiles instead of minting out-of-range ids
        val tx = least(greatest(floor((lon + 180) / 360 * n).cast("long"), lit(0L)),
          lit(n - 1L))
        val ty = least(greatest(floor((lit(1.0) - log(tan(lat * lit(math.Pi) / 180) +
          lit(1.0) / cos(lat * lit(math.Pi) / 180)) / lit(math.Pi)) / 2 * n).cast("long"),
          lit(0L)), lit(n - 1L))
        concat(lit(s"$zi/"), tx, lit("/"), ty)
      case ("ST_GEOHASH", Seq(p, NumLit(prec))) =>
        if (!prec.isWhole || !prec.isValidInt || prec < 1 || prec > 6)
          throw ParseError(s"ST_GEOHASH precision must be an integer in [1, 6], got $prec", 0)
        val pr = prec.toIntExact
        val pc = compileExpr(p)
        val (lon, lat) = (pc.getField("lon"), pc.getField("lat"))
        val bitsTotal = 5 * pr
        val lonBits = (bitsTotal + 1) / 2
        val latBits = bitsTotal / 2
        // quantize (clamped BOTH sides like ST_GEOTILE — the +180/+90
        // edge folds into the last cell like ES, and a below-range
        // coordinate folds into cell 0 instead of feeding a negative
        // index into the interleave and minting a garbage geohash —
        // r16 advice), then the geohash lon-first bit interleave —
        // no transcendental anywhere, bit-exact by construction
        val ix = least(greatest(floor((lon + 180) / 360 * (1L << lonBits)).cast("long"),
          lit(0L)), lit((1L << lonBits) - 1))
        val iy = least(greatest(floor((lat + 90) / 180 * (1L << latBits)).cast("long"),
          lit(0L)), lit((1L << latBits) - 1))
        val cell = (0 until bitsTotal).map { j => // j = 0 is the msb
          val weight = 1L << (bitsTotal - 1 - j)
          val bit =
            if (j % 2 == 0) shiftright(ix, lonBits - 1 - j / 2) % 2
            else shiftright(iy, latBits - 1 - (j - 1) / 2) % 2
          bit * weight
        }.reduce(_ + _)
        val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        concat((0 until pr).map { k =>
          lit(base32).substr((shiftright(cell, 5 * (pr - 1 - k)) % 32).cast("int") + 1, lit(1))
        }: _*)
      case ("ST_GEOHEX", Seq(p)) =>
        val pc = compileExpr(p)
        val (lon, lat) = (pc.getField("lon"), pc.getField("lat"))
        // the ns_agg_geohex_grid affine hex lattice (no H3 library in
        // this sandbox — hexagonal Voronoi cells of two interleaved
        // offset lattices, exact integer arithmetic on doubled
        // coordinates; one fixed resolution, the lattice period)
        val lx = (lon * 2).cast("long")
        val ly = (lat * 2).cast("long")
        val hax = floor((lx + 18) / lit(36.0)).cast("long") * 36
        val hay = floor((ly + 31) / lit(62.0)).cast("long") * 62
        val hbx = floor(lx / lit(36.0)).cast("long") * 36 + 18
        val hby = floor(ly / lit(62.0)).cast("long") * 62 + 31
        val hda = (lx - hax) * (lx - hax) + (ly - hay) * (ly - hay)
        val hdb = (lx - hbx) * (lx - hbx) + (ly - hby) * (ly - hby)
        val hx = when(hda <= hdb, hax).otherwise(hbx)
        val hy = when(hda <= hdb, hay).otherwise(hby)
        concat(hx, lit("/"), hy)
      // ---------------- full-text functions (9.x: relevance predicates
      // inside WHERE). ES resolves the searched field from the index
      // default; this dialect names it as the first argument. Each
      // compiles onto the engine's OWN language machinery — one boolean
      // codegen expression, no second engine.
      case ("KNN", _) => throw ParseError(
        "KNN is a WHERE-level match function — use it as a positive " +
          "top-level conjunct of WHERE", 0)
      case ("MATCH", Seq(Ident(f), StrLit(q))) =>
        // match query, default OR operator: any analyzed term present
        val terms = q.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        if (terms.isEmpty) lit(false)
        else arrays_overlap(split(trim(col(f)), " "), array(terms.map(lit): _*))
      // MATCH_PHRASE (9.1): the query terms must appear CONSECUTIVELY
      // in order — space-padded containment over the whitespace
      // analysis, the engine's shared phrase discipline (SearchExt's
      // match_phrase / the box languages' quoted phrase). Like those
      // siblings, the FIELD is analyzed on single spaces (the engine's
      // whole-corpus convention) while the QUERY normalizes on \s+ —
      // a field with multi-space runs between tokens phrase-matches
      // only its literal spacing, a stated deviation from ES's
      // position-based phrase
      case ("MATCH_PHRASE", Seq(Ident(f), StrLit(q))) =>
        val terms = q.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        if (terms.isEmpty) lit(false)
        else concat(lit(" "), trim(col(f)), lit(" "))
          .contains(" " + terms.mkString(" ") + " ")
      // MULTI_MATCH (9.1): the match query over SEVERAL fields, OR'd
      // (ES's best_fields existence semantics at WHERE level — a doc
      // matches if ANY field matches)
      case ("MULTI_MATCH", StrLit(q) +: fs) if fs.nonEmpty &&
          fs.forall(_.isInstanceOf[Ident]) =>
        fs.map(f => compileExpr(Func("MATCH", Seq(f, StrLit(q)))))
          .reduce(_ || _)
      // TERM: the UN-analyzed exact term — matches when any whitespace
      // token of the field equals the value verbatim (on a keyword-ish
      // single-token column this reduces to plain equality). An EMPTY
      // value matches exactly the wholly-empty-keyword rows ("" is an
      // indexed keyword term under ES's term-query contract)
      case ("TERM", Seq(Ident(f), StrLit(v))) =>
        // The field splits on whitespace RUNS (" +") with empty tokens
        // FILTERED: multi-space runs and edge whitespace must not mint
        // phantom "" tokens. Only the WHOLLY empty field ("") carries
        // the one "" term, matched by the dedicated branch — under
        // ES's term-query contract "" is an indexed keyword term, and
        // a whitespace-only field ("  ") is a DIFFERENT keyword that
        // must match neither "" nor anything else (r19 advice: the r18
        // trim-based form collapsed "  " onto "" and over-matched).
        when(col(f) === "", lit(v == ""))
          .otherwise(array_contains(
            filter(split(col(f), " +"), t => t =!= lit("")), v))
      case ("QSTR", Seq(Ident(f), StrLit(q))) =>
        val ast = QueryStringParser.parse(q)
        QueryStringParser.compile(ast, col(f), qstrFieldMap(ast))
      case ("KQL", Seq(Ident(f), StrLit(q))) =>
        val ast = KqlParser.parse(q)
        val (kw, num) = kqlFieldMaps(ast)
        KqlParser.compile(ast, col(f), kw, num)
      case (other, xs) =>
        throw ParseError(s"unsupported function $other/${xs.size}", 0)
    }
  }

  /** Field-name → Column bindings for an embedded query_string: every
    * `field:…` clause in the parsed AST binds to the frame's column of
    * that name (ES binds them to the index mapping; the frame IS the
    * mapping here). */
  private def qstrFieldMap(n: QueryStringParser.Node): Map[String, Column] = {
    import QueryStringParser.{Node, Term, Prefix, Phrase}
    def go(n: Node): Set[String] = n match {
      case Term(f, _) => f.toSet
      case Prefix(f, _) => f.toSet
      case Phrase(f, _) => f.toSet
      case QueryStringParser.And(l, r) => go(l) ++ go(r)
      case QueryStringParser.Or(l, r) => go(l) ++ go(r)
      case QueryStringParser.Not(x) => go(x)
    }
    go(n).map(f => f -> col(f)).toMap
  }

  /** Keyword/numeric field bindings for an embedded KQL query: match
    * and phrase clauses bind as keyword columns, range clauses as
    * numeric columns — both to the frame's same-named column. */
  private def kqlFieldMaps(n: KqlParser.Node)
      : (Map[String, Column], Map[String, Column]) = {
    import KqlParser.{Node, MatchQ, PhraseQ, RangeQ}
    def kw(n: Node): Set[String] = n match {
      case MatchQ(f, _) => f.toSet
      case PhraseQ(f, _) => f.toSet
      case RangeQ(_, _, _) => Set.empty
      case KqlParser.And(l, r) => kw(l) ++ kw(r)
      case KqlParser.Or(l, r) => kw(l) ++ kw(r)
      case KqlParser.Not(x) => kw(x)
    }
    def num(n: Node): Set[String] = n match {
      case RangeQ(f, _, _) => Set(f)
      case KqlParser.And(l, r) => num(l) ++ num(r)
      case KqlParser.Or(l, r) => num(l) ++ num(r)
      case KqlParser.Not(x) => num(x)
      case _ => Set.empty
    }
    (kw(n).map(f => f -> col(f)).toMap, num(n).map(f => f -> col(f)).toMap)
  }

  // ------------------------------------------------- dissect / grok patterns
  private val keyRx = "%\\{([^}]*)\\}".r

  /** Dissect template → (anchored regex, capture keys). Literal runs are
    * regex-quoted; every `%{key}` becomes a lazy capture; `%{}` and
    * `%{?name}` (named skip) consume without capturing; the `->`
    * right-padding modifier is honored by absorbing trailing spaces. */
  private[graft] def dissectRegex(pattern: String): (String, Seq[String]) = {
    val keys = Seq.newBuilder[String]
    val sb = new StringBuilder("^")
    var last = 0
    for (m <- keyRx.findAllMatchIn(pattern)) {
      if (m.start > last) sb.append(java.util.regex.Pattern.quote(pattern.substring(last, m.start)))
      val raw = m.group(1)
      val padded = raw.endsWith("->")
      val name = raw.stripSuffix("->")
      if (name.isEmpty || name.startsWith("?")) sb.append("(?:.*?)")
      else { keys += name; sb.append("(.*?)") }
      if (padded) sb.append(" *")
      last = m.end
    }
    if (last < pattern.length) sb.append(java.util.regex.Pattern.quote(pattern.substring(last)))
    sb.append("$")
    val ks = keys.result()
    if (ks.isEmpty) throw ParseError("dissect pattern has no %{key} captures", 0)
    (sb.toString, ks)
  }

  /** The grok pattern dictionary (the subset the synthesized fixtures
    * exercise — each name is the stock ES/logstash definition's shape). */
  private val grokDefs: Map[String, String] = Map(
    "WORD" -> "\\w+",
    "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?\\d+",
    "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?",
    "IP" -> "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}",
    "HTTPDATE" -> "[^\\]]+",
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "USER" -> "[a-zA-Z0-9._-]+",
    "LOGLEVEL" -> "[A-Za-z]+",
    "UUID" -> "[0-9a-fA-F-]{36}")

  private val grokRefRx = "%\\{(\\w+)(?::([\\w.@]+))?(?::(int|long|float|double|string))?\\}".r

  /** Grok pattern → (regex, (name, type) captures). Text outside `%{…}`
    * is raw regex (true grok semantics — unlike dissect, nothing is
    * quoted); `%{SYNTAX:name:type}` becomes a named capture with a cast,
    * `%{SYNTAX}` a non-capturing consume. Unanchored, like ES. */
  private[graft] def grokRegex(pattern: String): (String, Seq[(String, String)]) = {
    val keys = Seq.newBuilder[(String, String)]
    val sb = new StringBuilder
    var last = 0
    for (m <- grokRefRx.findAllMatchIn(pattern)) {
      sb.append(pattern.substring(last, m.start))
      val syntax = m.group(1).toUpperCase
      val sub = grokDefs.getOrElse(syntax,
        throw ParseError(s"unknown grok pattern %{$syntax}", 0))
      Option(m.group(2)) match {
        case Some(name) =>
          keys += (name -> Option(m.group(3)).getOrElse("string"))
          sb.append("(").append(sub).append(")")
        case None => sb.append("(?:").append(sub).append(")")
      }
      last = m.end
    }
    sb.append(pattern.substring(last))
    val ks = keys.result()
    if (ks.isEmpty) throw ParseError("grok pattern has no named captures", 0)
    (sb.toString, ks)
  }

  /** One-pass extraction: a single codegen matched-flag extraction
    * expression evaluates the pattern once per row, then the typed
    * fields flatten out. The expression's ES-dialect mode already
    * separates the cases the legacy empty-string convention conflated:
    * fields are null exactly when the whole pattern failed (or, for
    * grok, the group did not participate), while a matched-but-EMPTY
    * capture (adjacent dissect delimiters) stays `""` — ES dissect's
    * actual contract. Typed casts stay ANSI-safe: null casts to null,
    * and the numeric grok patterns (`INT`/`NUMBER`) cannot match empty. */
  private def applyExtract(df: DataFrame, g: Column,
                           keys: Seq[(String, String)]): DataFrame = {
    // explode(array(…)) materializes the struct through a Generate:
    // downstream WHEREs on extracted fields would otherwise be pushed
    // THROUGH the projection, inlining (and re-evaluating) the regex
    // once per referencing predicate and branch — measured 6
    // occurrences in the plan and ~5× the runtime. Behind the Generate
    // the pattern runs exactly once per row; every field below is a
    // cheap struct access.
    val flat = keys.foldLeft(
      df.select(col("*"), explode(array(g)).as("__extract"))) { case (d, (n, t)) =>
      val raw = col("__extract").getField(n)
      d.withColumn(n, t match {
        case "int" | "long" => raw.cast("long")
        case "float" | "double" => raw.cast("double")
        case _ => raw
      })
    }
    flat.drop("__extract")
  }

  /** CHANGE_POINT: the CUSUM-style single-mean-shift argmax over the
    * key-ordered series (the ns_agg_change_point scoring — k·(n−k)·
    * (meanL − meanR)², exact-long prefix sums, ties broken by key),
    * attached NON-COLLAPSING: the argmax row gains (typeName,
    * pvalName = round(1/(1+score), 6), a deterministic monotone map of
    * the shift score shared verbatim with the oracle); every other row
    * keeps nulls. The command runs over the pipeline's already-
    * aggregated series (ES itself caps CHANGE_POINT input at 1000
    * rows), so the single-partition windows order a |series|-bounded
    * table — never corpus rows (the adjudicated serial_diff shape). */
  private def compileChangePoint(df: DataFrame, v: String, k: String,
                                 tn: String, pn: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(k))
    val wAll = Window.orderBy(col(k))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val meanL = col("__cp_sk").cast("double") / col("__cp_k")
    val meanR = (col("__cp_st") - col("__cp_sk")).cast("double") /
      (col("__cp_n") - col("__cp_k"))
    val score = col("__cp_k").cast("double") * (col("__cp_n") - col("__cp_k")) *
      (meanL - meanR) * (meanL - meanR)
    df.withColumn("__cp_k", row_number().over(w).cast("long"))
      .withColumn("__cp_sk", sum(col(v)).over(w))
      .withColumn("__cp_st", sum(col(v)).over(wAll))
      .withColumn("__cp_n", count(lit(1)).over(wAll))
      .withColumn("__cp_score", when(col("__cp_k") < col("__cp_n"), score))
      .withColumn("__cp_rk", row_number().over(
        Window.orderBy(col("__cp_score").desc_nulls_last, col(k))))
      .withColumn(tn,
        when(col("__cp_rk") === 1 && col("__cp_score").isNotNull, lit("step_change")))
      .withColumn(pn,
        when(col("__cp_rk") === 1 && col("__cp_score").isNotNull,
          round(lit(1.0) / (lit(1.0) + col("__cp_score")), 6)))
      .drop("__cp_k", "__cp_sk", "__cp_st", "__cp_n", "__cp_score", "__cp_rk")
  }

  /** The unaliased aggregate Column — shared by STATS (grouped) and
    * INLINESTATS (windowed via .over). */
  private def compileAggRaw(agg: Agg): Column = {
    // a filtered aggregate gates its input to null outside the filter —
    // every aggregate here ignores nulls, so this IS FILTER(WHERE …)
    def gate(e: Column, f: Option[Expr]): Column =
      f.map(c => when(compileExpr(c), e)).getOrElse(e)
    agg match {
      case CountAll(f) => count(gate(lit(1), f))
      case AggFn("count", e, f) => count(gate(compileExpr(e), f))
      case AggFn("count_distinct", e, f) => countDistinct(gate(compileExpr(e), f))
      case AggFn("sum", e, f) => sum(gate(compileExpr(e), f))
      case AggFn("min", e, f) => min(gate(compileExpr(e), f))
      case AggFn("max", e, f) => max(gate(compileExpr(e), f))
      case AggFn("avg", e, f) => avg(gate(compileExpr(e), f))
      case AggFn("median", e, f) => median(gate(compileExpr(e), f))
      // VALUES: distinct values, SORTED (deterministic where ES leaves
      // multivalue order undefined); nulls drop as in ES
      case AggFn("values", e, f) => sort_array(collect_set(gate(compileExpr(e), f)))
      // TOP: k values by their own ordering, repeats included
      case AggTop(e, k, desc) =>
        slice(sort_array(collect_list(compileExpr(e)), asc = !desc), 1, k)
      // exact sort-based percentile, linear interpolation (the dialect's
      // contract; the engine's mergeable sketch twin is the declared
      // at-scale path — ns_agg_percentile_approx)
      case AggPercentile(e, p) =>
        percentile(compileExpr(e), lit(p.toDouble / 100))
      case AggFn("std_dev", e, f) => stddev_pop(gate(compileExpr(e), f))
      // ST_CENTROID_AGG: component-wise mean of the group's points —
      // ES's geo centroid contract (the ns_agg_geo_centroid discipline)
      case AggFn("st_centroid", e, f) =>
        val c = gate(compileExpr(e), f)
        struct(avg(c.getField("lon")).as("lon"), avg(c.getField("lat")).as("lat"))
      // ST_EXTENT_AGG (9.1): the group's bounding box — four partial-
      // aggregating min/max passes over the point struct, emitted in
      // the SAME struct layout TO_GEOSHAPE's ENVELOPE produces, so the
      // ST_XMIN/…/ST_YMAX accessors compose on the result
      case AggFn("st_extent", e, f) =>
        val c = gate(compileExpr(e), f)
        struct(min(c.getField("lon")).as("min_lon"),
          max(c.getField("lon")).as("max_lon"),
          max(c.getField("lat")).as("max_lat"),
          min(c.getField("lat")).as("min_lat"))
      // ES skips documents whose VALUE is null entirely — their weight
      // must not inflate the denominator, so gate the weight on the
      // value's non-nullness (sum(v*w) already drops null-v rows).
      case AggWavg(v, w) =>
        val (cv, cw) = (compileExpr(v), compileExpr(w))
        sum(cv * cw).cast("double") / sum(when(cv.isNotNull, cw))
      case AggFn(other, _, _) => throw ParseError(s"unsupported aggregate $other", 0)
    }
  }

  private def compileAgg(name: String, agg: Agg): Column =
    compileAggRaw(agg).as(name)

  /** The engine's own `lexical` reranker — an EXACT cross-scorer:
    * per query term, capped term frequency (min(tf, rerankTfCap) — BM25's
    * saturation idea with an exact integer cap) summed over terms.
    * tf counts occurrences in a bar-encoded token string
    * (`|tok||tok|`), where every token carries its OWN delimiters so
    * adjacent repeats count correctly and the whole scorer is plain
    * length/replace arithmetic — one codegen pass, no HOF, no
    * explode. A registered inference endpoint would slot in through
    * the same RERANK seam. */
  /** Exact term frequency of `term` in the whitespace-tokenized `field`
    * via the bar-encoding trick (every token carries its OWN delimiters,
    * so adjacent repeats count) — one codegen pass, no HOF. Shared by
    * the RERANK scorer and the retriever tree's standard/rescorer
    * nodes, so the tokenization can never drift between them. */
  private[graft] def barTf(term: String, field: Column): Column = {
    val bar = concat(lit("|"), regexp_replace(trim(field), " ", "||"), lit("|"))
    val needle = s"|$term|"
    ((length(bar) - length(replace(bar, lit(needle), lit("")))) /
      lit(needle.length)).cast("long")
  }

  /** The lexical reranker's per-term tf saturation cap. 5, not 3 (r20
    * gate-liveness audit): at cap 3 every document on the corpus
    * queries' top page saturated every matched term, so _score was
    * CONSTANT across the reranked page at sf≥0.01 and the rank the
    * command emitted was decided entirely by the doc_id tiebreak — a
    * vacuous reranker. At 5 the top page carries 3–4 distinct scores
    * at every shipped SF while keeping BM25's saturation idea. */
  private[graft] val rerankTfCap = 5L

  private[graft] def lexicalRerankScore(query: String, field: Column): Column = {
    val terms = query.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
    // null-field gate (r17, found planning the rerank fuzzer): barTf of
    // a null field is null and Spark's `least` IGNORES nulls, so
    // least(null, cap) = cap — an ungated sum would score a MISSING
    // field at the saturation cap per term, ranking null docs TOP. A
    // doc without the reranked field scores null instead.
    when(field.isNotNull,
      terms.map(t => least(barTf(t, field), lit(rerankTfCap))).reduce(_ + _))
  }

  /** Materialize `BY name = expr` grouping expressions ahead of the
    * aggregate — ES|QL's inline grouping form, identical to an EVAL
    * immediately before the STATS. */
  private def applyByAssigns(df: DataFrame, as: Seq[(String, Expr)]): DataFrame =
    as.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, compileExpr(e)) }

  private val overTimeFns = Set("RATE", "COUNT_OVER_TIME", "SUM_OVER_TIME",
    "MIN_OVER_TIME", "MAX_OVER_TIME", "AVG_OVER_TIME",
    "FIRST_OVER_TIME", "LAST_OVER_TIME")

  /** TS-mode STATS — ES|QL's time-series aggregation is TWO-LEVEL: the
    * inner RATE / *_OVER_TIME function aggregates each time SERIES (the
    * `_tsid` identity the TSDB index mapping defines — the resolved
    * frame must carry `_tsid` plus an epoch-millis `_ts_ms` strictly
    * increasing within a series, which real TSDB enforces by rejecting
    * duplicate per-series timestamps) within each BY group, and the
    * OUTER aggregate combines across series. Plain aggregates are
    * rewritten onto their over-time twins (COUNT → SUM∘COUNT_OVER_TIME,
    * SUM → SUM∘SUM_OVER_TIME, MIN/MAX likewise) so everything rides the
    * same grouped pass; plain AVG / MEDIAN / COUNT_DISTINCT don't
    * decompose across series and are rejected the way ES rejects
    * non-decomposable TS aggregates.
    *
    * RATE is the TSDB counter rate: reset-adjusted increase (deltas
    * from a lag window partitioned by (BY keys, _tsid), so a delta
    * never crosses a bucket boundary) over the series' observed span,
    * kept exact as a milli-rate long (units/sec × 1000 — the
    * ns_agg_derivative discipline). AVG_OVER_TIME and the outer AVG are
    * exact milli longs the same way.
    *
    * Scale shape: the only window partitions by (BY keys, _tsid) —
    * series-bounded, never corpus-wide — and both aggregation levels
    * are partial-aggregating hash aggregates; the inner table is
    * |groups|×|series| rows, the dimensional cardinality a TSDB is
    * designed around. */
  private def compileTsStats(df: DataFrame, aggs: Seq[(String, Agg)],
                             by: Seq[String]): DataFrame = {
    for (c <- Seq("_tsid", "_ts_ms") if !df.columns.contains(c))
      throw ParseError(s"TS source must carry $c (the TSDB mapping contract)", 0)
    case class TsAgg(name: String, outer: String, inner: String, c: Option[String])
    val norm = aggs.map {
      case (n, AggFn(outer, Func(f, Seq(Ident(c))), None)) if overTimeFns(f) =>
        TsAgg(n, outer, f, Some(c))
      case (n, CountAll(None)) => TsAgg(n, "sum", "COUNT_OVER_TIME", None)
      case (n, AggFn("count", Ident(c), None)) => TsAgg(n, "sum", "COUNT_OVER_TIME", Some(c))
      case (n, AggFn("sum", Ident(c), None)) => TsAgg(n, "sum", "SUM_OVER_TIME", Some(c))
      case (n, AggFn("min", Ident(c), None)) => TsAgg(n, "min", "MIN_OVER_TIME", Some(c))
      case (n, AggFn("max", Ident(c), None)) => TsAgg(n, "max", "MAX_OVER_TIME", Some(c))
      case (n, _) => throw ParseError(
        s"TS STATS: $n must wrap RATE/*_OVER_TIME or be a decomposable plain aggregate", 0)
    }
    import org.apache.spark.sql.expressions.Window
    val grp = by :+ "_tsid"
    val rateCols = norm.collect { case TsAgg(_, _, "RATE", Some(c)) => c }.distinct
    val w = Window.partitionBy(grp.map(col): _*).orderBy(col("_ts_ms"))
    val prepared = rateCols.foldLeft(df)((d, c) =>
      d.withColumn(s"__prev_$c", lag(col(c), 1).over(w)))
    def innerCol(a: TsAgg): Column = a.inner match {
      case "COUNT_OVER_TIME" => count(a.c.map(col).getOrElse(lit(1)))
      case "SUM_OVER_TIME" => sum(col(a.c.get))
      case "MIN_OVER_TIME" => min(col(a.c.get))
      case "MAX_OVER_TIME" => max(col(a.c.get))
      case "FIRST_OVER_TIME" => min_by(col(a.c.get), col("_ts_ms"))
      case "LAST_OVER_TIME" => max_by(col(a.c.get), col("_ts_ms"))
      case "AVG_OVER_TIME" =>
        round(sum(col(a.c.get)).cast("double") * 1000 / count(col(a.c.get)), 0).cast("long")
      case "RATE" =>
        val c = col(a.c.get); val p = col(s"__prev_${a.c.get}")
        val increase = sum(when(p.isNull, lit(0L))
          .when(c >= p, c - p).otherwise(c))
        val spanMs = greatest(max(col("_ts_ms")) - min(col("_ts_ms")), lit(1L))
        round(increase.cast("double") * 1000000 / spanMs, 0).cast("long")
    }
    val innerCols = norm.map(a => innerCol(a).as(a.name))
    val inner = prepared.groupBy(grp.map(col): _*)
      .agg(innerCols.head, innerCols.tail: _*)
    def outerCol(a: TsAgg): Column = a.outer match {
      case "sum" => sum(col(a.name))
      case "min" => min(col(a.name))
      case "max" => max(col(a.name))
      case "count" => count(col(a.name))
      case "median" => median(col(a.name))
      case "count_distinct" => countDistinct(col(a.name))
      case "avg" =>
        round(sum(col(a.name)).cast("double") * 1000 / count(col(a.name)), 0).cast("long")
      case other => throw ParseError(s"TS STATS: unsupported outer aggregate $other", 0)
    }
    val outCols = norm.map(a => outerCol(a).as(a.name))
    if (by.isEmpty) inner.agg(outCols.head, outCols.tail: _*)
    else inner.groupBy(by.map(col): _*).agg(outCols.head, outCols.tail: _*)
  }

  /** Compile a parsed pipeline onto DataFrames; `resolve` supplies the
    * FROM source (index name → frame) and `policies` the ENRICH
    * dimensions (policy name → (dim frame, match field)), so the caller
    * owns catalog resolution exactly like the session would. `session`
    * supplies the session a FROM-less (ROW-first) pipeline builds its
    * literal source from — callers that have one should pass it;
    * falling back to `SparkSession.active` is a convenience that
    * breaks if another thread stops its session concurrently. */
  /** Shared default for the COMPLETION endpoint seam: reject unknown
    * endpoints at plan time (the catalog registers inference endpoints). */
  private val noCompletions: String => (DataFrame, Column, String) => DataFrame =
    n => throw ParseError(
      s"unknown completion endpoint $n (the catalog registers inference endpoints)", 0)

  def compile(cmds: Seq[Cmd], resolve: String => DataFrame,
              policies: String => (DataFrame, String) =
                n => throw ParseError(s"unknown enrich policy $n", 0),
              session: Option[org.apache.spark.sql.SparkSession] = None,
              completions: String => (DataFrame, Column, String) => DataFrame =
                noCompletions): DataFrame = {
    val df0 = cmds.headOption match {
      case Some(From(ts, meta)) =>
        meta.filterNot(_ == "_index").foreach(m =>
          throw ParseError(s"unsupported METADATA field $m (only _index here — " +
            "no doc-store identity backs _id/_version/_score)", 0))
        val withMeta: String => DataFrame =
          if (meta.contains("_index")) n => resolve(n).withColumn("_index", lit(n))
          else resolve
        ts.map(withMeta).reduce(_ unionByName _)
      case Some(TsFrom(ts)) => ts.map(resolve).reduce(_ unionByName _)
      case Some(RowCmd(as)) =>
        // the literal one-row source: a LocalRelation, no scan at all
        session.getOrElse(org.apache.spark.sql.SparkSession.active).range(1)
          .select(as.map { case (n, e) => compileExpr(e).as(n) }: _*)
      case Some(ShowInfo) =>
        // deterministic build facts (no wall clock — results must replay);
        // values come from the committed graft-build.properties resource,
        // shared with the ns_esql_show oracle so neither side can drift
        session.getOrElse(org.apache.spark.sql.SparkSession.active).range(1)
          .select(lit(graft.BuildInfo.version).as("version"),
            lit(graft.BuildInfo.date).as("date"),
            lit(graft.BuildInfo.hash).as("hash"))
      case _ => throw ParseError("query must start with FROM, TS, ROW or SHOW", 0)
    }
    applyCmds(df0, cmds.tail, resolve, policies,
      cmds.headOption.exists(_.isInstanceOf[TsFrom]), completions)
  }

  /** Apply a command SEQUENCE with the TS-mode transition: TS mode
    * applies to the FIRST STATS only — it collapses the time series,
    * so any later STATS in the same sequence is an ordinary
    * aggregation over the already-aggregated frame (ES's contract; a
    * second over-time function correctly fails as an unsupported
    * aggregate). Found by the r17 pipeline fuzzer: the pipeline-global
    * flag made `TS … | STATS … | STATS …` demand _tsid of a frame that
    * no longer has one. Shared by compile() and FORK's branch folds
    * (the r17 review's follow-up: a STATS inside a FORK branch
    * transitions the mode for ITS branch), and TS mode does not
    * survive the FORK itself — the unioned frame carries per-branch
    * null-filled columns and is no longer THE series frame, so the
    * post-FORK pipeline is ordinary. */
  private def applyCmds(df0: DataFrame, cmds: Seq[Cmd],
                        resolve: String => DataFrame,
                        policies: String => (DataFrame, String),
                        tsMode0: Boolean,
                        completions: String => (DataFrame, Column, String) => DataFrame)
      : DataFrame = {
    var tsMode = tsMode0
    // remember WHAT ended TS mode so a later RATE/*_OVER_TIME fails
    // self-explainingly (r18 advice: `TS … | FORK (WHERE a) (WHERE b)
    // | STATS SUM(RATE(c))` used to fail as a bare unsupported
    // aggregate with no hint that the FORK consumed TS mode)
    var tsEndedBy: Option[String] = None
    cmds.foldLeft(df0) { (df, cmd) =>
      (cmd, tsEndedBy) match {
        case (Stats(aggs, _, _), Some(cause)) if !tsMode =>
          for ((n, AggFn(_, Func(f, _), _)) <- aggs if overTimeFns(f))
            throw ParseError(s"$f (in $n): TS mode ended at the earlier " +
              (if (cause == "FORK")
                 "FORK — the unioned branch frames are no longer THE series frame, " +
                   "so RATE/*_OVER_TIME cannot apply after a FORK"
               else
                 "STATS — it collapsed the time series, so RATE/*_OVER_TIME " +
                   "cannot apply to the aggregated frame"), 0)
        case _ => ()
      }
      val out = applyCmd(df, cmd, resolve, policies, tsMode, completions)
      if (tsMode && (cmd.isInstanceOf[Stats] || cmd.isInstanceOf[Fork])) {
        tsMode = false
        tsEndedBy = Some(if (cmd.isInstanceOf[Fork]) "FORK" else "STATS")
      }
      out
    }
  }

  /** Decompose a WHERE condition into its top-level AND conjuncts,
    * extracting at most one `KNN(field, [vector], k)` match function.
    * KNN anywhere DEEPER — under OR/NOT, inside an expression or IN
    * list — is a named error (ES's contract: knn must be a positive
    * top-level conjunct so its k-nearest cut composes with the other
    * predicates as prefilters). */
  private def splitKnn(e: Expr)
      : (Option[(String, Seq[BigDecimal], Int)], Seq[Expr]) = {
    def conjuncts(x: Expr): Seq[Expr] = x match {
      case Bin("and", l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def hasKnn(x: Expr): Boolean = x match {
      case Func("KNN", _) => true
      case Func(_, as) => as.exists(hasKnn)
      case Bin(_, l, r) => hasKnn(l) || hasKnn(r)
      case Not(y) => hasKnn(y)
      case Neg(y) => hasKnn(y)
      case Like(y, _) => hasKnn(y)
      case RLike(y, _) => hasKnn(y)
      case IsNull(y, _) => hasKnn(y)
      case In(y, vs) => hasKnn(y) || vs.exists(hasKnn)
      case _ => false
    }
    val cs = conjuncts(e)
    val (knns, rest) = cs.partition {
      case Func("KNN", _) => true; case _ => false
    }
    if (knns.size > 1)
      throw ParseError("at most one KNN per WHERE", 0)
    if (rest.exists(hasKnn))
      throw ParseError("KNN must be a positive top-level conjunct of WHERE " +
        "(not under OR/NOT or inside an expression)", 0)
    val parsed = knns.headOption.map {
      case Func("KNN", Seq(Ident(f), ArrLit(vec), kExpr)) =>
        // a negative k literal parses as Neg(NumLit) — unwrap it so the
        // documented non-positive-k error is actually reachable
        val k = kExpr match {
          case NumLit(k0) => k0
          case Neg(NumLit(k0)) => -k0
          case _ => throw ParseError("KNN expects (field, [query vector], k)", 0)
        }
        if (!k.isWhole || !k.isValidInt || k < 1)
          throw ParseError(s"KNN k must be a positive integer, got $k", 0)
        (f, vec, k.toIntExact)
      case _ => throw ParseError("KNN expects (field, [query vector], k)", 0)
    }
    (parsed, rest)
  }

  private def applyCmd(df: DataFrame, cmd: Cmd, resolve: String => DataFrame,
                       policies: String => (DataFrame, String),
                       tsMode: Boolean = false,
                       completions: String => (DataFrame, Column, String) => DataFrame =
                         noCompletions): DataFrame = {
      cmd match {
        case From(_, _) | TsFrom(_) | RowCmd(_) =>
          throw ParseError("FROM/TS/ROW only allowed first", 0)
        case Where(e) => splitKnn(e) match {
          case (None, _) => df.filter(compileExpr(e))
          case (Some((f, vec, k)), rest) =>
            // ES|QL 9.1's `knn` match function: the OTHER top-level
            // conjuncts are PREFILTERS (the filtered-kNN discipline —
            // the exact top-k OF the filtered subset, never the
            // post-filtered residue of an unfiltered search), the
            // similarity is the engine's shared native cosine (the
            // field guarded/coerced at analysis time — numeric arrays
            // cast to array<float>, anything else a NAMED error), the
            // ordering is round(·, 6) desc with the frame's FIRST
            // column as the deterministic tie-break (documented — ES
            // breaks ties by internal doc id, which this dialect does
            // not have; determinism at the k boundary needs that
            // column unique, as vec_id is), and the cut compiles to
            // TakeOrderedAndProject — top-k bounded, never a global
            // sort.
            val pre = rest.map(compileExpr).reduceOption(_ && _)
              .map(df.filter).getOrElse(df)
            val q = array(vec.map(v => lit(v.toFloat)): _*)
            val tie = df.columns.head
            if (df.schema.head.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
              throw ParseError("KNN's tie-break orders by the frame's first " +
                s"column ($tie), which must be orderable (map type found)", 0)
            // a score-column name the frame can't already own — a user
            // column named __knn_s must survive the cut untouched
            val sc = Iterator.from(0).map(i => s"__knn_s$i")
              .find(n => !df.columns.contains(n)).get
            val fieldVec = graft.Cols.column(
              org.apache.spark.sql.graftshim.RequireFloatVec(graft.Cols.expr(col(f))))
            // ES's knn never matches a doc missing the vector field:
            // a null field (or degenerate cosine) must not occupy a
            // k slot when fewer than k scored rows survive the
            // prefilter — filter null scores BEFORE the top-k cut
            // (r18 advice; the oracle mirrors with s IS NOT NULL)
            pre.withColumn(sc,
                round(graft.expr.VecFunctions.vec_cosine(fieldVec, q), 6))
              .filter(col(sc).isNotNull)
              .orderBy(col(sc).desc, col(tie).asc)
              .limit(k)
              .drop(sc)
        }
        case Eval(as) => as.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, compileExpr(e)) }
        case Stats(aggs, by, byAssigns) if tsMode =>
          compileTsStats(applyByAssigns(df, byAssigns), aggs, by)
        case Stats(aggs, by, byAssigns)
            if aggs.exists { case (_, AggFn("mad", _, _)) => true; case _ => false } =>
          // MEDIAN_ABSOLUTE_DEVIATION: median(|x − median(x)|) has no
          // single-pass exact form, so it compiles as TWO aggregation
          // stages — the per-group medians (|groups| rows, dashboard-
          // bounded) broadcast back onto the rows, then one ordinary
          // aggregate computes median of absolute deviations next to
          // every other requested aggregate. (ES itself serves MAD from
          // a TDigest sketch; this dialect's contract is exact, like
          // its PERCENTILE.)
          val d = applyByAssigns(df, byAssigns)
          def gateOf(e: Expr, f: Option[Expr]): Column =
            f.map(c => when(compileExpr(c), compileExpr(e))).getOrElse(compileExpr(e))
          val madMeds = aggs.zipWithIndex.collect {
            case ((_, AggFn("mad", e, f)), i) =>
              (s"__mad_med_$i", median(gateOf(e, f)).as(s"__mad_med_$i"))
          }
          val meds =
            if (by.isEmpty) d.agg(madMeds.head._2, madMeds.tail.map(_._2): _*)
            else d.groupBy(by.map(col): _*).agg(madMeds.head._2, madMeds.tail.map(_._2): _*)
          // NULL-SAFE join back: groupBy emits a null-key bucket, and a
          // plain equi-join would silently DROP those rows — losing the
          // null bucket for every aggregate in this STATS, not just the
          // MAD (found in the r15 self-review). <=> keys still hash-join.
          val joined =
            if (by.isEmpty) d.crossJoin(broadcast(meds))
            else {
              val medsR = by.foldLeft(meds)((m, c) =>
                m.withColumnRenamed(c, s"__mad_by_$c"))
              d.join(broadcast(medsR),
                  by.map(c => col(c) <=> col(s"__mad_by_$c")).reduce(_ && _))
                .drop(by.map(c => s"__mad_by_$c"): _*)
            }
          val cols = aggs.zipWithIndex.map {
            case ((n, AggFn("mad", e, f)), i) =>
              median(abs(gateOf(e, f) - col(s"__mad_med_$i"))).as(n)
            case ((n, a), _) => compileAgg(n, a)
          }
          if (by.isEmpty) joined.agg(cols.head, cols.tail: _*)
          else joined.groupBy(by.map(col): _*).agg(cols.head, cols.tail: _*)
        case Stats(aggs, by, byAssigns) =>
          val d = applyByAssigns(df, byAssigns)
          val cols = aggs.map { case (n, a) => compileAgg(n, a) }
          if (by.isEmpty) d.agg(cols.head, cols.tail: _*)
          else d.groupBy(by.map(col): _*).agg(cols.head, cols.tail: _*)
        case InlineStats(aggs, byRaw, byAssigns) =>
          val df1 = applyByAssigns(df, byAssigns)
          val by = byRaw
          // non-collapsing stats: each aggregate rides an unordered
          // window over its group — every row keeps its columns and
          // gains the group's aggregates (count_distinct is not a
          // window aggregate; reject it the way ES marks it unsupported)
          aggs.foreach {
            case (_, AggFn("count_distinct", _, _)) =>
              throw ParseError("INLINESTATS does not support COUNT_DISTINCT", 0)
            case (_, AggFn("mad", _, _)) =>
              throw ParseError("INLINESTATS does not support MEDIAN_ABSOLUTE_DEVIATION", 0)
            case (_, AggFn("st_centroid", _, _)) =>
              throw ParseError("INLINESTATS does not support ST_CENTROID_AGG", 0)
            case (_, AggFn("st_extent", _, _)) =>
              throw ParseError("INLINESTATS does not support ST_EXTENT_AGG", 0)
            case _ => ()
          }
          if (by.isEmpty) {
            // global group: NEVER a partition-less window (that funnels
            // the whole corpus through one task) — one partial-
            // aggregated global row, broadcast back across every row
            // (the engine's ns_agg_global discipline)
            val cols = aggs.map { case (n, a) => compileAggRaw(a).as(n) }
            // An aggregate named like an existing column must OVERWRITE
            // it (the BY branch's withColumn semantics) — drop the
            // clashing source columns before the join, like ENRICH —
            // and the final projection restores the ORIGINAL column
            // order (withColumn overwrites in place; drop+join would
            // otherwise relocate the overwritten column to the end)
            val clashes = aggs.map(_._1).filter(df1.columns.contains)
            val joined = df1.drop(clashes: _*)
              .crossJoin(broadcast(df1.agg(cols.head, cols.tail: _*)))
            val outOrder = df1.columns ++
              aggs.map(_._1).filterNot(df1.columns.contains)
            joined.select(outOrder.map(col): _*)
          } else {
            import org.apache.spark.sql.expressions.Window
            val w = Window.partitionBy(by.map(col): _*)
            aggs.foldLeft(df1) { case (d, (n, a)) =>
              d.withColumn(n, compileAggRaw(a).over(w))
            }
          }
        case Sort(keys) =>
          // ES|QL's dialect default treats null as LARGER than any
          // value: ASC → nulls last, DESC → nulls first (Spark's
          // defaults are the opposite pairing)
          df.orderBy(keys.map {
            case (n, true, None) => col(n).asc_nulls_last
            case (n, false, None) => col(n).desc_nulls_first
            case (n, true, Some(true)) => col(n).asc_nulls_first
            case (n, true, Some(false)) => col(n).asc_nulls_last
            case (n, false, Some(true)) => col(n).desc_nulls_first
            case (n, false, Some(false)) => col(n).desc_nulls_last
          }: _*)
        case Limit(n) => df.limit(n)
        case Keep(cs) =>
          val expanded = cs.flatMap {
            case p if p.endsWith("*") =>
              val hits = df.columns.filter(_.startsWith(p.dropRight(1)))
              if (hits.isEmpty) throw ParseError(s"KEEP pattern $p matches no columns", 0)
              hits.toSeq
            case n => Seq(n)
          }.distinct
          df.select(expanded.map(col): _*)
        case Drop(cs) =>
          val expanded = cs.flatMap {
            case p if p.endsWith("*") => df.columns.filter(_.startsWith(p.dropRight(1))).toSeq
            case n => Seq(n)
          }.distinct
          df.drop(expanded: _*)
        case Rename(ps) => ps.foldLeft(df) { case (d, (o, n)) => d.withColumnRenamed(o, n) }
        case Dissect(in, p) =>
          // dissectRegex validates the template and yields the key list;
          // execution runs the NATIVE linear walk (DissectExtract), not
          // the regex twin — same semantics (ParserLawsSpec parity law),
          // no backtracking
          val (_, keys) = dissectRegex(p)
          applyExtract(df,
            graft.expr.GrokFunctions.dissect_extract_m(col(in), p, keys),
            keys.map(_ -> "string"))
        case Grok(in, p) =>
          val (rx, keys) = grokRegex(p)
          applyExtract(df,
            graft.expr.GrokFunctions.regexp_extract_struct_m(col(in), rx, keys.map(_._1)),
            keys)
        case Enrich(policy, on, withCols) =>
          val (dim, matchField) = policies(policy)
          if (dim.columns.contains("__range_lo") && dim.columns.contains("__range_hi")) {
            // a RANGE-typed enrich policy (ES's `range` policy type: the
            // match field falls inside the dim row's [lo, hi) interval —
            // IP blocks, value tiers). The catalog signals the type by
            // shaping the dim with __range_lo/__range_hi; the join is the
            // engine's geoip discipline — broadcast the interval table,
            // probe side unshuffled, a BroadcastNestedLoopJoin whose
            // inner is |dim| rows.
            val fields = if (withCols.nonEmpty) withCols
              else dim.columns.filterNot(c =>
                c == "__range_lo" || c == "__range_hi" || c == matchField).toSeq
            val dimSel = dim.select((Seq("__range_lo", "__range_hi") ++ fields).map(col): _*)
            // ES enrich's max_matches=1 contract: overlapping policy
            // intervals must not multiply probe rows. Disjointify the
            // dim with a sweep over its own endpoints — each elementary
            // segment between consecutive endpoints is won by the
            // containing interval with the smallest (__range_lo,
            // __range_hi, fields…), deterministically. ALL of this is
            // dim-side work on the broadcast-small policy table (the
            // partition-less windows are dim-bounded); the probe join
            // stays a single-match BroadcastNestedLoopJoin, unshuffled.
            import org.apache.spark.sql.expressions.Window
            val segW = Window.orderBy(col("__p"))
            val segs = dimSel
              .select(explode(array(col("__range_lo"), col("__range_hi"))).as("__p"))
              .distinct()
              .withColumn("__seg_hi", lead(col("__p"), 1).over(segW))
              .filter(col("__seg_hi").isNotNull)
              .select(col("__p").as("__seg_lo"), col("__seg_hi"))
            val winW = Window.partitionBy(col("__seg_lo"))
              .orderBy((Seq("__range_lo", "__range_hi") ++ fields).map(col): _*)
            val disjoint = segs.join(dimSel,
                segs("__seg_lo") >= dimSel("__range_lo") &&
                  segs("__seg_lo") < dimSel("__range_hi"))
              .withColumn("__rk", row_number().over(winW))
              .filter(col("__rk") === 1)
              .select((Seq("__seg_lo", "__seg_hi") ++ fields).map(col): _*)
            val clash = fields.filter(f => f != on && df.columns.contains(f))
            val src = df.drop(clash: _*)
            src.join(broadcast(disjoint),
                src(on) >= disjoint("__seg_lo") && src(on) < disjoint("__seg_hi"), "left")
              .drop("__seg_lo", "__seg_hi")
          } else {
          val fields = if (withCols.nonEmpty) withCols
            else dim.columns.filterNot(_ == matchField).toSeq
          val dimSel = dim.select((matchField +: fields).map(col): _*)
            .withColumnRenamed(matchField, "__enrich_match")
          // ES OVERWRITES an existing field of the same name — drop the
          // clashing source columns (never the join key) before joining
          val clash = fields.filter(f => f != on && df.columns.contains(f))
          val src = df.drop(clash: _*)
          src.join(broadcast(dimSel), src(on) === dimSel("__enrich_match"), "left")
            .drop("__enrich_match")
          }
        case LookupJoin(index, on) =>
          // ES|QL's LOOKUP JOIN (the successor to ENRICH for arbitrary
          // lookup-mode indices): LEFT join on the shared field name.
          // The lookup index is declared single-shard/replicated in ES —
          // the broadcast is its Spark twin. Lookup fields OVERWRITE
          // same-named source columns, as in ES.
          val dim = resolve(index)
          val dimSel = dim.withColumnRenamed(on, "__lookup_match")
          val clash = dimSel.columns
            .filter(c => c != "__lookup_match" && c != on && df.columns.contains(c))
          val src = df.drop(clash: _*)
          src.join(broadcast(dimSel), src(on) === dimSel("__lookup_match"), "left")
            .drop("__lookup_match")
        case MvExpand(c) => df.withColumn(c, explode_outer(col(c)))
        case Fork(branches) =>
          // each branch's sub-pipeline transforms the SAME incoming
          // frame and compiles to its own plan leg — exactly how ES
          // executes FORK (independent branch phases). The scale win
          // is per-branch PUSHDOWN: each leg's WHERE reaches its own
          // scan's PushedFilters (PlanSpec-locked), so selective
          // branches read only their row groups instead of sharing one
          // unfiltered pass. unionByName(allowMissing) nulls a column
          // a branch didn't produce — ES FORK's column-union
          // semantics.
          // branch folds run through applyCmds so a branch's own first
          // STATS consumes TS mode for THAT branch (r17 review)
          branches.zipWithIndex.map { case (bs, bi) =>
            applyCmds(df, bs, resolve, policies, tsMode, completions)
              .withColumn("_fork", lit(s"fork${bi + 1}"))
          }.reduce(_.unionByName(_, allowMissingColumns = true))
        case Fuse(id, rank) =>
          // RRF over FORK's ranked pages: rank within each branch from
          // the RANK column (desc, id-tie-broken — matching the
          // branch's own SORT), fused score in EXACT micros
          // (Σ round(1e6/(60+rank))) so the hash never rides float
          // addition order. The per-branch windows order pages FORK's
          // LIMITs already bounded — dashboard-sized at any SF.
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy("_fork").orderBy(col(rank).desc, col(id))
          df.withColumn("__fuse_rank", row_number().over(w))
            .groupBy(id)
            .agg(sum(round(lit(1000000.0) / (lit(60.0) + col("__fuse_rank")), 0).cast("long"))
              .as("_score_c"),
              count(lit(1)).as("n_legs"))
        case Rerank(q, f, rk) =>
          rk.getOrElse("lexical") match {
            case "lexical" => ()
            case other => throw ParseError(
              s"unknown reranker $other (the catalog registers inference endpoints)", 0)
          }
          df.withColumn("_score", lexicalRerankScore(q, col(f)))
        case Completion(t, p, ep) =>
          completions(ep)(df, compileExpr(p), t)
        case ChangePoint(v, k, tn, pn) => compileChangePoint(df, v, k, tn, pn)
        case Sample(p, on) =>
          // deterministic inverse of the probability on a 1e6 grid —
          // the ns_agg_random_sampler membership primitive
          val cut = (p * 1000000).toLong
          val bucket = on match {
            case Some(c) =>
              // the reproducible path: md5 of the named column's string
              // form (identical text in Spark and DuckDB)
              conv(substring(md5(col(c).cast("string")), 1, 8), 16, 10)
                .cast("long") % 1000000L
            case None =>
              // no designated key: hash every column (deterministic for
              // a given schema; not oracle-expressible, documented)
              pmod(xxhash64(df.columns.map(col): _*), lit(1000000L))
          }
          df.filter(bucket < cut)
      }
  }

  def run(query: String, resolve: String => DataFrame,
          policies: String => (DataFrame, String) =
            n => throw ParseError(s"unknown enrich policy $n", 0),
          session: Option[org.apache.spark.sql.SparkSession] = None,
          completions: String => (DataFrame, Column, String) => DataFrame =
            noCompletions,
          params: Map[String, Expr] = Map.empty): DataFrame =
    compile(parse(query, params), resolve, policies, session, completions)
}
