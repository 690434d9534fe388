package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.EsqlParser

/** Full-PIPELINE differential fuzzer for ES|QL — the r15 review's
  * finding industrialized: every real bug that round was COMPOSITIONAL
  * (a null BY bucket lost in a join, argument-role dispatch, overwrite
  * semantics), exactly the class the expression-level
  * ParserDifferentialSpec cannot reach. Here whole random programs —
  * WHERE | EVAL | STATS BY (incl. NULL-able BY keys) | INLINESTATS |
  * SORT+LIMIT | MV_EXPAND — run through the engine over the documents
  * corpus and the FULL RESULT FRAME is compared against an independent
  * plain-Scala evaluator that implements each command's contract from
  * the dialect spec in Option space (so the null paths — CASE keys,
  * division/modulo by zero, three-valued WHERE logic, null group
  * buckets, MV_EXPAND of null — are first-class, not avoided the way
  * the Long-space expression fuzzer had to).
  *
  * Comparison is multiset equality over canonicalized rows. SORT+LIMIT
  * is only generated with every (non-multivalue) column as a trailing
  * tiebreak, so the cut is a total order and the kept row SET is
  * deterministic in both engines. Numeric generation stays integral at
  * bounded depth: sums/products stay far below 2^53, so engine LONG
  * arithmetic, AVG's double division, and the evaluator agree exactly
  * — score comparison is ==, no tolerance.
  *
  * It already paid for itself at authoring time: data-dependent `%`
  * reached the ANSI Remainder, which THROWS on a zero modulus where
  * ES|QL nulls the cell — fixed via graftshim.EsqlMod (EsqlDivide's
  * sibling) before the suite could go green. */
class PipelineDifferentialSpec extends SparkSpec {

  // ------------------------------------------------------------ corpus
  private lazy val srcDf = {
    val df = Tables.documents(spark, sfDir).select("doc_id", "n_chars", "lang", "source")
    df.cache(); df.count() // one read; 500 rows at sf0.001
    df
  }
  /** The same corpus WITH the text column — the r17 command-compiler
    * sweep resolves `documents` to this frame; every program drops
    * `text` again right after its full-text head so the generic
    * machinery (whose SORT+LIMIT total-order invariant rides the
    * schema pools) never sees an untracked free column. */
  private lazy val srcDfText = {
    val df = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars", "lang", "source", "text")
    df.cache(); df.count()
    df
  }
  /** TS source: the TSDB mapping contract — `_tsid` is the series
    * identity (lang), `_ts_ms` strictly increasing within any series
    * (doc_id is globally unique, so any partition of it is strict). */
  private lazy val tsDf = {
    val df = srcDf.withColumn("_tsid", org.apache.spark.sql.functions.col("lang"))
      .withColumn("_ts_ms", org.apache.spark.sql.functions.col("doc_id"))
    df.cache(); df.count()
    df
  }
  private type Row = Map[String, Option[Any]]
  private lazy val corpus: Seq[Row] = {
    val rows = srcDf.collect().map(r => Map[String, Option[Any]](
      "doc_id" -> Some(r.getLong(0)), "n_chars" -> Some(r.getLong(1)),
      "lang" -> Some(r.getString(2)), "source" -> Some(r.getString(3)))).toSeq
    // the grok oracle's regex-vs-split equivalence needs newline-free
    // strings ('.' excludes \n); pin the invariant where it can fail
    // loudly if a testdata regeneration ever breaks it
    assert(rows.forall(r => Seq("lang", "source").forall(
      c => !r(c).get.asInstanceOf[String].contains("\n"))),
      "corpus strings must stay newline-free for the grok oracle")
    rows
  }
  private lazy val corpusT: Seq[Row] = {
    val byId = srcDfText.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    corpus.map(r => r + ("text" ->
      (Some(byId(r("doc_id").get.asInstanceOf[Long])): Option[Any])))
  }
  private lazy val tsCorpus: Seq[Row] =
    corpus.map(r => r +
      ("_tsid" -> r("lang")) + ("_ts_ms" -> r("doc_id")))

  // a small keyword ENRICH policy over the corpus langs plus two
  // literal keys the string generator can produce — unmatched keys
  // (most source values, CASE nulls) exercise the left-join null path
  private lazy val enrichDim: Map[String, (String, Long)] =
    (corpus.flatMap(_("lang")).map(_.asInstanceOf[String]).distinct
      .map(l => l -> (s"T_$l", l.length.toLong)) ++
      Seq("aa" -> ("T_aa", 9L), "bb" -> ("T_bb", 7L))).toMap
  private lazy val enrichDimDf = {
    import spark.implicits._
    enrichDim.toSeq.map { case (k, (tag, tier)) => (k, tag, tier) }
      .toDF("k", "tag", "tier")
  }

  // RANGE-typed ENRICH policy: [lo, hi) intervals with DELIBERATE
  // overlaps, shared (lo, hi) prefixes, adjacent boundaries, and a
  // one-wide interval — the max_matches=1 sweep-disjointification's
  // winner rule (smallest (lo, hi, fields…)) is the point under fuzz
  private val rangeDim: Seq[(Long, Long, String, Long)] = Seq(
    (-50L, 100L, "low", 1L), (0L, 200L, "mid", 2L), (100L, 200L, "highA", 3L),
    (150L, 400L, "highB", 4L), (150L, 400L, "dupJ", 5L), (500L, 501L, "point", 6L))
  private lazy val rangeDimDf = {
    import spark.implicits._
    rangeDim.toDF("__range_lo", "__range_hi", "rtag", "rtier")
  }
  /** The winner for a value: smallest (lo, hi, rtag, rtier) among the
    * containing intervals — the engine's per-segment row_number rule. */
  private def rangeHit(v: Long): Option[(String, Long)] =
    rangeDim.filter { case (lo, hi, _, _) => v >= lo && v < hi }
      .sortBy { case (lo, hi, tag, tier) => (lo, hi, tag, tier) }
      .headOption.map { case (_, _, tag, tier) => (tag, tier) }

  // LOOKUP JOIN index keyed on `lang`, deliberately missing one lang so
  // the left-join null path occurs; unique keys — no row multiplication
  private lazy val lookupDim: Map[String, (Long, String)] = {
    val langs = corpus.flatMap(_("lang")).map(_.asInstanceOf[String]).distinct.sorted
    langs.drop(1).map(l => l -> (l.length.toLong * 3, s"L_$l")).toMap
  }
  private lazy val lookupDimDf = {
    import spark.implicits._
    lookupDim.toSeq.map { case (k, (n, w)) => (k, n, w) }
      .toDF("lang", "lknum", "lkword")
  }

  // ------------------------------------------------------- expressions
  private sealed trait NE
  private case class NCol(n: String) extends NE
  private case class NLit(v: Long) extends NE
  private case class NBin(op: String, l: NE, r: NE) extends NE
  private case class NLen(s: SE) extends NE
  // r18 function-audit additions (NOT in the shared neGen — the r18
  // sweep generates them locally so earlier tests stay seed-identical)
  private case class NRoundTo(e: NE, points: Seq[Long]) extends NE
  private case class NCopySign(m: NE, sg: NE) extends NE
  private sealed trait SE
  private case class SCol(n: String) extends SE
  private case class SLit(v: String) extends SE
  private case class SConcat(l: SE, r: SE) extends SE // CONCAT(l, "_", r)
  private case class SToStr(e: NE) extends SE
  private case class SCase(c: BE, v: SE) extends SE // CASE(c, v): false/null → null
  private case class SCategorize(e: SE) extends SE // digit runs collapse to `?`
  private sealed trait BE
  private case class BCmpN(op: String, l: NE, r: NE) extends BE
  private case class BCmpS(eq: Boolean, l: SE, r: SE) extends BE
  private case class BIn(e: NE, vs: Seq[Long]) extends BE
  private case class BIsNull(e: NE, neg: Boolean) extends BE
  private case class BBin(and: Boolean, l: BE, r: BE) extends BE
  private case class BNot(e: BE) extends BE

  private def neText(e: NE): String = e match {
    case NCol(n) => n
    case NLit(v) => if (v < 0) s"(- ${-v})" else v.toString
    case NBin(op, l, r) => s"(${neText(l)} $op ${neText(r)})"
    case NLen(s) => s"LENGTH(${seText(s)})"
    // points render UNSORTED as generated — the plan-time sort is the
    // compiler's job and part of what the sweep checks
    case NRoundTo(x, ps) => s"ROUND_TO(${neText(x)}, ${ps.mkString(", ")})"
    case NCopySign(m, sg) => s"COPY_SIGN(${neText(m)}, ${neText(sg)})"
  }
  private def seText(e: SE): String = e match {
    case SCol(n) => n
    case SLit(v) => "\"" + v + "\""
    case SConcat(l, r) => s"""CONCAT(${seText(l)}, "_", ${seText(r)})"""
    case SToStr(n) => s"TO_STRING(${neText(n)})"
    case SCase(c, v) => s"CASE(${beText(c)}, ${seText(v)})"
    case SCategorize(x) => s"CATEGORIZE(${seText(x)})"
  }
  private def beText(e: BE): String = e match {
    case BCmpN(op, l, r) => s"(${neText(l)} $op ${neText(r)})"
    case BCmpS(eq, l, r) => s"(${seText(l)} ${if (eq) "==" else "!="} ${seText(r)})"
    case BIn(x, vs) => s"${neText(x)} IN (${vs.mkString(", ")})"
    case BIsNull(x, neg) => s"${neText(x)} IS ${if (neg) "NOT " else ""}NULL"
    case BBin(and, l, r) => s"(${beText(l)} ${if (and) "AND" else "OR"} ${beText(r)})"
    case BNot(x) => s"NOT ${beText(x)}"
  }

  // Option-space evaluation, the dialect's null contracts throughout
  private def evalN(e: NE, row: Row): Option[Long] = e match {
    case NCol(n) => row(n).map(_.asInstanceOf[Long])
    case NLit(v) => Some(v)
    case NBin(op, l, r) =>
      for {
        a <- evalN(l, row); b <- evalN(r, row)
        v <- op match {
          case "+" => Some(a + b)
          case "-" => Some(a - b)
          case "*" => Some(a * b)
          case "/" => if (b == 0) None else Some(a / b) // EsqlDivide: x/0 → null
          case "%" => if (b == 0) None else Some(a % b) // EsqlMod: x%0 → null
        }
      } yield v
    case NLen(s) => evalS(s, row).map(_.length.toLong)
    // ROUND_TO: greatest point <= v; below the smallest point clamps
    // to the smallest (ES's contract; null value → null)
    case NRoundTo(x, ps) => evalN(x, row).map { v =>
      val sorted = ps.sorted
      sorted.reverse.find(_ <= v).getOrElse(sorted.head)
    }
    // COPY_SIGN: |m| carries sg's sign; zero-or-positive sign → +|m|;
    // null on EITHER argument → null (the engine's abs(null)/when-null)
    case NCopySign(m, sg) =>
      for { s <- evalN(sg, row); a <- evalN(m, row) }
        yield if (s < 0) -math.abs(a) else math.abs(a)
  }
  private def evalS(e: SE, row: Row): Option[String] = e match {
    case SCol(n) => row(n).map(_.asInstanceOf[String])
    case SLit(v) => Some(v)
    case SConcat(l, r) =>
      for { a <- evalS(l, row); b <- evalS(r, row) } yield s"${a}_$b"
    case SToStr(n) => evalN(n, row).map(_.toString)
    case SCase(c, v) => if (evalB(c, row).contains(true)) evalS(v, row) else None
    case SCategorize(x) => evalS(x, row).map(_.replaceAll("[0-9]+", "?"))
  }
  private def evalB(e: BE, row: Row): Option[Boolean] = e match {
    case BCmpN(op, l, r) =>
      for { a <- evalN(l, row); b <- evalN(r, row) } yield op match {
        case "==" => a == b; case "!=" => a != b
        case ">=" => a >= b; case "<=" => a <= b
        case ">" => a > b; case "<" => a < b
      }
    case BCmpS(eq, l, r) =>
      for { a <- evalS(l, row); b <- evalS(r, row) } yield if (eq) a == b else a != b
    case BIn(x, vs) => evalN(x, row).map(vs.contains)
    case BIsNull(x, neg) => Some(evalN(x, row).isEmpty != neg)
    case BBin(true, l, r) => (evalB(l, row), evalB(r, row)) match { // Kleene AND
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case BBin(false, l, r) => (evalB(l, row), evalB(r, row)) match { // Kleene OR
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case BNot(x) => evalB(x, row).map(!_)
  }

  // --------------------------------------------------------- commands
  private sealed trait PAgg
  private case object PCount extends PAgg
  private case class PSum(e: NE) extends PAgg
  private case class PMin(e: NE) extends PAgg
  private case class PMax(e: NE) extends PAgg
  private case class PAvg(e: NE) extends PAgg

  private sealed trait PCmd
  private case class PWhere(b: BE) extends PCmd
  private case class PEvalN(name: String, e: NE) extends PCmd
  private case class PEvalS(name: String, e: SE) extends PCmd
  private case class PEvalMv(name: String, a: SE, b: SE) extends PCmd // SPLIT(CONCAT(a, ",", b), ",")
  private case class PMvExpand(name: String) extends PCmd
  private case class PStats(aggs: Seq[(String, PAgg)], by: Seq[(String, Either[String, SE])]) extends PCmd
  private case class PInline(aggs: Seq[(String, PAgg)], by: Option[String]) extends PCmd
  private case class PSortLimit(keys: Seq[(String, Boolean, Option[Boolean])],
      tiebreak: Seq[String], n: Int) extends PCmd
  private case class PEnrich(on: String) extends PCmd // adds/overwrites tag (str), tier (long)
  private case class PDissect(in: String, ka: String, kb: String) extends PCmd // "%{ka}_%{kb}"
  private case class PGrok(in: String, ka: String, kb: String) extends PCmd // "%{DATA:ka}_%{GREEDYDATA:kb}"
  private case object PLookup extends PCmd // LOOKUP JOIN ldim ON lang → lknum, lkword
  private case class PKeep(cols: Seq[String]) extends PCmd
  private case class PDrop(c: String) extends PCmd
  private case class PRename(from: String, to: String) extends PCmd
  // ------- r17: the previously-unfuzzed command compilers (FORK, FUSE,
  // TS-mode STATS, CHANGE_POINT, SAMPLE, CATEGORIZE-as-BY, full-text
  // WHERE) — each modeled from the dialect's documented contract
  /** FORK: each branch transforms the SAME incoming frame; results
    * union by name with missing columns nulled + a `_fork` tag.
    * `branchCols` records each branch's OUTPUT schema so the union's
    * column set is right even for a branch whose WHERE kept 0 rows. */
  private case class PForkU(branches: Seq[Seq[PCmd]], branchCols: Seq[Seq[String]]) extends PCmd
  /** FUSE ON id RANK col: per-branch rank from the RANK column (desc
    * nulls-last, id ties asc), fused score Σ round(1e6/(60+rank)). */
  private case class PFuse(id: String, rank: String) extends PCmd
  /** One TS-mode aggregate: outer ∘ inner(col); `plain` renders the
    * rewritten sugar form (COUNT(*)/SUM(c)/MIN/MAX). */
  private case class TsA(name: String, outer: String, inner: String,
      c: Option[String], plain: Boolean)
  private case class PTsStats(aggs: Seq[TsA], by: Seq[String]) extends PCmd
  /** CHANGE_POINT v ON doc_id AS tn, pn (doc_id unique → deterministic
    * key order). */
  private case class PChangePoint(v: String, tn: String, pn: String) extends PCmd
  private case class PSample(p: BigDecimal, on: String, onStr: Boolean) extends PCmd
  /** Full-text WHERE: lang 0 = QSTR, 1 = KQL, 2 = MATCH, over `field`
    * as the text field. */
  private case class PFtWhere(lang: Int, field: String, node: FTN) extends PCmd
  /** ENRICH with the RANGE-typed `prange` policy on a numeric column:
    * rtag/rtier from the winning interval, nulls on no match, clash
    * columns overwritten (the keyword-ENRICH contract). */
  private case class PEnrichRange(on: String) extends PCmd
  /** RERANK with the lexical scorer: _score = Σ min(tf, rerankTfCap)
    * over the distinct query terms; a null field scores null. */
  private case class PRerank(terms: Seq[String], field: String) extends PCmd
  /** r18 full-text function predicates: kind ∈ match_phrase (consecutive
    * in-order terms over the whitespace analysis), multi_match (Kleene
    * OR of per-field MATCH), term (exact whitespace-token equality). */
  private case class PFnWhere(kind: String, fields: Seq[String], q: String) extends PCmd

  // full-text mini-AST (the generated subset of each box language)
  private sealed trait FTN
  private case class FtTerm(f: Option[String], w: String) extends FTN
  private case class FtPrefix(f: Option[String], p: String) extends FTN
  private case class FtPhrase(f: Option[String], ws: Seq[String]) extends FTN
  private case class FtWild(f: Option[String], v: String) extends FTN // KQL only
  private case class FtRange(f: String, op: String, v: Long) extends FTN // KQL only
  private case class FtMatchTerms(ws: Seq[String]) extends FTN // MATCH only
  private case class FtAnd(l: FTN, r: FTN) extends FTN
  private case class FtOr(l: FTN, r: FTN) extends FTN
  private case class FtNot(x: FTN) extends FTN

  private def renderFt(lang: Int, n: FTN): String = {
    def fld(f: Option[String]) = f.map(_ + ":").getOrElse("")
    n match {
      case FtTerm(f, w) => fld(f) + w
      case FtPrefix(f, p) => fld(f) + p + "*"
      case FtPhrase(f, ws) => fld(f) + "\"" + ws.mkString(" ") + "\""
      case FtWild(f, v) => fld(f) + v
      case FtRange(f, op, v) => s"$f $op $v"
      case FtMatchTerms(ws) => ws.mkString(" ")
      case FtAnd(l, r) =>
        val op = if (lang == 1) "and" else "AND"
        s"(${renderFt(lang, l)} $op ${renderFt(lang, r)})"
      case FtOr(l, r) =>
        val op = if (lang == 1) "or" else "OR"
        s"(${renderFt(lang, l)} $op ${renderFt(lang, r)})"
      case FtNot(x) =>
        val op = if (lang == 1) "not" else "NOT"
        s"($op ${renderFt(lang, x)})"
    }
  }

  /** Kleene evaluation of a full-text node over a Row, mirroring the
    * engine compilers' Column logic (QueryStringParser.compile /
    * KqlParser.compile / the MATCH arrays_overlap): a null text field
    * or a null fielded column nulls its leaf. */
  private def evalFt(n: FTN, field: String, row: Row): Option[Boolean] = {
    def text: Option[String] = row(field).map(_.asInstanceOf[String])
    def toks: Option[Seq[String]] = text.map(_.trim.split(" ", -1).toSeq)
    def padded: Option[String] = text.map(t => " " + t.trim + " ")
    def kw(f: String): Option[String] = row(f).map(_.asInstanceOf[String])
    def wildcardMatch(pattern: String, v: String): Boolean = {
      val rx = pattern.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
      v.matches(rx)
    }
    def kleene(and: Boolean, a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
      if (and) (a, b) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      } else (a, b) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
    n match {
      case FtTerm(None, w) => toks.map(_.contains(w))
      case FtTerm(Some(f), w) => kw(f).map(_ == w)
      case FtPrefix(None, p) => toks.map(_.exists(_.startsWith(p)))
      case FtPrefix(Some(f), p) => kw(f).map(_.startsWith(p))
      case FtPhrase(None, ws) => padded.map(_.contains(" " + ws.mkString(" ") + " "))
      case FtPhrase(Some(f), ws) => kw(f).map(_ == ws.mkString(" "))
      case FtWild(None, v) =>
        if (v.contains("*")) toks.map(_.exists(wildcardMatch(v, _)))
        else toks.map(_.contains(v))
      case FtWild(Some(f), v) =>
        if (v.contains("*")) kw(f).map(wildcardMatch(v, _))
        else kw(f).map(_ == v)
      case FtRange(f, op, v) => row(f).map(_.asInstanceOf[Long]).map { x =>
        op match {
          case ">" => x > v; case ">=" => x >= v
          case "<" => x < v; case "<=" => x <= v
        }
      }
      case FtMatchTerms(ws) => toks.map(_.exists(ws.contains))
      case FtAnd(l, r) => kleene(and = true, evalFt(l, field, row), evalFt(r, field, row))
      case FtOr(l, r) => kleene(and = false, evalFt(l, field, row), evalFt(r, field, row))
      case FtNot(x) => evalFt(x, field, row).map(!_)
    }
  }

  private def aggText(a: PAgg): String = a match {
    case PCount => "COUNT(*)"
    case PSum(e) => s"SUM(${neText(e)})"
    case PMin(e) => s"MIN(${neText(e)})"
    case PMax(e) => s"MAX(${neText(e)})"
    case PAvg(e) => s"AVG(${neText(e)})"
  }
  private def cmdText(c: PCmd): String = c match {
    case PWhere(b) => s"| WHERE ${beText(b)}"
    case PEvalN(n, e) => s"| EVAL $n = ${neText(e)}"
    case PEvalS(n, e) => s"| EVAL $n = ${seText(e)}"
    case PEvalMv(n, a, b) => s"""| EVAL $n = SPLIT(CONCAT(${seText(a)}, ",", ${seText(b)}), ",")"""
    case PMvExpand(n) => s"| MV_EXPAND $n"
    case PStats(aggs, by) =>
      val as = aggs.map { case (n, a) => s"$n = ${aggText(a)}" }.mkString(", ")
      val byTxt =
        if (by.isEmpty) ""
        else " BY " + by.map {
          case (n, Left(c0)) if n == c0 => c0
          case (n, Left(c0)) => s"$n = $c0"
          case (n, Right(se)) => s"$n = ${seText(se)}"
        }.mkString(", ")
      s"| STATS $as$byTxt"
    case PInline(aggs, by) =>
      val as = aggs.map { case (n, a) => s"$n = ${aggText(a)}" }.mkString(", ")
      s"| INLINESTATS $as${by.map(b => s" BY $b").getOrElse("")}"
    case PSortLimit(keys, tiebreak, n) =>
      val ks = keys.map { case (k, asc, nf) =>
        val dir = if (asc) k else s"$k DESC"
        nf match {
          case None => dir
          case Some(true) => s"$dir NULLS FIRST"
          case Some(false) => s"$dir NULLS LAST"
        }
      } ++ tiebreak
      s"| SORT ${ks.mkString(", ")} | LIMIT $n"
    case PEnrich(on) => s"| ENRICH ptags ON $on"
    case PDissect(in, ka, kb) => s"""| DISSECT $in "%{$ka}_%{$kb}""""
    case PGrok(in, ka, kb) => s"""| GROK $in "%{DATA:$ka}_%{GREEDYDATA:$kb}""""
    case PLookup => "| LOOKUP JOIN ldim ON lang"
    case PKeep(cols) => s"| KEEP ${cols.mkString(", ")}"
    case PDrop(c) => s"| DROP $c"
    case PRename(from, to) => s"| RENAME $from AS $to"
    case PForkU(branches, _) =>
      "| FORK " + branches.map(bs =>
        "(" + bs.map(c => cmdText(c).stripPrefix("| ")).mkString(" | ") + ")").mkString(" ")
    case PFuse(id, rank) => s"| FUSE ON $id RANK $rank"
    case PTsStats(aggs, by) =>
      val as = aggs.map { a =>
        val body =
          if (a.plain) (a.inner, a.c) match {
            case ("COUNT_OVER_TIME", None) => "COUNT(*)"
            case ("COUNT_OVER_TIME", Some(c)) => s"COUNT($c)"
            case ("SUM_OVER_TIME", Some(c)) => s"SUM($c)"
            case ("MIN_OVER_TIME", Some(c)) => s"MIN($c)"
            case ("MAX_OVER_TIME", Some(c)) => s"MAX($c)"
            case other => sys.error(s"no plain form for $other")
          } else s"${a.outer.toUpperCase}(${a.inner}(${a.c.get}))"
        s"${a.name} = $body"
      }.mkString(", ")
      s"| STATS $as${if (by.isEmpty) "" else " BY " + by.mkString(", ")}"
    case PChangePoint(v, tn, pn) => s"| CHANGE_POINT $v ON doc_id AS $tn, $pn"
    case PSample(p, on, _) => s"| SAMPLE $p ON $on"
    case PFtWhere(lang, field, node) =>
      val fn = lang match { case 0 => "QSTR"; case 1 => "KQL"; case _ => "MATCH" }
      val q = renderFt(lang, node).replace("\\", "\\\\").replace("\"", "\\\"")
      s"""| WHERE $fn($field, "$q")"""
    case PEnrichRange(on) => s"| ENRICH prange ON $on"
    case PRerank(terms, field) => s"""| RERANK "${terms.mkString(" ")}" ON $field"""
    case PFnWhere(kind, fields, q0) =>
      val q = q0.replace("\\", "\\\\").replace("\"", "\\\"")
      kind match {
        case "match_phrase" => s"""| WHERE MATCH_PHRASE(${fields.head}, "$q")"""
        case "multi_match" => s"""| WHERE MULTI_MATCH("$q", ${fields.mkString(", ")})"""
        case "term" => s"""| WHERE TERM(${fields.head}, "$q")"""
      }
  }

  // evaluator: aggregate a group's rows per the dialect contracts
  private def evalAgg(a: PAgg, rows: Seq[Row]): Option[Any] = a match {
    case PCount => Some(rows.size.toLong)
    case PSum(e) =>
      val vs = rows.flatMap(r => evalN(e, r))
      if (vs.isEmpty) None else Some(vs.sum)
    case PMin(e) =>
      val vs = rows.flatMap(r => evalN(e, r)); if (vs.isEmpty) None else Some(vs.min)
    case PMax(e) =>
      val vs = rows.flatMap(r => evalN(e, r)); if (vs.isEmpty) None else Some(vs.max)
    case PAvg(e) =>
      val vs = rows.flatMap(r => evalN(e, r))
      if (vs.isEmpty) None else Some(vs.sum.toDouble / vs.length) // exact: |sum| << 2^53
  }

  /** The dissect/grok two-field extraction both command oracles share. */
  private def splitFirst(r: Row, in: String, ka: String, kb: String): Row =
    r(in).map(_.asInstanceOf[String]) match {
      case Some(s) if s.contains("_") =>
        val i = s.indexOf("_")
        r ++ Map[String, Option[Any]](
          ka -> Some(s.substring(0, i)), kb -> Some(s.substring(i + 1)))
      case _ => r ++ Map[String, Option[Any]](ka -> None, kb -> None)
    }

  /** Null-as-largest ordering (the dialect's SORT default: ASC → nulls
    * last, DESC → nulls first — one rule, null = +∞). */
  private def cmpOpt(a: Option[Any], b: Option[Any]): Int = (a, b) match {
    case (None, None) => 0
    case (None, _) => 1
    case (_, None) => -1
    case (Some(x: Long), Some(y: Long)) => java.lang.Long.compare(x, y)
    case (Some(x: Double), Some(y: Double)) => java.lang.Double.compare(x, y)
    case (Some(x: String), Some(y: String)) => x.compareTo(y)
    case (x, y) => sys.error(s"unorderable $x vs $y")
  }

  private def evalCmd(c: PCmd, rows: Seq[Row]): Seq[Row] = c match {
    case PWhere(b) => rows.filter(r => evalB(b, r).contains(true))
    case PEvalN(n, e) => rows.map(r => r + (n -> evalN(e, r)))
    case PEvalS(n, e) => rows.map(r => r + (n -> evalS(e, r)))
    case PEvalMv(n, a, b) => rows.map { r =>
      val v = for { x <- evalS(a, r); y <- evalS(b, r) } yield List(x, y)
      r + (n -> v)
    }
    case PMvExpand(n) => rows.flatMap { r =>
      r(n) match {
        case None => Seq(r + (n -> None)) // explode_outer: null row kept
        case Some(xs) =>
          val l = xs.asInstanceOf[List[String]]
          if (l.isEmpty) Seq(r + (n -> None))
          else l.map(x => r + (n -> Some(x)))
      }
    }
    case PStats(aggs, by) =>
      if (by.isEmpty) Seq(aggs.map { case (n, a) => n -> evalAgg(a, rows) }.toMap)
      else {
        def keyVal(r: Row, e: Either[String, SE]): Option[Any] = e match {
          case Left(c0) => r(c0)
          case Right(se) => evalS(se, r)
        }
        val keyed = rows.groupBy(r => by.map { case (_, e) => keyVal(r, e) })
        keyed.toSeq.map { case (ks, grp) =>
          (by.map(_._1).zip(ks).toMap ++
            aggs.map { case (n, a) => n -> evalAgg(a, grp) }).toMap
        }
      }
    case PInline(aggs, by) => by match {
      case None =>
        val vals = aggs.map { case (n, a) => n -> evalAgg(a, rows) }
        rows.map(r => r ++ vals) // overwrite clashes, like the engine
      case Some(b) =>
        val grps = rows.groupBy(_(b))
        val vals = grps.map { case (k, grp) =>
          k -> aggs.map { case (n, a) => n -> evalAgg(a, grp) } }
        rows.map(r => r ++ vals(r(b)))
    }
    case PSortLimit(keys, tiebreak, n) =>
      // explicit NULLS FIRST/LAST overrides the dialect default
      // (ASC → nulls last, DESC → nulls first)
      def keyCmp(a: Option[Any], b: Option[Any], asc: Boolean, nf: Option[Boolean]): Int = {
        val nullsFirst = nf.getOrElse(!asc)
        (a, b) match {
          case (None, None) => 0
          case (None, _) => if (nullsFirst) -1 else 1
          case (_, None) => if (nullsFirst) 1 else -1
          case _ => val c = cmpOpt(a, b); if (asc) c else -c
        }
      }
      val allKeys = keys ++ tiebreak.map(k => (k, true, None: Option[Boolean]))
      rows.sortWith { (a, b) =>
        allKeys.iterator.map { case (k, asc, nf) => keyCmp(a(k), b(k), asc, nf) }
          .find(_ != 0).exists(_ < 0)
      }.take(n)
    // dissect's linear walk AND grok's ^(.*?)_(.*)$ regex agree on the
    // same observable: ka = text before the FIRST separator, the
    // trailing key takes the rest; matched-but-empty captures stay "";
    // no-match (and null) rows null every key. (The regex-vs-split
    // equivalence needs newline-free strings — '.' excludes \n —
    // asserted over the corpus at fixture load.)
    case PDissect(in, ka, kb) => rows.map(splitFirst(_, in, ka, kb))
    case PGrok(in, ka, kb) => rows.map(splitFirst(_, in, ka, kb))
    case PLookup =>
      // lookup fields OVERWRITE same-named columns; a key the index
      // lacks nulls them (left join), like ENRICH
      rows.map { r =>
        val hit = r("lang").map(_.asInstanceOf[String]).flatMap(lookupDim.get)
        (r - "lknum" - "lkword") ++ Map[String, Option[Any]](
          "lknum" -> hit.map(_._1), "lkword" -> hit.map(_._2))
      }
    case PEnrich(on) =>
      // ES ENRICH overwrites clashing columns with the DIM value — null
      // on no match, even where the source had a value (the engine
      // drops the clash columns before its left join)
      rows.map { r =>
        val hit = r(on).map(_.asInstanceOf[String]).flatMap(enrichDim.get)
        (r - "tag" - "tier") ++ Map[String, Option[Any]](
          "tag" -> hit.map(_._1), "tier" -> hit.map(_._2))
      }
    case PKeep(cols) => rows.map(r => cols.map(c => c -> r(c)).toMap)
    case PDrop(c) => rows.map(_ - c)
    case PRename(from, to) => rows.map(r => (r - from) + (to -> r(from)))
    case PForkU(branches, branchCols) =>
      // union column set comes from the branch SCHEMAS (a branch whose
      // WHERE kept zero rows still contributes its columns), like the
      // engine's unionByName(allowMissingColumns = true)
      val allKeys = (branchCols.flatten :+ "_fork").distinct
      branches.zipWithIndex.flatMap { case (bs, bi) =>
        bs.foldLeft(rows)((rs, c0) => evalCmd(c0, rs))
          .map(_ + ("_fork" -> (Some(s"fork${bi + 1}"): Option[Any])))
      }.map(r => allKeys.map(k => k -> r.getOrElse(k, None)).toMap)
    case PFuse(id, rank) =>
      // per-branch rank: RANK desc with nulls LAST (Spark's desc
      // default in the engine's window), id asc ties
      val ranked = rows.groupBy(_("_fork")).toSeq.flatMap { case (_, rs) =>
        val sorted = rs.sortWith { (a, b) =>
          val (ra, rb) = (a(rank).map(_.asInstanceOf[Long]),
            b(rank).map(_.asInstanceOf[Long]))
          val c = (ra, rb) match {
            case (None, None) => 0
            case (None, _) => 1
            case (_, None) => -1
            case (Some(x), Some(y)) => -java.lang.Long.compare(x, y)
          }
          if (c != 0) c < 0 else cmpOpt(a(id), b(id)) < 0
        }
        sorted.zipWithIndex.map { case (r, i) => (r(id), i + 1) }
      }
      ranked.groupBy(_._1).toSeq.map { case (idv, legs) =>
        val score = legs.map { case (_, rk) =>
          BigDecimal(1000000.0 / (60.0 + rk))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }.sum
        Map[String, Option[Any]](id -> idv,
          "_score_c" -> Some(score), "n_legs" -> Some(legs.size.toLong))
      }
    case PTsStats(aggs, by) =>
      def longOf(r: Row, c: String): Option[Long] = r(c).map(_.asInstanceOf[Long])
      def half(x: Double): Long =
        BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      // inner level: one row per (BY keys, _tsid), ordered by _ts_ms
      val inner = rows.groupBy(r => by.map(r(_)) :+ r("_tsid")).toSeq.map {
        case (_, grp0) =>
          val grp = grp0.sortBy(r => longOf(r, "_ts_ms").get)
          val innerVals = aggs.map { a =>
            val vs = a.c.map(c => grp.flatMap(longOf(_, c))).getOrElse(Nil)
            val v: Long = a.inner match {
              case "COUNT_OVER_TIME" => a.c.map(_ => vs.size.toLong).getOrElse(grp.size.toLong)
              case "SUM_OVER_TIME" => vs.sum
              case "MIN_OVER_TIME" => vs.min
              case "MAX_OVER_TIME" => vs.max
              case "AVG_OVER_TIME" => half(vs.sum.toDouble * 1000 / vs.size)
              case "FIRST_OVER_TIME" => vs.head
              case "LAST_OVER_TIME" => vs.last
              case "RATE" =>
                val increase = vs.zip(vs.drop(1))
                  .map { case (p, c0) => if (c0 >= p) c0 - p else c0 }.sum
                val ts = grp.map(r => longOf(r, "_ts_ms").get)
                val span = math.max(ts.max - ts.min, 1L)
                half(increase.toDouble * 1000000 / span)
            }
            a.name -> v
          }
          (by.map(grp.head(_)), innerVals.toMap)
      }
      // outer level: combine the series rows per BY group; a GLOBAL
      // aggregate over an empty frame still yields ONE row (count = 0,
      // everything else null) — the SQL global-agg contract
      val groups = inner.groupBy(_._1).toSeq
      val padded =
        if (by.isEmpty && groups.isEmpty)
          Seq((Seq.empty[Option[Any]], Seq.empty[(Seq[Option[Any]], Map[String, Long])]))
        else groups
      padded.map { case (ks, series) =>
        val outs = aggs.map { a =>
          val vs = series.map(_._2(a.name))
          val v: Option[Long] = a.outer match {
            case "sum" => if (vs.isEmpty) None else Some(vs.sum)
            case "min" => if (vs.isEmpty) None else Some(vs.min)
            case "max" => if (vs.isEmpty) None else Some(vs.max)
            case "count" => Some(vs.size.toLong)
            case "avg" => if (vs.isEmpty) None
              else Some(half(vs.sum.toDouble * 1000 / vs.size))
          }
          a.name -> (v: Option[Any])
        }
        (by.zip(ks) ++ outs).toMap
      }
    case PChangePoint(v, tn, pn) =>
      // the engine's CUSUM argmax over the doc_id-ordered series:
      // k·(n−k)·(meanL−meanR)², exact-long prefix sums, ties → smallest
      // key; the argmax row gains (tn, pn = round(1/(1+score), 6))
      val ordered = rows.sortBy(r => r("doc_id").get.asInstanceOf[Long])
      val n = ordered.size
      val vals = ordered.map(r => r(v).map(_.asInstanceOf[Long]))
      val prefix = vals.scanLeft(Option.empty[Long]) { (acc, x) =>
        (acc, x) match {
          case (None, None) => None
          case (None, Some(b)) => Some(b)
          case (Some(a), None) => Some(a)
          case (Some(a), Some(b)) => Some(a + b)
        }
      }.drop(1)
      val st = prefix.lastOption.flatten
      val scores = (1 to n).map { k =>
        if (k >= n) None
        else for { sk <- prefix(k - 1); total <- st } yield {
          val meanL = sk.toDouble / k
          val meanR = (total - sk).toDouble / (n - k)
          k.toDouble * (n - k) * (meanL - meanR) * (meanL - meanR)
        }
      }
      val best = scores.zipWithIndex.collect { case (Some(s), i) => (s, i) }
        .sortBy { case (s, i) => (-s, i) }.headOption.map(_._2)
      ordered.zipWithIndex.map { case (r, i) =>
        if (best.contains(i)) {
          val s = scores(i).get
          val pv = BigDecimal(1.0 / (1.0 + s))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          r + (tn -> (Some("step_change"): Option[Any])) +
            (pn -> (Some(pv): Option[Any]))
        } else r + (tn -> (None: Option[Any])) + (pn -> (None: Option[Any]))
      }
    case PSample(p, on, _) =>
      val cut = (p * 1000000).toLong
      rows.filter { r =>
        r(on).exists { v =>
          val s = v match {
            case l: Long => l.toString
            case str: String => str
            case other => other.toString
          }
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8"))
          val hex = md.map("%02x".format(_)).mkString.take(8)
          java.lang.Long.parseLong(hex, 16) % 1000000L < cut
        }
      }
    case PFtWhere(_, field, node) =>
      rows.filter(r => evalFt(node, field, r).contains(true))
    case PEnrichRange(on) =>
      rows.map { r =>
        val hit = r(on).map(_.asInstanceOf[Long]).flatMap(rangeHit)
        (r - "rtag" - "rtier") ++ Map[String, Option[Any]](
          "rtag" -> hit.map(_._1), "rtier" -> hit.map(_._2))
      }
    case PRerank(terms, field) =>
      rows.map { r =>
        val score = r(field).map(_.asInstanceOf[String]).map { v =>
          val toks = v.trim.split(" ", -1).toSeq
          terms.map(t =>
            math.min(toks.count(_ == t).toLong, ops.EsqlParser.rerankTfCap)).sum
        }
        r + ("_score" -> (score: Option[Any]))
      }
    case PFnWhere(kind, fields, q) =>
      // the engine analyzes the QUERY on \s+ but the FIELD on single
      // spaces (split(trim(f), " ")) — the mirror preserves the split
      val terms = q.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      def fv(r: Row, f: String): Option[String] = r(f).map(_.asInstanceOf[String])
      def kleeneOr(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] = (a, b) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      rows.filter { r =>
        val verdict: Option[Boolean] = kind match {
          case "match_phrase" =>
            if (terms.isEmpty) Some(false) // engine: lit(false), null-proof
            else fv(r, fields.head).map(v =>
              (" " + v.trim + " ").contains(" " + terms.mkString(" ") + " "))
          case "multi_match" =>
            if (terms.isEmpty) Some(false) // every MATCH leg is lit(false)
            else fields.map(f => fv(r, f)
              .map(v => v.trim.split(" ", -1).exists(terms.contains)))
              .reduce(kleeneOr)
          case "term" => // the literal verbatim, not its analysis; the
            // FIELD splits on whitespace runs, so TERM("") matches
            // exactly the wholly-empty fields ("" keeps its one ""
            // term — ES's empty-keyword contract) and nothing else
            fv(r, fields.head).map(v => v.trim.split(" +", -1).contains(q))
        }
        verdict.contains(true)
      }
  }

  // ------------------------------------------------- program generator
  /** `longs` carries each numeric column's ABS-VALUE BOUND so the
    * generator can keep every expression inside the exactness window
    * (see tame below). */
  private case class Schema(longs: Seq[(String, Long)], strs: Seq[String], mvs: Seq[String]) {
    def longNames: Seq[String] = longs.map(_._1)
    def boundOf(n: String): Long = longs.find(_._1 == n).get._2
  }
  private val rowCap = 16000L // 500 docs × ≤4 MV_EXPAND doublings, with margin
  private val base = Schema(Seq("doc_id" -> 500L, "n_chars" -> 600L), Seq("lang", "source"), Nil)

  /** The magnitude invariant, ENFORCED rather than hoped for: every
    * generated numeric node is rebuilt bottom-up with a saturating
    * abs-bound; any node whose bound exceeds `tameCap` is wrapped in
    * `% 999983` (identical in both engines, nonzero literal modulus).
    * With operands ≤ 1e6, a product is ≤ 1e12 — no LONG overflow (ANSI
    * would throw where the evaluator wraps), and aggregate sums stay
    * ≤ rowCap·1e6 ≈ 1.6e10 ≪ 2^53, so AVG's double division is exact
    * and the frame comparison can stay ==. */
  private val tameCap = 1000000L
  private def tame(e: NE, s: Schema): (NE, Long) = {
    def clamp(e0: NE, b: Long): (NE, Long) =
      if (b <= tameCap) (e0, b) else (NBin("%", e0, NLit(999983L)), 999982L)
    e match {
      case NCol(n) => clamp(e, s.boundOf(n))
      case NLit(v) => (e, math.abs(v))
      case NLen(se) => (e, 1000L) // corpus strings + bounded concat chains
      case NBin(op, l, r) =>
        val (tl, bl) = tame(l, s)
        val (tr, br) = tame(r, s)
        val bound = op match {
          case "+" | "-" => bl + br
          case "*" => bl * br
          case "/" => bl
          case "%" => math.min(bl, br)
        }
        clamp(NBin(op, tl, tr), bound)
      // the result is always one of the literal points
      case NRoundTo(x, ps) =>
        val (tx, _) = tame(x, s)
        (NRoundTo(tx, ps), ps.map(math.abs).max)
      case NCopySign(m, sg) =>
        val (tm, bm) = tame(m, s)
        val (ts, _) = tame(sg, s)
        clamp(NCopySign(tm, ts), bm)
    }
  }

  private def neGen(s: Schema, depth: Int): Gen[NE] = {
    val leaf = Gen.frequency(
      4 -> Gen.oneOf(s.longNames).map(NCol.apply),
      3 -> Gen.chooseNum(-100L, 100L).map(NLit.apply),
      1 -> (if (s.strs.nonEmpty) Gen.oneOf(s.strs).map(c => NLen(SCol(c)))
            else Gen.chooseNum(-100L, 100L).map(NLit.apply)))
    val raw =
      if (depth <= 0) leaf
      else Gen.frequency(
        3 -> leaf,
        // data-dependent divisors and moduli INCLUDED — the null paths
        // the expression fuzzer had to avoid are the point here
        2 -> (for { op <- Gen.oneOf("+", "-", "*", "/", "%")
                    l <- neGen(s, depth - 1); r <- neGen(s, depth - 1) } yield NBin(op, l, r)))
    raw.map(e => tame(e, s)._1)
  }
  private def neBound(e: NE, s: Schema): Long = tame(e, s)._2
  private def seGen(s: Schema, depth: Int): Gen[SE] = {
    val leafPicks = Seq(
      // '_'-edged literals make dissect/grok's matched-but-EMPTY
      // capture branch reachable (r16 review: it was asserted-by-
      // comment but never generated)
      1 -> Gen.oneOf("aa", "bb", "zz", "_aa", "aa_").map(SLit.apply: String => SE),
      1 -> neGen(s, 0).map(SToStr.apply: NE => SE)) ++
      (if (s.strs.nonEmpty) Seq(4 -> Gen.oneOf(s.strs).map(SCol.apply: String => SE)) else Nil)
    val leaf = Gen.frequency(leafPicks: _*)
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      1 -> (for { l <- seGen(s, depth - 1); r <- seGen(s, depth - 1) } yield SConcat(l, r): SE),
      1 -> (for { c <- beGen(s, 0); v <- seGen(s, depth - 1) } yield SCase(c, v): SE))
  }
  private def beGen(s: Schema, depth: Int): Gen[BE] = {
    val leaf = Gen.frequency(
      4 -> (for { op <- Gen.oneOf("==", "!=", ">=", "<=", ">", "<")
                  l <- neGen(s, 1); r <- neGen(s, 1) } yield BCmpN(op, l, r)),
      2 -> (for { eq <- Gen.oneOf(true, false); l <- seGen(s, 0)
                  r <- seGen(s, 0) } yield BCmpS(eq, l, r)),
      1 -> (for { x <- neGen(s, 1); vs <- Gen.listOfN(3, Gen.chooseNum(-50L, 450L)) }
        yield BIn(x, vs.distinct)),
      1 -> (for { x <- neGen(s, 1); neg <- Gen.oneOf(true, false) } yield BIsNull(x, neg)))
    if (depth <= 0) leaf
    else Gen.frequency(
      2 -> leaf,
      2 -> (for { and <- Gen.oneOf(true, false); l <- beGen(s, depth - 1)
                  r <- beGen(s, depth - 1) } yield BBin(and, l, r)),
      1 -> beGen(s, depth - 1).map(BNot.apply))
  }
  /** Column bound an aggregate result carries into the long pool. */
  private def aggBound(a: PAgg, s: Schema): Long = a match {
    case PCount => rowCap
    case PSum(e) => rowCap * neBound(e, s) // ≤ 16000 · 1e6 ≪ 2^53
    case PMin(e) => neBound(e, s)
    case PMax(e) => neBound(e, s)
    case PAvg(_) => 0L // double — never enters the long pool
  }
  private def aggGen(s: Schema): Gen[PAgg] = Gen.frequency(
    2 -> Gen.const(PCount),
    2 -> neGen(s, 1).map(PSum.apply),
    1 -> neGen(s, 1).map(PMin.apply),
    1 -> neGen(s, 1).map(PMax.apply),
    1 -> neGen(s, 1).map(PAvg.apply))

  /** One command valid under `s`, with the schema it produces. The
    * schema's LONG pool is never empty (every STATS carries a forced
    * COUNT), so numeric generation always has a leaf; string-dependent
    * picks are only offered while a string column is in scope. */
  private def cmdGen(s: Schema, fresh: Int): Gen[(PCmd, Schema)] = {
    def where = beGen(s, 2).map(b => (PWhere(b): PCmd) -> s)
    def evalN = for { e <- neGen(s, 2) } yield {
      val n = s"e$fresh"
      (PEvalN(n, e): PCmd) -> s.copy(longs = s.longs :+ (n -> neBound(e, s)))
    }
    def evalS = for { e <- seGen(s, 2) } yield {
      val n = s"t$fresh"
      (PEvalS(n, e): PCmd) -> s.copy(strs = s.strs :+ n)
    }
    def evalMv = for { a <- seGen(s, 1); b <- seGen(s, 1) } yield {
      val n = s"m$fresh"
      (PEvalMv(n, a, b): PCmd) -> s.copy(mvs = s.mvs :+ n)
    }
    def mvExpand = Gen.oneOf(s.mvs).map { m =>
      (PMvExpand(m): PCmd) -> Schema(s.longs, s.strs :+ m, s.mvs.filterNot(_ == m))
    }
    def stats = {
      type ByKey = (String, Either[String, SE])
      def plainKey: Gen[ByKey] = Gen.oneOf(s.strs).map(c => c -> Left(c))
      // NULL-able BY key — the r15 bug class, generated on purpose
      def caseKey: Gen[ByKey] = for {
        c <- beGen(s, 0); v <- Gen.oneOf(s.strs).map(SCol.apply)
      } yield s"g$fresh" -> Right(SCase(c, v): SE)
      for {
        nAggs <- Gen.chooseNum(0, 2)
        aggs <- Gen.listOfN(nAggs, aggGen(s))
        by <- if (s.strs.isEmpty) Gen.const(Seq.empty[ByKey])
          else Gen.frequency[Seq[ByKey]](
            1 -> Gen.const(Nil),
            2 -> plainKey.map(Seq(_)),
            2 -> caseKey.map(Seq(_)),
            // MULTI-key BY with a null-able member: the null bucket must
            // survive inside a composite grouping key too
            2 -> (for { p <- plainKey; c <- caseKey } yield Seq(p, c)))
      } yield {
        // a forced COUNT keeps the post-STATS long pool non-empty
        val named = (s"a${fresh}c" -> (PCount: PAgg)) +:
          aggs.zipWithIndex.map { case (a, i) => s"a$fresh$i" -> a }
        val out = Schema(
          named.collect { case (n, a) if !a.isInstanceOf[PAvg] => n -> aggBound(a, s) },
          by.map(_._1), Nil)
        (PStats(named, by): PCmd) -> out
      }
    }
    def inline = for {
      nAggs <- Gen.chooseNum(1, 2)
      aggs <- Gen.listOfN(nAggs, aggGen(s))
      by <- if (s.strs.isEmpty) Gen.const(None: Option[String])
        else Gen.frequency[Option[String]](
          1 -> Gen.const(None),
          3 -> Gen.oneOf(s.strs).map(Some(_)))
      // sometimes OVERWRITE an existing numeric column — the engine's
      // documented withColumn/drop-join overwrite contract
      clash <- Gen.frequency(3 -> Gen.const(false), 1 -> Gen.const(true))
    } yield {
      val named = aggs.zipWithIndex.map { case (a, i) =>
        val n = if (clash && i == 0) s.longNames.head else s"i$fresh$i"
        n -> a
      }
      val newLongs = named.collect { case (n, a) if !a.isInstanceOf[PAvg] => n -> aggBound(a, s) }
        .filterNot { case (n, _) => s.longNames.contains(n) }
      // an overwritten LONG column: an AVG makes it a double — drop it
      // from the long pool; a long agg REBOUNDS it (a count overwriting
      // doc_id now carries the count's bound, not doc_id's)
      val avgNames = named.collect { case (n, a) if a.isInstanceOf[PAvg] => n }
      val rebound = named.collect { case (n, a) if !a.isInstanceOf[PAvg] => n -> aggBound(a, s) }.toMap
      (PInline(named, by): PCmd) ->
        s.copy(longs = s.longs.filterNot { case (n, _) => avgNames.contains(n) }
          .map { case (n, b) => n -> rebound.getOrElse(n, b) } ++ newLongs)
    }
    def sortLimit = for {
      nk <- Gen.chooseNum(1, 2)
      keys <- Gen.listOfN(nk, for {
        k <- Gen.oneOf(s.longNames ++ s.strs); asc <- Gen.oneOf(true, false)
        nf <- Gen.oneOf(None, Some(true), Some(false)) // explicit NULLS FIRST/LAST too
      } yield (k, asc, nf))
      n <- Gen.chooseNum(1, 40)
    } yield {
      val tiebreak = (s.longNames ++ s.strs).filterNot(keys.map(_._1).contains)
      (PSortLimit(keys.distinctBy(_._1), tiebreak, n): PCmd) -> s
    }
    def enrich = Gen.oneOf(s.strs.filterNot(c => c == "tag" || c == "tier")).map { on =>
      // overwrite semantics: tag/tier REPLACE any same-named columns
      (PEnrich(on): PCmd) -> Schema(
        s.longs.filterNot(_._1 == "tier") :+ ("tier" -> 20L),
        s.strs.filterNot(_ == "tag") :+ "tag", s.mvs)
    }
    def keep = for {
      mask <- Gen.listOfN(s.longNames.size + s.strs.size + s.mvs.size,
        Gen.frequency(3 -> Gen.const(true), 2 -> Gen.const(false)))
    } yield {
      val all = s.longNames ++ s.strs ++ s.mvs
      val chosen0 = all.zip(mask).collect { case (c, true) => c }
      // the long pool must survive (numeric generation needs a leaf)
      val chosen = if (chosen0.exists(s.longNames.contains)) chosen0
        else s.longNames.head +: chosen0
      (PKeep(chosen): PCmd) -> Schema(
        s.longs.filter(l => chosen.contains(l._1)),
        s.strs.filter(chosen.contains), s.mvs.filter(chosen.contains))
    }
    def drop = Gen.oneOf(
      (s.longNames.drop(1) ++ s.strs ++ s.mvs)). map { c =>
      (PDrop(c): PCmd) -> Schema(
        s.longs.filterNot(_._1 == c), s.strs.filterNot(_ == c), s.mvs.filterNot(_ == c))
    }
    def rename = for { c <- Gen.oneOf(s.longNames ++ s.strs ++ s.mvs) } yield {
      val to = s"r$fresh"
      val ren = (n: String) => if (n == c) to else n
      (PRename(c, to): PCmd) -> Schema(
        s.longs.map { case (n, b) => ren(n) -> b }, s.strs.map(ren), s.mvs.map(ren))
    }
    def dissect = Gen.oneOf(s.strs).map { in =>
      val (ka, kb) = (s"d${fresh}a", s"d${fresh}b")
      (PDissect(in, ka, kb): PCmd) -> s.copy(strs = s.strs ++ Seq(ka, kb))
    }
    def grok = Gen.oneOf(s.strs).map { in =>
      val (ka, kb) = (s"k${fresh}a", s"k${fresh}b")
      (PGrok(in, ka, kb): PCmd) -> s.copy(strs = s.strs ++ Seq(ka, kb))
    }
    def lookup = Gen.const(
      (PLookup: PCmd) -> Schema(
        s.longs.filterNot(_._1 == "lknum") :+ ("lknum" -> 30L),
        s.strs.filterNot(_ == "lkword") :+ "lkword", s.mvs))
    val picks = Seq.newBuilder[(Int, Gen[(PCmd, Schema)])]
    picks += 4 -> where
    picks += 3 -> evalN
    picks += 2 -> evalS
    picks += 1 -> evalMv
    picks += 2 -> stats
    picks += 2 -> inline
    picks += 1 -> keep
    picks += 1 -> rename
    if (s.strs.nonEmpty) { picks += 2 -> dissect; picks += 1 -> grok }
    if (s.strs.contains("lang")) picks += 2 -> lookup
    if (s.strs.exists(c => c != "tag" && c != "tier")) picks += 2 -> enrich
    if (s.longNames.size + s.strs.size + s.mvs.size > 1) picks += 1 -> drop
    if (s.mvs.nonEmpty) picks += 3 -> mvExpand
    // SORT+LIMIT needs a total order over scalar columns — only when no
    // multivalue column is in scope (arrays are not sort keys)
    if (s.mvs.isEmpty) picks += 2 -> sortLimit
    Gen.frequency(picks.result(): _*)
  }

  private def programGen(len: Int): Gen[List[PCmd]] = {
    def go(s: Schema, i: Int): Gen[List[PCmd]] =
      if (i >= len) Gen.const(Nil)
      else cmdGen(s, i).flatMap { case (c, s2) => go(s2, i + 1).map(c :: _) }
    go(base, 0)
  }

  // ------------------------------------------------------- comparison
  private def canon(v: Option[Any]): String = v match {
    case None => "∅"
    case Some(x: Long) => s"L:$x"
    case Some(x: Double) => s"D:${java.lang.Double.doubleToRawLongBits(x)}"
    case Some(x: String) => s"S:$x"
    case Some(xs: List[_]) => s"M:${xs.mkString("|")}"
    case Some(x) => s"?:$x"
  }
  private def canonRows(rows: Seq[Row]): Seq[String] =
    rows.map(r => r.toSeq.sortBy(_._1).map { case (k, v) => s"$k=${canon(v)}" }
      .mkString(",")).sorted

  private def engineRows(q: String,
      docsFrame: org.apache.spark.sql.DataFrame = srcDf): Seq[Row] = {
    val df = EsqlParser.run(q,
      { case "ldim" => lookupDimDf; case "tsrc" => tsDf; case _ => docsFrame },
      session = Some(spark),
      policies = {
        case "ptags" => (enrichDimDf, "k")
        case "prange" => (rangeDimDf, "__none")
      })
    val fields = df.schema.fields
    df.collect().toSeq.map { r =>
      fields.zipWithIndex.map { case (f, i) =>
        val v: Option[Any] =
          if (r.isNullAt(i)) None
          else f.dataType match {
            case org.apache.spark.sql.types.LongType => Some(r.getLong(i))
            case org.apache.spark.sql.types.DoubleType => Some(r.getDouble(i))
            case org.apache.spark.sql.types.StringType => Some(r.getString(i))
            case _: org.apache.spark.sql.types.ArrayType => Some(r.getSeq[String](i).toList)
            case other => sys.error(s"unexpected engine type $other for ${f.name}")
          }
        f.name -> v
      }.toMap
    }
  }

  test("200 random multi-command programs: engine frame == independent evaluator frame") {
    var seed = Seed(1009L)
    var checked = 0
    val feature = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    (1 to 200).foreach { i =>
      val len = 2 + (i % 4) // 2..5 commands
      val prog = programGen(len).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      prog.foreach {
        case PWhere(_) => feature("where") += 1
        case _: PEvalN | _: PEvalS => feature("eval") += 1
        case _: PEvalMv => feature("eval_mv") += 1
        case _: PMvExpand => feature("mv_expand") += 1
        case PStats(_, by) =>
          if (by.isEmpty) feature("stats_global") += 1
          if (by.exists(_._2.isLeft)) feature("stats_by") += 1
          if (by.exists(_._2.isRight)) feature("stats_null_by") += 1
          if (by.size >= 2) feature("stats_multi_by") += 1
        case PInline(aggs, _) =>
          feature("inlinestats") += 1
          if (aggs.exists { case (n, _) => !n.startsWith("i") }) feature("inline_overwrite") += 1
        case PSortLimit(keys, _, _) =>
          feature("sort_limit") += 1
          if (keys.exists(_._3.isDefined)) feature("sort_nulls_explicit") += 1
        case _: PEnrich => feature("enrich") += 1
        case _: PDissect => feature("dissect") += 1
        case _: PGrok => feature("grok") += 1
        case PLookup => feature("lookup_join") += 1
        case _: PKeep | _: PDrop | _: PRename => feature("schema_ops") += 1
      }
      def hasDivMod(e: NE): Boolean = e match {
        case NBin(op, l, r) => op == "/" || op == "%" || hasDivMod(l) || hasDivMod(r)
        case _ => false
      }
      def cmdDivMod(c: PCmd): Boolean = c match {
        case PEvalN(_, e) => hasDivMod(e)
        case _ => false
      }
      if (prog.exists(cmdDivMod)) feature("div_or_mod") += 1
      val q = ("FROM documents" +: prog.map(cmdText)).mkString("\n")
      val want = canonRows(prog.foldLeft(corpus)((rows, c) => evalCmd(c, rows)))
      val got = canonRows(engineRows(q))
      assert(got == want, {
        val firstDiff = got.zipAll(want, "<missing>", "<missing>")
          .find { case (a, b) => a != b }
        s"""frame diverged (seed round $i)
           |query:
           |$q
           |engine rows: ${got.size}, evaluator rows: ${want.size}
           |first diff: $firstDiff""".stripMargin
      })
      checked += 1
    }
    assert(checked == 200)
    // the sweep must actually EXERCISE every command family and the
    // null-path features it exists for — a generator drift that stops
    // producing them would leave this suite green but hollow
    val required = Seq("where", "eval", "eval_mv", "mv_expand", "stats_null_by",
      "stats_by", "stats_global", "stats_multi_by", "inlinestats",
      "inline_overwrite", "sort_limit", "sort_nulls_explicit", "div_or_mod",
      "enrich", "dissect", "grok", "lookup_join", "schema_ops")
    val missing = required.filterNot(feature(_) > 0)
    assert(missing.isEmpty,
      s"generator no longer produces: $missing (counts: ${feature.toSeq.sorted})")
  }

  // =================== r17: the previously-unfuzzed command compilers
  // (FORK / FUSE / TS / CATEGORIZE / SAMPLE / CHANGE_POINT / full-text
  // WHERE) — the same generator + Option-space-evaluator pattern, aimed
  // at the most intricate compilers in EsqlParser (r16 verdict task 1)

  private lazy val textTop: Seq[String] = corpusT
    .flatMap(_("text").get.asInstanceOf[String].trim.split(" ", -1))
    .filter(_.nonEmpty).groupBy(identity).toSeq.sortBy(-_._2.size)
    .take(40).map(_._1)
  private lazy val textWordG: Gen[String] = Gen.oneOf(textTop)
  private lazy val textPhraseG: Gen[Seq[String]] = for {
    r <- Gen.oneOf(corpusT)
    n <- Gen.chooseNum(2, 3)
    st <- Gen.chooseNum(0, 200)
  } yield {
    val toks = r("text").get.asInstanceOf[String].trim.split(" ", -1)
      .toSeq.filter(_.nonEmpty)
    val s0 = toks.slice(st % math.max(1, toks.length), st % math.max(1, toks.length) + n)
    if (s0.nonEmpty) s0 else Seq("aa", "bb")
  }
  private lazy val langVals: Seq[String] =
    corpus.flatMap(_("lang")).map(_.asInstanceOf[String]).distinct :+ "zz"
  private lazy val sourceVals: Seq[String] =
    corpus.flatMap(_("source")).map(_.asInstanceOf[String]).distinct :+ "nowhere"

  private def wildify(w: String, pos: Int): String = pos match {
    case 0 => w.take(3) + "*"
    case 1 => "*" + w.drop(math.max(0, w.length - 3))
    case 2 => if (w.length >= 2) w.take(1) + "*" + w.takeRight(1) else w + "*"
    case _ => w
  }

  /** Full-text node over the documents TEXT field, with fielded
    * clauses binding the base keyword/numeric columns. */
  private def ftGenText(lang: Int, depth: Int): Gen[FTN] = {
    val kwPick: Gen[(String, String)] = for {
      f <- Gen.oneOf("lang", "source")
      v <- if (f == "lang") Gen.oneOf(langVals) else Gen.oneOf(sourceVals)
    } yield (f, v)
    val leaf: Gen[FTN] = lang match {
      case 0 => Gen.frequency(
        3 -> textWordG.map(w => FtTerm(None, w): FTN),
        2 -> (for { w <- textWordG; k <- Gen.chooseNum(1, 3) }
          yield FtPrefix(None, w.take(k)): FTN),
        2 -> textPhraseG.map(ws => FtPhrase(None, ws): FTN),
        2 -> kwPick.map { case (f, v) => FtTerm(Some(f), v): FTN },
        1 -> (for { (f, v) <- kwPick; k <- Gen.chooseNum(1, 2) }
          yield FtPrefix(Some(f), v.take(k)): FTN))
      case 1 => Gen.frequency(
        3 -> (for { w <- textWordG; pos <- Gen.oneOf(0, 1, 2, 3) }
          yield FtWild(None, wildify(w, pos)): FTN),
        2 -> textPhraseG.map(ws => FtPhrase(None, ws): FTN),
        2 -> kwPick.map { case (f, v) => FtWild(Some(f), v): FTN },
        2 -> (for { f <- Gen.oneOf("n_chars", "doc_id")
                    op <- Gen.oneOf(">", ">=", "<", "<=")
                    v <- Gen.chooseNum(0L, 700L) } yield FtRange(f, op, v): FTN))
      case _ => for { n <- Gen.chooseNum(1, 3); ws <- Gen.listOfN(n, textWordG) }
        yield FtMatchTerms(ws): FTN
    }
    if (depth <= 0 || lang == 2) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for { l <- ftGenText(lang, depth - 1); r <- ftGenText(lang, depth - 1) }
        yield FtAnd(l, r): FTN),
      2 -> (for { l <- ftGenText(lang, depth - 1); r <- ftGenText(lang, depth - 1) }
        yield FtOr(l, r): FTN),
      1 -> ftGenText(lang, depth - 1).map(FtNot.apply: FTN => FTN))
  }

  /** Mid-pipeline full-text node: the text field is a POOLED string
    * column (often an EVAL'd null-able one) and fielded clauses bind
    * other pooled columns — the parser × compiler × null-semantics
    * crossing the r16 verdict asked for. */
  private def ftGenFielded(lang: Int, s: Schema, depth: Int): Gen[FTN] = {
    val vals = Seq("aa", "bb", "zz", "aa_bb") ++ langVals.take(3)
    val leaf: Gen[FTN] = {
      val base = lang match {
        case 0 => Seq(
          3 -> Gen.oneOf(vals).map(v => FtTerm(None, v): FTN),
          2 -> (for { v <- Gen.oneOf(vals); k <- Gen.chooseNum(1, 2) }
            yield FtPrefix(None, v.take(k)): FTN)) ++
          (if (s.strs.size > 1) Seq(2 -> (for {
            f <- Gen.oneOf(s.strs); v <- Gen.oneOf(vals)
          } yield FtTerm(Some(f), v): FTN)) else Nil)
        case 1 => Seq(
          3 -> (for { v <- Gen.oneOf(vals); pos <- Gen.oneOf(0, 2, 3) }
            yield FtWild(None, wildify(v.replace("_", "x"), pos)): FTN),
          2 -> (for { f <- Gen.oneOf(s.longNames); op <- Gen.oneOf(">", ">=", "<", "<=")
                      v <- Gen.chooseNum(0L, 450L) } yield FtRange(f, op, v): FTN)) ++
          (if (s.strs.size > 1) Seq(2 -> (for {
            f <- Gen.oneOf(s.strs); v <- Gen.oneOf(vals)
          } yield FtWild(Some(f), v): FTN)) else Nil)
        case _ => Seq(
          3 -> (for { n <- Gen.chooseNum(1, 2); ws <- Gen.listOfN(n, Gen.oneOf(vals)) }
            yield FtMatchTerms(ws): FTN))
      }
      Gen.frequency(base: _*)
    }
    if (depth <= 0 || lang == 2) leaf
    else Gen.frequency(
      2 -> leaf,
      1 -> (for { l <- ftGenFielded(lang, s, depth - 1)
                  r <- ftGenFielded(lang, s, depth - 1) } yield FtAnd(l, r): FTN),
      1 -> (for { l <- ftGenFielded(lang, s, depth - 1)
                  r <- ftGenFielded(lang, s, depth - 1) } yield FtOr(l, r): FTN),
      1 -> ftGenFielded(lang, s, depth - 1).map(FtNot.apply: FTN => FTN))
  }

  // ------- branch bodies for FORK (restricted to frame-transforms —
  // the union's column semantics are the point, not nested aggregation)
  private def branchCmdGen(s: Schema, fresh: Int): Gen[(PCmd, Schema)] =
    Gen.frequency(
      3 -> beGen(s, 2).map(b => (PWhere(b): PCmd) -> s),
      2 -> (for { e <- neGen(s, 2) } yield {
        val n = s"e$fresh"
        (PEvalN(n, e): PCmd) -> s.copy(longs = s.longs :+ (n -> neBound(e, s)))
      }),
      1 -> (for { e <- seGen(s, 2) } yield {
        val n = s"t$fresh"
        (PEvalS(n, e): PCmd) -> s.copy(strs = s.strs :+ n)
      }),
      1 -> (for { k <- Gen.oneOf(s.longNames ++ s.strs); asc <- Gen.oneOf(true, false)
                  n <- Gen.chooseNum(5, 60) } yield {
        val tb = (s.longNames ++ s.strs).filterNot(_ == k)
        (PSortLimit(Seq((k, asc, None)), tb, n): PCmd) -> s
      }))

  private def branchGen(s0: Schema, f0: Int): Gen[(Seq[PCmd], Schema)] = {
    def go(s: Schema, i: Int, left: Int): Gen[(List[PCmd], Schema)] =
      if (left == 0) Gen.const((Nil, s))
      else branchCmdGen(s, i).flatMap { case (c, s2) =>
        go(s2, i + 1, left - 1).map { case (cs, sf) => (c :: cs, sf) } }
    Gen.chooseNum(1, 2).flatMap(n => go(s0, f0, n).map { case (cs, sf) => (cs, sf) })
  }

  private def mergeSchemas(ss: Seq[Schema]): Schema = Schema(
    ss.flatMap(_.longs).groupBy(_._1).toSeq
      .map { case (n, bs) => n -> bs.map(_._2).max }
      .sortBy(_._1),
    (ss.flatMap(_.strs).distinct :+ "_fork"), Nil)

  private def forkUGen(s: Schema, fresh: Int): Gen[(List[PCmd], Schema)] = for {
    nb <- Gen.chooseNum(2, 3)
    branches <- (0 until nb).foldLeft(Gen.const(List.empty[(Seq[PCmd], Schema)])) {
      (acc, bi) => acc.flatMap(l => branchGen(s, fresh + 10 * (bi + 1)).map(l :+ _))
    }
  } yield {
    val cols = branches.map { case (_, sc) => sc.longNames ++ sc.strs }
    (List(PForkU(branches.map(_._1), cols)), mergeSchemas(branches.map(_._2)))
  }

  private def forkFuseGen(s: Schema, fresh: Int): Gen[(List[PCmd], Schema)] = for {
    rkE <- neGen(s, 2)
    nb <- Gen.chooseNum(2, 3)
    specs <- Gen.listOfN(nb, for {
      withWhere <- Gen.oneOf(true, false)
      b <- beGen(s.copy(longs = s.longs :+ ("rk" -> neBound(rkE, s))), 1)
      n <- Gen.chooseNum(3, 25)
    } yield (withWhere, b, n))
  } yield {
    val s1 = s.copy(longs = s.longs :+ ("rk" -> neBound(rkE, s)))
    val tb = (s1.longNames ++ s1.strs).filterNot(_ == "rk")
    val branches = specs.map { case (ww, b, n) =>
      (if (ww) Seq(PWhere(b): PCmd) else Nil) :+
        (PSortLimit(Seq(("rk", false, None)), tb, n): PCmd)
    }
    val cols = branches.map(_ => s1.longNames ++ s1.strs)
    val out = Schema(Seq("doc_id" -> 500L, "_score_c" -> 50000L, "n_legs" -> 3L), Nil, Nil)
    (List(PEvalN("rk", rkE), PForkU(branches, cols), PFuse("doc_id", "rk")), out)
  }

  private val tsInnerCols = Seq("n_chars" -> 600L, "doc_id" -> 500L)
  private def tsBoundOf(a: TsA): Long = {
    val colB = a.c.map(c => tsInnerCols.find(_._1 == c).get._2).getOrElse(1L)
    val innerB = a.inner match {
      case "COUNT_OVER_TIME" => 500L
      case "SUM_OVER_TIME" => 500L * colB
      case "MIN_OVER_TIME" | "MAX_OVER_TIME"
           | "FIRST_OVER_TIME" | "LAST_OVER_TIME" => colB
      case "AVG_OVER_TIME" => colB * 1000L
      case "RATE" => 500L * colB * 1000000L
    }
    a.outer match {
      case "sum" => innerB * 500L
      case "min" | "max" => innerB
      case "count" => 500L
      case "avg" => innerB * 1000L
    }
  }
  private def tsAggGen: Gen[TsA] = Gen.frequency(
    1 -> (for {
      (o, in, needCol) <- Gen.oneOf(
        ("sum", "COUNT_OVER_TIME", false), ("sum", "COUNT_OVER_TIME", true),
        ("sum", "SUM_OVER_TIME", true), ("min", "MIN_OVER_TIME", true),
        ("max", "MAX_OVER_TIME", true))
      c <- Gen.oneOf(tsInnerCols.map(_._1))
    } yield TsA("", o, in, if (needCol) Some(c) else None, plain = true)),
    2 -> (for {
      o <- Gen.oneOf("sum", "min", "max", "avg", "count")
      // RATE weighted up: it is the branchiest inner (lag window +
      // reset adjustment + span clamp) and must never drop out of a run
      in <- Gen.frequency(
        3 -> Gen.const("RATE"),
        7 -> Gen.oneOf("COUNT_OVER_TIME", "SUM_OVER_TIME", "MIN_OVER_TIME",
          "MAX_OVER_TIME", "AVG_OVER_TIME", "FIRST_OVER_TIME", "LAST_OVER_TIME"))
      c <- Gen.oneOf(tsInnerCols.map(_._1))
    } yield TsA("", o, in, Some(c), plain = false)))

  private val tsBase = Schema(Seq("doc_id" -> 500L, "n_chars" -> 600L),
    Seq("lang", "source"), Nil)
  private def tsHeadGen(fresh: Int): Gen[(List[PCmd], Schema)] = for {
    withWhere <- Gen.frequency(1 -> Gen.const(true), 2 -> Gen.const(false))
    wb <- beGen(tsBase, 2)
    nA <- Gen.chooseNum(1, 3)
    aggs <- Gen.listOfN(nA, tsAggGen)
    by <- Gen.frequency(
      2 -> Gen.const(Seq.empty[String]), 2 -> Gen.const(Seq("lang")),
      2 -> Gen.const(Seq("source")), 1 -> Gen.const(Seq("lang", "source")))
  } yield {
    val named = aggs.zipWithIndex.map { case (a, i) => a.copy(name = s"ts$fresh$i") }
    val cmds = (if (withWhere) List(PWhere(wb): PCmd) else Nil) :+
      (PTsStats(named, by): PCmd)
    (cmds, Schema(named.map(a => a.name -> tsBoundOf(a)), by, Nil))
  }

  private def changePointGen(s: Schema, fresh: Int): Gen[(List[PCmd], Schema)] = for {
    useEval <- Gen.oneOf(true, false)
    e <- neGen(s, 2)
    withWhere <- Gen.oneOf(true, false)
    wb <- beGen(s, 1)
    s1 = if (useEval) s.copy(longs = s.longs :+ ("cv" -> neBound(e, s))) else s
    v <- Gen.oneOf(s1.longNames)
  } yield {
    val cmds = (if (useEval) List(PEvalN("cv", e): PCmd) else Nil) ++
      (if (withWhere) List(PWhere(wb): PCmd) else Nil) :+
      (PChangePoint(v, "cpt", "cpp"): PCmd)
    (cmds, s1.copy(strs = s1.strs :+ "cpt"))
  }

  private def sampleHeadGen(s: Schema): Gen[(List[PCmd], Schema)] = for {
    p <- Gen.oneOf(BigDecimal("0.25"), BigDecimal("0.5"), BigDecimal("0.75"))
    on <- Gen.oneOf(s.longNames ++ s.strs)
  } yield (List(PSample(p, on, s.strs.contains(on)): PCmd), s)

  private def ftHeadGen(s: Schema): Gen[(List[PCmd], Schema)] = for {
    n <- Gen.chooseNum(1, 2)
    fts <- Gen.listOfN(n, for {
      lang <- Gen.oneOf(0, 1, 2)
      d <- Gen.chooseNum(0, 2)
      node <- ftGenText(lang, d)
    } yield PFtWhere(lang, "text", node): PCmd)
  } yield (fts :+ (PDrop("text"): PCmd), s)

  /** STATS with a CATEGORIZE grouping key whose digits come from a
    * TO_STRING'd numeric expression, so real templates collapse. */
  private def catStatsGen(s: Schema, fresh: Int): Gen[(PCmd, Schema)] = for {
    c <- Gen.oneOf(s.strs)
    ne0 <- neGen(s, 1)
    nAggs <- Gen.chooseNum(0, 1)
    aggs <- Gen.listOfN(nAggs, aggGen(s))
  } yield {
    val byKey = s"g$fresh" -> (Right(SCategorize(SConcat(SCol(c), SToStr(ne0))): SE)
      : Either[String, SE])
    val named = (s"a${fresh}c" -> (PCount: PAgg)) +:
      aggs.zipWithIndex.map { case (a, i) => s"a$fresh$i" -> a }
    val out = Schema(
      named.collect { case (n, a) if !a.isInstanceOf[PAvg] => n -> aggBound(a, s) },
      Seq(byKey._1), Nil)
    (PStats(named, Seq(byKey)): PCmd) -> out
  }

  private def ftFieldedGen(s: Schema, fresh: Int): Gen[(PCmd, Schema)] = for {
    field <- Gen.oneOf(s.strs)
    lang <- Gen.oneOf(0, 1, 2)
    node <- ftGenFielded(lang, s, 1)
  } yield (PFtWhere(lang, field, node): PCmd) -> s

  private def sampleCmdGen(s: Schema): Gen[(PCmd, Schema)] = for {
    p <- Gen.oneOf(BigDecimal("0.25"), BigDecimal("0.5"), BigDecimal("0.75"))
    on <- Gen.oneOf(s.longNames ++ s.strs)
  } yield (PSample(p, on, s.strs.contains(on)): PCmd) -> s

  /** Range ENRICH on a numeric column ("rtier" excluded as the join
    * key — enriching ON a field the policy also emits would leave
    * ambiguous twin columns, as with keyword ENRICH's tag/tier). */
  private def enrichRangeGen(s: Schema): Gen[(PCmd, Schema)] =
    Gen.oneOf(s.longNames.filterNot(_ == "rtier")).map { on =>
      (PEnrichRange(on): PCmd) -> Schema(
        s.longs.filterNot(_._1 == "rtier") :+ ("rtier" -> 10L),
        s.strs.filterNot(_ == "rtag") :+ "rtag", s.mvs)
    }
  private def rerankGen(s: Schema): Gen[(PCmd, Schema)] = for {
    n <- Gen.chooseNum(1, 3)
    terms <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "zz", "aa_bb"))
    field <- Gen.oneOf(s.strs)
  } yield (PRerank(terms.distinct, field): PCmd) -> s.copy(
    longs = s.longs.filterNot(_._1 == "_score") :+ ("_score" -> 9L))

  /** Generic tail command: the r16 machinery plus the new families
    * that are valid mid-pipeline (CATEGORIZE keys, fielded full-text
    * WHERE, SAMPLE). */
  private def tailCmdGen(s: Schema, i: Int): Gen[(PCmd, Schema)] = {
    val picks = Seq.newBuilder[(Int, Gen[(PCmd, Schema)])]
    picks += 8 -> cmdGen(s, i)
    picks += 1 -> sampleCmdGen(s)
    if (s.longNames.exists(_ != "rtier")) picks += 2 -> enrichRangeGen(s)
    if (s.strs.nonEmpty) {
      picks += 2 -> catStatsGen(s, i)
      picks += 2 -> ftFieldedGen(s, i)
      picks += 2 -> rerankGen(s)
    }
    Gen.frequency(picks.result(): _*)
  }
  private def tailProg(s0: Schema, start: Int, len: Int): Gen[List[PCmd]] = {
    def go(s: Schema, i: Int): Gen[List[PCmd]] =
      if (i >= start + len) Gen.const(Nil)
      else tailCmdGen(s, i).flatMap { case (c, s2) => go(s2, i + 1).map(c :: _) }
    go(s0, start)
  }

  test("250 random programs over the r17 command compilers: engine frame == evaluator frame") {
    var seed = Seed(7177L)
    val feature = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val dropText: PCmd = PDrop("text")
    (1 to 250).foreach { i =>
      val headGen: Gen[(List[PCmd], Schema, Boolean)] = (i % 6) match {
        case 0 => forkUGen(base, 900).map { case (c, s) => (dropText :: c, s, false) }
        case 1 => forkFuseGen(base, 900).map { case (c, s) => (dropText :: c, s, false) }
        case 2 => tsHeadGen(900).map { case (c, s) => (c, s, true) }
        case 3 => changePointGen(base, 900).map { case (c, s) => (dropText :: c, s, false) }
        case 4 => sampleHeadGen(base).map { case (c, s) => (dropText :: c, s, false) }
        case _ => ftHeadGen(base).map { case (c, s) => (c, s, false) }
      }
      val prog = (for {
        (head, hs, fromTs) <- headGen
        tailLen <- Gen.chooseNum(1, 3)
        tail <- tailProg(hs, 100, tailLen)
      } yield (head ++ tail, fromTs)).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val (cmds, fromTs) = prog
      def walk(c: PCmd): Unit = c match {
        case PForkU(bs, cols) =>
          feature("fork") += 1
          if (bs.exists(_.exists(_.isInstanceOf[PWhere]))) feature("fork_where") += 1
          if (cols.flatten.distinct.size > cols.map(_.toSet).reduce(_ intersect _).size)
            feature("fork_missing_col") += 1
          bs.foreach(_.foreach(walk))
        case PFuse(_, _) => feature("fuse") += 1
        case PTsStats(aggs, by) =>
          if (aggs.exists(_.plain)) feature("ts_plain") += 1
          if (aggs.exists(a => !a.plain)) feature("ts_nested") += 1
          if (aggs.exists(_.inner == "RATE")) feature("ts_rate") += 1
          if (aggs.exists(_.outer == "avg")) feature("ts_avg") += 1
          if (by.nonEmpty) feature("ts_by") += 1 else feature("ts_global") += 1
        case PChangePoint(v, _, _) =>
          feature("change_point") += 1
          if (v == "cv") feature("change_point_eval") += 1
        case PSample(_, _, onStr) =>
          if (onStr) feature("sample_str") += 1 else feature("sample_long") += 1
        case PFtWhere(lang, f, _) =>
          val tag = lang match { case 0 => "qstr"; case 1 => "kql"; case _ => "match" }
          feature(s"ft_$tag") += 1
          if (f != "text") feature("ft_fielded") += 1
        case PEnrichRange(_) => feature("enrich_range") += 1
        case PRerank(_, _) => feature("rerank") += 1
        case PStats(_, by) if by.exists {
          case (_, Right(se)) => se.isInstanceOf[SCategorize]
          case _ => false
        } => feature("categorize") += 1
        case _ => ()
      }
      cmds.foreach(walk)
      val q = ((if (fromTs) "TS tsrc" else "FROM documents") +: cmds.map(cmdText))
        .mkString("\n")
      val rows0 = if (fromTs) tsCorpus else corpusT
      val want = canonRows(cmds.foldLeft(rows0)((rows, c) => evalCmd(c, rows)))
      val got = canonRows(engineRows(q, srcDfText))
      assert(got == want, {
        val firstDiff = got.zipAll(want, "<missing>", "<missing>")
          .find { case (a, b) => a != b }
        s"""frame diverged (seed round $i)
           |query:
           |$q
           |engine rows: ${got.size}, evaluator rows: ${want.size}
           |first diff: $firstDiff""".stripMargin
      })
    }
    val required = Seq("fork", "fork_where", "fork_missing_col", "fuse",
      "ts_plain", "ts_nested", "ts_rate", "ts_avg", "ts_by", "ts_global",
      "change_point", "change_point_eval", "sample_str", "sample_long",
      "ft_qstr", "ft_kql", "ft_match", "ft_fielded", "categorize",
      "enrich_range", "rerank")
    val missing = required.filterNot(feature(_) > 0)
    assert(missing.isEmpty,
      s"generator no longer produces: $missing (counts: ${feature.toSeq.sorted})")
  }

  test("box languages at pipeline level: 120 random programs per language") {
    var seed = Seed(9091L)
    val dropText: PCmd = PDrop("text")
    (0 to 2).foreach { lang =>
      var nonEmpty = 0
      (1 to 120).foreach { i =>
        val prog = (for {
          d <- Gen.chooseNum(1, 3)
          node <- ftGenText(lang, d)
          tailLen <- Gen.chooseNum(0, 2)
          tail <- tailProg(base, 100, tailLen)
        } yield (PFtWhere(lang, "text", node): PCmd) :: dropText :: tail)
          .pureApply(Gen.Parameters.default, seed)
        seed = seed.next
        val q = ("FROM documents" +: prog.map(cmdText)).mkString("\n")
        val want = canonRows(prog.foldLeft(corpusT)((rows, c) => evalCmd(c, rows)))
        val got = canonRows(engineRows(q, srcDfText))
        assert(got == want, {
          val firstDiff = got.zipAll(want, "<missing>", "<missing>")
            .find { case (a, b) => a != b }
          s"""frame diverged (lang $lang, round $i)
             |query:
             |$q
             |engine rows: ${got.size}, evaluator rows: ${want.size}
             |first diff: $firstDiff""".stripMargin
        })
        if (got.nonEmpty) nonEmpty += 1
      }
      assert(nonEmpty >= 30,
        s"lang $lang: only $nonEmpty of 120 programs produced rows — fuzz too weak")
    }
  }

  // =================== r18: the KNN match function + numeric mv
  // literals (r17's freshest compositional surface — its post-landing
  // review found three real edge bugs; this sweep exists to catch that
  // class at authoring time). Mirror: a brute-force Option-space
  // cosine top-k replicating the engine's exact arithmetic — float
  // elements, index-order double accumulation, round(·, 6) HALF_UP,
  // first-column tie-break, null scores excluded.

  private case class VRow(vecId: Long, grp: String, m: Long, emb: Option[Seq[Float]])

  /** Eight dyadic pool vectors shared across many rows, so score TIES
    * at the k boundary are the common case, not a lucky draw. */
  private val vecPool: Seq[Seq[Float]] = Seq(
    Seq(1f, 0f, 0f, 0f), Seq(0.75f, 0.25f, 0f, 0f), Seq(0.5f, 0.5f, 0f, 0f),
    Seq(0f, 1f, 0f, 0f), Seq(0.25f, 0.25f, 0.25f, 0.25f), Seq(-0.5f, 0.5f, 0f, 0f),
    Seq(0f, 0f, 1f, 0f), Seq(1f, 1f, 1f, 1f))

  private val vrows: Seq[VRow] = (0 until 60).map { i =>
    VRow(i.toLong, Seq("a", "b", "c")(i % 3), ((i * 7) % 30).toLong,
      if (i % 6 == 5) None else Some(vecPool(i % 8)))
  }

  private lazy val vecDf = {
    import spark.implicits._
    val df = vrows.map(r => (r.vecId, r.grp, r.m, r.emb))
      .toDF("vec_id", "grp", "m", "emb")
    df.cache(); df.count()
    df
  }

  /** The engine's exact cosine: dot over min length, norms over full
    * arrays, double accumulation in index order (VecMath), then
    * Spark's Round on DoubleType = BigDecimal(toString).setScale(6,
    * HALF_UP). -0.0 normalizes to 0.0 (Spark's sort does too). */
  private def refCos(a: Seq[Float], q: Seq[Float]): Double = {
    var dot = 0.0
    var i = 0
    val n = math.min(a.length, q.length)
    while (i < n) { dot += a(i).toDouble * q(i).toDouble; i += 1 }
    def norm(v: Seq[Float]): Double = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    val d = norm(a) * norm(q)
    val c = if (d == 0.0) 0.0 else dot / d
    val r = BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    if (r == 0.0) 0.0 else r
  }

  /** A prefilter: ES|QL text + the Kleene evaluator closure. A None
    * verdict (null) filters the row, the WHERE contract. */
  private case class Pre(text: String, eval: VRow => Option[Boolean], usesEval: Boolean = false,
                         mvLit: Boolean = false)

  /** The guard constant for the EVAL'd nullable field — fixed per
    * program so the `p > c1` conjunct and the EVAL line agree. */
  private val evalGuard = 17L

  private def preGenFixed: Gen[Pre] = Gen.frequency(
    // a null-able EVAL'd field (`p = CASE(m > guard, m)` below): a
    // null prefilter verdict must FILTER, never error or pass — the
    // class the r18 advice called out. The mv-literal conjunct puts
    // the bracketed numeric literal in a NON-KNN position.
    2 -> (for { g <- Gen.oneOf("a", "b", "c"); eq <- Gen.oneOf(true, false) } yield
      Pre(if (eq) s"""grp == "$g"""" else s"""grp != "$g"""",
        r => Some(if (eq) r.grp == g else r.grp != g))),
    2 -> (for { c <- Gen.chooseNum(0L, 29L); lt <- Gen.oneOf(true, false) } yield
      Pre(if (lt) s"m < $c" else s"m > $c",
        r => Some(if (lt) r.m < c else r.m > c))),
    1 -> (for { vs <- Gen.listOfN(3, Gen.chooseNum(0L, 29L)) } yield
      Pre(s"m IN (${vs.mkString(", ")})", r => Some(vs.contains(r.m)))),
    2 -> (for { c1 <- Gen.chooseNum(0L, 29L) } yield
      Pre(s"p > $c1",
        r => if (r.m > evalGuard) Some(r.m > c1) else None, usesEval = true)),
    1 -> (for { a <- Gen.chooseNum(-5L, 5L); b <- Gen.chooseNum(-5L, 5L)
                c <- Gen.chooseNum(0L, 29L) } yield
      Pre(s"m + MV_SUM([$a, $b]) > $c", r => Some(r.m + a + b > c), mvLit = true)))

  /** Dyadic query vectors (k/4 components) — exactly representable in
    * float AND in the BigDecimal the mv-literal lexer produces. */
  private def queryVecGen: Gen[Seq[Double]] = Gen.frequency(
    3 -> Gen.listOfN(4, Gen.chooseNum(-4, 4).map(_ * 0.25)),
    1 -> Gen.oneOf(vecPool).map(_.map(_.toDouble)), // exact pool hit → max ties
    1 -> Gen.const(Seq(0.0, 0.0, 0.0, 0.0))) // zero query → all scores 0.0, pure tie-break

  test("r18: 220 random KNN programs — engine top-k == brute-force cosine mirror") {
    var seed = Seed(20260816L)
    val feature = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    (1 to 220).foreach { i =>
      val (pres, qv, k, knnPos) = (for {
        nPre <- Gen.frequency(1 -> Gen.const(0), 3 -> Gen.const(1), 2 -> Gen.const(2))
        pres <- Gen.listOfN(nPre, preGenFixed)
        qv <- queryVecGen
        // k spans 1 .. beyond the whole corpus, so "k at/above the
        // filtered-subset size" happens constantly
        k <- Gen.frequency(3 -> Gen.chooseNum(1, 12), 1 -> Gen.chooseNum(40, 70))
        pos <- Gen.chooseNum(0, nPre)
      } yield (pres, qv, k, pos)).pureApply(Gen.Parameters.default, seed)
      seed = seed.next

      val conjuncts = (pres.take(knnPos) :+ null) ++ pres.drop(knnPos)
      val whereText = conjuncts.map {
        case null => s"KNN(emb, [${qv.mkString(", ")}], $k)"
        case p: Pre => p.text
      }.mkString(" AND ")
      // doubled pipe: the interpolation lands inside a stripMargin
      // block, which eats the first '|' of the line as margin
      val evalLine = if (pres.exists(_.usesEval))
        s"\n|| EVAL p = CASE(m > $evalGuard, m)" else ""
      val q =
        s"""FROM vecs$evalLine
           || WHERE $whereText
           || KEEP vec_id, grp, m
           || SORT vec_id""".stripMargin

      // brute-force mirror: Kleene prefilter → drop null vectors →
      // (rounded score desc, vec_id asc) → take k → project → sort
      val pref = vrows.filter(r => pres.forall(p => p.eval(r).contains(true)))
      val scored = pref.flatMap(r => r.emb.map(e => (r, refCos(e, qv.map(_.toFloat)))))
      val want = scored.sortBy { case (r, s) => (-s, r.vecId) }.take(k).map(_._1)
        .sortBy(_.vecId).map(r => (r.vecId, r.grp, r.m))

      val got = try {
        EsqlParser.run(q, { case "vecs" => vecDf }, session = Some(spark))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      } catch {
        case e: Throwable =>
          fail(s"engine threw on round $i\nquery:\n$q\n${e.getMessage}", e)
      }

      assert(got == want,
        s"""KNN frame diverged (round $i)
           |query:
           |$q
           |engine: $got
           |mirror: $want""".stripMargin)

      // feature audit bookkeeping
      feature("knn") += 1
      if (pres.isEmpty) feature("knn_bare") += 1 else feature("knn_prefilter") += 1
      if (pres.exists(_.usesEval)) feature("knn_nullable_eval_prefilter") += 1
      if (pres.exists(_.mvLit)) feature("knn_mv_literal_conjunct") += 1
      if (knnPos > 0) feature("knn_not_first_conjunct") += 1
      if (k >= scored.size) feature("knn_k_at_or_above_subset") += 1
      if (pref.exists(_.emb.isEmpty)) feature("knn_null_field_in_subset") += 1
      if (scored.size > k && scored.sortBy { case (r, s) => (-s, r.vecId) }
            .slice(k - 1, k + 1).map(_._2).distinct.size == 1)
        feature("knn_tie_at_boundary") += 1
    }
    val required = Seq("knn", "knn_bare", "knn_prefilter",
      "knn_nullable_eval_prefilter", "knn_mv_literal_conjunct",
      "knn_not_first_conjunct", "knn_k_at_or_above_subset",
      "knn_null_field_in_subset", "knn_tie_at_boundary")
    val missing = required.filterNot(feature(_) > 0)
    assert(missing.isEmpty,
      s"generator no longer produces: $missing (counts: ${feature.toSeq.sorted})")
  }

  // =================== r18: the function-audit additions (ROUND_TO /
  // COPY_SIGN / MATCH_PHRASE / MULTI_MATCH / TERM) composed into whole
  // pipelines — the audit-closing commit's fresh surface, fuzzed at
  // authoring time per the standing discipline (the KNN sweep's three
  // post-landing bugs are the class this exists to pre-empt).

  private def r18NumGen(s: Schema): Gen[NE] = Gen.frequency(
    3 -> (for {
      e <- neGen(s, 1)
      n <- Gen.chooseNum(1, 3)
      ps <- Gen.listOfN(n, Gen.chooseNum(-100L, 100L))
    } yield NRoundTo(e, ps.distinct): NE),
    3 -> (for { m <- neGen(s, 1); sg <- neGen(s, 1) } yield NCopySign(m, sg): NE),
    // nested: the ROUND_TO output (always a literal point) as the
    // magnitude — plan-time point sort under composition
    1 -> (for {
      e <- neGen(s, 0)
      ps <- Gen.listOfN(2, Gen.chooseNum(-60L, 60L))
      sg <- neGen(s, 0)
    } yield NCopySign(NRoundTo(e, ps.distinct), sg): NE)
  ).map(e => tame(e, s)._1)

  private def fnWhereGen(s: Schema): Gen[PCmd] = {
    val kwVals = (langVals ++ sourceVals ++ Seq("aa", "zz")).distinct
    Gen.frequency(
      3 -> (for {
        pos <- Gen.frequency(2 -> Gen.const(true), 1 -> Gen.const(false))
        ws <- if (pos) textPhraseG else Gen.listOfN(2, textWordG)
      } yield PFnWhere("match_phrase", Seq("text"), ws.mkString(" ")): PCmd),
      1 -> (for { f <- Gen.oneOf(s.strs); v <- Gen.oneOf(kwVals) }
        yield PFnWhere("match_phrase", Seq(f), v): PCmd),
      // a query that ANALYZES to zero terms must compile to FALSE (not
      // null, not a parse error) in the analyzing functions — while
      // the verbatim TERM's EMPTY value matches exactly the
      // wholly-empty fields (none in this corpus)
      1 -> Gen.oneOf("match_phrase", "multi_match").map(k =>
        PFnWhere(k, Seq("text"), "  "): PCmd),
      1 -> Gen.oneOf(Seq("text", "lang")).map(f =>
        PFnWhere("term", Seq(f), ""): PCmd),
      3 -> (for {
        n <- Gen.chooseNum(1, 3)
        fs <- Gen.pick(n, "text" +: s.strs)
        w1 <- Gen.frequency(3 -> textWordG, 2 -> Gen.oneOf(kwVals))
        w2 <- Gen.option(textWordG)
      } yield PFnWhere("multi_match", fs.toSeq, (Seq(w1) ++ w2).mkString(" ")): PCmd),
      3 -> (for {
        f <- Gen.oneOf("text" +: s.strs)
        v <- Gen.frequency(2 -> textWordG, 2 -> Gen.oneOf(kwVals))
      } yield PFnWhere("term", Seq(f), v): PCmd))
  }

  test("r18: 200 random programs over the function-audit additions — engine frame == evaluator frame") {
    var seed = Seed(81802L)
    val feature = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    (1 to 200).foreach { i =>
      val prog = (for {
        useEval <- Gen.oneOf(true, false)
        eb <- beGen(base, 1)
        esrc <- Gen.oneOf("lang", "source")
        s1 = if (useEval) base.copy(strs = base.strs :+ "tn") else base
        nW <- Gen.chooseNum(1, 2)
        wheres <- Gen.listOfN(nW, fnWhereGen(s1))
        numE <- r18NumGen(s1)
        tailLen <- Gen.chooseNum(1, 3)
        s2 = s1.copy(longs = s1.longs :+ ("e900" -> neBound(numE, s1)))
        tail <- tailProg(s2, 100, tailLen)
      } yield {
        // nullable EVAL'd string FIRST (so predicates can bind it), the
        // function predicates over text/keyword/EVAL'd fields, then the
        // text drop (SORT total-order invariant) and the numeric EVAL
        (if (useEval) List(PEvalS("tn", SCase(eb, SCol(esrc))): PCmd) else Nil) ++
          wheres ++ List(PDrop("text"): PCmd, PEvalN("e900", numE): PCmd) ++ tail
      }).pureApply(Gen.Parameters.default, seed)
      seed = seed.next

      def walkNum(e: NE): Unit = e match {
        case NRoundTo(x, ps) =>
          feature("round_to") += 1
          if (ps != ps.sorted) feature("round_to_unsorted") += 1
          if (ps.size == 1) feature("round_to_single_point") += 1
          walkNum(x)
        case NCopySign(m, sg) =>
          feature("copy_sign") += 1
          if (m.isInstanceOf[NRoundTo]) feature("copy_sign_nested") += 1
          walkNum(m); walkNum(sg)
        case NBin(_, l, r) => walkNum(l); walkNum(r)
        case _ => ()
      }
      prog.foreach {
        case PEvalN(_, e) => walkNum(e)
        case PFnWhere(kind, fields, q) =>
          feature(s"fn_$kind") += 1
          if (q.trim.isEmpty) feature("fn_empty_query") += 1
          if (fields.size >= 2) feature("fn_multifield") += 1
          if (fields.contains("tn")) feature("fn_nullable_field") += 1
          if (kind != "multi_match" && fields.head != "text") feature("fn_keyword_field") += 1
        case _ => ()
      }

      val q = ("FROM documents" +: prog.map(cmdText)).mkString("\n")
      val want = canonRows(prog.foldLeft(corpusT)((rows, c) => evalCmd(c, rows)))
      val got = canonRows(engineRows(q, srcDfText))
      assert(got == want, {
        val firstDiff = got.zipAll(want, "<missing>", "<missing>")
          .find { case (a, b) => a != b }
        s"""frame diverged (round $i)
           |query:
           |$q
           |engine rows: ${got.size}, evaluator rows: ${want.size}
           |first diff: $firstDiff""".stripMargin
      })
    }
    val required = Seq("round_to", "round_to_unsorted", "round_to_single_point",
      "copy_sign", "copy_sign_nested", "fn_match_phrase", "fn_multi_match",
      "fn_term", "fn_empty_query", "fn_multifield", "fn_nullable_field",
      "fn_keyword_field")
    val missing = required.filterNot(feature(_) > 0)
    assert(missing.isEmpty,
      s"generator no longer produces: $missing (counts: ${feature.toSeq.sorted})")
  }

  // =================== r18: the new spatial surface (ST_DISJOINT /
  // ST_EXTENT_AGG / TO_CARTESIANSHAPE) against a plain-Scala box mirror.
  // Points and envelope corners share one small integer lattice so
  // boundary-exact hits (point ON an edge — where <= vs < diverges)
  // are routine, not lucky draws.

  private case class GPt(gid: Long, grp: String, p: Option[(Double, Double)])
  private lazy val gpts: Seq[GPt] = (0 until 60).map { i =>
    val x = ((i * 7) % 21 - 10).toDouble
    val y = ((i * 11) % 17 - 8).toDouble
    GPt(i.toLong, Seq("a", "b", "c")(i % 3),
      if (i % 7 == 6) None else Some((x, y)))
  }
  private lazy val gptsDf = {
    import spark.implicits._
    val df = gpts.map(g => (g.gid, g.grp,
      g.p.map { case (x, y) => s"POINT ($x $y)" }.getOrElse("not wkt")))
      .toDF("gid", "grp", "wkt")
    df.cache(); df.count(); df
  }

  private def runSpatial(q: String): Seq[(Long, Option[Boolean])] =
    EsqlParser.run(q, { case "pts" => gptsDf }, session = Some(spark))
      .collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getBoolean(1))))

  test("r18: 90 random envelopes — ST_DISJOINT (geo + cartesian, both arg orders) == box mirror") {
    val rnd = new scala.util.Random(118118L)
    var boundaryHits = 0
    var nullShapeRounds = 0
    (1 to 90).foreach { i =>
      val geo = i % 3 != 0 // rounds 1,2 geo; round 3 cartesian
      val wrap = i % 17 == 0 // an antimeridian-wrapping box: parses NULL (geo)
      val (x0, x1) = { val a = rnd.nextInt(21) - 10; val b = rnd.nextInt(21) - 10
        (math.min(a, b), math.max(a, b)) }
      val (y0, y1) = { val a = rnd.nextInt(17) - 8; val b = rnd.nextInt(17) - 8
        (math.min(a, b), math.max(a, b)) }
      val (lo, hi) = if (wrap) (x1 + 1, x0) else (x0, x1) // wrap → min > max → null shape
      val shapeFn = if (geo) "TO_GEOSHAPE" else "TO_CARTESIANSHAPE"
      val ptFn = if (geo) "TO_GEOPOINT" else "TO_CARTESIANPOINT"
      val env = s"""$shapeFn("ENVELOPE ($lo, $hi, $y1, $y0)")"""
      val dis = if (i % 2 == 0) s"ST_DISJOINT(pt, $env)" else s"ST_DISJOINT($env, pt)"
      val q =
        s"""FROM pts
           || EVAL pt = $ptFn(wkt)
           || EVAL dj = $dis
           || KEEP gid, dj
           || SORT gid""".stripMargin
      val want = gpts.map { g =>
        val dj =
          if (wrap) None // null shape → null relation, NEVER a bool
          else g.p.map { case (px, py) =>
            !(px >= lo && px <= hi && py >= y0 && py <= y1)
          }
        (g.gid, dj)
      }
      val got = runSpatial(q)
      assert(got == want,
        s"""ST_DISJOINT diverged (round $i)
           |query:
           |$q
           |engine: $got
           |mirror: $want""".stripMargin)
      if (wrap) nullShapeRounds += 1
      else boundaryHits += gpts.count(_.p.exists { case (px, py) =>
        (px == lo || px == hi) && py >= y0 && py <= y1 ||
          (py == y0 || py == y1) && px >= lo && px <= hi
      })
    }
    assert(boundaryHits > 50, s"boundary-exact hits: $boundaryHits — lattice drifted")
    assert(nullShapeRounds >= 4, s"null-shape rounds: $nullShapeRounds")
  }

  test("r18: ST_EXTENT_AGG bbox == per-group min/max mirror; accessors compose; empty/all-null groups null") {
    val rnd = new scala.util.Random(218218L)
    (1 to 12).foreach { i =>
      // cut: a random gid prefix; round 12 keeps NOTHING (the global
      // agg over an empty frame must still emit its one all-null row)
      val cut = if (i == 12) -1L else 10L + rnd.nextInt(55)
      val by = i % 2 == 0
      val q =
        s"""FROM pts
           || EVAL pt = TO_GEOPOINT(wkt)
           || WHERE gid < $cut
           || STATS ext = ST_EXTENT_AGG(pt)${if (by) " BY grp" else ""}
           || EVAL xmin = ST_XMIN(ext), xmax = ST_XMAX(ext), ymin = ST_YMIN(ext), ymax = ST_YMAX(ext)
           || KEEP ${if (by) "grp, " else ""}xmin, xmax, ymin, ymax${
            // doubled pipe: the interpolation lands inside stripMargin,
            // which eats the line's first '|' as margin
            if (by) "\n|| SORT grp" else ""}""".stripMargin
      val kept = gpts.filter(_.gid < cut)
      def box(gs: Seq[GPt]): Seq[Option[Double]] = {
        val ps = gs.flatMap(_.p)
        if (ps.isEmpty) Seq(None, None, None, None)
        else Seq(Some(ps.map(_._1).min), Some(ps.map(_._1).max),
          Some(ps.map(_._2).min), Some(ps.map(_._2).max))
      }
      val want: Seq[Seq[Option[Any]]] =
        if (by) kept.groupBy(_.grp).toSeq.sortBy(_._1)
          .map { case (g, gs) => (Some(g): Option[Any]) +: box(gs).map(x => x: Option[Any]) }
        else Seq(box(kept).map(x => x: Option[Any]))
      val got = EsqlParser.run(q, { case "pts" => gptsDf }, session = Some(spark))
        .collect().toSeq.map { r =>
          (0 until r.length).map(j => if (r.isNullAt(j)) None
            else (Some(r.get(j)): Option[Any]))
        }
      assert(got == want,
        s"""ST_EXTENT_AGG diverged (round $i)
           |query:
           |$q
           |engine: $got
           |mirror: $want""".stripMargin)
    }
  }

  // ------------------------------------------------- r19: WKT-text fuzz
  // The r18 spatial tests fuzz COORDINATES over well-formed WKT; this
  // fuzzes the WKT TEXT itself (the r19 verdict task): whitespace and
  // sign variants, degenerate and antimeridian-wrapping boxes, exponent
  // and fraction malformations — through the full conversion + relate +
  // accessor surface in ONE program, against a plain-Scala mirror that
  // re-implements the documented grammar (POINT/ENVELOPE exact-form
  // regex + the min<=max / max>=min gate) and the inclusive box
  // relations independently.
  private val mirPointRx = """^POINT \((-?\d+(?:\.\d+)?) (-?\d+(?:\.\d+)?)\)$""".r
  private val mirEnvRx =
    """^ENVELOPE \((-?\d+(?:\.\d+)?), (-?\d+(?:\.\d+)?), (-?\d+(?:\.\d+)?), (-?\d+(?:\.\d+)?)\)$""".r
  private def mirPoint(s: String): Option[(Double, Double)] = s match {
    case mirPointRx(x, y) => Some((x.toDouble, y.toDouble))
    case _ => None
  }
  /** (minX, maxX, maxY, minY) — WKT ENVELOPE argument order. */
  private def mirEnv(s: String): Option[(Double, Double, Double, Double)] = s match {
    case mirEnvRx(a, b, c, d) =>
      val (minX, maxX, maxY, minY) = (a.toDouble, b.toDouble, c.toDouble, d.toDouble)
      if (minX <= maxX && maxY >= minY) Some((minX, maxX, maxY, minY)) else None
    case _ => None
  }

  test("r19: 340 fuzzed WKT strings — conversions + relates + accessors == grammar mirror (geo AND cartesian)") {
    val rnd = new scala.util.Random(519519L)
    def numStr(): String = rnd.nextInt(6) match {
      case 0 => (rnd.nextInt(361) - 180).toString
      case 1 => s"${rnd.nextInt(181) - 90}.${rnd.nextInt(1000)}"
      case 2 => "-0"
      case 3 => s"-${rnd.nextInt(90)}.${rnd.nextInt(10)}"
      case 4 => "0"
      case _ => rnd.nextInt(10).toString
    }
    def pointStr(): String = {
      val (a, b) = (numStr(), numStr())
      rnd.nextInt(12) match {
        case 0 | 1 | 2 | 3 | 4 => s"POINT ($a $b)" // valid ~40%
        case 5 => s"POINT($a $b)" // missing space
        case 6 => s"POINT ($a  $b)" // double space
        case 7 => s"POINT ($a $b) " // trailing space
        case 8 => s"point ($a $b)" // case-sensitive keyword
        case 9 => s"POINT (+$a $b)" // explicit + sign
        case 10 => s"POINT (${a}e1 $b)" // exponent form
        case _ => s"POINT ($a, $b)" // comma separator
      }
    }
    def envStr(): String = {
      // raw coordinate draws — wrap/degenerate shapes arise naturally
      // AND deliberately (forced min>max below)
      val (a, b) = { val x = rnd.nextInt(41) - 20; val y = rnd.nextInt(41) - 20
        (math.min(x, y), math.max(x, y)) }
      val (d, c) = { val x = rnd.nextInt(33) - 16; val y = rnd.nextInt(33) - 16
        (math.min(x, y), math.max(x, y)) }
      rnd.nextInt(12) match {
        case 0 | 1 | 2 => s"ENVELOPE ($a, $b, $c, $d)" // valid
        case 3 => s"ENVELOPE (${b + 1}, $a, $c, $d)" // wrap: min>max → null
        case 4 => s"ENVELOPE ($a, $b, $d, ${c + 1})" // lat-degenerate → null
        case 5 => s"ENVELOPE ($a, $a, $c, $c)" // point-box: VALID, boundary-only
        case 6 => s"ENVELOPE ($a,$b, $c, $d)" // missing space after comma
        case 7 => s"ENVELOPE($a, $b, $c, $d)" // missing space after keyword
        case 8 => s"envelope ($a, $b, $c, $d)" // lowercase keyword
        case 9 => s"ENVELOPE ($a, $b, $c, $d) " // trailing space
        case 10 => s"ENVELOPE (+$a, $b, $c, $d)" // explicit + sign
        case _ => s"ENVELOPE ($a, $b, $c)" // arity
      }
    }
    val rows = (0 until 340).map(i => (i.toLong, pointStr(), envStr()))
    import spark.implicits._
    val fdf = rows.toDF("id", "pwkt", "ewkt")
    Seq(true, false).foreach { geo =>
      val (ptFn, shFn) = if (geo) ("TO_GEOPOINT", "TO_GEOSHAPE")
        else ("TO_CARTESIANPOINT", "TO_CARTESIANSHAPE")
      val q =
        s"""FROM t
           || EVAL p = $ptFn(pwkt), e = $shFn(ewkt)
           || EVAL c = ST_CONTAINS(e, p), w = ST_WITHIN(p, e),
           |       n = ST_INTERSECTS(p, e), d = ST_DISJOINT(p, e),
           |       xmn = ST_XMIN(e), xmx = ST_XMAX(e),
           |       ymn = ST_YMIN(e), ymx = ST_YMAX(e)
           || KEEP id, c, w, n, d, xmn, xmx, ymn, ymx
           || SORT id""".stripMargin
      val got = EsqlParser.run(q, { case "t" => fdf }, session = Some(spark))
        .collect().toSeq.map { r =>
          (r.getLong(0), (1 until 9).map(j =>
            if (r.isNullAt(j)) None else Some(r.get(j))).toList)
        }
      val want = rows.map { case (id, ps, es) =>
        val p = mirPoint(ps)
        val e = mirEnv(es)
        val inter: Option[Boolean] = (p, e) match {
          case (Some((px, py)), Some((x0, x1, y1, y0))) =>
            Some(px >= x0 && px <= x1 && py >= y0 && py <= y1)
          case _ => None
        }
        val box = List(e.map(_._1), e.map(_._2), e.map(_._4), e.map(_._3))
        (id, List[Option[Any]](inter, inter, inter, inter.map(!_)) ++
          box.map(x => x: Option[Any]))
      }
      got.zip(want).foreach { case (g, w) =>
        assert(g == w, s"""WKT fuzz diverged (geo=$geo) id=${w._1}
          |point='${rows(w._1.toInt)._2}' env='${rows(w._1.toInt)._3}'
          |engine: $g
          |mirror: $w""".stripMargin)
      }
    }
    // generator health: the interesting classes must actually occur
    val nP = rows.count(r => mirPoint(r._2).isDefined)
    val nE = rows.count(r => mirEnv(r._3).isDefined)
    val nGatedNull = rows.count { r =>
      mirEnvRx.findFirstIn(r._3).isDefined && mirEnv(r._3).isEmpty }
    assert(nP >= 80 && nP <= 300, s"valid points drifted: $nP")
    assert(nE >= 80 && nE <= 220, s"valid envelopes drifted: $nE")
    assert(nGatedNull >= 20, s"gate-nulled (wrap/degenerate) envelopes: $nGatedNull")
  }

  test("r19: ST_EXTENT_AGG over fuzzed WKT text — per-group min/max mirror, invalid points contribute nothing") {
    val rnd = new scala.util.Random(619619L)
    def pt(): String = rnd.nextInt(5) match {
      case 0 => s"POINT (${rnd.nextInt(21) - 10} ${rnd.nextInt(17) - 8})"
      case 1 => s"POINT (${rnd.nextInt(21) - 10}.${rnd.nextInt(100)} -0)"
      case 2 => s"POINT(${rnd.nextInt(21) - 10} ${rnd.nextInt(17) - 8})" // invalid
      case 3 => "garbage"
      case _ => s"POINT (${rnd.nextInt(21) - 10} ${rnd.nextInt(17) - 8} )" // invalid
    }
    val rows = (0 until 300).map(i => (i.toLong, s"g${i % 7}", pt()))
    import spark.implicits._
    val fdf = rows.toDF("id", "g", "wkt")
    val q =
      """FROM t
        || EVAL p = TO_GEOPOINT(wkt)
        || STATS ext = ST_EXTENT_AGG(p) BY g
        || EVAL xmn = ST_XMIN(ext), xmx = ST_XMAX(ext), ymn = ST_YMIN(ext), ymx = ST_YMAX(ext)
        || DROP ext
        || SORT g""".stripMargin
    val got = EsqlParser.run(q, { case "t" => fdf }, session = Some(spark))
      .collect().toSeq.map { r =>
        (r.getString(0), (1 until 5).map(j =>
          if (r.isNullAt(j)) None else Some(r.getDouble(j))).toList)
      }
    val want = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (g, gs) =>
      val ps = gs.flatMap(r => mirPoint(r._3))
      val box = if (ps.isEmpty) List[Option[Double]](None, None, None, None)
        else List(Some(ps.map(_._1).min), Some(ps.map(_._1).max),
          Some(ps.map(_._2).min), Some(ps.map(_._2).max))
      (g, box)
    }
    assert(got == want, s"extent fuzz diverged:\nengine: $got\nmirror: $want")
    assert(rows.count(r => mirPoint(r._3).isEmpty) >= 80, "too few invalid points")
  }

  test("r19: TO_VERSION ordering laws at pipeline level — the semver spec's published chain sorts exactly") {
    import spark.implicits._
    // semver.org §11's own example chain, plus the numeric-identifier
    // pairs the r19 precedence fix governs
    // "alpha-1" (r20 advice): a hyphen-bearing IDENTIFIER — first
    // identifiers compare "alpha" < "alpha-1" (prefix), so every
    // alpha.* tag sorts before alpha-1 although '-' 0x2D < '.' 0x2E
    // byte-wise; this is exactly the pair the r19 '.' joiner mis-sorted
    val chain = Seq(
      "1.0.0-alpha", "1.0.0-alpha.1", "1.0.0-alpha.beta", "1.0.0-alpha-1",
      "1.0.0-beta", "1.0.0-beta.2", "1.0.0-beta.11", "1.0.0-rc.1", "1.0.0")
    val shuffled = new scala.util.Random(719719L).shuffle(chain).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val vdf = shuffled.toDF("id", "s")
    val got = EsqlParser.run(
      "FROM v | EVAL ver = TO_VERSION(s) | SORT ver | KEEP s",
      { case "v" => vdf }, session = Some(spark))
      .collect().map(_.getString(0)).toSeq
    assert(got == chain, s"semver chain order broke: $got")
    // antisymmetry + totality on the ENCODED keyword over random pairs:
    // distinct inputs must encode distinct (the '|'+original tail), and
    // exactly one direction of < holds for any distinct pair
    val rnd = new scala.util.Random(819819L)
    val pool = chain ++ Seq("1.0.0-1", "1.0.0-01", "1.0.0-0.9", "2.0", "2.0.0",
      "not!valid", "v2", "10.0.0", "9.9.9")
    val enc = EsqlParser.run(
      "FROM v | EVAL ver = TO_VERSION(s) | SORT id | KEEP ver",
      { case "v" => pool.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s") }, session = Some(spark))
      .collect().map(_.getString(0)).toSeq
    assert(enc.distinct.size == pool.size, "distinct inputs collided in the encoding")
    (1 to 200).foreach { _ =>
      val i = rnd.nextInt(pool.size); val j = rnd.nextInt(pool.size)
      if (i != j) assert((enc(i) < enc(j)) != (enc(j) < enc(i)),
        s"ordering not antisymmetric for ${pool(i)} vs ${pool(j)}")
    }
  }
}
