package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Regenerates SURVEY.md §2.5.4's ES|QL COMMAND audit mechanically —
  * the third leg of the generated-audit discipline (r18: functions,
  * r19: ingest processors, and now the command surface, which was the
  * last ES|QL surface whose completeness rested on prose). The
  * reference list is the public Elasticsearch 9.1 ES|QL command
  * reference (docs: esql-commands), source + processing, tech-preview
  * rows marked.
  *
  * The IMPLEMENTED guard scrapes TWO dispatch surfaces of
  * EsqlParser.scala: processing commands dispatch as `case "WHERE" =>`
  * lines (the FunctionAudit scrape), and source-command heads read
  * through the keyword lexer (`isKw(_, "from")` / `eatKw("from")`) —
  * both scraped, so a row cannot claim a command the parser does not
  * dispatch. CommandAuditSpec re-runs the computation as a test. */
object CommandAudit {

  /** (category, name, note) — the public 9.1 command reference. */
  val reference: Seq[(String, String, String)] = Seq(
    ("source", "FROM", "index-pattern resolve (trailing * wildcards, " +
      "multi-index union, METADATA _index)"),
    ("source", "ROW", "literal one-row source — compiles to a LocalRelation, no scan"),
    ("source", "SHOW", "SHOW INFO (the reference's only variant): one " +
      "deterministic row of committed build facts — no wall clock, results replay"),
    ("source", "TS", "tech preview; TSDB mapping contract enforced " +
      "(_tsid/_ts_ms), *_over_time aggs scoped per STATS — and per FORK branch (r17 fix)"),
    ("processing", "CHANGE_POINT", "tech preview; spike/dip/step detection " +
      "over the keyed series"),
    ("processing", "COMPLETION", "tech preview; served by the inference-catalog " +
      "seam against caller-registered models (hosted endpoints are environmental)"),
    ("processing", "DISSECT", "native DissectExtract linear delimiter walk " +
      "(ES's actual scanner: indexOf per key, no regex, no backtracking)"),
    ("processing", "DROP", ""),
    ("processing", "ENRICH", "broadcast hash join against the registered policy table"),
    ("processing", "EVAL", ""),
    ("processing", "FORK", "tech preview; branch pipelines re-unioned with _fork ids"),
    ("processing", "FUSE", "tech preview; RRF over FORK's ranked pages in exact " +
      "micros so the fused score never rides float addition order"),
    ("processing", "GROK", "one-pass multi-group extraction (RegexExtractAll " +
      "struct), typed captures"),
    ("processing", "INLINESTATS", "tech preview; group aggregates joined back " +
      "onto every row"),
    ("processing", "KEEP", ""),
    ("processing", "LIMIT", ""),
    ("processing", "LOOKUP JOIN", "left join on the key column against the " +
      "registered lookup index"),
    ("processing", "MV_EXPAND", "null/empty arrays keep their row with a null " +
      "cell (ES contract)"),
    ("processing", "RENAME", ""),
    ("processing", "RERANK", "tech preview; inference-catalog seam, " +
      "caller-registered rerankers (the shipped ones are the engine's own statistics)"),
    ("processing", "SAMPLE", "deterministic md5-threshold membership — a stated " +
      "deviation from ES's random sample: results must replay byte-equal"),
    ("processing", "SORT", "NULLS FIRST/LAST, per-key direction"),
    ("processing", "STATS", "incl. WHERE-filtered aggs and null BY buckets"),
    ("processing", "WHERE", "three-valued logic; match functions compile to " +
      "boolean codegen predicates"))

  /** Command names the parser dispatches, scraped from the TWO
    * command-head dispatch contexts and NOTHING else (r20 advice —
    * the r19 scrape matched every isKw/eatKw literal in the file, so
    * a keyword used only as an OPERAND, e.g. `metadata` or `where`,
    * would have satisfied the guard for a same-named command):
    *
    *  - source commands: only lines EsqlParser tags `CMD-DISPATCH`
    *    (the four head-position isKw/eatKw sites; the tag and this
    *    scrape are a matched pair, and CommandAuditSpec pins the
    *    scraped set to exactly {FROM, ROW, SHOW, TS});
    *  - processing commands: `case "X"` lines INSIDE parseCommand's
    *    body (its head to the source-dispatch section), not the whole
    *    file — parseAgg's aggregate cases and compileExpr's function
    *    cases no longer leak in.
    *
    * "LOOKUP JOIN" is dispatched by its head token LOOKUP. */
  def scraped(): Set[String] = sourceHeads() ++ processingCases()

  /** The keyword-lexer heads tagged `CMD-DISPATCH`. */
  def sourceHeads(): Set[String] = {
    val kw = """(?:isKw\(_, |eatKw\()"([a-z_]+)"""".r
    parserLines().iterator
      .filter(_.contains("// CMD-DISPATCH"))
      .flatMap(l => kw.findAllMatchIn(l).map(_.group(1).toUpperCase))
      .toSet
  }

  /** `case "X"` heads inside parseCommand's body only. */
  def processingCases(): Set[String] = {
    val src = parserLines()
    val start = src.indexWhere(_.contains("def parseCommand(): Cmd"))
    val end = src.indexWhere(_.contains("val cmds = Seq.newBuilder[Cmd]"), start)
    require(start >= 0 && end > start,
      "parseCommand dispatch region not found — the scrape anchor moved")
    // every quoted UPPERCASE token on a `case "` line — alternations
    // (`case "KEEP" | "DROP" =>`) dispatch several commands on one line
    val tok = """"([A-Z_]+)"""".r
    src.slice(start, end).iterator
      .filter(_.trim.startsWith("case \""))
      .flatMap(l => tok.findAllMatchIn(l).map(_.group(1)))
      .toSet
  }

  private def parserLines(): Vector[String] =
    Files.readAllLines(
      Paths.get("src/main/scala/graft/ops/EsqlParser.scala")).asScala.toVector

  /** (category, name, status, note) — fails loudly when a row claims a
    * command the parser has no dispatch for. */
  def rows(): Seq[(String, String, String, String)] = {
    val have = scraped()
    reference.map { case (cat, name, note) =>
      val head = name.split(" ").head
      if (!have.contains(head)) sys.error(
        s"command '$name' is classified implemented but EsqlParser.scala has no dispatch for $head")
      (cat, name, "implemented", note)
    }
  }

  def main(args: Array[String]): Unit = {
    val rs = rows()
    val table = s"${reference.size} public 9.1 ES|QL commands (4 source + " +
      s"${reference.size - 4} processing): ${rs.size} implemented, 0 rejected, " +
      "0 absent. Regenerate with `sbt \"runMain graft.CommandAudit\"`; a row " +
      "without a parser dispatch fails the generator AND CommandAuditSpec.\n\n" +
      "| category | command | status | note |\n|---|---|---|---|\n" +
      rs.map { case (c, n, s, note) => s"| $c | `$n` | $s | $note |" }.mkString("\n")
    val survey = Paths.get("SURVEY.md")
    val txt = new String(Files.readAllBytes(survey), "UTF-8")
    val b = "<!-- BEGIN GENERATED ESQL COMMAND AUDIT (sbt \"runMain graft.CommandAudit\") -->"
    val e = "<!-- END GENERATED ESQL COMMAND AUDIT -->"
    val i0 = txt.indexOf(b)
    val i1 = txt.indexOf(e)
    require(i0 >= 0 && i1 > i0, "command-audit markers missing in SURVEY.md")
    val out = txt.substring(0, i0 + b.length) + "\n" + table + "\n" + txt.substring(i1)
    Files.write(survey, out.getBytes("UTF-8"))
    println(s"command audit: ${reference.size} reference rows " +
      s"(${rs.size} implemented, 0 rejected, 0 absent) written to SURVEY.md")
  }
}
