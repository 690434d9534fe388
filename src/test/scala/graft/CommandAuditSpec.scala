package graft

/** Guards for the generated ES|QL command audit (SURVEY §2.5.4): every
  * reference row must have a parser dispatch (rows() itself sys.errors
  * otherwise), the reference list must not shrink, and the SURVEY table
  * must be the regenerated one. */
class CommandAuditSpec extends SparkSpec {

  test("every reference command has a parser dispatch (rows() builds)") {
    val rs = CommandAudit.rows()
    assert(rs.size == CommandAudit.reference.size)
    assert(rs.size >= 24, s"reference list shrank: ${rs.size}")
    assert(rs.count(_._1 == "source") == 4)
  }

  test("the two scrapes actually see both dispatch surfaces") {
    val have = CommandAudit.scraped()
    // keyword-lexer heads (source commands) and case-line heads
    // (processing commands) must both be present
    Seq("FROM", "ROW", "SHOW", "TS", "WHERE", "FORK", "FUSE", "LOOKUP",
      "INLINESTATS", "CHANGE_POINT").foreach { n =>
      assert(have.contains(n), s"scrape lost $n")
    }
  }

  test("r20: the scrape is anchored to dispatch context — operand-only keywords cannot pass the guard") {
    // The r19 scrape matched EVERY isKw/eatKw literal in EsqlParser, so
    // a keyword appearing only as an operand (a clause modifier, a join
    // conjunction) satisfied the implemented-guard for a same-named
    // command. The anchored scrape must see exactly the four
    // CMD-DISPATCH-tagged source heads and none of the operand
    // keywords that provably appear as isKw/eatKw literals elsewhere.
    assert(CommandAudit.sourceHeads() == Set("FROM", "ROW", "SHOW", "TS"),
      s"source-head scrape drifted: ${CommandAudit.sourceHeads()}")
    val operands = Seq("METADATA", "INFO", "ON", "WITH", "BY", "AS",
      "NULLS", "DESC", "AND", "OR", "NOT", "IN", "LIKE")
    val leaked = operands.filter(CommandAudit.scraped().contains)
    assert(leaked.isEmpty, s"operand keywords leaked into the command scrape: $leaked")
    // and the processing scrape no longer sees parseAgg/compileExpr
    // cases — aggregate and scalar FUNCTION names must not register as
    // commands (COUNT/SUM dispatch inside parseStats, not parseCommand)
    val fnLeak = Seq("COUNT", "SUM", "AVG", "PERCENTILE", "TO_VERSION",
      "DATE_FORMAT").filter(CommandAudit.processingCases().contains)
    assert(fnLeak.isEmpty, s"function cases leaked into the command scrape: $fnLeak")
  }

  test("SURVEY.md carries the generated table between its markers") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val b = txt.indexOf("<!-- BEGIN GENERATED ESQL COMMAND AUDIT")
    val e = txt.indexOf("<!-- END GENERATED ESQL COMMAND AUDIT -->")
    assert(b >= 0 && e > b, "audit markers missing")
    val body = txt.substring(b, e)
    assert(body.contains("| `LOOKUP JOIN` | implemented |"),
      "generated table is stale — run sbt \"runMain graft.CommandAudit\"")
    assert(body.contains(s"${CommandAudit.reference.size} public 9.1 ES|QL commands"),
      "generated header count is stale — run sbt \"runMain graft.CommandAudit\"")
  }
}
