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
