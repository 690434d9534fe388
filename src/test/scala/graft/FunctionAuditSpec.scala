package graft

/** Guards for the generated ES|QL function-reference audit (SURVEY
  * §2.5.2): the classification must stay consistent with the compiler
  * (rows() itself sys.errors on any implemented-but-not-dispatched or
  * dispatched-but-classified-away row), the reference list must not
  * shrink, and every absent row must carry its reason. */
class FunctionAuditSpec extends SparkSpec {

  test("classification is consistent with the compiler dispatch (rows() builds)") {
    val rs = FunctionAudit.rows() // sys.errors on any drift
    assert(rs.size == FunctionAudit.reference.size)
    val impl = rs.count(_._3 == "implemented")
    assert(impl >= 142, s"implemented count regressed: $impl")
    assert(rs.count(_._3 == "ABSENT") <= 2, "absent rows grew — close or classify them")
    // every non-implemented row must state WHY
    rs.filter(_._3 != "implemented").foreach { case (_, n, _, note) =>
      assert(note.nonEmpty, s"$n is not implemented and carries no reason")
    }
  }

  test("the scrape actually sees the dispatch surface (not a regex gone quiet)") {
    val have = FunctionAudit.scraped()
    assert(have.size >= 140, s"scrape found only ${have.size} names — pattern drift?")
    // spot anchors across the dispatch styles: scalar case-tuple,
    // aggregate case-string, TS inner function, single-letter constant
    Seq("CONCAT", "PERCENTILE", "RATE", "E", "KNN", "ST_EXTENT_AGG",
      "MATCH_PHRASE", "ROUND_TO").foreach { n =>
      assert(have.contains(n), s"scrape lost $n")
    }
  }

  test("SURVEY.md carries the generated table between its markers") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val b = txt.indexOf("<!-- BEGIN GENERATED ESQL FUNCTION AUDIT")
    val e = txt.indexOf("<!-- END GENERATED ESQL FUNCTION AUDIT -->")
    assert(b >= 0 && e > b, "audit markers missing")
    val body = txt.substring(b, e)
    assert(body.contains("| `ROUND_TO` | implemented |"),
      "generated table is stale — run sbt \"runMain graft.FunctionAudit\"")
    assert(body.contains(s"${FunctionAudit.reference.size} public 9.1 reference functions"),
      "generated header count is stale — run sbt \"runMain graft.FunctionAudit\"")
  }
}
