package graft

/** Guards for the generated query-DSL audit (SURVEY §2.5.5): every
  * implemented row must cite declared Registry keys (rows() itself
  * sys.errors otherwise), the reference list must span the docs'
  * clause groups and not shrink, and the SURVEY table must be the
  * regenerated one. */
class QueryDslAuditSpec extends SparkSpec {

  test("every implemented clause cites declared Registry keys (rows() builds)") {
    val rs = QueryDslAudit.rows()
    assert(rs.size == QueryDslAudit.reference.size)
    assert(rs.size >= 55, s"reference list shrank: ${rs.size}")
    assert(rs.count(_._3 == "rejected by design") <= 4,
      "rejection count grew — every new rejection needs a review")
    // the docs' clause groups are all present
    val cats = rs.map(_._1).toSet
    Seq("compound", "fulltext", "term-level", "geo", "shape", "joining",
      "span", "specialized", "match-all").foreach { c =>
      assert(cats.contains(c), s"clause group $c missing")
    }
  }

  test("no clause is absent: every row is implemented or carries a written rejection reason") {
    QueryDslAudit.rows().foreach { case (_, name, status, note) =>
      assert(status == "implemented" || status == "rejected by design",
        s"$name has unexpected status $status")
      if (status == "rejected by design")
        assert(note.trim.length > 20, s"$name: rejection without a substantive reason")
    }
  }

  test("the r20 gap-closers exist and gate their clauses") {
    // term/terms/match_all and parent_id were the audit's absent rows —
    // closed with named keys this round (the np_field_ops2 discipline)
    val names = Registry.all.map(_.name).toSet
    assert(names.contains("ns_search_term_terms"))
    assert(names.contains("ns_search_parent_id"))
    val byClause = QueryDslAudit.rows().map(r => r._2 -> r._4).toMap
    assert(byClause("term").contains("ns_search_term_terms"))
    assert(byClause("parent_id").contains("ns_search_parent_id"))
    assert(byClause("match_all").contains("ns_search_term_terms"))
  }

  test("SURVEY.md carries the generated table between its markers") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val b = txt.indexOf("<!-- BEGIN GENERATED QUERY DSL AUDIT")
    val e = txt.indexOf("<!-- END GENERATED QUERY DSL AUDIT -->")
    assert(b >= 0 && e > b, "query-dsl audit markers missing")
    val body = txt.substring(b, e)
    assert(body.contains("| joining | `parent_id` | implemented |"),
      "generated table is stale — run sbt \"runMain graft.QueryDslAudit\"")
    assert(body.contains(s"${QueryDslAudit.reference.size} public 9.1 query-DSL clauses"),
      "generated header count is stale — run sbt \"runMain graft.QueryDslAudit\"")
  }
}
