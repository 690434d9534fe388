package graft

/** Guards for the generated ingest-processor audit (SURVEY §2.5.3): the
  * classification must stay consistent with the Registry (rows() itself
  * sys.errors when an implemented row cites an undeclared key), the
  * reference list must not shrink, rejections must state why, and the
  * SURVEY table must be the regenerated one. */
class ProcessorAuditSpec extends SparkSpec {

  test("classification is consistent with the Registry (rows() builds)") {
    val rs = ProcessorAudit.rows() // sys.errors on any stale key citation
    assert(rs.size == ProcessorAudit.reference.size)
    assert(rs.size >= 45, s"reference list shrank: ${rs.size}")
    val impl = rs.count(_._2 == "implemented")
    assert(impl >= 40, s"implemented count regressed: $impl")
    assert(!rs.exists(_._2 == "ABSENT"), "absent rows exist — close or classify them")
    rs.filter(_._2 != "implemented").foreach { case (n, _, note) =>
      assert(note.nonEmpty, s"$n is not implemented and carries no reason")
    }
  }

  test("every cited key really is declared, and the r19 closure key carries the residue") {
    val declared = Registry.all.map(_.name).toSet
    val cited = ProcessorAudit.reference.collect { case (_, Right(ks)) => ks }.flatten.toSet
    assert(cited.subsetOf(declared), s"undeclared: ${cited -- declared}")
    // the processors the r19 verdict ordered closed all cite np_field_ops2
    Seq("convert", "gsub", "dot_expander", "sort", "join", "trim",
      "lowercase", "uppercase", "foreach", "redact").foreach { p =>
      val row = ProcessorAudit.reference.toMap.apply(p)
      assert(row.isRight, s"$p must be implemented")
    }
    assert(declared.contains("np_field_ops2"))
  }

  test("SURVEY.md carries the generated table between its markers") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val b = txt.indexOf("<!-- BEGIN GENERATED INGEST PROCESSOR AUDIT")
    val e = txt.indexOf("<!-- END GENERATED INGEST PROCESSOR AUDIT -->")
    assert(b >= 0 && e > b, "audit markers missing")
    val body = txt.substring(b, e)
    assert(body.contains("| `redact` | implemented |"),
      "generated table is stale — run sbt \"runMain graft.ProcessorAudit\"")
    assert(body.contains(s"${ProcessorAudit.reference.size} public 9.1 ingest processors"),
      "generated header count is stale — run sbt \"runMain graft.ProcessorAudit\"")
  }
}
