package graft

import java.nio.file.{Files, Paths}

/** Regenerates SURVEY.md §2.5.3's ES ingest-processor audit mechanically
  * (the FunctionAudit discipline applied to the PROCESSOR surface — r19
  * verdict task: before this, the generic ingest-processor library's
  * coverage beyond the reference's own two pipelines was anecdotal; now
  * it is a generated table that cannot silently drift).
  *
  * The reference list below is the public Elasticsearch 9.1 ingest
  * processor reference (docs: processors), in docs order. Processors
  * have no single compiler dispatch point to scrape (unlike ES|QL
  * functions), so the mechanical guard is key EXISTENCE: every
  * `implemented` row names the Registry keys that exercise it, and a
  * named key that Registry.all doesn't declare fails the generator AND
  * ProcessorAuditSpec — a row can never outlive the operator it cites.
  * Rejections carry their stated reason inline. */
object ProcessorAudit {

  /** status: Left(reason) = rejected by design; Right(keys) = implemented
    * by these declared Registry keys. */
  val reference: Seq[(String, Either[String, Seq[String]])] = Seq(
    "append" -> Right(Seq("np_array_ops")),
    "attachment" -> Left("Tika-style binary document extraction is an " +
      "external-library/service concern (the inference seam's class); the " +
      "multimodal family (ns_multimodal_*) is the in-engine binary-decode " +
      "surface"),
    "bytes" -> Right(Seq("np_bytes")),
    "circle" -> Left("ES approximates a circle as a polygon because its " +
      "index structures cannot store circles; this engine evaluates " +
      "point-in-circle EXACTLY (haversine — ns_geo_distance, " +
      "ns_agg_geo_distance rings), so the lossy preprocessing step has " +
      "no role"),
    "community_id" -> Right(Seq("np_community_id")),
    "convert" -> Right(Seq("np_field_ops2")),
    "csv" -> Right(Seq("np_csv")),
    "date" -> Right(Seq("np_date_parse", "np_ingest_pipeline")),
    "date_index_name" -> Right(Seq("np_date_index_name")),
    "dissect" -> Right(Seq("ns_esql_dissect")),
    "dot_expander" -> Right(Seq("np_field_ops2")),
    "drop" -> Right(Seq("k2e_deadletter")),
    "enrich" -> Right(Seq("np_geoip_join", "np_geoip_bucketed")),
    "fail" -> Right(Seq("k2e_deadletter")),
    "fingerprint" -> Right(Seq("np_fingerprint")),
    "foreach" -> Right(Seq("np_array_ops", "np_field_ops2")),
    "geo_grid" -> Right(Seq("ns_agg_geotile_grid", "ns_agg_geohash_grid",
      "ns_agg_geohex_grid")),
    "geoip" -> Right(Seq("np_geoip_join", "np_geoip_bucketed")),
    "grok" -> Right(Seq("np_grok_access_log", "ns_esql_grok")),
    "gsub" -> Right(Seq("np_field_ops2")),
    "html_strip" -> Right(Seq("np_html_strip")),
    "inference" -> Left("a hosted-model endpoint is environmental (no " +
      "model service in scope); the ENRICH/RERANK/COMPLETION catalog seam " +
      "is the engine's inference surface, exercised against " +
      "caller-registered implementations (SURVEY §2, hosted-inference note)"),
    "ip_location" -> Right(Seq("np_geoip_join", "np_geoip_bucketed")),
    "join" -> Right(Seq("np_array_ops", "np_field_ops2")),
    "json" -> Right(Seq("k2e_from_json", "k2e_json_or_text")),
    "kv" -> Right(Seq("np_kv")),
    "lowercase" -> Right(Seq("np_field_ops2")),
    "network_direction" -> Right(Seq("np_network_direction")),
    "pipeline" -> Right(Seq("np_route_by_loggroup", "np_ingest_pipeline")),
    "redact" -> Right(Seq("np_field_ops2")),
    "registered_domain" -> Right(Seq("np_registered_domain")),
    "remove" -> Right(Seq("np_field_ops")),
    "rename" -> Right(Seq("np_field_ops")),
    "reroute" -> Right(Seq("np_route_by_loggroup", "np_date_index_name")),
    "script" -> Right(Seq("np_tls_version", "np_drop_null_fields")),
    "set" -> Right(Seq("np_field_ops", "np_set_if_null")),
    "set_security_user" -> Left("reads the authenticated principal from " +
      "the REQUEST security context — environmental (no auth subsystem in " +
      "scope); per-request access-key propagation through the spool to the " +
      "bulk sink (S6, HttpBulk auth isolation) is the engine's " +
      "request-identity surface"),
    "sort" -> Right(Seq("np_array_ops", "np_field_ops2")),
    "split" -> Right(Seq("np_field_ops2", "np_array_ops")),
    "terminate" -> Left("early-exit control flow has no meaning in a " +
      "set-oriented projection: conditional processor chains compile to " +
      "when() branches that already skip the remaining transforms per row, " +
      "and batch abort is the micro-batch error contract (§2.3)"),
    "trim" -> Right(Seq("np_field_ops2")),
    "uppercase" -> Right(Seq("np_field_ops2")),
    "uri_parts" -> Right(Seq("np_uri_parts")),
    "urldecode" -> Right(Seq("np_urldecode")),
    "user_agent" -> Right(Seq("np_user_agent")))

  /** (name, status, note) for every reference row — fails loudly when an
    * implemented row cites a key the Registry doesn't declare. */
  def rows(): Seq[(String, String, String)] = {
    val declared = Registry.all.map(_.name).toSet
    reference.map {
      case (name, Left(reason)) => (name, "rejected by design", reason)
      case (name, Right(keys)) =>
        val missing = keys.filterNot(declared.contains)
        if (missing.nonEmpty) sys.error(
          s"processor '$name' cites undeclared Registry keys: ${missing.mkString(", ")} — stale row")
        (name, "implemented", keys.map(k => s"`$k`").mkString(", "))
    }
  }

  def main(args: Array[String]): Unit = {
    val rs = rows()
    val nImpl = rs.count(_._2 == "implemented")
    val nRej = rs.count(_._2 == "rejected by design")
    val table = s"${reference.size} public 9.1 ingest processors: " +
      s"$nImpl implemented (each row names its declared Registry keys), " +
      s"$nRej rejected by design (reasons inline), 0 absent. Regenerate " +
      "with `sbt \"runMain graft.ProcessorAudit\"`; an implemented row " +
      "citing a key Registry.all doesn't declare fails the generator AND " +
      "ProcessorAuditSpec.\n\n" +
      "| processor | status | keys / reason |\n|---|---|---|\n" +
      rs.map { case (n, s, note) => s"| `$n` | $s | $note |" }.mkString("\n")
    val survey = Paths.get("SURVEY.md")
    val txt = new String(Files.readAllBytes(survey), "UTF-8")
    val b = "<!-- BEGIN GENERATED INGEST PROCESSOR AUDIT (sbt \"runMain graft.ProcessorAudit\") -->"
    val e = "<!-- END GENERATED INGEST PROCESSOR AUDIT -->"
    val i0 = txt.indexOf(b)
    val i1 = txt.indexOf(e)
    require(i0 >= 0 && i1 > i0, "processor-audit markers missing in SURVEY.md")
    val out = txt.substring(0, i0 + b.length) + "\n" + table + "\n" + txt.substring(i1)
    Files.write(survey, out.getBytes("UTF-8"))
    println(s"processor audit: ${reference.size} reference rows " +
      s"($nImpl implemented, $nRej rejected, 0 absent) written to SURVEY.md")
  }
}
