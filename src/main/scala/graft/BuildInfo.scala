package graft

/** Build facts surfaced by ES|QL's `SHOW INFO` (reference: the ES
  * `SHOW INFO` source command returns the node's version/date/hash).
  * One committed resource (graft-build.properties) is the single source
  * of truth: the ShowInfo compilation (EsqlParser) and the ns_esql_show
  * DuckDB oracle (SearchExt) both read THESE values, so the two sides
  * can never drift — editing the resource updates engine and oracle
  * together. Deterministic by construction: the resource is committed,
  * never derived from a wall clock.
  */
object BuildInfo {
  private val props = {
    val p = new java.util.Properties()
    val in = getClass.getResourceAsStream("/graft-build.properties")
    require(in != null, "graft-build.properties missing from classpath")
    try p.load(in) finally in.close()
    p
  }
  val version: String = props.getProperty("version")
  val date: String = props.getProperty("date")
  val hash: String = props.getProperty("hash")
  require(version != null && date != null && hash != null,
    "graft-build.properties must define version, date, hash")
}
