package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Regenerates SURVEY.md §2.5.2's ES|QL function-reference audit
  * mechanically (the Inventory discipline applied to the FUNCTION
  * surface — r18 verdict task: before this, the gap between the
  * public ES|QL function reference and the implemented set was
  * anecdotal; now it is a generated table that cannot silently
  * drift).
  *
  * The reference list below is the public Elasticsearch 9.1 ES|QL
  * function reference (docs: esql-functions-operators), curated by
  * category. The IMPLEMENTED set is scraped from EsqlParser.scala's
  * `case` dispatch lines — the single place every function name must
  * appear to compile — so a classification can never claim a function
  * the compiler doesn't dispatch: classifying a name `implemented`
  * that the scrape can't find is a build error, as is a scraped name
  * still classified rejected/absent (stale row). FunctionAuditSpec
  * runs the same computation as a test. */
object FunctionAudit {

  /** (category, name) — the public 9.1 reference surface. */
  val reference: Seq[(String, String)] = Seq(
    "aggregate" -> Seq("AVG", "COUNT", "COUNT_DISTINCT", "MAX", "MEDIAN",
      "MEDIAN_ABSOLUTE_DEVIATION", "MIN", "PERCENTILE", "SAMPLE",
      "ST_CENTROID_AGG", "ST_EXTENT_AGG", "STD_DEV", "SUM", "TOP", "VALUES",
      "WEIGHTED_AVG"),
    "time-series" -> Seq("AVG_OVER_TIME", "COUNT_OVER_TIME", "FIRST_OVER_TIME",
      "LAST_OVER_TIME", "MAX_OVER_TIME", "MIN_OVER_TIME", "RATE",
      "SUM_OVER_TIME"),
    "grouping" -> Seq("BUCKET", "CATEGORIZE"),
    "conditional" -> Seq("CASE", "COALESCE", "GREATEST", "LEAST"),
    "date-time" -> Seq("DATE_DIFF", "DATE_EXTRACT", "DATE_FORMAT", "DATE_PARSE",
      "DATE_TRUNC", "NOW"),
    "ip" -> Seq("CIDR_MATCH", "IP_PREFIX"),
    "math" -> Seq("ABS", "ACOS", "ASIN", "ATAN", "ATAN2", "CBRT", "CEIL",
      "COPY_SIGN", "COS", "COSH", "E", "EXP", "FLOOR", "HYPOT", "LOG", "LOG10",
      "PI", "POW", "ROUND", "ROUND_TO", "SCALB", "SIGNUM", "SIN", "SINH",
      "SQRT", "TAN", "TANH", "TAU"),
    "search" -> Seq("KQL", "KNN", "MATCH", "MATCH_PHRASE", "MULTI_MATCH",
      "QSTR", "TERM", "SCORE"),
    "multivalue" -> Seq("MV_APPEND", "MV_AVG", "MV_CONCAT", "MV_COUNT",
      "MV_DEDUPE", "MV_FIRST", "MV_LAST", "MV_MAX", "MV_MEDIAN",
      "MV_MEDIAN_ABSOLUTE_DEVIATION", "MV_MIN", "MV_PERCENTILE",
      "MV_PSERIES_WEIGHTED_SUM", "MV_SLICE", "MV_SORT", "MV_SUM", "MV_ZIP"),
    "spatial" -> Seq("ST_CONTAINS", "ST_DISJOINT", "ST_DISTANCE", "ST_ENVELOPE",
      "ST_GEOHASH", "ST_GEOHASH_TO_LONG", "ST_GEOHASH_TO_STRING", "ST_GEOHEX",
      "ST_GEOHEX_TO_LONG", "ST_GEOHEX_TO_STRING", "ST_GEOTILE",
      "ST_GEOTILE_TO_LONG", "ST_GEOTILE_TO_STRING", "ST_INTERSECTS",
      "ST_WITHIN", "ST_X", "ST_XMAX", "ST_XMIN", "ST_Y", "ST_YMAX", "ST_YMIN"),
    "string" -> Seq("BIT_LENGTH", "BYTE_LENGTH", "CONCAT", "ENDS_WITH",
      "FROM_BASE64", "HASH", "LEFT", "LENGTH", "LOCATE", "LTRIM", "MD5",
      "REPEAT", "REPLACE", "REVERSE", "RIGHT", "RTRIM", "SHA1", "SHA256",
      "SPACE", "SPLIT", "STARTS_WITH", "SUBSTRING", "TO_BASE64", "TO_LOWER",
      "TO_UPPER", "TRIM"),
    "conversion" -> Seq("TO_AGGREGATE_METRIC_DOUBLE", "TO_BOOLEAN",
      "TO_CARTESIANPOINT", "TO_CARTESIANSHAPE", "TO_DATEPERIOD", "TO_DATETIME",
      "TO_DATE_NANOS", "TO_DEGREES", "TO_DOUBLE", "TO_GEOPOINT", "TO_GEOSHAPE",
      "TO_INTEGER", "TO_IP", "TO_LONG", "TO_RADIANS", "TO_STRING",
      "TO_TIMEDURATION", "TO_UNSIGNED_LONG", "TO_VERSION")
  ).flatMap { case (cat, names) => names.map(cat -> _) }

  /** Deliberate non-implementations, each with its stated reason. */
  val rejectedByDesign: Map[String, String] = Map(
    "NOW" -> ("wall-clock output breaks the deterministic-replay contract " +
      "(the SHOW INFO precedent: build facts, no clock); pass timestamps in"),
    "SAMPLE" -> ("nondeterministic by definition; the md5-threshold SAMPLE " +
      "command and the ns_sample_* family are the deterministic sampling surface"),
    "SCORE" -> ("per-predicate relevance needs the index-global scoring " +
      "model; scored retrieval is served by RERANK and the ns_search scorers"),
    "TO_DATEPERIOD" -> ("span literals (`1 day`) are first-class grammar; the " +
      "period type exists only as a literal argument in ES|QL too"),
    "TO_TIMEDURATION" -> ("span literals (`4 hours`) are first-class grammar; " +
      "the duration type exists only as a literal argument in ES|QL too"),
    "TO_UNSIGNED_LONG" -> ("no unsigned 64-bit type on the JVM/Spark; TO_LONG " +
      "covers the dialect's numeric space"),
    "TO_AGGREGATE_METRIC_DOUBLE" -> ("the downsample operator " +
      "(ns_agg_downsample) materializes min/max/sum/count columns directly; " +
      "the opaque composite type is an index-storage detail"),
    "ST_GEOHASH_TO_LONG" -> gridIdReason, "ST_GEOHASH_TO_STRING" -> gridIdReason,
    "ST_GEOHEX_TO_LONG" -> gridIdReason, "ST_GEOHEX_TO_STRING" -> gridIdReason,
    "ST_GEOTILE_TO_LONG" -> gridIdReason, "ST_GEOTILE_TO_STRING" -> gridIdReason)

  private def gridIdReason: String =
    "this dialect's grid ids are already the readable string form " +
      "(documented deviation from ES's opaque long encoding), so the " +
      "long<->string conversions have no role"

  /** Honest gaps — absent, with the reason recorded. (Empty since the
    * r18 closure of TO_DATE_NANOS/TO_VERSION; the map stays so a future
    * reference bump has somewhere honest to record a new gap.) */
  val absent: Map[String, String] = Map.empty

  /** Implemented rows whose CARRIER deviates from ES's storage type —
    * the deviation is part of the audit, not a footnote elsewhere. */
  val implementedNotes: Map[String, String] = Map(
    "TO_DATE_NANOS" -> ("carried as epoch-nanos LONG (the representation " +
      "Spark gives parquet TIMESTAMP(NANOS) itself); keyword (Z or ±HH:MM " +
      "offsets, r19) / date / date_nanos(ntz) / long in"),
    "TO_VERSION" -> ("carried as an order-preserving encoded keyword " +
      "(semver-aware sort incl. rule-11.4 numeric prerelease-identifier " +
      "precedence as of r19; invalid versions sort after valid)"))

  /** Function names the compiler dispatches: every quoted
    * ALL-CAPS token on a `case` line of EsqlParser.scala. */
  def scraped(): Set[String] = {
    val src = Files.readAllLines(
      Paths.get("src/main/scala/graft/ops/EsqlParser.scala")).asScala
    val tok = "\"([A-Z][A-Z_0-9]*)\"".r // * not +: E() and PI() are real functions
    src.iterator.filter(_.trim.startsWith("case "))
      .flatMap(l => tok.findAllMatchIn(l).map(_.group(1)))
      .toSet
  }

  /** Names whose dispatch hit is a COMMAND of the same spelling, not
    * the reference FUNCTION (ES|QL has both a SAMPLE command — which
    * this engine implements — and a SAMPLE aggregate, which it
    * rejects): the stale-row guard cannot tell them apart from a
    * line scrape, so these are exempted from it. */
  private val commandHomonyms = Set("SAMPLE")

  /** (category, name, status, note) for every reference row — fails
    * loudly on any classification/scrape disagreement. */
  def rows(): Seq[(String, String, String, String)] = {
    val have = scraped()
    reference.map { case (cat, name) =>
      val row =
        if (rejectedByDesign.contains(name)) {
          if (have.contains(name) && !commandHomonyms.contains(name)) sys.error(
            s"$name is classified rejected-by-design but the compiler dispatches it — stale row")
          (cat, name, "rejected by design", rejectedByDesign(name))
        } else if (absent.contains(name)) {
          if (have.contains(name)) sys.error(
            s"$name is classified absent but the compiler dispatches it — stale row")
          (cat, name, "ABSENT", absent(name))
        } else {
          if (!have.contains(name)) sys.error(
            s"$name is classified implemented but EsqlParser.scala has no case dispatch for it")
          (cat, name, "implemented", implementedNotes.getOrElse(name, ""))
        }
      row
    }
  }

  def main(args: Array[String]): Unit = {
    val rs = rows()
    val nImpl = rs.count(_._3 == "implemented")
    val nRej = rs.count(_._3 == "rejected by design")
    val nAbs = rs.count(_._3 == "ABSENT")
    val table = s"${reference.size} public 9.1 reference functions: " +
      s"$nImpl implemented, $nRej rejected by design (reasons below), " +
      s"$nAbs absent${if (nAbs > 0) " (reasons below)" else ""}. Regenerate with " +
      "`sbt \"runMain graft.FunctionAudit\"`; classifying a function " +
      "implemented without a compiler dispatch line (or vice versa) fails " +
      "the generator AND FunctionAuditSpec.\n\n" +
      "| category | function | status | note |\n|---|---|---|---|\n" +
      rs.map { case (c, n, s, note) =>
        s"| $c | `$n` | $s | $note |"
      }.mkString("\n")
    val survey = Paths.get("SURVEY.md")
    val txt = new String(Files.readAllBytes(survey), "UTF-8")
    val b = "<!-- BEGIN GENERATED ESQL FUNCTION AUDIT (sbt \"runMain graft.FunctionAudit\") -->"
    val e = "<!-- END GENERATED ESQL FUNCTION AUDIT -->"
    val i0 = txt.indexOf(b)
    val i1 = txt.indexOf(e)
    require(i0 >= 0 && i1 > i0, "function-audit markers missing in SURVEY.md")
    val out = txt.substring(0, i0 + b.length) + "\n" + table + "\n" + txt.substring(i1)
    Files.write(survey, out.getBytes("UTF-8"))
    println(s"function audit: ${reference.size} reference rows " +
      s"($nImpl implemented, $nRej rejected, $nAbs absent) written to SURVEY.md")
  }
}
