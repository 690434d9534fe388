package graft

import org.apache.spark.sql.types.{ArrayType, MapType}

/** Contract guards on the operator registry itself — the driver keys
  * CORRECTNESS/BENCH on `SparkEntry.queries`, so a duplicate name (one
  * entry silently shadowing another in the Map) or an oracle without a
  * query would corrupt the gate without any test failing. */
class RegistrySpec extends SparkSpec {

  test("registry names are unique — no entry shadows another in SparkEntry.queries") {
    val names = Registry.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate registry keys: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == names.size,
      "SparkEntry.queries lost entries to name collisions")
  }

  test("every oracle belongs to a declared query and uses the shared prefix scheme") {
    val names = Registry.all.map(_.name).toSet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    val badPrefix = names.filterNot(n =>
      n.startsWith("k2e_") || n.startsWith("np_") || n.startsWith("ns_"))
    assert(badPrefix.isEmpty, s"unexpected key prefixes: ${badPrefix.mkString(", ")}")
  }

  test("SURVEY §2.5.1 'declared at' rows point at real declarations, never an audit generator") {
    // r20 verdict fix: Inventory.site() resolves the FIRST quoted
    // occurrence across alphabetically-sorted files; the audit
    // generators (ProcessorAudit/CommandAudit/FunctionAudit/
    // QueryDslAudit) quote key names in their classification tables
    // and sort before graft/ops/, so without the filterNot they hijack
    // the attribution. This reads the GENERATED table and fails if any
    // site cell points into a generator (or at Inventory itself).
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val b = txt.indexOf("<!-- BEGIN GENERATED INVENTORY")
    val e = txt.indexOf("<!-- END GENERATED INVENTORY -->")
    assert(b >= 0 && e > b, "inventory markers missing")
    val banned = Seq("Inventory.scala", "ProcessorAudit.scala",
      "CommandAudit.scala", "FunctionAudit.scala", "QueryDslAudit.scala",
      "ConstExemptions.scala", "Liveness.scala")
    val offenders = txt.substring(b, e).linesIterator.filter(_.startsWith("| `"))
      .filter(l => banned.exists(l.contains)).toSeq
    assert(offenders.isEmpty,
      s"inventory rows attributed to an audit generator (rerun sbt \"runMain graft.Inventory\"): ${offenders.take(5).mkString(" / ")}")
  }

  test("oracle-gated queries emit scalar columns only (external comparator row-sorts)") {
    // The driver's DuckDB-oracle harness sorts result rows in pandas;
    // array/map cells are unhashable there and crash the gate (the
    // r11 ns_search_match_phrase_prefix incident). Schema-only check:
    // building the DataFrame analyzes the plan without executing it.
    val offenders = Registry.all.filter(_.oracle.isDefined).flatMap { q =>
      val bad = SparkEntry.queries(q.name)(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType] =>
          s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
      bad
    }
    assert(offenders.isEmpty,
      s"array/map-typed output columns in oracle-gated queries: ${offenders.mkString("; ")}")
  }
}
