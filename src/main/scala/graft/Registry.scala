package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the testdata dir plus an
  * optional DuckDB-oracle SQL over the same parquet tables. Queries with
  * `oracle = None` are non-SQL-expressible (e.g. gunzip) and get the
  * driver's weaker rows-only check; they are covered by ScalaTest instead.
  *
  * `liveness` (r20, the gate-liveness audit): branch probes declared
  * NEXT TO the oracle — each is (label, a Spark-SQL statement returning
  * exactly one boolean over the key's own RESULT registered as view `r`)
  * asserting that the semantic branch the key exists to exercise is
  * actually HIT by the fixture (both EXCEPT directions populated,
  * n_copies>1 duplicate groups present, both geoip match and miss
  * sides, …). The r19 oracle-mutant class caught three keys whose green
  * rested on degenerate fixtures (empty-vs-empty, zero duplicates) only
  * INCIDENTALLY; graft.Liveness makes that detection first-class and
  * runs every declared probe at sf0.01 AND sf0.1.
  *
  * `constOk` names output columns that are INTENTIONALLY constant or
  * all-null at audit SFs (column → the reason), exempting them from the
  * audit's no-silent-degenerate-column check; LivenessSpec fails on an
  * entry naming a column the key does not emit.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    liveness: Seq[(String, String)] = Nil,
    constOk: Map[String, String] = Map.empty)

object Registry {
  /** All operator groups, in SURVEY.md §2 order — with the liveness
    * audit's const-exemption ledger merged in (ConstExemptions: one
    * reviewed reason per intentionally-constant column; LivenessSpec
    * fails on a ledger row naming a key or column that doesn't
    * exist). */
  def all: Seq[QueryDef] =
    (ops.Decode.entries ++
      ops.Enrich.entries ++
      ops.Relational.entries ++
      ops.AggsExt.entries ++
      ops.TextOps.entries ++
      ops.Corpus.entries ++
      ops.SearchExt.entries ++
      ops.RetrieverTree.entries ++
      ops.VectorSearch.entries ++
      ops.StreamOps.entries)
      .map(q => ConstExemptions.byKey.get(q.name)
        .fold(q)(m => q.copy(constOk = q.constOk ++ m)))
}
