package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the testdata dir plus an
  * optional DuckDB-oracle SQL over the same parquet tables. Queries with
  * `oracle = None` are non-SQL-expressible (e.g. gunzip) and get the
  * driver's weaker rows-only check; they are covered by ScalaTest instead.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All operator groups, in SURVEY.md §2 order. */
  def all: Seq[QueryDef] =
    ops.Decode.entries ++
      ops.Enrich.entries ++
      ops.Relational.entries ++
      ops.AggsExt.entries ++
      ops.TextOps.entries ++
      ops.Corpus.entries ++
      ops.SearchExt.entries ++
      ops.RetrieverTree.entries ++
      ops.VectorSearch.entries ++
      ops.StreamOps.entries
}
