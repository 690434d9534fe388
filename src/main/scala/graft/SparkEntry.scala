package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY.md §2 is declared in `queries` via
  * Registry; SQL-expressible ones also have a DuckDB oracle in
  * `oracleSql` (same column names both sides — the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the reference's full Firehose→documents dataflow with the
    * real base64(gzip(json)) record encoding, via the custom Gunzip
    * Catalyst expression. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    ops.Decode.pipeline(spark, "/root/testdata/sf0.001", withGzip = true)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (gzip round-trips), which are covered by ScalaTest instead. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
