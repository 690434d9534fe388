package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's read-only testdata (TESTDATA.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot read natively
  * (PARQUET_TYPE_ILLEGAL); we read it as a nanosecond long via
  * `spark.sql.legacy.parquet.nanosAsLong` and expose both the raw nanos
  * (`ts`, ordering-safe) and derived micro/milli columns. DuckDB's oracle
  * view of the same file presents `ts` truncated to microseconds, so every
  * derived value here floors — `ts div 1000` (µs), `ts div 1000000` (ms) —
  * to stay bit-identical with the oracle.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** events with `ts` = epoch nanos (LONG), `ts_ms` = epoch millis (LONG),
    * `tsu` = TIMESTAMP truncated to micros (matches DuckDB's view of the file). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime-settable SQL conf; set defensively in case the calling session
    // (driver-owned in Verify/Bench) was built without it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("tsu", expr("timestamp_micros(ts div 1000)"))
  }
}
