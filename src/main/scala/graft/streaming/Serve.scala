package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.GraftExtensions

/** Launchable ingest job outside tests: file-drop source → decode/route
  * → SUCCESS/ERROR channels, optionally with the HTTP `_bulk` transport
  * as the delivery sink.
  *
  * Usage:
  *   runMain graft.streaming.Serve <dropDir> <outDir> <checkpointDir>
  *     [<esBulkUrl> <index>]
  *
  * Without the URL args the SUCCESS channel is parquet (the offline /
  * verify topology); with them, documents POST per partition to the
  * endpoint (reference main.go:248–365 is the service this replaces:
  * Firehose batches land as JSON-lines files in `dropDir` instead of
  * HTTP pushes — same envelope contract, same downstream dataflow). */
object Serve {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 5,
      "usage: Serve <dropDir> <outDir> <checkpointDir> [<esBulkUrl> <index>]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.install(spark)
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_DRAIN=1: process what's landed and exit (smoke runs /
    // cron-style catch-up); default is the reference's 5 s flush cadence
    val trigger =
      if (sys.env.get("SPARK_GRAFT_DRAIN").contains("1")) Trigger.AvailableNow()
      else Trigger.ProcessingTime("5 seconds")
    val source = Pipeline.fileDropSource(spark, args(0))
    val query =
      if (args.length == 5)
        Pipeline.runHttp(source, args(3), args(4), args(1), args(2), trigger = trigger)
      else
        Pipeline.run(source, args(1), args(2), trigger = trigger)
    query.awaitTermination()
  }
}
