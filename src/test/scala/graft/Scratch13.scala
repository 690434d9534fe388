package graft

import org.apache.spark.sql.SparkSession

/** Throwaway round-13 smoke runner for new registry keys (not a test). */
object Scratch13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "ns_esql_change_point", "ns_esql_sample", "ns_search_completion_suggest",
      "ns_search_mget", "ns_search_msearch", "ns_esql_inlinestats", "ns_bpe_train",
      "ns_esql_dissect", "ns_esql_grok", "ns_esql_observability")
    names.foreach { n =>
      try {
        val rows = SparkEntry.queries(n)(spark, dir).collect()
        println(s"=== $n rows=${rows.length}")
        rows.take(5).foreach(r => println("   " + r))
      } catch {
        case e: Throwable =>
          println(s"=== $n FAILED ${e.getClass.getName}: ${Option(e.getMessage).getOrElse("").take(400)}")
      }
    }
    spark.stop()
  }
}
