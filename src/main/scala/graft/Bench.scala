package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...}. Each query is forced through the
  * noop sink (not `.count()`, which would let Catalyst prune the whole
  * projection and time an empty scan).
  *
  * Each query runs twice and reports the faster pass (steady-state,
  * JMH-style): single-shot numbers on a shared box fold first-call
  * codegen compilation and ambient load into whichever query they land
  * on (observed ±50% run-to-run swings on identical code). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)
    // JIT/codegen warmup on the smallest sf so per-query numbers measure
    // the plan, not first-call class generation.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a failed pass is +Infinity, never its elapsed time — min-of-two
      // must not prefer a fast FAILED run over a slow successful one
      def onePass(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Double.PositiveInfinity
        }
      }
      name -> math.min(onePass(), onePass())
    }
    // failures surface in the JSON (a finite sentinel keeps it strict
    // JSON — Infinity is not): per-query 1e9 s + an explicit failed list
    val failed = results.collect { case (k, v) if !v.isFinite => k }
    val bounded = results.map { case (k, v) => k -> (if (v.isFinite) v else 1e9) }
    val qs = bounded.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = bounded.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
