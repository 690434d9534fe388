package graft

import org.apache.spark.sql.SparkSession

/** Scaling probe: runs every declared query at TWO scale factors and
  * flags super-linear time growth the single-sf bench cannot see — a
  * query whose cost curve bends (an accidental O(n²) candidate set, a
  * broadcast side that stopped being broadcastable, a partial aggregate
  * that stopped combining) shows up as time-ratio ≫ data-ratio long
  * before it kills a 100 TB run.
  *
  * Method: min-of-`rounds` per query per sf (the Bench rig's one-sided-
  * noise argument), ratio = t_big / t_small. Flag when the ratio
  * exceeds `flagFactor` × the data ratio AND the big-sf time is above
  * the noise floor (sub-`floorSec` queries are dominated by constant
  * per-query overhead — plan/codegen/task dispatch — and their ratios
  * are meaningless in both directions).
  *
  * Prints ONE JSON line:
  *   {"metric":"scaling","data_ratio":…,"ratios":{q:r,…},"flagged":[…]}
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfSmall = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val sfBig = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val dataRatio = args.lift(2).map(_.toDouble).getOrElse(10.0)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "2").toInt
    val flagFactor = 2.0
    val floorSec = 0.5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    def onePass(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => Double.PositiveInfinity }
    }
    // round-robin within each sf (the Bench rig): an ambient-load spike
    // lands on one round of many queries, not all passes of one query
    def minTimes(dir: String): Map[String, Double] = {
      val acc = collection.mutable.Map.empty[String, Double].withDefaultValue(Double.PositiveInfinity)
      for (_ <- 1 to rounds; (name, fn) <- names)
        acc(name) = math.min(acc(name), onePass(fn, dir))
      acc.toMap
    }
    val small = minTimes(sfSmall)
    val big = minTimes(sfBig)

    def fmt(d: Double): String =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val ratios = names.flatMap { case (name, _) =>
      val (a, b) = (small(name), big(name))
      if (a.isFinite && b.isFinite && a > 0)
        Some(name -> b / a)
      else None
    }
    val flagged = ratios.collect {
      case (name, r) if r > flagFactor * dataRatio && big(name) > floorSec => name
    }
    val failed = names.map(_._1).filter(n => !small(n).isFinite || !big(n).isFinite)
    val rJson = ratios.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val tJson = ratios.map { case (k, _) =>
      "\"" + k + "\":[" + fmt(small(k)) + "," + fmt(big(k)) + "]" }.mkString("{", ",", "}")
    val fJson = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"scaling","data_ratio":$dataRatio,"flag_factor":$flagFactor,"floor_sec":$floorSec,"rounds":$rounds,"sf_small":"$sfSmall","sf_big":"$sfBig","ratios":$rJson,"times":$tJson,"flagged":$fJson,"failed":$failJson}""")
    println(s"""{"metric":"scaling_summary","n_queries":${names.size},"n_flagged":${flagged.size},"flagged":$fJson,"failed":$failJson}""")
    spark.stop()
  }
}
