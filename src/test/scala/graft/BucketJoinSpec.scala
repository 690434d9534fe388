package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing as the co-located-join strategy (SURVEY §2.5 skew/
  * partitioning): writing both fact tables bucketed on the join key
  * lets every subsequent join on that key run with ZERO exchanges —
  * the technique that turns the repeated orders⋈lineitem shuffle into
  * a one-time layout cost at 100 TB. Asserted on the physical plan, not
  * assumed. */
class BucketJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero shuffle exchanges and identical results") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the assertion exercises bucketing, not a
    // trivially shuffle-free broadcast join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.format("parquet").bucketBy(8, "o_orderkey")
        .option("path", s"$wh/orders").mode("overwrite").saveAsTable("g_orders_bkt")
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.format("parquet").bucketBy(8, "l_orderkey")
        .option("path", s"$wh/lineitem").mode("overwrite").saveAsTable("g_lineitem_bkt")

      val bucketed = spark.table("g_orders_bkt")
        .join(spark.table("g_lineitem_bkt"), col("o_orderkey") === col("l_orderkey"))
      val plan = bucketed.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle either side:\n$plan")

      val expected = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(bucketed.count() == expected && expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_bkt")
    }
  }
}
