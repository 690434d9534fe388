package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.{ScoredItem, TopKByScore}

/** The bounded top-k Aggregator must agree exactly with the window
  * row_number formulation it replaces (ORDER BY score DESC, id ASC),
  * including tie-breaks — on adversarial data with heavy score ties. */
class TopKSpec extends SparkSpec {

  test("aggregator top-k == window row_number top-k on 5000 rows with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, math.floor(rnd.nextDouble() * 20) / 20.0)
    }
    val df = rows.toDF("grp", "id", "score").repartition(8)

    val k = 5
    val topk = udaf(new TopKByScore(k))
    val viaAgg = df.groupBy("grp")
      .agg(topk(col("id"), col("score")).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), col("col.id").as("id"), (col("pos") + 1).as("rank"))

    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).select(col("grp"), col("id"), col("rank").cast("long"))

    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("merge respects the bound and ordering across partial buffers") {
    val agg = new TopKByScore(3)
    val left = Seq(ScoredItem(1, 0.9), ScoredItem(2, 0.5), ScoredItem(3, 0.4))
    val right = Seq(ScoredItem(4, 0.9), ScoredItem(5, 0.7), ScoredItem(6, 0.1))
    val merged = agg.merge(left, right)
    assert(merged == Seq(ScoredItem(1, 0.9), ScoredItem(4, 0.9), ScoredItem(5, 0.7)))
  }
}
