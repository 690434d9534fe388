package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftshim.{TopKBuf, TopKByScoreAgg}

/** The bounded top-k aggregate must agree exactly with the window
  * row_number formulation it replaces (ORDER BY score DESC, id ASC),
  * including tie-breaks — on adversarial data with heavy score ties. */
class TopKSpec extends SparkSpec {

  test("aggregate top-k == window row_number top-k on 5000 rows with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, math.floor(rnd.nextDouble() * 20) / 20.0)
    }
    val df = rows.toDF("grp", "id", "score").repartition(8)

    val k = 5
    val viaAgg = df.groupBy("grp")
      .agg(graft.expr.VecFunctions.topk_by_score(col("id"), col("score"), k).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), col("col.id").as("id"), (col("pos") + 1).as("rank"))

    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).select(col("grp"), col("id"), col("rank").cast("long"))

    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("merge respects the bound and ordering across partial buffers") {
    val agg = TopKByScoreAgg(Cols.expr(lit(0L)), Cols.expr(lit(0.0)), 3)
    def buf(items: (Long, Double)*): TopKBuf = {
      val b = agg.createAggregationBuffer()
      items.foreach { case (id, s) => b.insert(id, s, 3) }
      b
    }
    val merged = agg.merge(
      buf((1L, 0.9), (2L, 0.5), (3L, 0.4)),
      buf((4L, 0.9), (5L, 0.7), (6L, 0.1)))
    val got = (0 until merged.len).map(i => (merged.ids(i), merged.scores(i)))
    assert(got == Seq((1L, 0.9), (4L, 0.9), (5L, 0.7)))
  }

  test("serialize/deserialize round-trips partial buffers exactly") {
    val agg = TopKByScoreAgg(Cols.expr(lit(0L)), Cols.expr(lit(0.0)), 4)
    val b = agg.createAggregationBuffer()
    Seq((9L, 0.1), (2L, 0.8), (7L, 0.8), (1L, 0.3)).foreach { case (id, s) =>
      b.insert(id, s, 4)
    }
    val rt = agg.deserialize(agg.serialize(b))
    assert((0 until rt.len).map(i => (rt.ids(i), rt.scores(i))) ==
      (0 until b.len).map(i => (b.ids(i), b.scores(i))))
    assert(rt.ids.take(rt.len).toSeq == Seq(2L, 7L, 1L, 9L))
  }
}
