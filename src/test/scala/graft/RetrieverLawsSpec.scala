package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.RetrieverTree
import graft.ops.RetrieverTree._

/** Property laws for the retriever-tree compiler: for ARBITRARY trees
  * (every node type, random shapes/depths/windows), the compiled page
  * honors the node contracts the hand-picked RetrieverSpec cases can't
  * exhaust — |page| ≤ window, no duplicate ids, scores non-increasing
  * with id tie-break, and rule-pinned ids leading in pin order. Guards
  * the compiler against regressions when future node types land. */
class RetrieverLawsSpec extends SparkSpec {

  private val terms = Seq("spark", "data", "merge", "window", "sort")
  private val leaf: Gen[Retriever] = Gen.oneOf(
    for { t <- Gen.oneOf(terms); w <- Gen.chooseNum(3, 20) } yield RStandard(t, w),
    for { q <- Gen.chooseNum(0L, 15L); w <- Gen.chooseNum(3, 20) } yield RKnn(q, w))

  private def tree(depth: Int): Gen[Retriever] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for {
        n <- Gen.chooseNum(2, 3)
        cs <- Gen.listOfN(n, tree(depth - 1))
        w <- Gen.chooseNum(3, 15)
      } yield RRrf(cs.toSeq, w)),
      1 -> (for {
        cs <- Gen.listOfN(2, tree(depth - 1))
        ws <- Gen.listOfN(2, Gen.chooseNum(1, 9))
        w <- Gen.chooseNum(3, 15)
      } yield RLinear(cs.toSeq.zip(ws.map(_ / 10.0)), w)),
      1 -> (for {
        c <- tree(depth - 1); t <- Gen.oneOf(terms)
        w <- Gen.chooseNum(3, 12)
      } yield RRerank(c, t, w)),
      1 -> (for {
        c <- tree(depth - 1); t <- Gen.oneOf(terms)
        qw <- Gen.chooseNum(0, 10); rw <- Gen.chooseNum(0, 10)
        w <- Gen.chooseNum(3, 12)
      } yield RRescorer(c, t, qw / 10.0, rw / 10.0, w)),
      1 -> (for {
        c <- tree(depth - 1)
        // some pins deliberately name ids beyond the corpus (doc_id <
        // 500 at sf0.001): ES query-rules pinned documents that don't
        // exist are simply ABSENT from the hits, never fabricated
        pins <- Gen.listOfN(2, Gen.oneOf(
          Gen.chooseNum(0L, 30L), Gen.chooseNum(100000L, 100030L)))
        w <- Gen.chooseNum(3, 12)
      } yield RRule(pins.toSeq.distinct, c, w)))

  test("any tree: page ≤ window, distinct ids, scores non-increasing, pins lead") {
    var seed = Seed(23L)
    (1 to 12).foreach { _ =>
      val r = tree(2).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val rows = RetrieverTree.compile(spark, sfDir, r).collect()
      assert(rows.length <= r.window, s"page overflow for $r")
      val ids = rows.map(_.getLong(0)).toSeq
      assert(ids.distinct == ids, s"duplicate ids for $r")
      val scores = rows.map(_.getDouble(1)).toSeq
      assert(scores == scores.sorted.reverse, s"scores not descending for $r")
      // equal scores tie-break ascending by id
      rows.sliding(2).foreach {
        case Array(a, b) if a.getDouble(1) == b.getDouble(1) =>
          assert(a.getLong(0) < b.getLong(0), s"tie-break violated for $r")
        case _ => ()
      }
      r match {
        case RRule(pins, _, w) =>
          // only pins that EXIST in the corpus surface (the ES
          // query-rules contract); existing ones lead in pin order
          val existing = pins.filter(_ < 500L)
          val lead = rows.take(math.min(existing.length, w)).map(_.getLong(0)).toSeq
          assert(lead == existing.take(w), s"existing pins not leading for $r")
          val ghost = pins.filter(_ >= 500L).toSet
          assert(ids.forall(!ghost.contains(_)),
            s"nonexistent pinned id fabricated into the page for $r")
        case _ => ()
      }
    }
  }
}
