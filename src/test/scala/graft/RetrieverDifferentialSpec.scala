package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.RetrieverTree
import graft.ops.RetrieverTree._

/** Differential check for the retriever-tree COMPILER — the
  * ParserDifferentialSpec idea applied to the other compiler where a
  * wrong answer could hide: for random trees (every node type, random
  * shapes/windows/weights), the compiled Spark pipeline must return
  * exactly the page an INDEPENDENT plain-Scala evaluator computes over
  * the collected corpus — same ids, same order, same scores. The
  * evaluator reimplements each node's contract from its spec (bar-
  * encoded tf, index-order double cosine with HALF_UP rounding, rrf's
  * 1/(k+rank), per-page min-max normalization, rescorer's weighted sum,
  * rule's childMax-derived pins with corpus-existence filtering) —
  * not by calling any engine code path. */
class RetrieverDifferentialSpec extends SparkSpec {

  private case class Doc(id: Long, text: String)
  private lazy val docs: Seq[Doc] =
    Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1))).toSeq
  private lazy val textOf: Map[Long, String] = docs.map(d => d.id -> d.text).toMap
  private lazy val embs: Seq[(Long, Array[Float])] =
    Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
  private lazy val embOf: Map[Long, Array[Float]] = embs.toMap

  // ------------------------------- independent node-contract evaluator
  private def barTf(term: String, text: String): Long = {
    val bar = "|" + text.trim.replace(" ", "||") + "|"
    val needle = s"|$term|"
    (bar.length - bar.replace(needle, "").length).toLong / needle.length
  }
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var i = 0
    while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < v.length) { val x = v(j).toDouble; s += x * x; j += 1 }
      math.sqrt(s)
    }
    val d = norm(a) * norm(b)
    if (d == 0.0) 0.0 else dot / d
  }
  private def cut(page: Seq[(Long, Double)], w: Int): Seq[(Long, Double)] =
    page.sortBy { case (id, s) => (-s, id) }.take(w)

  private def eval(r: Retriever): Seq[(Long, Double)] = r match {
    case RStandard(term, w) =>
      cut(docs.map(d => d.id -> barTf(term, d.text)).filter(_._2 > 0)
        .map { case (id, tf) => id -> tf.toDouble }, w)
    case RKnn(qid, w) =>
      val q = embOf(qid)
      cut(embs.filter(_._1 != qid)
        .map { case (id, v) => id -> round6(cosine(v, q)) }, w)
    case RRrf(children, w, k) =>
      val ranks: Seq[Map[Long, Int]] = children.map(c =>
        eval(c).zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap)
      val ids = ranks.flatMap(_.keys).distinct
      cut(ids.map(id => id -> ranks.map(
        _.get(id).map(r0 => 1.0 / (k + r0)).getOrElse(0.0)).sum), w)
    case RRerank(child, q, w) =>
      val page = eval(child).map(_._1).toSet
      val terms = q.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
      cut(docs.filter(d => page(d.id)).map(d =>
        d.id -> terms.map(t =>
          math.min(barTf(t, d.text), ops.EsqlParser.rerankTfCap)).sum.toDouble), w)
    case RRescorer(child, term, qw, rw, w) =>
      cut(eval(child).map { case (id, s) =>
        id -> (s * qw + barTf(term, textOf(id)).toDouble * rw) }, w)
    case RLinear(children, w) =>
      val normed: Seq[(Map[Long, Double], Double)] = children.map { case (c, wt) =>
        val page = eval(c)
        val (mn, mx) = (page.map(_._2).min, page.map(_._2).max)
        page.map { case (id, s) =>
          id -> (if (mx > mn) (s - mn) / (mx - mn) else 1.0) }.toMap -> wt
      }
      val ids = normed.flatMap(_._1.keys).distinct
      cut(ids.map(id =>
        id -> normed.map { case (m, wt) => m.getOrElse(id, 0.0) * wt }.sum), w)
    case RRule(pinned, child, w) =>
      val organic = eval(child).filterNot { case (id, _) => pinned.contains(id) }
      val mx = if (organic.isEmpty) 0.0 else organic.map(_._2).max
      val pins = pinned.zipWithIndex
        .filter { case (id, _) => textOf.contains(id) } // existence contract
        .map { case (id, i) => id -> (mx + (pinned.length - i).toDouble) }
      cut(organic ++ pins, w)
  }

  // ------------------------------------------------ random tree source
  private val terms = Seq("spark", "data", "merge", "window", "sort")
  private val leaf: Gen[Retriever] = Gen.oneOf(
    for { t <- Gen.oneOf(terms); w <- Gen.chooseNum(3, 20) } yield RStandard(t, w),
    for { q <- Gen.chooseNum(0L, 15L); w <- Gen.chooseNum(3, 20) } yield RKnn(q, w))
  private def tree(depth: Int): Gen[Retriever] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for { n <- Gen.chooseNum(2, 3); cs <- Gen.listOfN(n, tree(depth - 1))
                  w <- Gen.chooseNum(3, 15) } yield RRrf(cs.toSeq, w)),
      1 -> (for { cs <- Gen.listOfN(2, tree(depth - 1))
                  ws <- Gen.listOfN(2, Gen.chooseNum(1, 9))
                  w <- Gen.chooseNum(3, 15) }
        yield RLinear(cs.toSeq.zip(ws.map(_ / 10.0)), w)),
      1 -> (for { c <- tree(depth - 1); t <- Gen.oneOf(terms)
                  w <- Gen.chooseNum(3, 12) } yield RRerank(c, t, w)),
      1 -> (for { c <- tree(depth - 1); t <- Gen.oneOf(terms)
                  qw <- Gen.chooseNum(0, 10); rw <- Gen.chooseNum(0, 10)
                  w <- Gen.chooseNum(3, 12) }
        yield RRescorer(c, t, qw / 10.0, rw / 10.0, w)),
      1 -> (for { c <- tree(depth - 1)
                  pins <- Gen.listOfN(2, Gen.oneOf(
                    Gen.chooseNum(0L, 30L), Gen.chooseNum(100000L, 100030L)))
                  w <- Gen.chooseNum(3, 12) } yield RRule(pins.toSeq.distinct, c, w)))

  private def check(r: Retriever): Unit = {
    val got = RetrieverTree.compile(spark, sfDir, r).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toSeq
      .sortBy { case (id, s) => (-s, id) }
    val want = eval(r)
    assert(got.map(_._1) == want.map(_._1),
      s"id set/order diverged for $r\n got=${got.take(15)}\n want=${want.take(15)}")
    got.zip(want).foreach { case ((id, gs), (_, ws)) =>
      assert(math.abs(gs - ws) < 1e-9,
        s"score diverged for doc $id in $r: engine=$gs evaluator=$ws")
    }
  }

  test("random depth-3 trees: compiled page == independent evaluator page (ids, order, scores)") {
    // 100 seeds at depth 3: compound-over-compound-over-compound shapes
    // (rrf-of-linear-of-rescorer and every other nesting ES accepts)
    // reach the compiler paths the r15 depth-2 run could not
    var seed = Seed(31L)
    (1 to 100).foreach { _ =>
      val r = tree(3).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      check(r)
    }
  }

  test("directed nestings: rescorer-over-linear and rule-over-rrf (the ES-accepted pairs)") {
    // the two nestings the r15 review called out as untested — random
    // generation reaches them only by chance; pin them deterministically
    // across a seed sweep of shapes/weights/windows
    val rescorerOverLinear: Gen[Retriever] = for {
      cs <- Gen.listOfN(2, tree(1))
      ws <- Gen.listOfN(2, Gen.chooseNum(1, 9))
      wl <- Gen.chooseNum(4, 15)
      t <- Gen.oneOf(terms)
      qw <- Gen.chooseNum(0, 10); rw <- Gen.chooseNum(1, 10)
      w <- Gen.chooseNum(3, 10)
    } yield RRescorer(RLinear(cs.toSeq.zip(ws.map(_ / 10.0)), wl), t, qw / 10.0, rw / 10.0, w)
    val ruleOverRrf: Gen[Retriever] = for {
      n <- Gen.chooseNum(2, 3)
      cs <- Gen.listOfN(n, tree(1))
      wr <- Gen.chooseNum(4, 15)
      pins <- Gen.listOfN(2, Gen.oneOf(
        Gen.chooseNum(0L, 30L), Gen.chooseNum(100000L, 100030L)))
      w <- Gen.chooseNum(3, 10)
    } yield RRule(pins.toSeq.distinct, RRrf(cs.toSeq, wr), w)
    var seed = Seed(77L)
    (1 to 8).foreach { _ =>
      check(rescorerOverLinear.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
      check(ruleOverRrf.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
}
