package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.TextOps

/** Properties behind the text-dedup operators' implementation tricks. */
class TextOpsSpec extends SparkSpec {

  // The codegen-friendly regexp shingler must agree with the definitional
  // split-based form it replaced (TextOps.shingles3 doc) on single-space
  // tokenized text.
  private val token: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  private val sentence: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))

  test("shingles3 equals the split-based 3-shingle definition (200 scalacheck strings)") {
    import spark.implicits._
    var seed = Seed(42L)
    val texts = (1 to 200).map { _ =>
      val t = sentence.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      t
    }
    texts.foreach { text =>
      val Array(byRegex, bySplit) = Seq(text).toDF("text")
        .withColumn("t", split(trim(col("text")), " "))
        .select(
          TextOps.shingles3(trim(col("text"))).as("a"),
          when(size(col("t")) >= 3, expr(
            "transform(sequence(1, size(t)-2), i -> concat(element_at(t,i), ' ', element_at(t,i+1), ' ', element_at(t,i+2)))"))
            .otherwise(expr("CAST(array() AS ARRAY<STRING>)")).as("b"))
        .as[(Seq[String], Seq[String])]
        .collect()
        .flatMap(r => Array(r._1, r._2))
      assert(byRegex == bySplit, s"text=<$text>")
    }
  }

  test("salted skew join result equals the plain join (identity of the rewrite)") {
    import spark.implicits._
    val salted = SparkEntry.queries("ns_join_skew_salted")(spark, sfDir)
      .as[(String, Long)].collect().sortBy(_._1)
    val plain = Tables.events(spark, sfDir)
      .select(col("event_id"),
        when(col("user_id") % 4 < 3, lit(0))
          .otherwise(col("user_id") % 25).cast("int").as("nk"))
      .join(Tables.nation(spark, sfDir), col("nk") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_events"))
      .as[(String, Long)].collect().sortBy(_._1)
    assert(salted.nonEmpty && (salted sameElements plain))
  }

  test("native SimHashBits equals the explode-×16 SQL formulation bit-for-bit") {
    import spark.implicits._
    val nat = SparkEntry.queries("ns_dedup_simhash")(spark, sfDir)
      .as[(Long, Long)].collect().sortBy(_._1)
    // the definitional shape the expression replaced (and the DuckDB
    // oracle still runs): explode tokens ×16 bit positions, ±1 majority
    // vote per bit, re-assemble the signature
    val sql = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
      .withColumn("h", expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)"))
      .select(col("doc_id"), col("h"), explode(expr("sequence(0, 15)")).as("j"))
      .groupBy("doc_id", "j")
      .agg(sum(expr("CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END")).as("w"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN w >= 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END")).as("simhash"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(nat.length == 500 && nat.sameElements(sql))
  }

  test("bounded_bucket: ≤ cap ids kept sorted, over-cap buckets drop whole across merges") {
    import spark.implicits._
    val df = Seq((1L, "a"), (3L, "a"), (2L, "a"), (9L, "d"), (8L, "d"), (7L, "c"))
      .toDF("id", "k")
    val out = df.repartition(4) // force partial buffers + merge
      .groupBy("k")
      .agg(graft.expr.TextFunctions.bounded_bucket(col("id"), 2).as("ds"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
    assert(out("a").isEmpty, "3 members > cap=2 must drop the bucket whole")
    assert(out("d").contains(Seq(8L, 9L)), "at-cap bucket keeps all ids, sorted")
    assert(out("c").contains(Seq(7L)))
  }

  test("min-label propagation contract: K rounds converge diameter ≤ K; fixpoint is stable") {
    import spark.implicits._
    // a diameter-5 chain 0–1–2–3–4–5 plus a detached pair 10–11
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val nodes = ((0L to 5L) ++ Seq(10L, 11L)).toDF("node_id")
    def run(k: Int): Map[Long, Long] = TextOps.minLabelPropagate(nodes, edges, k)
      .as[(Long, Long)].collect().toMap
    // after the production K (3): min labels have traveled exactly K hops
    // — the documented partial-convergence contract for longer chains
    val k3 = run(TextOps.propagationRounds)
    assert(k3 == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L,
      10L -> 10L, 11L -> 10L))
    // K = diameter converges the chain; one more round changes nothing
    val k5 = run(5)
    assert((0L to 5L).forall(k5(_) == 0L) && k5(10L) == 10L && k5(11L) == 10L)
    assert(run(6) == k5, "converged labels must be a fixpoint")
  }

  test("minhash band cap drops whole buckets deterministically") {
    // Two runs of the capped query produce identical row sets.
    val q = SparkEntry.queries("ns_dedup_minhash")
    val r1 = q(spark, sfDir).collect().map(_.toSeq).sortBy(_.toString)
    val r2 = q(spark, sfDir).collect().map(_.toSeq).sortBy(_.toString)
    assert(r1.nonEmpty && r1.sameElements(r2))
  }

  test("dedup pipeline contract: exact dups cluster, normalization-only variants cluster, distinct docs keep") {
    import spark.implicits._
    val q = SparkEntry.queries("ns_dedup_pipeline")
    val out = q(spark, sfDir)
      .as[(Long, Long, Boolean)].collect()
    val byDoc = out.map(t => t._1 -> ((t._2, t._3))).toMap
    // one row per document, keep ⟺ doc is its cluster's min label
    assert(out.length == byDoc.size, "exactly one row per doc")
    out.foreach { case (id, cl, keep) =>
      assert(cl <= id, s"cluster label must be a min label, got $cl for $id")
      assert(keep == (cl == id))
    }
    // the kept set is exactly one doc per cluster
    val clusters = out.groupBy(_._2)
    clusters.foreach { case (cl, members) =>
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == cl)
    }
    // the corpus carries near-dups (ns_dedup_minhash finds candidate
    // pairs on it) — some cluster must have >1 member
    assert(clusters.exists(_._2.length > 1),
      "corpus near-dups must produce at least one multi-member cluster")
    // normalization-equal docs (case/punct-only variants, which include
    // any exact duplicates) share every band and have J = 1 — they must
    // cluster whenever the corpus has them
    val variantGroups = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")).as("n"))
      .groupBy("n").agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select("ids").as[Seq[Long]].collect()
    variantGroups.foreach { ids =>
      assert(ids.map(byDoc(_)._1).distinct.size == 1,
        s"normalization-equal docs $ids must share a cluster")
    }
  }

  test("pii scrub contract: planted pii redacts to placeholders, counts match the plant, no false positives") {
    import spark.implicits._
    val out = SparkEntry.queries("ns_text_pii_scrub")(spark, sfDir)
      .as[(Long, String, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, scrubbed, nPii) =>
      val expected = (if (id % 2 == 0) 1 else 0) + (if (id % 3 == 0) 1 else 0) +
        (if (id % 5 == 0) 1 else 0)
      assert(nPii == expected,
        s"doc $id: counted $nPii, planted $expected — a false positive or miss")
      assert(scrubbed.contains("<EMAIL>") == (id % 2 == 0))
      assert(scrubbed.contains("<IP>") == (id % 3 == 0))
      assert(scrubbed.contains("<ID>") == (id % 5 == 0))
      assert(!scrubbed.contains("@") && !scrubbed.contains("example.com"),
        s"doc $id: an email survived scrubbing")
      assert(!scrubbed.matches(".*\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}.*"),
        s"doc $id: an IPv4 survived scrubbing")
    }
  }

  /** Independent recomputation of TextOps' md5 split bucket (8 hex
    * digits % mod — keep in lockstep with hashBucketOn). */
  private def md5Bucket(key: Long, mod: Int = 100): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.toString.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % mod
  }

  test("leakage-safe split contract: duplicate clusters never straddle splits, proportions sane") {
    import spark.implicits._
    val out = SparkEntry.queries("ns_split_leakage_safe")(spark, sfDir)
      .as[(Long, Long, String)].collect()
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(out.length == n, "one row per document")
    // the contamination guarantee: every member of a cluster carries the
    // SAME split — no exact duplicate can sit in train while its copy
    // sits in test
    out.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cl straddles splits: ${members.map(_._3).distinct.toSeq}")
    }
    // the split derives from the CLUSTER id alone (this corpus has no
    // exact dups at test scale, so assert the rule mechanically rather
    // than relying on a multi-member cluster existing): recompute each
    // doc's split from its cluster_id and require equality
    out.foreach { case (id, cl, split) =>
      val bkt = md5Bucket(cl)
      val want = if (bkt < 80) "train" else if (bkt < 90) "val" else "test"
      assert(split == want, s"doc $id cluster $cl: split $split != $want from cluster hash")
    }
    val frac = out.count(_._3 == "train").toDouble / n
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac out of band")
  }

  test("near-dup leakage split: near-identical (not byte-identical) copies land on one side") {
    import spark.implicits._
    val out = SparkEntry.queries("ns_split_leakage_near")(spark, sfDir)
      .as[(Long, Long, String)].collect()
    assert(out.length == graft.Tables.documents(spark, sfDir).count(), "one row per document")
    // every cluster — including near-dup clusters the exact-dup split
    // cannot see — carries exactly one split
    out.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cl straddles splits: ${members.map(_._3).distinct.toSeq}")
    }
    // the guarantee is about NEAR-identical copies: some multi-member
    // cluster must contain documents whose raw texts differ (byte-level)
    // — otherwise this test degenerates to the exact-dup twin's
    val texts = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val nearClusters = out.groupBy(_._2).values
      .filter(m => m.length > 1 && m.map(t => texts(t._1)).distinct.length > 1)
    assert(nearClusters.nonEmpty,
      "the corpus must exercise a near-dup (non-byte-identical) cluster")
    // and the split key is the cluster id, nothing else: recompute
    out.foreach { case (id, cl, split) =>
      val bkt = md5Bucket(cl)
      val want = if (bkt < 80) "train" else if (bkt < 90) "val" else "test"
      assert(split == want, s"doc $id cluster $cl: split $split != $want from cluster hash")
    }
  }

  test("chunking contract: full coverage, no chunk fully contained in its predecessor") {
    import spark.implicits._
    val W = 32; val S = 24
    val out = SparkEntry.queries("ns_text_chunk")(spark, sfDir)
      .as[(Long, Long, String, Long)].collect()
    val nTokens = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(trim(col("text")), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == nTokens.keySet, "every document chunks — short ones too")
    byDoc.foreach { case (id, chunks) =>
      val n = nTokens(id)
      chunks.foreach { case (_, idx, _, len) =>
        val start = idx * S + 1
        // a chunk after the first must extend past its predecessor's
        // end — the old formula emitted a fully-contained tail chunk
        // for every doc with n % S in [1, W - S]
        if (idx > 0) assert(start + len - 1 > (idx - 1) * S + W,
          s"doc $id chunk $idx adds no new tokens (n=$n)")
        assert(len == math.min(W, n - start + 1))
      }
      // coverage: the last chunk reaches the last token
      val maxEnd = chunks.map { case (_, idx, _, len) => idx * S + len }.max
      assert(maxEnd == n, s"doc $id: tokens ${maxEnd + 1}..$n dropped")
      // contiguous chunk indexes from 0
      assert(chunks.map(_._2).sorted.toSeq == (0L until chunks.length).toSeq)
    }
  }

  test("piiCount of a null message is 0, not null") {
    import spark.implicits._
    val r = Seq((1L, Option.empty[String]), (2L, Some("mail a@b.co x")))
      .toDF("doc_id", "message")
      .select(col("doc_id"), graft.ops.TextOps.piiCount(col("message")).as("n_pii"))
      .as[(Long, Long)].collect().toMap
    assert(r(1L) == 0L, "a document without a message carries no PII")
    assert(r(2L) == 1L)
  }

  test("incremental dedup contract: one row per new doc, dups point into the corpus, straddling exact dups flagged") {
    import spark.implicits._
    val out = SparkEntry.queries("ns_dedup_incremental")(spark, sfDir)
      .as[(Long, Option[Long], Boolean)].collect()
    val byDoc = out.map(t => t._1 -> t).toMap
    val nNew = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0).count()
    assert(out.length == nNew && byDoc.size == out.length,
      "exactly one row per new-slice document")
    out.foreach { case (id, dupOf, isUnique) =>
      assert(id % 5 == 0, s"row for a non-new doc $id")
      assert(isUnique == dupOf.isEmpty)
      // only corpus docs can be canonical duplicates — never another
      // new doc, never itself
      dupOf.foreach(d => assert(d % 5 != 0 && d != id,
        s"dup_of $d for $id must point into the corpus"))
    }
    // the corpus exercises the path at all
    assert(out.exists(!_._3), "the slice must find at least one duplicate")
    // identical-text pairs straddling the split have J = 1 and share
    // every band — each such new doc must be flagged (a capped bucket
    // could in principle drop one, but identical groups here are tiny)
    val straddling = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), trim(col("text")).as("t"))
      .filter(size(split(col("t"), " ")) >= 3)
      .groupBy("t").agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select("ids").as[Seq[Long]].collect()
      .filter(ids => ids.exists(_ % 5 == 0) && ids.exists(_ % 5 != 0))
    straddling.foreach { ids =>
      ids.filter(_ % 5 == 0).foreach { id =>
        assert(byDoc(id)._2.nonEmpty,
          s"new doc $id has an exact corpus twin in $ids and must be flagged")
      }
    }
  }

  test("mixture sampling contract: thresholds capped, anti-monotone in language count, low-resource kept whole") {
    val corpus = Tables.documents(spark, sfDir)
    val counts = corpus.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val thr = SparkEntry.queries("ns_sample_mixture")(spark, sfDir)
      .select("lang", "thr").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    thr.foreach { case (l, t) =>
      assert(t > 0 && t <= 10000, s"$l threshold $t out of range")
      // K=8: a language with ≤ 64 docs has rate 8/sqrt(cnt) ≥ 1 → kept whole
      if (counts(l) <= 64) assert(t == 10000, s"low-resource $l must be availability-capped at keep-all, got $t")
    }
    for ((a, ca) <- counts; (b, cb) <- counts if ca > cb && thr.contains(a) && thr.contains(b))
      assert(thr(a) <= thr(b),
        s"rate must not increase with resource count: $a($ca)=${thr(a)} vs $b($cb)=${thr(b)}")
  }

  test("shard order contract: shards partition the corpus, ord is contiguous from 1 per shard") {
    val out = SparkEntry.queries("ns_shard_order")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val total = Tables.documents(spark, sfDir).count()
    assert(out.length == total, "every document gets exactly one shard slot")
    assert(out.map(_._1).distinct.length == total, "doc_ids must be unique")
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val ords = rows.map(_._3).sorted
      assert(ords.head == 1L && ords.last == rows.length.toLong &&
        ords.distinct.length == rows.length,
        s"shard $shard ord must be the contiguous range 1..${rows.length}")
    }
  }

  test("filter funnel contract: verdicts cover the corpus exactly once") {
    val out = SparkEntry.queries("ns_filter_funnel")(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(out.map(_.getLong(2)).sum == total, "funnel counts must sum to the corpus size")
    val verdicts = out.map(_.getString(1)).toSet
    assert(verdicts.subsetOf(Set("too_short", "lang_mismatch", "repetitive", "low_quality", "keep")),
      s"unknown verdicts: $verdicts")
  }

  test("percolate edge contracts: unknown terms, dup registrations, empty input") {
    import spark.implicits._
    val docs = Seq((1L, "spark join here"), (2L, "nothing relevant")).toDF("doc_id", "text")
    // a query whose term exists in no document yields no match — not an
    // error, and not a partial match for its other (present) term
    val qMissing = Seq(7L -> "spark", 7L -> "zzz_not_in_corpus")
    assert(TextOps.percolate(docs, qMissing).count() == 0L,
      "a conjunction with an unknown term must not fire")
    // duplicated registration rows must not raise the bar above what
    // any document can count (the dedupe-on-entry contract)
    val qDup = Seq(9L -> "spark", 9L -> "spark", 9L -> "join")
    val hits = TextOps.percolate(docs, qDup).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSet == Set((1L, 9L)), s"dup registration broke matching: ${hits.toSeq}")
    // an empty document batch (streaming quiet period) is a no-op
    assert(TextOps.percolate(docs.limit(0)).count() == 0L)
  }

  test("bm25 page contract: exactly top-20, positive scores, (score DESC, doc_id) order") {
    import spark.implicits._
    val out = SparkEntry.queries("ns_text_bm25")(spark, sfDir)
      .as[(Long, Double)].collect()
    assert(out.length == 20, "the page is exactly top-20")
    assert(out.forall(_._2 > 0.0), "a returned document must have positive score")
    // the declared ordering field is the score itself: the collected
    // page sorted by (-score, doc_id) must equal the collect order
    assert(out.sortBy(r => (-r._2, r._1)).toSeq == out.toSeq,
      "page must arrive in (score DESC, doc_id) order")
  }

  test("budget selection contract: a quality-rank prefix whose running total respects the budget") {
    val rows = SparkEntry.queries("ns_select_budget")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "the budget must admit at least one document")
    assert(rows.forall(_._4 <= 8000L), "no kept document may exceed the budget")
    // internal consistency: under the (qb DESC, doc_id) total order the
    // cum column IS the running sum of the kept documents' tokens —
    // i.e. the kept set is a contiguous prefix with no gaps
    val ordered = rows.sortBy(r => (-r._2, r._1))
    val running = ordered.scanLeft(0L)(_ + _._3).tail
    ordered.zip(running).foreach { case ((id, _, _, cum), expect) =>
      assert(cum == expect, s"doc $id cum $cum != running prefix $expect — the kept set has a gap")
    }
  }
}
