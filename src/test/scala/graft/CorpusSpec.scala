package graft

import org.apache.spark.sql.functions._

/** Contracts for the tokenizer-level corpus ops (ops/Corpus.scala). */
class CorpusSpec extends SparkSpec {

  /** Reference BPE application in plain Scala: greedy left-to-right per
    * merge, merges applied in table order — the semantics the chained
    * `replace` over the trailing-`|` encoding must reproduce. */
  private def refBpe(text: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = text.trim.map(_.toString).toVector
    for ((l, r) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("ns_text_bpe token counts match a reference greedy BPE on every doc") {
    val gotFull = SparkEntry.queries("ns_text_bpe")(spark, sfDir)
      .select("doc_id", "n_symbols", "n_bpe_tokens").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val ref = refBpe(text, ops.Corpus.bpeMerges)
      val refTokens = ref.count(_ != " ")
      val refSymbols = text.trim.length
      val (nSym, nTok) = gotFull(id)
      assert(nSym == refSymbols, s"doc $id: symbol count $nSym != $refSymbols")
      assert(nTok == refTokens,
        s"doc $id: bpe tokens $nTok != reference $refTokens (text: ${text.take(60)}…)")
    }
  }

  test("bpe merges strictly reduce token counts and never cross a space") {
    val df = SparkEntry.queries("ns_text_bpe")(spark, sfDir)
    val bad = df.filter(col("n_bpe_tokens") > col("n_symbols")).count()
    assert(bad == 0, "a merge increased the token count")
    // compression actually happened somewhere (the merge table is not a no-op)
    val compressed = df.filter(col("n_bpe_tokens") <
      col("n_symbols") - length(lit("")).cast("long")).count()
    assert(compressed > 0, "no document compressed — merge table never fired")
    assert(ops.Corpus.bpeMerges.forall { case (l, r) => !l.contains(" ") && !r.contains(" ") },
      "a merge pair contains the word separator")
  }

  test("ns_bpe_train learns non-space pairs with strictly positive support, ranked") {
    val rows = SparkEntry.queries("ns_bpe_train")(spark, sfDir)
      .orderBy("rank").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (l, rr, n) = (r.getAs[String]("l"), r.getAs[String]("r"), r.getAs[Long]("n"))
      assert(l.nonEmpty && rr.nonEmpty && l != " " && rr != " ", s"bad pair ($l,$rr)")
      assert(n > 0)
    }
    // the first learned merge must be at least as frequent as the second
    // was AT ITS OWN ROUND — not comparable directly — but rank 1's count
    // must dominate any LATER round's count of the same pair shape;
    // minimally: counts are positive and ranks are 1..3
    assert(rows.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
  }

  test("bpe_train: the checkpoint cadence crosses a materialization with unchanged output") {
    // 5 rounds with K=2 re-materializes the working corpus twice (after
    // rounds 2 and 4); the learned merge table must be byte-identical to
    // the never-checkpointed run — localCheckpoint bounds lineage, it
    // must not change what is learned
    val checkpointed = ops.Corpus.bpeTrain(spark, sfDir, rounds = 5, checkpointEvery = 2)
      .collect().toSeq
    val unchackpointed = ops.Corpus.bpeTrain(spark, sfDir, rounds = 5,
      checkpointEvery = Int.MaxValue).collect().toSeq
    assert(checkpointed == unchackpointed)
    assert(checkpointed.length == 5)
  }

  test("bpe_train survives empty documents (the 1-symbol split guard)") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_empty").toString
    import spark.implicits._
    Seq((1L, "abab"), (2L, ""), (3L, "   "), (4L, "ab"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val learned = ops.Corpus.bpeTrain(spark, dir, rounds = 1,
      checkpointEvery = Int.MaxValue).collect()
    assert(learned.length == 1)
    assert((learned(0).getAs[String]("l"), learned(0).getAs[String]("r")) == ("a", "b"))
    assert(learned(0).getAs[Long]("n") == 3L) // 2 in doc 1 + 1 in doc 4
  }

  test("ns_quality_classifier logit is exactly the integer feature dot product") {
    val r = SparkEntry.queries("ns_quality_classifier")(spark, sfDir)
    // recompute one doc by hand
    val doc = Tables.documents(spark, sfDir)
      .select("doc_id", "text").head()
    val t = doc.getString(1).trim.split(" ").toSeq
    val stop = Set("the", "a", "of", "and", "in", "to")
    val nWords = t.size.toLong
    val nStop = t.count(stop).toLong
    val nDup = (t.size - t.distinct.size).toLong
    val wlenPm = t.map(_.length).sum.toLong * 1000 / nWords
    val want = -2500000L + 12000L * nWords + 90000L * nStop - 45000L * nDup + 300L * wlenPm
    val got = r.filter(col("doc_id") === doc.getLong(0))
      .select("logit_micros").head().getLong(0)
    assert(got == want, s"logit mismatch: $got != $want")
  }

  test("ns_embedding_whiten output is standardized: per-dim mean ~0, var ~1") {
    val z = SparkEntry.queries("ns_embedding_whiten")(spark, sfDir)
    val stats = z.groupBy("d")
      .agg(avg(col("z_r")).as("mu"), avg(col("z_r") * col("z_r")).as("m2"))
      .collect()
    assert(stats.length == 8)
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("mu")) < 1e-3, s"dim ${r.get(0)}: mean ${r.get(1)}")
      assert(math.abs(r.getAs[Double]("m2") - 1.0) < 0.02, s"dim ${r.get(0)}: var ${r.get(2)}")
    }
  }
}
