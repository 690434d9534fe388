package graft

import org.apache.spark.sql.functions._

/** Guards for the r20 gate-liveness audit (graft.Liveness): the probe
  * declarations are structurally sound, every declared probe HOLDS at
  * the test SF, and — the audit's reason to exist — the tool
  * mechanically re-derives the three r19 vacuity catches (ns_except
  * empty-vs-empty, ns_dedup_exact with zero duplicate groups,
  * ns_dedup_cluster with zero non-self edges) plus this round's
  * catches (ns_lang_id constant argmax, ns_quality_classifier constant
  * keep) from deliberately degenerate inputs, instead of a judge
  * noticing them incidentally. The full two-SF sweep runs as
  * `runMain graft.Liveness LIVENESS_r20.json sf0.01 sf0.1`. */
class LivenessSpec extends SparkSpec {

  private def probed = Registry.all.filter(_.liveness.nonEmpty)

  test("probe declarations: labels unique per key, SQL references the result view") {
    probed.foreach { q =>
      val labels = q.liveness.map(_._1)
      assert(labels.distinct.size == labels.size, s"${q.name}: duplicate probe labels")
      q.liveness.foreach { case (l, sql) =>
        assert(sql.contains("FROM r") || sql.contains("FROM r)"),
          s"${q.name}/$l: probe must read the result view r")
      }
    }
    // the audit has real coverage: the branch-probe surface spans the
    // decode, ingest, relational, agg, dedup, curation and streaming
    // families (≥ 20 keys), not a token pair
    assert(probed.size >= 20, s"probe surface shrank: ${probed.size} keys")
  }

  test("every constOk exemption names a column its key actually emits") {
    // the ledger can't reference a key the registry doesn't declare…
    val names = Registry.all.map(_.name).toSet
    val ghostKeys = ConstExemptions.byKey.keySet -- names
    assert(ghostKeys.isEmpty, s"exemption ledger names unknown keys: $ghostKeys")
    // …nor a column the key doesn't emit, nor an empty reason
    Registry.all.filter(_.constOk.nonEmpty).foreach { q =>
      val cols = q.fn(spark, sfDir).schema.fieldNames.toSet
      val ghost = q.constOk.keySet -- cols
      assert(ghost.isEmpty, s"${q.name}: constOk names missing columns $ghost")
      q.constOk.values.foreach(reason =>
        assert(reason.trim.nonEmpty, s"${q.name}: empty constOk reason"))
    }
  }

  test("every declared branch probe holds at sf0.001") {
    Liveness.registerBaseTables(spark, sfDir)
    val bad = probed.flatMap { q =>
      val rep = Liveness.auditOne(spark, q, sfDir)
      rep.probes.collect { case (l, false) => s"${q.name}/$l" } ++
        rep.error.map(e => s"${q.name}: $e")
    }
    assert(bad.isEmpty, s"failing probes: ${bad.mkString(", ")}")
  }

  test("r19 catch re-derived: an empty result (the ns_except empty-vs-empty form) is flagged") {
    import spark.implicits._
    val degenerate = QueryDef("ns_fake_except",
      (_, _) => Seq.empty[Long].toDF("c_custkey"), None)
    val rep = Liveness.check(spark, degenerate, degenerate.fn(spark, sfDir))
    assert(rep.emptyResult && rep.flagged,
      "an empty result must flag — the r19 ns_except gate sat green on exactly this")
  }

  test("r19 catch re-derived: a duplicate-free corpus fails the dedup probes") {
    import spark.implicits._
    Liveness.registerBaseTables(spark, sfDir)
    // ns_dedup_exact WITHOUT the overlay: every group is a singleton
    val noDups = Tables.documents(spark, sfDir)
      .withColumn("text_hash", md5(lower(col("text")).cast("binary")))
      .groupBy("text_hash")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    val exact = Registry.all.find(_.name == "ns_dedup_exact").get
    val repExact = Liveness.check(spark, exact, noDups)
    assert(repExact.probes.exists { case (l, ok) =>
      l == "duplicate_groups_exist" && !ok },
      s"the keep-one-of-many probe must fail on a dup-free corpus: ${repExact.probes}")
    // ns_dedup_cluster WITHOUT the overlay: labels never move
    val selfLabels = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
    val cluster = Registry.all.find(_.name == "ns_dedup_cluster").get
    val repCluster = Liveness.check(spark, cluster, selfLabels)
    assert(repCluster.probes.exists { case (l, ok) =>
      l == "labels_propagate" && !ok },
      s"the propagation probe must fail when no label moves: ${repCluster.probes}")
  }

  test("r20 catch re-derived: a constant prediction column is flagged generically") {
    // ns_lang_id BEFORE this round's marker overlay: pred_lang was the
    // constant 'en' and the four non-en scores were constant zero —
    // the generic no-constant-column check must flag that shape even
    // with no probe declared
    val vacuous = QueryDef("ns_fake_lang_id",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        lit(0L).as("s_de"), lit("en").as("pred_lang")), None)
    val rep = Liveness.check(spark, vacuous, vacuous.fn(spark, sfDir))
    assert(rep.constCols.toSet == Set("s_de", "pred_lang") && rep.flagged,
      s"constant columns must flag: $rep")
    // …and a declared constOk exemption (with a reason) is honored
    val exempted = vacuous.copy(constOk = Map(
      "s_de" -> "test exemption", "pred_lang" -> "test exemption"))
    val rep2 = Liveness.check(spark, exempted, exempted.fn(spark, sfDir))
    assert(!rep2.flagged && rep2.constExempt.toSet == Set("s_de", "pred_lang"),
      s"exempted constants must report, not flag: $rep2")
  }

  test("fixed this round, now live: lang_id predicts all five languages, classifier keeps and drops, gopher rules all fire") {
    Liveness.registerBaseTables(spark, sfDir)
    Seq("ns_lang_id", "ns_quality_classifier", "ns_quality_gopher",
      "ns_semi_anti", "np_geoip_join", "np_geoip_bucketed").foreach { name =>
      val q = Registry.all.find(_.name == name).get
      val rep = Liveness.auditOne(spark, q, sfDir)
      assert(rep.probes.nonEmpty && rep.probes.forall(_._2),
        s"$name probes not green: ${rep.probes} ${rep.error}")
    }
  }
}
