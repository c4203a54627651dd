package graft

/** The skew-guard observe metrics, end to end: the gate queries whose
  * oracles are exhaustive must drop ZERO buckets on their gate corpora
  * (q24/q25/q29/q33/q49/q51 recall claims rest on that), and the
  * listener must actually SEE a drop when one happens.
  */
class GuardMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** session is shared across suites: restore the AQE rule exclusion
    * after each test so other suites see default planning */
  private def withGuardPlanning[A](body: => A): A = {
    val key = "spark.sql.adaptive.optimizer.excludedRules"
    val saved = spark.conf.getOption(key)
    GuardMetrics.excludeEmptyRelationRule(spark)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("gate corpora run drop-free through every candidate guard") {
    assume(new java.io.File(sfDir).isDirectory)
    val guards = GuardMetrics.register(spark)
    // without the rule exclusion, a query whose guard drops EVERYTHING
    // would lose its metric node to AQE empty propagation and pass
    // vacuously
    try withGuardPlanning {
      for (q <- Seq("q24_minhash_neardup", "q25_simhash_neardup",
          "q29_ngram_jaccard", "q33_cosine_neardup",
          "q49_cross_contamination", "q50_curate",
          "q51_containment_decontam", "q62_contamination_report",
          "q63_split_leakage", "q68_hot_bucket_rescue",
          "q69_cosine_rescue", "q70_semantic_rescue",
          "q71_ngram_rescue", "q72_simhash_rescue")) {
        // noop write, not count(): count() lets the optimizer DELETE
        // a left join whose (unique-keyed, unreferenced) right side
        // carries the guard metrics — q62's report shape — and the
        // pruned subtree never emits; the write consumes every column,
        // like Verify's parquet dump
        SparkEntry.queries(q)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val drained = guards.drain()
        assert(drained.nonEmpty, s"$q emitted no guard metrics")
        // rescue reroutes (graft_*_rescue_*) are recall-PRESERVING and
        // expected non-zero on q68's planted corpus; only drops fail
        val nonZero = drained.filter { case (k, v) =>
          v != 0L && k.contains("_guard_") }
        assert(nonZero.isEmpty, s"$q dropped buckets: $nonZero")
        spark.catalog.clearCache()
      }
    } finally spark.listenerManager.unregister(guards)
  }

  test("hot-bucket rescue keeps near-dup recall with the guard ON") {
    val guards = GuardMetrics.register(spark)
    try withGuardPlanning {
      // 1000 byte-identical boilerplate copies + 5 distinct docs. Every
      // band bucket holding the copy cluster blows maxBucket = 50, so
      // the plain guard drops it and finds NOTHING; the rescue path
      // must collapse the cluster to star pairs, keep exactly one
      // representative, and report the reroute through the metric.
      val boiler = (0L until 1000L).map(i =>
        (i, "the quick brown fox jumps over the lazy dog again and again"))
      val distinctDocs = (0L until 5L).map(i =>
        (5000L + i, s"unique document number $i with its own words ".repeat(3)))
      val docs = (boiler ++ distinctDocs).toDF("doc_id", "text")
      val guarded = operators.Dedup.minhashNearDups(docs, "doc_id", "text",
        numHashes = 128, bands = 32, threshold = 0.8, wordGrams = 3,
        maxBucket = 50)
      assert(guarded.count() == 0L,
        "without rescue the hot cluster must be dropped (the guard bites)")
      guards.drain(settleMs = 2000L) // discard the no-rescue run's drops
      val rescued = operators.Dedup.minhashNearDups(docs, "doc_id", "text",
        numHashes = 128, bands = 32, threshold = 0.8, wordGrams = 3,
        maxBucket = 50, rescueHot = true)
      val kept = operators.Dedup.dropNearDups(docs, rescued, "doc_id")
        .select("doc_id").as[Long].collect().sorted
      // 100% recall: all 1000 copies collapse to representative id 0
      assert(kept.toSeq == (0L +: (5000L until 5005L)),
        s"expected one boilerplate survivor + 5 distinct docs, got ${kept.toSeq}")
      val drained = guards.drain(settleMs = 2000L)
      assert(drained.exists { case (k, v) =>
        k.contains("_rescue_") && k.endsWith("rescued_members") && v == 999L },
        s"expected rescued_members=999, got $drained")
      assert(!drained.exists { case (k, v) =>
        k.contains("_guard_") && v > 0L },
        s"rescue run must be drop-free, got $drained")
      spark.catalog.clearCache()
    } finally spark.listenerManager.unregister(guards)
  }

  test("listener surfaces a real drop from a hot bucket") {
    val guards = GuardMetrics.register(spark)
    // the all-dropped case is exactly the one AQE empty propagation
    // would hide — with the rule active this drains Map()
    try withGuardPlanning {
      // 60 identical docs share every 4-gram: with maxBucket = 50 each
      // gram bucket is hot and must be counted as dropped
      val docs = (0L until 60L)
        .map(i => (i, "all these documents share exactly the same words"))
        .toDF("doc_id", "text")
      val pairs = operators.Dedup.ngramJaccardNearDups(docs, "doc_id",
        "text", n = 4, threshold = 0.5, maxBucket = 50)
      assert(pairs.count() == 0L) // every candidate bucket was dropped
      val drained = guards.drain(settleMs = 2000L)
      assert(drained.exists { case (k, v) =>
        k.startsWith("graft_ngram_guard_") && v > 0L },
        s"expected a non-zero ngram guard metric, got $drained")
      spark.catalog.clearCache()
    } finally spark.listenerManager.unregister(guards)
  }
}
