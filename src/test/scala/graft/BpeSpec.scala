package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("fit: the Sennrich corpus learns the classic merge sequence") {
    // word frequencies low:5 lower:2 newest:6 widest:3 — pair counts
    // make (e,s)/(s,t)/(t,</w>) tie at 9, so the lexicographic
    // tie-break picks (e,s) first, then the chain est → est</w>,
    // then the l/o/w family at 7
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val vocab = Bpe.fit(corpus, "text", numMerges = 5)
    assert(vocab.merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")), vocab.merges.toString)
    val pieces = vocab.wordPieces.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(pieces("newest") == List("n", "e", "w", "est</w>"))
    assert(pieces("widest") == List("w", "i", "d", "est</w>"))
    assert(pieces("low") == List("low", "</w>"))
    assert(pieces("lower") == List("low", "e", "r", "</w>"))
    vocab.wordPieces.unpersist()
  }

  test("fit: deterministic across runs and input partitioning") {
    val docs = (1L to 30L).map(i =>
      (i, s"some repeated text tokens text some ${i % 5}"))
      .toDF("doc_id", "text")
    val a = Bpe.fit(docs, "text", numMerges = 6)
    val b = Bpe.fit(docs.repartition(7), "text", numMerges = 6)
    assert(a.merges == b.merges, s"${a.merges} vs ${b.merges}")
    a.wordPieces.unpersist(); b.wordPieces.unpersist()
  }

  test("fit: early stop when no pair repeats (no word memorization)") {
    // every word a single char: the only pairs are (c, </w>), each
    // with count 1 — nothing reaches the min count of 2
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val vocab = Bpe.fit(docs, "text", numMerges = 10)
    assert(vocab.merges.isEmpty, vocab.merges.toString)
    vocab.wordPieces.unpersist()
  }

  test("encodeWords: left-to-right non-overlapping fold, quote-safe literals") {
    // "aaa" under merge (a,a): positions overlap, the fold glues
    // greedily left-to-right → [aa, a], never [a, aa] or [aa, aa]
    val words = Seq("aaa", "aaaa", "don't").toDF("w")
    val got = Bpe.encodeWords(words, "w", Seq(("a", "a")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(got("aaa") == List("aa", "a", "</w>"))
    assert(got("aaaa") == List("aa", "aa", "</w>"))
    // merge literals pass through Column lambdas, not spliced SQL —
    // a quote inside a token must survive untouched
    assert(got("don't") == List("d", "o", "n", "'", "t", "</w>"))
    // empty word: sequence(1, 0) would step DOWN to two phantom ""
    // symbols without the guard — the empty word is the bare marker
    val empty = Bpe.encodeWords(Seq("").toDF("w"), "w", Seq(("a", "a")))
      .collect().map(_.getSeq[String](1).toList)
    assert(empty.head == List("</w>"), empty.head.toString)
    val got2 = Bpe.encodeWords(Seq("don't").toDF("w"), "w",
        Seq(("n", "'"), ("n'", "t")))
      .collect().map(r => r.getSeq[String](1).toList)
    assert(got2.head == List("d", "o", "n't", "</w>"))
  }

  private def piecesOf(v: Bpe.BpeVocab): Map[String, List[String]] =
    v.wordPieces.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap

  test("fitBatched ≡ fit: Sennrich corpus and an interaction-dominated corpus") {
    val sennrich = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val seq5 = Bpe.fit(sennrich, "text", numMerges = 5)
    val bat5 = Bpe.fitBatched(sennrich, "text", numMerges = 5, maxBatch = 4)
    assert(bat5.merges == seq5.merges,
      s"${bat5.merges} vs ${seq5.merges}")
    assert(piecesOf(bat5) == piecesOf(seq5))
    // the trap corpus: every top pair interacts — (a,b), (b,</w>) and
    // (x,a) all tie at 9 and share endpoints, and merging (a,b)
    // CREATES (x,ab)/(ab,</w>) at count 9, which must win round 2
    // over anything the stale round-1 counts would have picked. The
    // batch must collapse to the single head pair per round (the
    // strict-trim rule), reproducing the sequential path exactly.
    val trap = (1L to 9L).map(i => (i, "xab")).toDF("doc_id", "text")
    val seqT = Bpe.fit(trap, "text", numMerges = 3)
    val batT = Bpe.fitBatched(trap, "text", numMerges = 3, maxBatch = 8)
    assert(seqT.merges == Seq(("a", "b"), ("ab", "</w>"), ("x", "ab</w>")),
      seqT.merges.toString)
    assert(batT.merges == seqT.merges, s"${batT.merges} vs ${seqT.merges}")
    assert(piecesOf(batT) == piecesOf(seqT))
    Seq(seq5, bat5, seqT, batT).foreach(_.wordPieces.unpersist())
  }

  test("fitBatched ≡ fit: seeded random corpora over a tiny alphabet") {
    // small alphabets maximize pair interactions, merged-token
    // resurrection chances and count ties — any divergence between
    // the batched and sequential argmax shows up here
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val words = (1 to 40).map { i =>
        val len = 1 + rnd.nextInt(6)
        (i.toLong, Seq.fill(len)("abc" (rnd.nextInt(3))).mkString)
      }
      val docs = words.toDF("doc_id", "text")
      val a = Bpe.fit(docs, "text", numMerges = 6)
      val b = Bpe.fitBatched(docs, "text", numMerges = 6, maxBatch = 3)
      assert(a.merges == b.merges,
        s"seed $seed: ${a.merges} vs ${b.merges}")
      assert(piecesOf(a) == piecesOf(b), s"seed $seed pieces diverge")
      a.wordPieces.unpersist(); b.wordPieces.unpersist()
    }
  }

  test("fitBatched: non-interacting top pairs land in ONE round (fewer jobs)") {
    // four disjoint letter families with strictly separated counts —
    // (a,b)=18 > (c,d)=16 > (e,f)=14 > (g,h)=12 > everything else ≤ 9
    // — so all four merges are pairwise non-interacting and the
    // batched fit must learn them in ONE candidate aggregate where
    // the sequential tier runs four
    val docs = ((1L to 9L).map(i => (i, "abab")) ++
      (11L to 18L).map(i => (i, "cdcd")) ++
      (21L to 27L).map(i => (i, "efef")) ++
      (31L to 36L).map(i => (i, "ghgh"))).toDF("doc_id", "text")
    def countingJobs(body: => Bpe.BpeVocab): (Bpe.BpeVocab, Int) = {
      val counted = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          counted.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val v = try body finally {
        // listener events deliver asynchronously (no public
        // waitUntilEmpty) — wait for the count to go stable
        var last = -1
        var stable = 0
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (stable < 3 && System.nanoTime() < deadline) {
          val c = counted.get()
          if (c == last) stable += 1 else { stable = 0; last = c }
          Thread.sleep(100)
        }
        spark.sparkContext.removeSparkListener(listener)
      }
      (v, counted.get())
    }
    val (seqV, seqJobs) = countingJobs(Bpe.fit(docs, "text", numMerges = 4))
    val (batV, batJobs) = countingJobs(
      Bpe.fitBatched(docs, "text", numMerges = 4, maxBatch = 4))
    assert(batV.merges == seqV.merges && batV.merges.size == 4,
      s"${batV.merges} vs ${seqV.merges}")
    assert(batV.merges.toSet ==
      Set(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")))
    assert(piecesOf(batV) == piecesOf(seqV))
    // the job-count claim of the production tier, measured: one
    // candidate aggregate + one alphabet guard + one fold for the
    // whole batch vs one aggregate + one fold PER merge
    assert(batJobs < seqJobs,
      s"batched should schedule fewer jobs: batched=$batJobs seq=$seqJobs")
    seqV.wordPieces.unpersist(); batV.wordPieces.unpersist()
  }

  test("bpe vocab save/load: merges+pieces round-trip, fresh-session reopen, torn states refused") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val vocab = Bpe.fit(corpus, "text", numMerges = 5)
    val dir = java.nio.file.Files.createTempDirectory("bpe_vocab").toString
    Bpe.writeBpeVocab(vocab, "bpe_vocab_spec", s"$dir/v1", numBuckets = 4)
    val docs = Seq((1L, "low lower zzz"), (2L, "newest widest low"))
      .toDF("doc_id", "text")
    def counts(v: Bpe.BpeVocab): Seq[(Long, Long, Long)] =
      Bpe.tokenCount(docs, "doc_id", "text", v)
        .orderBy($"doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    val fitted = counts(vocab)
    val loaded = Bpe.readBpeVocab(spark, "bpe_vocab_spec", s"$dir/v1")
    assert(loaded.merges == vocab.merges)
    assert(counts(loaded) == fitted)
    // DRIVER RESTART: the in-memory catalog forgets the table; the
    // data is EXTERNAL so readBpeVocab re-registers it and the
    // reopened vocab counts row-identically
    spark.sql("DROP TABLE bpe_vocab_spec")
    assert(!spark.catalog.tableExists("bpe_vocab_spec"))
    val reborn = Bpe.readBpeVocab(spark, "bpe_vocab_spec", s"$dir/v1")
    assert(reborn.merges == vocab.merges)
    assert(counts(reborn) == fitted)
    // torn meta: manifest missing → refuse
    Bpe.writeBpeVocab(vocab, "bpe_vocab_torn", s"$dir/v2", numBuckets = 4)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/v2/meta", "MANIFEST"))
    val noManifest = intercept[IllegalArgumentException] {
      Bpe.readBpeVocab(spark, "bpe_vocab_torn", s"$dir/v2")
    }
    assert(noManifest.getMessage.contains("MANIFEST"))
    // cross-epoch: manifest's token absent from the table dir (a torn
    // rewrite wiped it with the old table) → refuse, never mix
    // generations
    Bpe.writeBpeVocab(vocab, "bpe_vocab_torn2", s"$dir/v3", numBuckets = 4)
    val manifest = java.nio.file.Paths.get(s"$dir/v3/meta", "MANIFEST")
    val epoch = new String(java.nio.file.Files.readAllBytes(manifest),
      "UTF-8").trim.split("\\s+").last
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      s"$dir/v3/word_pieces", s"_graft_epoch_$epoch"))
    val tornEpoch = intercept[IllegalArgumentException] {
      Bpe.readBpeVocab(spark, "bpe_vocab_torn2", s"$dir/v3")
    }
    assert(tornEpoch.getMessage.contains("epoch token"))
    vocab.wordPieces.unpersist()
  }

  test("tokenCount: fitted words join, OOV falls back to char count + 1") {
    val fitCorpus = (1L to 4L).map(i => (i, "the the theme"))
      .toDF("doc_id", "text")
    val vocab = Bpe.fit(fitCorpus, "text", numMerges = 3)
    val inVocab = vocab.wordPieces.filter($"w" === "the")
      .select($"n_pieces").as[Int].head()
    val docs = Seq((1L, "the theme"), (2L, "the zzz")).toDF("doc_id", "text")
    val got = Bpe.tokenCount(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val themePieces = vocab.wordPieces.filter($"w" === "theme")
      .select($"n_pieces").as[Int].head()
    assert(got(1L) == ((inVocab.toLong + themePieces, 2L)))
    // "zzz" never seen: 3 chars + 1 marker = 4 pieces
    assert(got(2L) == ((inVocab.toLong + 4L, 2L)))
    vocab.wordPieces.unpersist()
  }

  test("maintainBpeVocab: rooted A/B swap through one call, quiet no-op, pointer face") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_mw").toString
    val fitCorpus = (1L to 4L).map(i => (i, "the quick brown fox the"))
      .toDF("doc_id", "text")
    Bpe.writeBpeVocabRooted(spark, "bpe_mw", dir,
      Bpe.fit(fitCorpus, "text", numMerges = 3), numBuckets = 2)
    assert(spark.table("bpe_mw_meta").collect()(0)
      .getAs[String]("gen") == "a")
    // rooted read serves the fitted vocab through the pointer
    assert(Bpe.readBpeVocabRooted(spark, "bpe_mw").merges.size == 3)
    val drifted = Seq((10L, "zza zzb zzc zzd the"),
      (11L, "zze zzf zzg zzh zzi")).toDF("doc_id", "text")
    val corpus = fitCorpus.unionByName(drifted)
    def window(): org.apache.spark.sql.Row =
      Bpe.maintainBpeVocab(spark, "bpe_mw", dir, drifted, "text",
        corpus, maxOovRate = 0.2, numMerges = 3, numBuckets = 2)
        .collect()(0)
    val heal = window()
    // 10 sample words, 9 unseen (only "the" is in-vocab); refit
    // covers them all
    assert(heal.getLong(0) == 10L && heal.getLong(1) == 9L &&
      heal.getBoolean(2) && heal.getLong(3) == 0L && heal.getBoolean(4),
      s"drifted sample must fire and recover through one call: $heal")
    assert(spark.table("bpe_mw_meta").collect()(0)
      .getAs[String]("gen") == "b")
    assert(!spark.catalog.tableExists("bpe_mw_wp_a"),
      "the superseded generation must drop after the flip")
    val metaBefore = spark.table("bpe_mw_meta").collect().toSeq
    val noop = window()
    assert(noop.getLong(1) == 0L && !noop.getBoolean(2) &&
      !noop.getBoolean(4), s"undrifted sample must be a no-op: $noop")
    assert(spark.table("bpe_mw_meta").collect().toSeq == metaBefore,
      "a quiet window must not touch the pointer record")
  }
}
