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
}
