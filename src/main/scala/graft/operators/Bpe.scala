package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction and application (Sennrich,
  * Haddow, Birch 2016, "Neural machine translation of rare words with
  * subword units") — the tokenizer-training step of an LLM data
  * pipeline, distributed: the merge loop runs over the corpus's
  * DISTINCT-WORD table (vocabulary-bounded — millions of rows at
  * 100 TB, never the corpus itself), each iteration is one
  * weighted pair-count aggregate plus one fold projection, and the
  * learned merge list is ordinary driver state (like the fitted LR /
  * DSIR models) that applies to any corpus as plan-level expressions
  * — no UDFs, no per-row driver calls.
  *
  * Reference semantics (the paper's algorithm 1): words split to
  * characters plus a `</w>` terminator; each iteration merges the
  * globally most frequent adjacent symbol pair (weighted by word
  * frequency, overlapping positions counted per occurrence — "aaa"
  * holds two (a,a) positions) everywhere it occurs, left-to-right
  * non-overlapping within a word. Frequency ties break to the
  * lexicographically smallest (a, b) so the learned vocabulary is a
  * pure function of the corpus — re-runs, input order and
  * partitioning all agree. */
object Bpe {

  /** A fitted BPE vocabulary: the ordered merge list plus the
    * symbolized distinct-word table (`w`, corpus count `n`, piece
    * array `s`) in its post-merge state — the build-once artifact
    * [[tokenCount]] joins against (the [[Similarity.SqIndex]]
    * build-once/search-many shape; persist or write it, apply it
    * many times). */
  final case class BpeVocab(merges: Seq[(String, String)],
                            wordPieces: DataFrame)

  /** Distinct lowercase whitespace tokens with corpus counts — the
    * table the merge loop iterates over. */
  private def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** Initial symbol sequence: per-character split plus the `</w>`
    * end-of-word marker (the paper's word-boundary symbol — without
    * it "est" inside "estimate" and at the end of "widest" would
    * merge identically). Guarded for the empty string: Spark's
    * `sequence(1, 0)` steps DOWN to [1, 0] rather than returning an
    * empty array, which would hand an empty word two phantom ""
    * symbols — an empty (or null) word is just the bare marker. */
  private def charSymbols(w: Column): Column =
    when(length(w) > 0,
      concat(transform(sequence(lit(1), length(w)),
        i => substring(w, i, lit(1))), array(lit("</w>"))))
    .otherwise(array(lit("</w>")))

  /** One merge applied to a symbol array, left-to-right
    * non-overlapping: fold each symbol onto the accumulator, gluing
    * it to the previous element when (prev, current) is exactly the
    * merge pair. Built with Column lambdas (never string-spliced SQL
    * — real tokens carry quotes and backslashes). */
  private def mergeOnce(s: Column, a: String, b: String): Column = {
    val folded = aggregate(
      slice(s, lit(2), greatest(size(s) - 1, lit(0))),
      array(element_at(s, 1)),
      (acc, x) => when(
          element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))
    when(size(s) >= 2, folded).otherwise(s)
  }

  /** Learn `numMerges` merges from the corpus. Each iteration: one
    * vocabulary-bounded weighted pair-count aggregate → the argmax
    * pair to the driver (ONE row — bounded driver state like the LR
    * gradient collects) → one fold projection re-symbolizing the word
    * table.
    *
    * Loop hygiene (measured, not theoretical): the re-symbolized
    * table is EAGERLY `localCheckpoint`ed each iteration — a persist
    * would keep the LOGICAL plan growing one nested fold per merge,
    * and by merge 16 the re-analyzed/re-optimized plan chain cost
    * two minutes of driver time on a 30-word vocabulary (118 s →
    * ~8 s with constant-depth plans). The word table is also
    * compacted to ~250k rows/partition using the count the
    * first materialization already paid for — numMerges sequential
    * jobs over a small vocabulary are pure task-scheduling overhead
    * at the default partitioning, while a huge vocabulary stays
    * distributed. Non-reliable checkpoint blocks are fine here: the
    * loop's own actions all complete inside fit, and a lost block
    * after return costs a refit, not wrong results. Stops early when
    * no pair occurs twice (merging singletons would just memorize
    * words). */
  def fit(df: DataFrame, textCol: String, numMerges: Int): BpeVocab = {
    require(numMerges >= 0, "need numMerges >= 0")
    // superseded checkpoint generations are released explicitly —
    // Dataset.unpersist only clears CacheManager entries, so without
    // the bridge call up to numMerges+2 copies of the word table
    // would sit in the BlockManager until the driver happens to GC
    // the dead RDDs (the round-8 shared-bench-JVM heap lesson)
    def advance(from: DataFrame, to: DataFrame): DataFrame = {
      val next = to.localCheckpoint()
      org.apache.spark.sql.GraftExpressionBridge.releaseLocalCheckpoint(from)
      next
    }
    var words = wordTable(df, textCol)
      .withColumn("s", charSymbols(col("w")))
      .localCheckpoint()
    val vocabSize = words.count()
    val targetParts = math.max(1L, vocabSize / 250000L).toInt
    if (words.rdd.getNumPartitions > targetParts)
      words = advance(words, words.coalesce(targetParts))
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 1 to numMerges if !exhausted) {
      val top = words.filter(size(col("s")) >= 2)
        .select(col("n"), explode(transform(
          sequence(lit(0), size(col("s")) - 2),
          i => struct(element_at(col("s"), i + 1).as("a"),
            element_at(col("s"), i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("c"))
        .filter(col("c") >= 2)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        words = advance(words, words.withColumn("s", mergeOnce(col("s"), a, b)))
      }
    }
    // persisted for the caller's joins — caller owns the wordPieces
    // lifecycle from here (the gram-table discipline)
    val pieces = words
      .select(col("w"), col("n"), col("s"), size(col("s")).as("n_pieces"))
      .persist()
    pieces.count()
    BpeVocab(merges.toList, pieces)
  }

  /** Apply an ORDERED merge list to a symbol-array column — the
    * paper's inference rule (merges replay in learned order). One
    * chained fold per merge; fine for the tens-of-merges regime the
    * exactly-reproducible tier targets (a production 50k-merge
    * vocabulary applies via [[tokenCount]]'s precomputed word join,
    * never per-row replay). */
  def applyMerges(symbols: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbols) { case (s, (a, b)) => mergeOnce(s, a, b) }

  /** Symbolize raw words and replay `merges` — the from-scratch apply
    * path for corpora OTHER than the fit corpus. */
  def encodeWords(words: DataFrame, wordCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    words.withColumn("pieces",
      applyMerges(charSymbols(col(wordCol)), merges))

  /** Per-document BPE piece count — the token-budget unit a
    * subword-tokenized training run actually consumes (whitespace
    * token counts undercount rare words that fragment). Words join
    * the fitted `wordPieces` table (vocabulary-bounded, usually
    * broadcast); out-of-vocabulary words fall back to their
    * character count + 1, the untrained-word piece count under an
    * empty merge list. */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String,
                 vocab: BpeVocab): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    toks.join(vocab.wordPieces.select(col("w"), col("n_pieces")),
        Seq("w"), "left")
      .withColumn("__p", coalesce(col("n_pieces"),
        length(col("w")).cast("int") + 1))
      .groupBy(col(idCol))
      .agg(sum(col("__p")).as("n_bpe_tokens"),
        count(lit(1)).as("n_words"))
  }
}
