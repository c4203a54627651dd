package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite for large-scale training-data pipelines —
  * exact, MinHash+LSH, SimHash, n-gram Jaccard. All deterministic
  * (seeded xxhash64), all expressed as DataFrame transformations:
  * the only shuffles are the per-doc aggregations and the
  * bucket-join on LSH band hashes, so the work scales out linearly
  * with documents and never goes O(n²) — candidate generation is
  * band-bucketed, and only candidates get exact verification.
  */
object Dedup {

  /** Exact dedup: keep the first (lowest orderCol) row per identical
    * value of `on`; hash-groupBy, one shuffle. */
  def exact(df: DataFrame, on: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(on.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Character k-shingles of the normalized text, as one row per
    * distinct (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
        explode(expr(s"transform(sequence(1, greatest(length(lower($textCol))-${k - 1}, 1)), " +
          s"i -> substring(lower($textCol), i, $k))")).as("shingle"))
      .distinct()

  /** Word n-gram shingles. Prefer these over character shingles on
    * corpora with a small shared vocabulary: random-pair character-
    * 5-gram Jaccard can sit at 0.3-0.5 (every banding scheme then
    * floods with candidates), while word-trigram Jaccard of unrelated
    * docs stays near zero. */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = s"split(lower(trim($textCol)), '\\\\s+')"
    df.select(col(idCol),
        explode(expr(s"transform(sequence(1, greatest(size($toks)-${n - 1}, 1)), " +
          s"i -> concat_ws(' ', slice($toks, i, $n)))")).as("shingle"))
      .distinct()
  }

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the min over the doc's shingles. One groupBy over the shingle
    * table; `numHashes` agg buffers. */
  def minhashSignatures(sh: DataFrame, idCol: String, numHashes: Int): DataFrame =
    sh.groupBy(col(idCol))
      .agg(array((0 until numHashes).map(i =>
        min(xxhash64(lit(i), col("shingle")))): _*).as("sig"))

  /** LSH banding: split the signature into `bands` bands, hash each;
    * docs sharing any (band, hash) bucket become candidate pairs.
    * Returns distinct (a, b) with a < b. The self-join is on the
    * bucket key — co-partitioned, no cross product. */
  def lshCandidates(sigs: DataFrame, idCol: String, numHashes: Int,
                    bands: Int): DataFrame = {
    val rows = numHashes / bands
    val banded = sigs.select(col(idCol),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> xxhash64(slice(sig, b*$rows + 1, $rows)))")).as(Seq("band", "bh")))
    val l = banded.select(col("band"), col("bh"), col(idCol).as("a"))
    val r = banded.select(col("band"), col("bh"), col(idCol).as("b"))
    l.join(r, Seq("band", "bh")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact Jaccard similarity of shingle sets for given candidate
    * pairs (join-based intersection — only candidates are scored). */
  def jaccardVerify(cands: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = cands
      .join(sh.select(col(idCol).as("a"), col("shingle")), Seq("a"))
      .join(sh.select(col(idCol).as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    cands.join(inter, Seq("a", "b"), "left")
      .na.fill(0, Seq("inter"))
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col(idCol).as("b"), col("sz").as("szb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double"))
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification:
    * the standard shingle → minhash → band → bucket-join → verify
    * pipeline. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8, wordGrams: Int = 0): DataFrame = {
    val sh =
      if (wordGrams > 0) wordShingles(df, idCol, textCol, wordGrams)
      else shingles(df, idCol, textCol, shingleK)
    val sigs = minhashSignatures(sh, idCol, numHashes)
    val cands = lshCandidates(sigs, idCol, numHashes, bands)
    jaccardVerify(cands, sh, idCol).filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** SimHash (64-bit): per-token hash votes ±1 on each bit; the sign
    * vector packs into one long. Computed with 64 agg expressions in a
    * single groupBy pass (no per-row loops). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(lower(col(textCol)), "\\s+")).as("tok"))
    val h = xxhash64(col("tok"))
    val voteCols = (0 until 64).map(b =>
      sum(when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$b"))
    val votes = toks.groupBy(col(idCol)).agg(voteCols.head, voteCols.tail: _*)
    votes.select(col(idCol),
      (0 until 64).map(b =>
        when(col(s"b$b") > 0, lit(1L) * lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: bucket the 64-bit hash into 4
    * 16-bit bands (any pair within hamming ≤ 3 of each other shares at
    * least one identical band by pigeonhole), then verify hamming. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val hs = simhash(df, idCol, textCol)
    val banded = hs.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bh")))
    val l = banded.select(col("band"), col("bh"),
      col(idCol).as("a"), col("simhash").as("ha"))
    val r = banded.select(col("band"), col("bh"),
      col(idCol).as("b"), col("simhash").as("hb"))
    l.join(r, Seq("band", "bh")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming(col("ha"), col("hb")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Word n-gram Jaccard near-dups: candidates = pairs sharing a rare
    * n-gram (bucket join), verified with exact n-gram-set Jaccard. */
  def ngramJaccardNearDups(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 8, threshold: Double = 0.5,
                           maxBucket: Int = 50): DataFrame = {
    val toks = s"split(lower($textCol), '\\\\s+')"
    val grams = df.select(col(idCol),
      explode(expr(s"transform(sequence(1, greatest(size($toks)-${n - 1}, 1)), " +
        s"i -> xxhash64(concat_ws(' ', slice($toks, i, $n))))")).as("gram"))
      .distinct()
    // drop pathological buckets (stop-gram equivalent of skew guard)
    val rare = grams.groupBy("gram").agg(count(lit(1)).as("c"))
      .filter(col("c") <= maxBucket && col("c") > 1)
    val g = grams.join(rare.select("gram"), Seq("gram"))
    val cands = g.select(col("gram"), col(idCol).as("a"))
      .join(g.select(col("gram"), col(idCol).as("b")), Seq("gram"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
    val sizes = grams.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = cands
      .join(grams.select(col(idCol).as("a"), col("gram")), Seq("a"))
      .join(grams.select(col(idCol).as("b"), col("gram")), Seq("b", "gram"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    cands.join(inter, Seq("a", "b"))
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col(idCol).as("b"), col("sz").as("szb")), Seq("b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sza") + col("szb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }
}
