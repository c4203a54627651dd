package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{CanDecode, Curation, Dedup, TextAnalysis, TimeSeries}
import graft.sources.{Candump, CandumpConverter, CanFixtures}

/** Property tests (SURVEY.md §5) driven by ScalaCheck generators with
  * fixed seeds (deterministic — no scalatestplus bridge needed):
  * decode round-trip through the S8 formatter → S1 parser → §2.3
  * decoder on random frames, and interpolation invariants. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  case class Frame(sec: Long, ms: Int, curr: Int, duty: Int, flags: Int, pad: Int)

  val frameGen: Gen[List[Frame]] = Gen.listOfN(40, for {
    sec <- Gen.choose(1500000000L, 1700000000L)
    ms <- Gen.choose(0, 999)
    curr <- Gen.choose(0, 65535)
    duty <- Gen.choose(0, 255)
    flags <- Gen.choose(0, 255)
    pad <- Gen.choose(0, 255)
  } yield Frame(sec, ms, curr, duty, flags, pad))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: S8 format → S1 parse → decode round-trips random frames") {
    (1L to 3L).foreach { seed =>
      // unique timestamps so the pivot's first() is unambiguous
      val frames = sample(frameGen, seed)
        .groupBy(f => (f.sec, f.ms)).map(_._2.head).toList
      val recs = frames.map { f =>
        (Seq((f.curr % 256).toString, (f.curr / 256).toString,
          f.duty.toString, f.flags.toString, f.pad.toString),
          new java.sql.Timestamp(f.sec * 1000 + f.ms).toString, 17, 33)
      }.toDF("bytes", "date", "mod", "top")
      val lines = CandumpConverter.toCandumpLines(recs)
        .withColumn("file", lit("prop.log"))
      val decoded = CanDecode.decodeLong(
        Candump.framesFromLines(lines), CanFixtures.schema)
        .groupBy("timestamp").pivot("byte_name",
          Seq("SIGNATURE", "CURR", "DUTY", "FLAG1", "FLAG2"))
        .agg(first("value"))
        .collect()
      assert(decoded.length == frames.length, s"seed $seed row count")
      val expect = frames.map(f => (f.sec * 1000000L + f.ms * 1000L,
        (f.curr * 0.01, f.duty * 0.01, (f.flags & 1) * (1.0 / 255),
          ((f.flags >> 1) & 1).toDouble))).toMap
      decoded.foreach { r =>
        val ts = r.getTimestamp(0)
        val tsUs = ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
        val (c, d, f1, f2) = expect(tsUs)
        assert(r.getDouble(1) == 17.0)
        assert(r.getDouble(2) == c, s"CURR at $tsUs")
        assert(r.getDouble(3) == d, s"DUTY at $tsUs")
        assert(r.getDouble(4) == f1 && r.getDouble(5) == f2, s"flags at $tsUs")
      }
    }
  }

  val edgesGen: Gen[List[(Long, Long)]] = Gen.listOfN(60, for {
    a <- Gen.choose(0L, 39L)
    b <- Gen.choose(0L, 39L) if a != b
  } yield (a, b))

  test("property: connected components match a union-find reference") {
    (20L to 23L).foreach { seed =>
      val edges = sample(edgesGen, seed)
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      val got = Dedup.connectedComponents(edges.toDF("a", "b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed $seed")
    }
  }

  val tokenGen: Gen[List[String]] = Gen.listOfN(30,
    Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("päneln", "電池", "ünïcode", "", "word", "WORD", "a"),
      Gen.listOfN(6, Gen.choose(33.toChar, 126.toChar)).map(_.mkString)))

  test("property: winnow selection matches the per-window reference") {
    // brute-force ground truth: for every window, rightmost minimum
    def reference(hs: Array[Long], w: Int): Seq[Int] = {
      if (hs.isEmpty) return Seq.empty
      val win = math.min(w, hs.length)
      (0 to hs.length - win).map { s =>
        var best = s
        for (i <- s + 1 until s + win) if (hs(i) <= hs(best)) best = i
        best + 1
      }.distinct.sorted
    }
    val hashGen = Gen.choose(0, 20).flatMap(n =>
      // small value range forces frequent ties — the tie-break side
      // is exactly what the deque's >= eviction must get right
      Gen.listOfN(n, Gen.choose(0L, 6L)))
    for (seed <- 40L to 49L; w <- Seq(1, 3, 4, 7)) {
      val hs = sample(hashGen, seed).toArray
      val got = Seq(Tuple1(hs)).toDF("h")
        .select(TextAnalysis.winnowCol(col("h"), w).as("sel"))
        .head().getSeq[Int](0)
      assert(got == reference(hs, w), s"seed $seed w $w hs ${hs.toSeq}")
    }
  }

  test("winnow guarantee: a shared run of w+k-1 words shares a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"  // 8 words
    val docs = Seq(
      (1L, s"unrelated prefix words here $shared"),
      (2L, s"$shared completely different suffix text follows now"))
      .toDF("doc_id", "text")
    // k=4, w=5 → guarantee threshold w+k-1 = 8 shared words
    val fps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text",
        k = 4, w = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    val (a, b) = (fps.filter(_._1 == 1L).map(_._2).toSet,
      fps.filter(_._1 == 2L).map(_._2).toSet)
    assert((a & b).nonEmpty, "shared run must share at least one fingerprint")
  }

  test("property: native md5 simhash matches the SQL aggregate bit-for-bit") {
    // random (incl. unicode / punctuation / empty) token streams: the
    // native SimhashSignatureMd5 projection must agree with the
    // exploded-token 64-sum-buffer aggregate over the SQL
    // conv(substring(md5(tok),1,15),16,10) hash on every bit
    (40L to 42L).foreach { seed =>
      val docs = sample(Gen.listOfN(12, tokenGen), seed).zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val viaAgg = Dedup.simhash(docs, "doc_id", "text",
          tokenHash = c => conv(substring(md5(c), 1, 15), 16, 10).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaNative = Dedup.simhash(docs, "doc_id", "text",
          tokenHash = Dedup.md5Hash60)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaNative === viaAgg, s"seed $seed")
    }
  }

  // ---- round-5 curation/analysis operators ----

  val paraPool: Vector[String] = Vector.tabulate(8)(i => s"para body $i")
  val paraDocsGen: Gen[List[List[String]]] =
    Gen.choose(3, 10).flatMap(nd => Gen.listOfN(nd,
      Gen.choose(1, 5).flatMap(np =>
        Gen.listOfN(np, Gen.choose(0, paraPool.size - 1).map(paraPool)))))

  test("property: paragraph dedup equals the sequential keep-first reference") {
    (20L to 24L).foreach { seed =>
      val docs = sample(paraDocsGen, seed).zipWithIndex
        .map { case (ps, i) => (i.toLong, ps) }
      val df = docs.map { case (id, ps) => (id, ps.mkString("\n\n")) }
        .toDF("doc_id", "text")
      // reference: walk occurrences in (doc, pos) order with a seen-set
      var seen = Set.empty[String]
      val want = docs.map { case (id, ps) =>
        val kept = ps.filter { p =>
          val fresh = !seen(p); seen += p; fresh
        }
        id -> kept.mkString("\n\n")
      }.toMap
      val got = Curation.dropDuplicateParagraphs(df, "doc_id", "text")
        .select("doc_id", "clean_text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"seed $seed")
    }
  }

  val tokenDocsGen: Gen[List[String]] =
    Gen.choose(3, 8).flatMap(nd => Gen.listOfN(nd,
      Gen.choose(2, 30).flatMap(nt =>
        Gen.listOfN(nt, Gen.oneOf("a", "b", "c", "d", "e", "f"))
          .map(_.mkString(" ")))))

  test("property: unigram log-prob matches the closed-form reference") {
    (30L to 33L).foreach { seed =>
      val texts = sample(tokenDocsGen, seed)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val all = texts.flatMap(_.split("\\s+"))
      val c = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = all.size.toDouble
      val want = texts.zipWithIndex.map { case (t, i) =>
        val toks = t.split("\\s+")
        i.toLong -> toks.map(tk => math.log(c(tk) / total)).sum / toks.length
      }.toMap
      val got = TextAnalysis.unigramLogProb(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      want.foreach { case (id, w) =>
        assert(math.abs(got(id) - w) < 1e-6, s"seed $seed doc $id")
        assert(got(id) <= 0.0, "log-probabilities are never positive")
      }
    }
  }

  val repTextGen: Gen[String] =
    Gen.choose(1, 6).flatMap(nl => Gen.listOfN(nl,
      Gen.choose(1, 12).flatMap(nt =>
        Gen.listOfN(nt, Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" "))))
      .map(_.mkString("\n")))

  test("property: repetition fractions bounded, composite equals re-derived conjunction") {
    (40L to 42L).foreach { seed =>
      val texts = (0 until 6).map(i => sample(repTextGen, seed * 10 + i))
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = TextAnalysis.gopherRepetitionFlags(df, "doc_id", "text")
        .collect()
      rows.foreach { r =>
        val fracCols = Seq("dup_line_frac", "dup_line_char_frac",
          "dup_para_frac", "dup_para_char_frac") ++
          Seq(2, 3, 4).map(n => s"top_${n}gram_char_frac") ++
          (5 to 10).map(n => s"dup_${n}gram_char_frac")
        fracCols.foreach { cName =>
          val v = r.getAs[Double](cName)
          assert(v >= 0.0, s"$cName negative (seed $seed)")
        }
        // unit-count fractions are true fractions; char-coverage ones
        // can exceed 1 only via overlapping gram repeats (documented)
        Seq("dup_line_frac", "dup_para_frac").foreach(cName =>
          assert(r.getAs[Double](cName) <= 1.0))
        val thresholds =
          Seq("dup_line_frac" -> 0.30, "dup_para_frac" -> 0.30,
              "dup_line_char_frac" -> 0.20, "dup_para_char_frac" -> 0.20,
              "top_2gram_char_frac" -> 0.20, "top_3gram_char_frac" -> 0.18,
              "top_4gram_char_frac" -> 0.16) ++
          Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11,
              10 -> 0.10).map { case (n, th) =>
            s"dup_${n}gram_char_frac" -> th }
        val want = thresholds.forall { case (cName, th) =>
          r.getAs[Double](cName) <= th }
        assert(r.getAs[Boolean]("repetition_pass") == want,
          s"composite mismatch (seed $seed doc ${r.getAs[Long]("doc_id")})")
      }
    }
  }

  val seriesGen: Gen[List[Option[Double]]] =
    Gen.listOfN(30, Gen.option(Gen.choose(-100.0, 100.0)))

  test("property: interpolation bounded by brackets, exact on non-nulls") {
    (10L to 14L).foreach { seed =>
      val vs = sample(seriesGen, seed)
      val df = vs.zipWithIndex.map { case (v, i) =>
        (new java.sql.Timestamp(1500000000000L + i * 1000L), v)
      }.toDF("t", "v")
      val out = TimeSeries.interpolateLinear(df, "t", "v", Nil)
        .orderBy("t").select("v", "interp_value").collect()
      val orig = out.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      val interp = out.map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
      orig.zip(interp).foreach { case (o, i) => if (o.isDefined) assert(i == o) }
      val defined = orig.flatten
      if (defined.nonEmpty) {
        val (lo, hi) = (defined.min, defined.max)
        interp.flatten.foreach(v => assert(v >= lo - 1e-9 && v <= hi + 1e-9))
        val firstIdx = orig.indexWhere(_.isDefined)
        val lastIdx = orig.lastIndexWhere(_.isDefined)
        (firstIdx to lastIdx).foreach(i =>
          assert(interp(i).isDefined, s"interior index $i not filled (seed $seed)"))
        // outside the brackets nothing is invented (inside-only mode)
        (0 until firstIdx).foreach(i => assert(interp(i).isEmpty))
        (lastIdx + 1 until interp.length).foreach(i => assert(interp(i).isEmpty))
      }
    }
  }
}
