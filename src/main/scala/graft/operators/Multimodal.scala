package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs, processed batch-wise with
  * `mapPartitions` (the Scala analogue of `mapInPandas` — one
  * iterator per partition, so a real decoder would amortize library
  * init per batch, not per row).
  *
  * IMAGE decoding is REAL: [[decodeImages]] runs `javax.imageio`
  * (JDK-native — PNG/JPEG/BMP/GIF, no external codec library) inside
  * the codec boundary, with truncated/unsupported payloads yielding
  * null rows (the CAN length-filter admission discipline, P6).
  * AUDIO decoding is REAL for the container formats the JDK ships
  * codecs for: [[decodeWav]] runs `javax.sound.sampled`
  * (WAV/AIFF/AU, 16-bit signed PCM) inside the same boundary with
  * the same null-row admission contract. VIDEO decoding is real up
  * to the JDK's one multi-frame container ([[decodeFrames]] —
  * animated GIF through the frame-indexed `ImageReader` loop any
  * registered codec drives); true video codecs (H.264 et al.) don't
  * ship with the JDK, so the clearly-marked deterministic fake
  * ([[decodeStub]], seeded from the bytes) remains the hermetic
  * stand-in that keeps the plumbing (schemas, partitioning, batch
  * iteration, feature shapes) real and testable for those formats.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType)))

  val featureSchemaFields: Seq[StructField] = Seq(
    StructField("feat", ArrayType(FloatType)),
    StructField("feat_dim", IntegerType))

  /** STUB decoder — deterministic fake "features" derived from the
    * payload bytes (xxhash-like mixing), standing in for a real
    * image/audio decode + embed. Replace with a codec in production;
    * the signature (bytes → fixed-dim float vector) is the real
    * contract. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 0x9E3779B97F4A7C15L
    bytes.foreach { b => h = (h ^ (b & 0xFFL)) * 0xC2B2AE3D27D4EB4FL }
    val out = new Array[Float](dim)
    var s = h
    var i = 0
    while (i < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = ((s >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
      i += 1
    }
    out
  }

  /** Attach metadata + stub features to a binary media column,
    * batch-wise per partition. Schema-preserving: appends
    * (meta struct, feat array, feat_dim). */
  def withDecodedFeatures(df: DataFrame, binaryCol: String, format: String,
                          dim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields ++
      Seq(StructField("meta", mediaMetaType)) ++ featureSchemaFields)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { it =>
      // per-partition init happens HERE in a real decoder (codec setup)
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val n = if (bytes == null) 0 else bytes.length
        val meta = Row(format, n % 1920, n % 1080, 3, n.toLong)
        val feat = if (n == 0) Array.empty[Float] else decodeStub(bytes, dim)
        Row.fromSeq(row.toSeq ++ Seq(meta, feat, feat.length))
      }
    }(enc)
  }

  /** REAL image decode — `javax.imageio` over the payload bytes,
    * inside the same batched `mapPartitions` codec boundary as the
    * stub path (per-partition is where a heavier codec would
    * amortize its init). Appends:
    *
    *   - `img_width`, `img_height`, `img_channels` (always 3 — the
    *     image is rendered to row-major W×H×RGB, alpha dropped and
    *     palette/gray expanded, so downstream ops like [[resizeRaw]]
    *     get ONE raw layout regardless of source pixel format);
    *   - `pixels` — the raw RGB buffer, decode-exact for lossless
    *     formats (PNG/BMP/GIF);
    *
    * null/empty/truncated/undecodable payloads yield null in all
    * four columns — the row SURVIVES with its identity for
    * audit/quarantine (the P6 admission discipline); callers drop or
    * route on `img_width IS NULL`. ImageIO returns null or throws on
    * garbage — both map to the same null row, never a task failure:
    * one corrupt crawl image must not kill a 100 TB decode stage. */
  def decodeImages(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("img_width", IntegerType),
      StructField("img_height", IntegerType),
      StructField("img_channels", IntegerType),
      StructField("pixels", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val decoded: Option[(Int, Int, Array[Byte])] =
          if (bytes == null || bytes.isEmpty) None
          else try {
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))).map { img =>
              val w = img.getWidth; val h = img.getHeight
              val out = new Array[Byte](w * h * 3)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val base = (y * w + x) * 3
                  out(base) = ((rgb >> 16) & 0xFF).toByte
                  out(base + 1) = ((rgb >> 8) & 0xFF).toByte
                  out(base + 2) = (rgb & 0xFF).toByte
                  x += 1
                }
                y += 1
              }
              (w, h, out)
            }
          } catch { case _: java.io.IOException => None
                    case _: RuntimeException => None }
        decoded match {
          case Some((w, h, px)) =>
            Row.fromSeq(row.toSeq ++ Seq(w, h, 3, px))
          case None =>
            Row.fromSeq(row.toSeq ++ Seq(null, null, null, null))
        }
      }
    }(enc)
      // corrupt-payload observability (the GuardMetrics discipline):
      // nulled rows are deliberate, but a decode stage whose failure
      // count quietly climbs is a data-quality incident — surface it
      // per query like the rescue/guard counters
      .observe(s"graft_image_decode_${Dedup.obsId.incrementAndGet()}",
        count(lit(1)).as("rows"),
        sum(when(col("img_width").isNull, 1L).otherwise(0L))
          .as("decode_failures"))
  }

  /** Deterministic dead-letter classification for a codec stage —
    * the column the quarantine split routes on. The decode family's
    * corrupt-row discipline (null output columns, never a task
    * failure) is right for keeping a 100 TB scan alive, but a
    * silently-null row carries no forensics; this derives the reason
    * purely from what the row already shows (payload bytes + the
    * stage's null-on-failure output column), so it is a pure
    * projection — stream-legal, codegen'd, and REPLAYABLE (no
    * exception messages, which vary by JDK codec):
    *   - `null_payload`  — the payload column itself is null
    *   - `empty_payload` — zero bytes
    *   - `undecodable`   — bytes present, the codec returned nothing
    *   - `ok`            — the stage produced output
    * Works unchanged across the modality family: pass
    * `img_width` ([[decodeImages]]), `au_rate` ([[decodeWav]]) or
    * the frames/signature column as `ok`. */
  def decodeStatus(payload: Column, ok: Column): Column =
    when(payload.isNull, lit("null_payload"))
      .when(length(payload) === 0, lit("empty_payload"))
      .when(ok.isNull, lit("undecodable"))
      .otherwise(lit("ok"))

  /** Container format from MAGIC BYTES — a pure (codegen'd) column
    * projection, independent of any decoder, so a corpus profile can
    * count formats even for payloads the decode tier rejects. Covers
    * the containers this codec boundary handles (PNG / JPEG / BMP /
    * GIF images; WAV/RIFF, AIFF/FORM, AU audio) plus `unknown` /
    * `empty` / `null`. Magic-byte sniffing identifies the CONTAINER
    * only — a truncated PNG still says `png` (its decode_status says
    * the rest), which is exactly what a dead-letter forensics view
    * wants. */
  def mediaFormat(payload: Column): Column = {
    def at(pos: Int, hexBytes: String): Column =
      hex(substring(payload, pos, hexBytes.length / 2)) === lit(hexBytes)
    def begins(hexPrefix: String): Column = at(1, hexPrefix)
    when(payload.isNull, lit("null"))
      .when(length(payload) === 0, lit("empty"))
      .when(begins("89504E47"), lit("png"))
      .when(begins("FFD8FF"), lit("jpeg"))
      .when(begins("424D"), lit("bmp"))
      .when(begins("47494638"), lit("gif"))
      // RIFF and FORM are generic containers (RIFF also wraps AVI and
      // WebP, FORM any IFF type) — require the type tag at offset 8
      // ("WAVE" / "AIFF" or "AIFC") before claiming an audio format,
      // and report the bare container otherwise rather than guessing
      .when(begins("52494646") && at(9, "57415645"), lit("wav"))
      .when(begins("52494646"), lit("riff"))
      .when(begins("464F524D") &&
        (at(9, "41494646") || at(9, "41494643")), lit("aiff"))
      .when(begins("464F524D"), lit("iff"))
      .when(begins("2E736E64"), lit("au"))
      .otherwise(lit("unknown"))
  }

  /** The MULTIMODAL corpus datasheet — the media face of the text
    * tier's q91 profile / q102 release gates: one row per payload
    * with everything an operator triages a 100 TB media corpus by:
    * `format` (magic bytes, decoder-independent), `decode_status`
    * (the dead-letter classification), `n_px` (decoded pixel count;
    * null for non-ok rows) and `dup_of` (the smallest media id
    * sharing this row's dHash — the exact-perceptual dup pointer;
    * null for unique or undecodable rows). Downstream `groupBy
    * (format, decode_status)` + dup-rate aggregation is the release
    * report; this keeps the per-row evidence. One decode pass, one
    * self-join on the 64-bit signature — no pairwise work. */
  def mediaDatasheet(df: DataFrame, idCol: String,
                     binaryCol: String): DataFrame = {
    val decoded = perceptualHashes(decodeImages(df, binaryCol),
      "pixels", "img_width", "img_height")
    val rows = decoded.select(col(idCol),
      mediaFormat(col(binaryCol)).as("format"),
      decodeStatus(col(binaryCol), col("img_width")).as("decode_status"),
      (col("img_width").cast("long") * col("img_height")).as("n_px"),
      col("dhash"))
    val firsts = rows.filter(col("dhash").isNotNull)
      .groupBy(col("dhash"))
      .agg(count(lit(1)).as("__n"), min(col(idCol)).as("__first"))
    rows.join(firsts, Seq("dhash"), "left")
      .select(col(idCol), col("format"), col("decode_status"),
        col("n_px"),
        when(col("__n") > 1 && col(idCol) =!= col("__first"),
          col("__first")).as("dup_of"))
  }

  /** Nearest-neighbor image RESIZE over decoded RGB buffers — the
    * feature-prep step between [[decodeImages]] and any fixed-input
    * model stage (embedding extractors want one canonical WxH; a
    * 100 TB image corpus arrives at every size). Deliberately
    * nearest-neighbor with floor sampling (`sx = x*srcW / outW` in
    * integer arithmetic — the same rule [[perceptualHashes]]' grid
    * uses), so the op is integer-EXACT and replayable in plain SQL,
    * unlike interpolating kernels whose float rounding is
    * implementation-defined. Runs at the family's mapPartitions
    * buffer boundary; corrupt inputs follow the corrupt-row
    * discipline (null pixels/dims in → null resized out, and a
    * buffer shorter than `w*h*3` — checked in LONG, metadata dims
    * can overflow an Int product — yields null, never a task
    * failure). Appends `resized`/`resized_width`/`resized_height`,
    * leaving the source buffer in place for downstream stages that
    * want both. */
  def resizeImages(df: DataFrame, pixelsCol: String, wCol: String,
                   hCol: String, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0 && outW.toLong * outH * 3 < Int.MaxValue,
      s"bad target geometry ${outW}x$outH")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resized_width", IntegerType),
      StructField("resized_height", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    val pi = df.schema.fieldIndex(pixelsCol)
    val wi = df.schema.fieldIndex(wCol)
    val hi = df.schema.fieldIndex(hCol)
    df.mapPartitions { it =>
      it.map { row =>
        val px =
          if (row.isNullAt(pi)) null else row.getAs[Array[Byte]](pi)
        val bad = px == null || row.isNullAt(wi) || row.isNullAt(hi) || {
          val w = row.getInt(wi); val h = row.getInt(hi)
          w <= 0 || h <= 0 || px.length < w.toLong * h * 3
        }
        if (bad) Row.fromSeq(row.toSeq ++ Seq(null, null, null))
        else {
          val w = row.getInt(wi); val h = row.getInt(hi)
          val out = new Array[Byte](outW * outH * 3)
          var y = 0
          while (y < outH) {
            val sy = (y.toLong * h / outH).toInt
            var x = 0
            while (x < outW) {
              val sx = (x.toLong * w / outW).toInt
              val sb = (sy * w + sx) * 3
              val ob = (y * outW + x) * 3
              out(ob) = px(sb); out(ob + 1) = px(sb + 1)
              out(ob + 2) = px(sb + 2)
              x += 1
            }
            y += 1
          }
          Row.fromSeq(row.toSeq ++ Seq(out, outW, outH))
        }
      }
    }(enc)
  }

  /** 64-bit PERCEPTUAL image hashes over a raw row-major W×H×C
    * buffer — the real bytes→signature bridge from [[decodeImages]]
    * into the Hamming-banded near-dup machinery
    * ([[graft.operators.Dedup.hammingNearDups]]): this is what
    * catches a re-encoded duplicate (same pixels, PNG vs BMP vs GIF)
    * or a lightly edited variant that no byte-level hash can see —
    * the LAION-style image dedup a 100 TB multimodal pipeline runs.
    * Public-knowledge constructions, INTEGER-EXACT end to end so an
    * oracle can replay every bit from the planted pixel formulas:
    *
    *   - `dhash` (difference hash): nearest-neighbor sample to a
    *     9×8 luma grid (src = gx·W div 9, gy·H div 8 — the
    *     [[resizeRaw]] index math; luma = (299·R + 587·G + 114·B)
    *     div 1000, the ITU-R 601 weights in integer form), bit
    *     (gy·8 + gx) = luma(gx+1, gy) > luma(gx, gy) — gradient
    *     signs, robust to uniform brightness shifts;
    *   - `ahash` (average hash): 8×8 luma grid, bit = luma ≥ the
    *     integer mean (sum div 64) — coarse shape/brightness.
    *
    * Null/short/degenerate rows (null pixels, missing or non-positive
    * dims, buffer shorter than W·H·C) yield null hashes and SURVIVE —
    * the P6 admission discipline; a null signature can never enter a
    * near-dup band. Pure per-row integer arithmetic in the codec
    * boundary: no shuffle, no driver state. */
  /** Integer ITU-R 601 luma of pixel (x, y) in a row-major W×H×C
    * buffer — the one sampling formula every perceptual construction
    * here shares. */
  private def lumaAt(px: Array[Byte], w: Int, channels: Int,
                     x: Int, y: Int): Int = {
    val base = (y * w + x) * channels
    if (channels == 1) px(base) & 0xFF
    else (299 * (px(base) & 0xFF) + 587 * (px(base + 1) & 0xFF) +
      114 * (px(base + 2) & 0xFF)) / 1000
  }

  /** The dHash construction over one raw buffer (9×8 luma grid,
    * gradient-sign bits) — shared by [[perceptualHashes]] (per image
    * row) and [[videoSignatures]] (per frame inside one payload
    * row), so the two routes are bit-identical by construction. */
  private[graft] def dhashOf(px: Array[Byte], w: Int, h: Int,
                             channels: Int): Long = {
    val g = Array.tabulate(8, 9)((gy, gx) =>
      lumaAt(px, w, channels, gx * w / 9, gy * h / 8))
    var dh = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (g(gy)(gx + 1) > g(gy)(gx)) dh |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    dh
  }

  def perceptualHashes(df: DataFrame, pixelsCol: String, wCol: String,
                       hCol: String, channels: Int = 3): DataFrame = {
    require(channels == 1 || channels == 3,
      s"perceptualHashes supports gray (1) or RGB (3) buffers, got $channels")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("dhash", LongType), StructField("ahash", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val pIdx = df.schema.fieldIndex(pixelsCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    df.mapPartitions { it =>
      it.map { row =>
        val px = row.getAs[Array[Byte]](pIdx)
        // dims bound then LONG-arithmetic length check: corrupt
        // metadata with huge w/h would overflow an Int product
        // negative, sneak past a `px.length >= w*h*c` guard, and turn
        // the documented corrupt-row-yields-null discipline into an
        // ArrayIndexOutOfBounds task failure. 2^20 per side is far
        // beyond any real decoded frame (the buffer itself caps at
        // Int.MaxValue bytes ≈ 26k×26k RGB) — anything larger is
        // corrupt metadata by definition, not a big image.
        val ok = px != null && !row.isNullAt(wIdx) && !row.isNullAt(hIdx) &&
          row.getInt(wIdx) > 0 && row.getInt(hIdx) > 0 &&
          row.getInt(wIdx) <= (1 << 20) && row.getInt(hIdx) <= (1 << 20) &&
          px.length >= row.getInt(wIdx).toLong * row.getInt(hIdx) * channels
        val hashes: (java.lang.Long, java.lang.Long) =
          if (!ok) (null, null)
          else {
            val w = row.getInt(wIdx); val h = row.getInt(hIdx)
            def luma(x: Int, y: Int): Int = lumaAt(px, w, channels, x, y)
            // 8×8 grid for ahash (its own sample lattice: gx·W div 8)
            val a = Array.tabulate(8, 8)((gy, gx) =>
              luma(gx * w / 8, gy * h / 8))
            val mean = a.map(_.map(_.toLong).sum).sum / 64L
            var ah = 0L
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 8) {
                if (a(gy)(gx) >= mean) ah |= 1L << (gy * 8 + gx)
                gx += 1
              }
              gy += 1
            }
            (dhashOf(px, w, h, channels), ah)
          }
        Row.fromSeq(row.toSeq ++ Seq(hashes._1, hashes._2))
      }
    }(enc)
  }

  /** The IMAGE bytes→vector bridge — [[graft.operators.TextAnalysis.hashEmbed]]'s
    * sibling for the visual modality, completing the "every modality
    * reaches the vector tier" story: a decoded raw buffer samples
    * down to a `grid`×`grid` integer luma thumbnail (the classic
    * tiny-image embedding; Torralba et al. 2008's 80-million-tiny-
    * images representation at thumbnail scale) emitted as an
    * `array<double>` ready for every vector operator here — brute
    * cosine, the IVF/SQ/PQ index families, SemDeDup, and the
    * streaming [[graft.streaming.StreamingParse.annAdmissionStream]]
    * tier. Pure per-row integer sampling (the [[perceptualHashes]]
    * aHash lattice `gx·W div grid`, same ITU-R 601 luma), so the
    * whole chain is replayable in SQL and stream-legal; where the
    * Hamming tier answers "is this a re-encode?" at radius ≤ h, the
    * cosine tier RANKS look-alikes and composes with top-k search,
    * cluster-balanced sampling and drift-maintained indexes.
    *
    * Null/short/degenerate rows yield a null vector and SURVIVE (the
    * corrupt-row discipline; a null vector admits through the ANN
    * tier's null path, never crashes it). Length/dims guarded in
    * LONG exactly as [[perceptualHashes]]. */
  def imageEmbed(df: DataFrame, pixelsCol: String, wCol: String,
                 hCol: String, grid: Int = 8, channels: Int = 3,
                 out: String = "img_embedding"): DataFrame = {
    require(channels == 1 || channels == 3,
      s"imageEmbed supports gray (1) or RGB (3) buffers, got $channels")
    require(grid >= 1 && grid <= 64,
      s"grid must be in [1, 64], got $grid")
    val schema = StructType(df.schema.fields :+
      StructField(out, ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val pIdx = df.schema.fieldIndex(pixelsCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    df.mapPartitions { it =>
      it.map { row =>
        val px = row.getAs[Array[Byte]](pIdx)
        val ok = px != null && !row.isNullAt(wIdx) && !row.isNullAt(hIdx) &&
          row.getInt(wIdx) > 0 && row.getInt(hIdx) > 0 &&
          row.getInt(wIdx) <= (1 << 20) && row.getInt(hIdx) <= (1 << 20) &&
          px.length >= row.getInt(wIdx).toLong * row.getInt(hIdx) * channels
        val vec: Array[Double] =
          if (!ok) null
          else {
            val w = row.getInt(wIdx); val h = row.getInt(hIdx)
            Array.tabulate(grid * grid) { i =>
              lumaAt(px, w, channels,
                (i % grid) * w / grid, (i / grid) * h / grid).toDouble
            }
          }
        Row.fromSeq(row.toSeq :+ vec)
      }
    }(enc)
  }

  /** REAL audio decode through the same codec boundary as
    * [[decodeImages]]: `javax.sound.sampled` (JDK-native — WAV, AIFF
    * and AU containers) turns each binary payload into its stream
    * parameters plus the raw interleaved 16-bit signed little-endian
    * PCM frames. Appends `au_rate` (Hz), `au_channels`, `au_frames`
    * (frame count — samples per channel) and `pcm` (the interleaved
    * sample bytes). Only 16-bit signed PCM is admitted — floating or
    * 8-bit streams, truncated containers and non-audio bytes all map
    * to the SAME null row, never a task failure (one corrupt crawl
    * clip must not kill a 100 TB decode stage); failures surface on
    * the query's observe metric like the image tier's. Big-endian
    * sources (AIFF) are byte-swapped to LE so `pcm` has one layout
    * regardless of container. */
  def decodeWav(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("au_rate", IntegerType),
      StructField("au_channels", IntegerType),
      StructField("au_frames", IntegerType),
      StructField("pcm", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val decoded: Option[(Int, Int, Int, Array[Byte])] =
          if (bytes == null || bytes.isEmpty) None
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val f = ais.getFormat
              val pcm16 =
                f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                f.getSampleSizeInBits == 16
              if (!pcm16) None
              else {
                val raw = ais.readAllBytes()
                // truncation guard: AudioInputStream frame-aligns its
                // reads (a trailing partial frame is silently DROPPED,
                // not surfaced as an error), so a payload shorter than
                // the header's declared frame count reads back "clean"
                // with fewer frames — compare against the declaration
                val frameBytes = 2 * f.getChannels
                val declared = ais.getFrameLength // -1 = unspecified
                if (raw.length % frameBytes != 0 ||
                    (declared >= 0 && raw.length / frameBytes != declared))
                  None
                else {
                  if (f.isBigEndian) {
                    var i = 0
                    while (i + 1 < raw.length) {
                      val t = raw(i); raw(i) = raw(i + 1); raw(i + 1) = t
                      i += 2
                    }
                  }
                  Some((math.round(f.getSampleRate), f.getChannels,
                    raw.length / frameBytes, raw))
                }
              }
            } finally ais.close()
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: java.io.IOException => None
            case _: RuntimeException => None
          }
        decoded match {
          case Some((rate, ch, frames, pcm)) =>
            Row.fromSeq(row.toSeq ++ Seq(rate, ch, frames, pcm))
          case None =>
            Row.fromSeq(row.toSeq ++ Seq(null, null, null, null))
        }
      }
    }(enc)
      .observe(s"graft_audio_decode_${Dedup.obsId.incrementAndGet()}",
        count(lit(1)).as("rows"),
        sum(when(col("au_rate").isNull, 1L).otherwise(0L))
          .as("decode_failures"))
  }

  /** Per-channel SIGNED sample sums over interleaved 16-bit LE PCM —
    * the audio sibling of [[channelSums]] (the shape a loudness /
    * DC-offset / silence-detect feature takes). Channel count is a
    * per-row COLUMN (mono and stereo clips share a corpus), so the
    * interleave stride varies row to row; null pcm, null channels, or
    * a non-positive channel count (corrupt metadata) → null sums —
    * the module's corrupt-row-yields-null discipline holds even when
    * the channels column comes from somewhere other than
    * [[decodeWav]]. Pure per-row arithmetic in the codec boundary. */
  def pcmChannelSums(df: DataFrame, pcmCol: String,
                     channelsCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("sample_sums", ArrayType(LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val pIdx = df.schema.fieldIndex(pcmCol)
    val cIdx = df.schema.fieldIndex(channelsCol)
    df.mapPartitions { it =>
      it.map { row =>
        val pcm = row.getAs[Array[Byte]](pIdx)
        val sums =
          if (pcm == null || row.isNullAt(cIdx) || row.getInt(cIdx) <= 0)
            null
          else {
            val channels = row.getInt(cIdx)
            val s = new Array[Long](channels)
            var i = 0
            while (i + 1 < pcm.length) {
              val v = ((pcm(i) & 0xFF) | (pcm(i + 1) << 8)).toShort
              s((i / 2) % channels) += v
              i += 2
            }
            s
          }
        Row.fromSeq(row.toSeq :+ sums)
      }
    }(enc)
  }

  /** 64-bit time-domain AUDIO fingerprint over decoded PCM — the
    * audio sibling of [[perceptualHashes]], completing the
    * bytes→signature bridge for the sound tier: a re-encoded clip
    * (same samples, WAV vs AIFF vs AU) or a volume-scaled copy hashes
    * identically, which no byte-level hash can see. Construction
    * (public knowledge — the time-domain simplification of
    * energy-band fingerprinting, Haitsma & Kalker 2002's gradient-
    * sign idea): channels mix down by integer sum per frame, the clip
    * splits into 65 equal windows (frame j in window k iff
    * j ∈ [k·F div 65, (k+1)·F div 65)), window energy = Σ mix² (all
    * integer — SQL-replayable bit-for-bit), and bit k = e(k+1) >
    * e(k). Gradient signs are invariant under uniform gain (energy
    * scales by the square — comparisons unchanged), the audio
    * analogue of dHash's brightness invariance. Appends `afp`
    * (nullable long): null pcm, non-positive channel counts and
    * clips shorter than 65 frames (too short for a stable gradient
    * signature) yield null — the P6 admission discipline; null
    * signatures never enter a near-dup band
    * ([[graft.operators.Dedup.hammingNearDups]]). */
  def audioFingerprint(df: DataFrame, pcmCol: String,
                       channelsCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("afp", LongType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val pIdx = df.schema.fieldIndex(pcmCol)
    val cIdx = df.schema.fieldIndex(channelsCol)
    df.mapPartitions { it =>
      it.map { row =>
        val pcm = row.getAs[Array[Byte]](pIdx)
        val fp: java.lang.Long =
          if (pcm == null || row.isNullAt(cIdx) || row.getInt(cIdx) <= 0)
            null
          else {
            val ch = row.getInt(cIdx)
            val frames = pcm.length / 2 / ch
            if (frames < 65) null
            else {
              val mix = new Array[Long](frames)
              var j = 0
              while (j < frames) {
                var c = 0
                var s = 0L
                while (c < ch) {
                  val b = (j * ch + c) * 2
                  s += ((pcm(b) & 0xFF) | (pcm(b + 1) << 8)).toShort
                  c += 1
                }
                mix(j) = s
                j += 1
              }
              val e = new Array[Long](65)
              var k = 0
              while (k < 65) {
                // Long span math: k * frames overflows Int past
                // ~33 M frames (a long recording), garbling bounds
                var f = (k.toLong * frames / 65).toInt
                val hi = ((k + 1).toLong * frames / 65).toInt
                var acc = 0L
                while (f < hi) { acc += mix(f) * mix(f); f += 1 }
                e(k) = acc
                k += 1
              }
              var sig = 0L
              k = 0
              while (k < 64) {
                if (e(k + 1) > e(k)) sig |= 1L << k
                k += 1
              }
              sig
            }
          }
        Row.fromSeq(row.toSeq :+ fp)
      }
    }(enc)
  }

  /** The AUDIO bytes→vector bridge — [[imageEmbed]]'s sibling for the
    * acoustic modality, completing the vector tier across all three
    * modalities (text [[graft.operators.TextAnalysis.hashEmbed]],
    * image [[imageEmbed]], audio here): the channel-mixed PCM stream
    * folds into `windows` equal-span ENERGY-ENVELOPE sums
    * (sum-of-squares per window — [[audioFingerprint]]'s `e` array,
    * emitted as the vector instead of collapsed to gradient signs)
    * as an `array<double>`, ready for brute cosine, every index
    * family and the streaming ANN rung. Where the fingerprint's
    * Hamming tier answers "same recording within radius h?", the
    * cosine tier RANKS: and gain-invariance comes out EXACT — a g×
    * gain scales every energy by g² uniformly, and cosine is
    * scale-free (the fingerprint needed its sign trick for the same
    * property). All window sums are integer-exact in Long (bounded
    * far below 2^53), so the whole chain replays in SQL.
    *
    * Null/short/degenerate rows (null pcm, bad channel count, fewer
    * frames than windows) yield a null vector and SURVIVE — the
    * codec-boundary discipline shared by the whole decode family. */
  def audioEmbed(df: DataFrame, pcmCol: String, channelsCol: String,
                 windows: Int = 64,
                 out: String = "audio_embedding"): DataFrame = {
    require(windows >= 1 && windows <= 4096,
      s"windows must be in [1, 4096], got $windows")
    val schema = StructType(df.schema.fields :+
      StructField(out, ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val pIdx = df.schema.fieldIndex(pcmCol)
    val cIdx = df.schema.fieldIndex(channelsCol)
    df.mapPartitions { it =>
      it.map { row =>
        val pcm = row.getAs[Array[Byte]](pIdx)
        val vec: Array[Double] =
          if (pcm == null || row.isNullAt(cIdx) || row.getInt(cIdx) <= 0)
            null
          else {
            val ch = row.getInt(cIdx)
            val frames = pcm.length / 2 / ch
            if (frames < windows) null
            else {
              val mix = new Array[Long](frames)
              var j = 0
              while (j < frames) {
                var c = 0
                var s = 0L
                while (c < ch) {
                  val b = (j * ch + c) * 2
                  s += ((pcm(b) & 0xFF) | (pcm(b + 1) << 8)).toShort
                  c += 1
                }
                mix(j) = s
                j += 1
              }
              Array.tabulate(windows) { k =>
                // Long span math: k * frames overflows Int for clips
                // beyond ~2^31/windows frames (seconds of 44.1 kHz
                // audio at windows=4096) — worst case a negative
                // bound indexes out of mix() and KILLS the task,
                // violating the null-and-survive contract
                var f = (k.toLong * frames / windows).toInt
                val hi = ((k + 1).toLong * frames / windows).toInt
                var acc = 0L
                while (f < hi) { acc += mix(f) * mix(f); f += 1 }
                acc.toDouble
              }
            }
          }
        Row.fromSeq(row.toSeq :+ vec)
      }
    }(enc)
  }

  /** Per-channel byte sums over a raw row-major W×H×C buffer — the
    * minimal REAL feature-extract step after [[decodeImages]] (the
    * shape a mean-color / brightness / histogram feature takes):
    * appends `ch_sums` (array of `channels` longs; null pixels →
    * null). Pure per-row arithmetic in the codec boundary — no
    * shuffle, no driver state. */
  def channelSums(df: DataFrame, pixelsCol: String,
                  channels: Int = 3): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("ch_sums", ArrayType(LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(pixelsCol)
    df.mapPartitions { it =>
      it.map { row =>
        val px = row.getAs[Array[Byte]](idx)
        val sums =
          if (px == null) null
          else {
            val s = new Array[Long](channels)
            var i = 0
            while (i < px.length) {
              s(i % channels) += px(i) & 0xFF
              i += 1
            }
            s
          }
        Row.fromSeq(row.toSeq :+ sums)
      }
    }(enc)
  }

  /** REAL multi-frame decode through the codec boundary — the "video"
    * tier made concrete with the one multi-frame container the JDK
    * ships a codec for (animated GIF; the same `ImageReader` loop
    * drives any frame-indexed format a production codec registers).
    * Each payload EXPLODES to one row per frame (`frame_no`, dims,
    * channels, raw W×H×3 pixel bytes — the [[decodeImages]] layout,
    * so [[channelSums]]/[[resizeRaw]] compose unchanged downstream).
    * All-or-nothing per payload: a container that fails mid-frame
    * yields ONE null row, not a silent prefix of frames — partial
    * decodes masquerading as short videos are a worse failure mode
    * than a loud null. Mid-frame cuts throw on their own; a GIF cut
    * cleanly BETWEEN frames would decode as a shorter sequence
    * (measured), so the spec's mandatory 0x3B trailer is required
    * before the frame count is trusted (strict: trailing garbage
    * after the trailer also refuses). The guard WALKS the GIF block
    * structure ([[gifTrailerOffset]] — header, screen descriptor,
    * color tables, extension/image sub-block chains) to locate the
    * actual trailer position rather than inspecting the final byte,
    * so appended garbage that happens to end in 0x3B still refuses
    * (no 1/256 heuristic gap). Failures ride the observe counter like
    * the image/audio tiers. */
  /** Offset just PAST the GIF trailer byte (0x3B) located by walking
    * the container's block structure per the GIF89a spec — header,
    * logical screen descriptor, optional global color table, then a
    * chain of extension (0x21: label + length-prefixed sub-blocks)
    * and image (0x2C: descriptor + optional local color table + LZW
    * min-code byte + sub-blocks) blocks until the trailer. Returns −1
    * for any structural violation (truncation mid-block, unknown
    * block introducer, missing trailer). A well-formed payload with
    * nothing appended satisfies `gifTrailerOffset(b) == b.length`;
    * appended garbage — even garbage ending in 0x3B — does not,
    * because the walk finds the REAL trailer earlier. */
  private[graft] def gifTrailerOffset(bytes: Array[Byte]): Int = {
    val n = bytes.length
    if (n < 14) return -1
    val sig = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return -1
    var pos = 6 + 7 // header + logical screen descriptor
    val packed = bytes(10) & 0xFF
    if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 0x07) + 1))
    // skip a length-prefixed sub-block chain starting at p; -1 on cut
    def skipSubBlocks(start: Int): Int = {
      var p = start
      while (p < n) {
        val len = bytes(p) & 0xFF
        p += 1
        if (len == 0) return p
        p += len
      }
      -1
    }
    while (pos < n) {
      (bytes(pos) & 0xFF) match {
        case 0x3B => return pos + 1
        case 0x21 => // extension: introducer + label, then sub-blocks
          if (pos + 2 > n) return -1
          pos = skipSubBlocks(pos + 2)
          if (pos < 0) return -1
        case 0x2C => // image descriptor (9 bytes after introducer)
          if (pos + 10 > n) return -1
          val ip = bytes(pos + 9) & 0xFF
          var p = pos + 10
          if ((ip & 0x80) != 0) p += 3 * (1 << ((ip & 0x07) + 1))
          p += 1 // LZW minimum code size
          if (p > n) return -1
          pos = skipSubBlocks(p)
          if (pos < 0) return -1
        case _ => return -1
      }
    }
    -1
  }

  /** The all-or-nothing multi-frame decode shared by [[decodeFrames]]
    * (one row per frame) and [[videoSignatures]] (one signature per
    * payload): every frame as (frame_no, w, h, row-major W×H×RGB),
    * Nil for null/corrupt/torn payloads — including the GIF
    * trailer-walk guard against silent between-frame prefixes. */
  private[graft] def decodeAllFrames(bytes: Array[Byte])
      : Seq[(Int, Int, Int, Array[Byte])] =
    if (bytes == null || bytes.isEmpty) Nil
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Nil
        else {
          val reader = readers.next()
          try {
            // container-integrity guard: a GIF cut cleanly
            // BETWEEN frames decodes as a silent prefix (the
            // reader just finds fewer images — measured), so
            // walk the block structure to the spec's mandatory
            // 0x3B trailer and require it to be the FINAL byte
            // before trusting the frame count; mid-frame cuts
            // throw on their own below
            val gifTorn =
              reader.getFormatName.equalsIgnoreCase("gif") &&
              gifTrailerOffset(bytes) != bytes.length
            if (gifTorn) Nil
            else {
            // seekForwardOnly=false so getNumImages may search
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            (0 until n).map { f =>
              val img = reader.read(f)
              val w = img.getWidth; val h = img.getHeight
              val out = new Array[Byte](w * h * 3)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val base = (y * w + x) * 3
                  out(base) = ((rgb >> 16) & 0xFF).toByte
                  out(base + 1) = ((rgb >> 8) & 0xFF).toByte
                  out(base + 2) = (rgb & 0xFF).toByte
                  x += 1
                }
                y += 1
              }
              (f, w, h, out)
            }
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: java.io.IOException => Nil
              case _: RuntimeException => Nil }

  def decodeFrames(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_no", IntegerType),
      StructField("frame_w", IntegerType),
      StructField("frame_h", IntegerType),
      StructField("frame_channels", IntegerType),
      StructField("frame_pixels", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val frames = decodeAllFrames(row.getAs[Array[Byte]](idx))
        if (frames.isEmpty)
          Iterator.single(Row.fromSeq(row.toSeq ++
            Seq(null, null, null, null, null)))
        else frames.iterator.map { case (f, w, h, px) =>
          Row.fromSeq(row.toSeq ++ Seq(f, w, h, 3, px))
        }
      }
    }(enc)
      .observe(s"graft_frame_decode_${Dedup.obsId.incrementAndGet()}",
        count(lit(1)).as("rows"),
        sum(when(col("frame_no").isNull, 1L).otherwise(0L))
          .as("decode_failures"))
  }

  /** The temporal signature as a PER-ROW codec op — the stream-legal
    * face of the [[decodeFrames]] → [[perceptualHashes]] →
    * [[videoSignature]] batch route: every frame of a multi-frame
    * payload originates from ONE input row, so the whole chain
    * (decode all frames, per-frame dHash, per-bit strict-majority
    * vote) is a closed per-row computation — no frame explode, no
    * relational aggregation, legal in a plain append-mode stream.
    * Bit-identical to the batch route by construction (the decode
    * loop and the dHash math are the SAME shared helpers;
    * parity-spec'd). Appends `n_frames` and `vsig`; null/corrupt/torn
    * payloads (and payloads whose every frame fails) yield null in
    * both — the P6 admission discipline, with the same observe
    * counter as the frame tier. */
  def videoSignatures(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("n_frames", LongType),
      StructField("vsig", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { it =>
      it.map { row =>
        val frames = decodeAllFrames(row.getAs[Array[Byte]](idx))
        if (frames.isEmpty)
          Row.fromSeq(row.toSeq ++ Seq(null, null))
        else {
          val hashes = frames.map { case (_, w, h, px) =>
            dhashOf(px, w, h, 3) }
          val n = hashes.length
          var sig = 0L
          var b = 0
          while (b < 64) {
            var votes = 0
            hashes.foreach(hs => if (((hs >>> b) & 1L) == 1L) votes += 1)
            if (votes * 2 > n) sig |= 1L << b
            b += 1
          }
          Row.fromSeq(row.toSeq ++ Seq(n.toLong, sig))
        }
      }
    }(enc)
      .observe(s"graft_video_sig_${Dedup.obsId.incrementAndGet()}",
        count(lit(1)).as("rows"),
        sum(when(col("vsig").isNull, 1L).otherwise(0L))
          .as("decode_failures"))
  }

  /** The VIDEO bytes→vector bridge — the last cell of the modality ×
    * vector-tier matrix (text [[graft.operators.TextAnalysis.hashEmbed]],
    * image [[imageEmbed]], audio [[audioEmbed]], video here): every
    * frame samples onto [[imageEmbed]]'s `grid`×`grid` integer luma
    * lattice and the vector is the PER-CELL SUM across frames — a
    * temporal-pooled tiny-video embedding as `array<double>`. Like
    * [[videoSignatures]] this is a closed PER-ROW codec op (every
    * frame originates from one payload row — no frame explode, no
    * relational aggregation, stream-legal), and like the other
    * bridges it feeds every vector operator. Sum pooling keeps the
    * chain integer-exact and SQL-replayable; cosine gives the scale
    * freeness (uniform re-encodes land at exactly 1; a dropped or
    * lightly-edited frame moves the sum by one frame's share, so
    * near-copies rank just under 1 — the RANKING face of the vsig
    * majority vote's radius-h face). Null/corrupt/torn payloads →
    * null vector, same observe counter discipline. */
  def videoEmbed(df: DataFrame, binaryCol: String, grid: Int = 8,
                 out: String = "video_embedding"): DataFrame = {
    require(grid >= 1 && grid <= 64, s"grid must be in [1, 64], got $grid")
    val schema = StructType(df.schema.fields :+
      StructField(out, ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { it =>
      it.map { row =>
        val frames = decodeAllFrames(row.getAs[Array[Byte]](idx))
        val vec: Array[Double] =
          if (frames.isEmpty) null
          else {
            val acc = new Array[Long](grid * grid)
            frames.foreach { case (_, w, h, px) =>
              var i = 0
              while (i < grid * grid) {
                acc(i) += lumaAt(px, w, 3,
                  (i % grid) * w / grid, (i / grid) * h / grid)
                i += 1
              }
            }
            acc.map(_.toDouble)
          }
        Row.fromSeq(row.toSeq :+ vec)
      }
    }(enc)
      .observe(s"graft_video_embed_${Dedup.obsId.incrementAndGet()}",
        count(lit(1)).as("rows"),
        sum(when(col(out).isNull, 1L).otherwise(0L))
          .as("decode_failures"))
  }

  /** 64-bit VIDEO signature from per-frame perceptual hashes — the
    * temporal near-dup bridge for multi-frame media, making the video
    * modality's near-dup REAL for the container the JDK decodes
    * ([[decodeFrames]] → [[perceptualHashes]] over `frame_pixels` →
    * this): bit `b` of the signature is the MAJORITY VOTE of bit `b`
    * across the media's frame hashes (strict majority — ties vote 0),
    * i.e. SimHash over the frame sequence with the frame dHashes as
    * the "tokens". Integer-exact and SQL-replayable from planted
    * pixel formulas.
    *
    * Robustness, honestly stated: a re-encode or uniform brightness
    * shift leaves every frame hash unchanged (dHash gradients) →
    * identical signature; dropping/duplicating a few frames or
    * reordering scenes moves single votes → bits flip only where the
    * vote was marginal, so near-miss copies land within a small
    * Hamming radius and the [[graft.operators.Dedup.hammingNearDups]]
    * bands catch them; it is NOT a per-frame alignment (a clip
    * sharing half its scenes scores mid-range, not 0) — that finer
    * tier is the per-frame hash table itself, which this signature
    * gates cheaply at corpus scale.
    *
    * Scale shape: one 64-sum-buffer hash aggregate over the frame
    * table (the [[graft.operators.Dedup.simhash]] aggregate form —
    * frames per media are unbounded, so a collect-to-array per media
    * would not hold; partial aggregation keeps it one shuffle of
    * 64-long rows). Null frame hashes (corrupt rows from the
    * all-or-nothing decode) are excluded; media whose every frame is
    * null are ABSENT from the output — callers joining back treat a
    * missing signature as unprovable (admit), the P6 discipline. */
  def videoSignature(frames: DataFrame, idCol: String,
                     sigCol: String): DataFrame = {
    val s = col(sigCol).cast("long")
    val votes = (0 until 64).map(b =>
      sum(shiftrightunsigned(s, b).bitwiseAND(lit(1L))).as(s"__v$b"))
    frames.filter(col(sigCol).isNotNull)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), votes: _*)
      .select(col(idCol), col("__n").as("n_frames"),
        (0 until 64).map(b =>
          when(col(s"__v$b") * 2 > col("__n"), shiftleft(lit(1L), b))
            .otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("vsig"))
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size
    * chunk of the binary becomes a frame row (posexplode — the real
    * shape of a frame-sampling pipeline; the chunking stands in for
    * keyframe extraction). */
  def sampleFrames(df: DataFrame, binaryCol: String, frameBytes: Int,
                   stride: Int): DataFrame =
    df.select(col("*"),
      posexplode(expr(
        s"transform(sequence(0, greatest(int(length($binaryCol)/$frameBytes) - 1, 0), $stride), " +
          s"i -> substring($binaryCol, i*$frameBytes + 1, $frameBytes))"))
        .as(Seq("frame_no", "frame_bytes")))

  /** Nearest-neighbor resize of a RAW row-major W×H×C byte image to
    * (outW, outH) — pure index arithmetic over the payload bytes, so
    * unlike [[decodeStub]] this op is REAL end-to-end: no codec needed
    * for uncompressed frames (the shape raw video/image tensors arrive
    * in after upstream decode). Truncated payloads yield null (the
    * same admission discipline as the CAN length filter P6). Batch-wise
    * per partition like the decoder; appends `resized` + out dims. */
  def resizeRaw(df: DataFrame, binaryCol: String, inW: Int, inH: Int,
                channels: Int, outW: Int, outH: Int): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val resized = nnResize(bytes, inW, inH, channels, outW, outH)
        Row.fromSeq(row.toSeq ++ Seq(resized, outW, outH))
      }
    }(enc)
  }

  /** The shared nearest-neighbor kernel of [[resizeRaw]] (fixed-dims
    * face) and [[resizeImages]] (per-row-dims face): floor sampling
    * `sx = x*inW / outW` in integer arithmetic, length guard in LONG
    * (metadata-sized dims can overflow an Int product — the
    * [[perceptualHashes]] lesson), null in → null out. */
  private def nnResize(bytes: Array[Byte], inW: Int, inH: Int,
                       channels: Int, outW: Int, outH: Int): Array[Byte] =
    if (bytes == null || inW <= 0 || inH <= 0 || channels <= 0 ||
        bytes.length < inW.toLong * inH * channels) null
    else {
      val out = new Array[Byte](outW * outH * channels)
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * inH / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * inW / outW).toInt
          var c = 0
          while (c < channels) {
            out((y * outW + x) * channels + c) =
              bytes((sy * inW + sx) * channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }

  /** Build a synthetic media table from the documents table (text
    * bytes as payload) — used by tests and the bench to exercise the
    * plumbing with realistic row sizes. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("synthetic/raw").as("container"))
}
