package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the pipeline as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs per partition so the codec amortizes its init
  * across a batch of rows.
  *
  * The image path is REAL end to end: [[Multimodal.withPngPayload]]
  * renders genuine PNGs (JDK `javax.imageio` — no external media libs
  * needed) with dimensions and fill color derived deterministically
  * from the row, and [[Multimodal.decode]] runs an actual
  * `ImageIO.read` per payload, reporting the decoded width/height and a
  * pixel-sum the SQL oracle reproduces in closed form from the
  * synthesis parameters — so a broken codec round-trip fails the
  * correctness gate, not just a schema check. The video-frame and audio
  * paths below operate on raw byte windows (a keyframe extractor / FFT
  * would slot into the same per-partition loop).
  */
final case class Blob(doc_id: Long, payload: Array[Byte])
final case class Decoded(
    doc_id: Long, width: Long, height: Long, n_pixels: Long, sum_red: Long)

object Multimodal {

  /** Attach a binary payload column (here: utf8 bytes of `textCol`; in a
    * real corpus this is the stored media blob). */
  def withPayload(df: DataFrame, idCol: String, textCol: String): Dataset[Blob] =
    df.select(col(idCol).cast("long").as("doc_id"),
              col(textCol).cast("binary").as("payload"))
      .as(Encoders.product[Blob])

  /** Render a REAL deterministic PNG per row: dimensions derive from
    * the text's byte length (`w = 24 + n % 53`, `h = 16 + n % 43` —
    * both reproducible in SQL), the constant fill color from the id
    * (`red = 13·id mod 256`, green/blue likewise with 17/19). The
    * payload is a genuine `javax.imageio` PNG encode, so downstream
    * [[decode]] exercises an actual codec round-trip; encode runs per
    * partition, the blobs never touch the driver. */
  def withPngPayload(df: DataFrame, idCol: String,
                     textCol: String): Dataset[Blob] =
    df.select(col(idCol).cast("long").as("_1"),
        octet_length(col(textCol)).cast("long").as("_2"))
      .as(Encoders.product[(Long, Long)])
      .mapPartitions { it =>
        it.map { case (id, n) =>
          val w = (24 + n % 53).toInt
          val h = (16 + n % 43).toInt
          val rgb = (((id * 13) % 256) << 16 |
                     ((id * 17) % 256) << 8 |
                     ((id * 19) % 256)).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          img.setRGB(0, 0, w, h, Array.fill(w * h)(rgb), 0, w)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Blob(id, bos.toByteArray)
        }
      }(Encoders.product[Blob])

  /** REAL image decode (JDK `ImageIO`, per-partition batching): reads
    * each payload as an image and reports the decoded geometry plus the
    * red-channel pixel sum — for [[withPngPayload]] synthesis the
    * oracle knows all of these in closed form, so the gate verifies the
    * full encode→bytes→decode round-trip, not a stub. */
  def decode(blobs: Dataset[Blob]): Dataset[Decoded] =
    blobs.mapPartitions { it =>
      it.map { b =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b.payload))
        require(img != null,
          s"undecodable image payload for doc ${b.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += (px(i) >>> 16) & 0xff; i += 1 }
        Decoded(b.doc_id, w.toLong, h.toLong, w.toLong * h, sum)
      }
    }(Encoders.product[Decoded])

  /** Frame sampling over a video-like payload: `k` evenly-spaced fixed
    * length byte slices per blob (byte-window stand-in for codec-level
    * keyframe extraction — a real demuxer slots into the same
    * per-partition loop). Blobs shorter than one frame yield no
    * frames. */
  def sampleFrames(blobs: Dataset[Blob], k: Int, frameLen: Int): Dataset[Frame] =
    blobs.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { b =>
        val n = b.payload.length
        if (n < frameLen) Iterator.empty
        else {
          val stride = math.max(1, (n - frameLen) / math.max(1, k - 1))
          (0 until k).iterator
            .map(i => i * stride)
            .takeWhile(_ + frameLen <= n)
            .map { off =>
              val hex = digest
                .digest(java.util.Arrays.copyOfRange(b.payload, off, off + frameLen))
                .map(x => f"${x & 0xff}%02x").mkString
              digest.reset()
              Frame(b.doc_id, off.toLong, hex)
            }
        }
      }
    }(Encoders.product[Frame])
  /** Audio-style frame analysis over a payload treated as 8-bit PCM:
    * OVERLAPPING windows of `frameLen` bytes every `hop` bytes, per-frame
    * energy = Σ sample² (exact integer — portable), folded per blob to
    * (frame count, max energy, 1-based offset of the loudest frame,
    * first on ties). The windowing + per-partition imperative fold is
    * the real part (a codec/FFT would slot into the inner loop and
    * amortize its init across the partition); blobs shorter than one
    * frame yield no row. */
  def audioFrameStats(blobs: Dataset[Blob], frameLen: Int,
                      hop: Int): Dataset[AudioStats] = {
    require(frameLen > 0 && hop > 0,
      s"frameLen ($frameLen) and hop ($hop) must be positive — " +
        "hop <= 0 would never advance the frame loop")
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val n = b.payload.length
        if (n < frameLen) Iterator.empty
        else {
          var off = 0; var best = -1L; var bestOff = 0L; var count = 0L
          while (off + frameLen <= n) {
            var e = 0L; var i = 0
            while (i < frameLen) {
              val v = (b.payload(off + i) & 0xff).toLong; e += v * v; i += 1
            }
            if (e > best) { best = e; bestOff = off + 1L }
            count += 1L; off += hop
          }
          Iterator.single(AudioStats(b.doc_id, count, best, bestOff))
        }
      }
    }(Encoders.product[AudioStats])
  }

  /** VAD-style segmentation over the [[audioFrameStats]] frame grid:
    * a frame is SPEECH iff its Σ sample² energy reaches `threshold`,
    * and maximal runs of consecutive speech frames are the segments —
    * the silence-trimming pass an audio ingest pipeline runs before
    * transcription. The entire segmentation is per-blob imperative
    * state (current-run length, segment count, longest run) inside
    * one mapPartitions — frames of a blob never leave their row, so
    * the operator has NO shuffle at all; at 100 TB it is a pure map
    * over the audio store. Blobs shorter than one frame yield no
    * row. */
  def audioVadSegments(blobs: Dataset[Blob], frameLen: Int, hop: Int,
                       threshold: Long): Dataset[VadStats] = {
    require(frameLen > 0 && hop > 0,
      "frameLen and hop must be positive")
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val n = b.payload.length
        if (n < frameLen) Iterator.empty
        else {
          var off = 0; var count = 0L; var nSpeech = 0L
          var nSeg = 0L; var run = 0L; var longest = 0L
          while (off + frameLen <= n) {
            var e = 0L; var i = 0
            while (i < frameLen) {
              val v = (b.payload(off + i) & 0xff).toLong; e += v * v; i += 1
            }
            if (e >= threshold) {
              if (run == 0L) nSeg += 1L
              run += 1L; nSpeech += 1L
              if (run > longest) longest = run
            } else run = 0L
            count += 1L; off += hop
          }
          Iterator.single(VadStats(b.doc_id, count, nSpeech, nSeg, longest))
        }
      }
    }(Encoders.product[VadStats])
  }

  /** Scene-change detection over a frame sequence — the video
    * counterpart of [[audioVadSegments]]: consecutive `frameLen`-byte
    * frames compared by byte-wise squared-difference energy, a cut
    * declared where the diff reaches `threshold`, scenes = cuts + 1.
    * Per-blob imperative state in one mapPartitions (a real codec
    * would decode into the same loop) — zero shuffle; blobs shorter
    * than two frames yield no row. */
  def frameSceneStats(blobs: Dataset[Blob], frameLen: Int,
                      threshold: Long): Dataset[SceneStats] = {
    require(frameLen > 0, "frameLen must be positive")
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val n = b.payload.length
        if (n < 2 * frameLen) Iterator.empty
        else {
          var off = 0; var cmp = 0L; var cuts = 0L
          while (off + 2 * frameLen <= n) {
            var d = 0L; var i = 0
            while (i < frameLen) {
              val x = (b.payload(off + i) & 0xff) -
                (b.payload(off + frameLen + i) & 0xff)
              d += x.toLong * x; i += 1
            }
            if (d >= threshold) cuts += 1L
            cmp += 1L; off += frameLen
          }
          Iterator.single(SceneStats(b.doc_id, cmp, cuts, cuts + 1L))
        }
      }
    }(Encoders.product[SceneStats])
  }
}

/** Robust AUDIO FINGERPRINT, the Haitsma & Kalker family (ISMIR
  * 2002, the Philips fingerprint): hash = the SIGNS of frame-energy
  * DIFFERENCES over a fixed grid — volume shifts, re-encodes and
  * small per-sample perturbations move the energies but rarely flip
  * an inequality, so perceptually-equal audio lands within a small
  * Hamming distance (measured on the planted fixture: a whole-
  * alphabet sample shift moves ≤ 1 of 64 bits). 65 overlapping
  * frames (`frameLen` bytes every `hop`), per-frame exact integer
  * energy Σ sample², bit k = E(k+1) > E(k), packed into the same
  * `(hi, lo)` 32+32 layout as [[PHash]] so `PHash.nearDupPairs`'
  * banded Hamming join (and its losslessness proof) applies
  * verbatim. Pure codegen'd column expressions — the fingerprint
  * rides the corpus scan, zero shuffle; callers must guard
  * single-byte encodable payloads (the m02/m04 ascii discipline)
  * and length ≥ hop·64 + frameLen. */
object AudioFp {
  import org.apache.spark.sql.Column
  def fingerprint(df: DataFrame, idCol: String, textCol: String,
                  frameLen: Int = 16, hop: Int = 4): DataFrame = {
    val nFrames = 65
    val es = transform(sequence(lit(0), lit(nFrames - 1)), i =>
      aggregate(sequence(lit(1), lit(frameLen)), lit(0L),
        (acc: Column, j: Column) => {
          val c = ascii(col(textCol).substr(
            (i * hop + j).cast("int"), lit(1))).cast("long")
          acc + c * c
        }))
    // let-bind the energy array and the bit array: CollapseProject
    // would otherwise inline the ~1000-node energy expression into
    // every one of the 128 downstream references and the optimizer
    // chokes (the ExprLet raison d'etre, re-learned here)
    val fp = ExprLet.let(es) { e =>
      ExprLet.let(transform(sequence(lit(1), lit(64)), k =>
        when(element_at(e, (k + 1).cast("int")) >
          element_at(e, k.cast("int")), 1L).otherwise(0L))) { bits =>
        struct(
          aggregate(sequence(lit(1), lit(32)), lit(0L),
            (acc: Column, k: Column) => acc * 2 +
              element_at(bits, k.cast("int"))).as("hi"),
          aggregate(sequence(lit(33), lit(64)), lit(0L),
            (acc: Column, k: Column) => acc * 2 +
              element_at(bits, k.cast("int"))).as("lo"))
      }
    }
    df.select(col(idCol).as("doc_id"), fp.as("fp"))
      .select(col("doc_id"), col("fp.hi").as("hi"),
        col("fp.lo").as("lo"))
  }
}

final case class WavDecoded(
    doc_id: Long, n_samples: Long, sample_rate: Long,
    sum_samples: Long, energy: Long, hi: Long, lo: Long)

/** REAL audio codec round-trip — the audio twin of the image path's
  * ImageIO discipline (m01/m09), closing round 10's gap where the
  * audio ops ran on text-bytes-as-PCM stand-ins: [[withWavPayload]]
  * builds a genuine RIFF/WAVE container (44-byte canonical header +
  * 8-bit unsigned mono PCM) whose samples derive deterministically
  * from the row id, and [[decodeFingerprint]] decodes it through an
  * ACTUAL `javax.sound.sampled.AudioSystem.getAudioInputStream` —
  * format, frame count and every sample value come from the codec,
  * not from assuming the layout — then reports sample stats plus the
  * Haitsma & Kalker 64-bit fingerprint of the DECODED samples (the
  * m12 grid: 65 overlapping frameLen-sample frames every hop, bit k =
  * E(k+1) > E(k), PHash (hi, lo) packing). The oracle reproduces all
  * of it in closed form from the synthesis parameters, so a broken
  * header write, a misparsed format, or a codec that drops samples
  * fails the hash gate, not just a schema check. Synthesis and decode
  * both run per partition; payloads never touch the driver. */
object WavCodec {

  /** Canonical 44-byte RIFF/WAVE header + 8-bit unsigned PCM data. */
  private[operators] def wavBytes(samples: Array[Int],
                                  sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                 // PCM, mono
      .putInt(sampleRate).putInt(sampleRate)   // byteRate = sr·1·1
      .putShort(1).putShort(8)                 // blockAlign, bits
      .put("data".getBytes("US-ASCII")).putInt(n)
    samples.foreach(s => bb.put((s & 0xff).toByte))
    bb.array()
  }

  /** One WAV per row: `n = 280 + (id % 64)·4` samples (≥ the 272 the
    * 65-frame fingerprint grid needs), `s_k = (37·id + k·(1 + id % 7))
    * mod 256` — an arithmetic-progression tone the SQL oracle replays
    * exactly. */
  def withWavPayload(df: DataFrame, idCol: String,
                     sampleRate: Int = 8000): Dataset[Blob] =
    df.select(col(idCol).cast("long").as("value"))
      .as(Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          val n = (280 + (id % 64) * 4).toInt
          val a = (id * 37) % 256
          val b = 1 + (id % 7)
          val samples = Array.tabulate(n)(k => ((a + k * b) % 256).toInt)
          Blob(id, wavBytes(samples, sampleRate))
        }
      }(Encoders.product[Blob])

  /** Decode through the real codec and fingerprint the decoded
    * samples. Every reported value — frame count, sample rate, sums,
    * fingerprint — is derived from what `AudioSystem` actually
    * decoded. */
  def decodeFingerprint(blobs: Dataset[Blob], frameLen: Int = 16,
                        hop: Int = 4): Dataset[WavDecoded] =
    blobs.mapPartitions { it =>
      it.map { b =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b.payload))
        val fmt = ais.getFormat
        require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 8,
          s"unexpected decoded format for doc ${b.doc_id}: $fmt")
        val nFrames = ais.getFrameLength.toInt
        val raw = ais.readAllBytes()
        ais.close()
        require(raw.length == nFrames,
          s"codec returned ${raw.length} of $nFrames frames " +
            s"for doc ${b.doc_id}")
        require(nFrames >= hop * 64 + frameLen,
          s"payload too short to fingerprint: doc ${b.doc_id}")
        val s = raw.map(_ & 0xff)
        var sum = 0L
        var energy = 0L
        s.foreach { v => sum += v; energy += v.toLong * v }
        val es = Array.tabulate(65) { i =>
          var e = 0L
          var j = 0
          while (j < frameLen) {
            val v = s(i * hop + j).toLong; e += v * v; j += 1
          }
          e
        }
        var hi = 0L
        var lo = 0L
        (1 to 32).foreach(k =>
          hi = hi * 2 + (if (es(k) > es(k - 1)) 1L else 0L))
        (33 to 64).foreach(k =>
          lo = lo * 2 + (if (es(k) > es(k - 1)) 1L else 0L))
        WavDecoded(b.doc_id, nFrames.toLong, fmt.getSampleRate.toLong,
          sum, energy, hi, lo)
      }
    }(Encoders.product[WavDecoded])
}

final case class Frame(doc_id: Long, offset: Long, frame_md5: String)

final case class AudioStats(
    doc_id: Long, n_frames: Long, max_energy: Long, argmax_off: Long)

final case class VadStats(
    doc_id: Long, n_frames: Long, n_speech: Long, n_segments: Long,
    longest_seg: Long)

final case class SceneStats(
    doc_id: Long, n_cmp: Long, n_cuts: Long, n_scenes: Long)

final case class Resized(
    doc_id: Long, width: Long, height: Long,
    out_w: Long, out_h: Long, out_bytes: Long)

object MultimodalResize {

  /** REAL aspect-preserving downscale into a `maxDim` box (never
    * upscale): each payload is decoded with `ImageIO`, the target
    * geometry computed with integer floor math (SQL-reproducible), and
    * the pixel op actually runs — `Graphics2D.drawImage` into an
    * exactly-sized RGB buffer whose decoded dimensions are what the
    * row reports. `out_bytes` is the resized RGB buffer size
    * (out_w × out_h × 3). Per-partition like [[Multimodal.decode]], so
    * codec + raster init amortize across each batch. */
  def resize(blobs: Dataset[Blob], maxDim: Int): Dataset[Resized] =
    blobs.mapPartitions { it =>
      it.map { b =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b.payload))
        require(img != null,
          s"undecodable image payload for doc ${b.doc_id}")
        val w = img.getWidth.toLong
        val h = img.getHeight.toLong
        val m = math.max(w, h)
        val (ow, oh) =
          if (m <= maxDim) (w, h)
          else (w * maxDim / m, h * maxDim / m)
        val out = new java.awt.image.BufferedImage(
          ow.toInt, oh.toInt, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.drawImage(img, 0, 0, ow.toInt, oh.toInt, null)
        g.dispose()
        Resized(b.doc_id, w, h,
          out.getWidth.toLong, out.getHeight.toLong, ow * oh * 3)
      }
    }(Encoders.product[Resized])
}

/** VIDEO near-dup by KEYFRAME-SIGNATURE sets — the video member of
  * the modality near-dup family (m09 image dHash, m12 audio
  * fingerprint): a clip is reduced to the SET of its frame
  * signatures, candidate pairs come from sharing ANY frame hash (a
  * frame-hash bucket equi-join — never all-pairs; the d07 blocking
  * shape at frame granularity), and the verify is exact set Jaccard
  * computed RELATIONALLY (shared count from the bucket join itself,
  * set sizes from a per-doc count — no array materialization). This
  * is the classic keyframe-bag video copy-detection scheme: edits
  * that drop/insert/reorder frames keep most signatures, so clipped
  * or re-cut copies stay above the Jaccard bar while unrelated clips
  * share nothing.
  *
  * The "video" payload here is the repo's deterministic byte
  * stand-in (fixed-stride windows of the text bytes as frames — the
  * container has no video codec; the image path m01/m09 carries the
  * real-codec discipline), so the Spark-side plumbing — frame
  * slicing, signature hashing, bucket-join blocking, relational
  * Jaccard — is real and oracle-gated while the decode is a
  * stand-in. */
object VideoSig {
  import org.apache.spark.sql.functions._

  /** Distinct (doc_id, frame-hash) rows: up to `maxFrames` full
    * `frameLen`-char windows, each hashed with the engine-portable
    * [[Dedup.hash60]]. */
  def frameHashes(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, frameLen: Int = 32,
                  maxFrames: Int = 8): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(transform(
          sequence(lit(0),
            least(floor(length(col(textCol)) / frameLen),
              lit(maxFrames)).cast("int") - 1),
          i => Dedup.hash60(
            col(textCol).substr(i * frameLen + 1, lit(frameLen)))))
          .as("fh"))
      .distinct()

  /** Near-dup clip pairs with exact keyframe-set Jaccard >=
    * `minJaccard`: output `(doc_a, doc_b, n_shared, jaccard)`. */
  def nearDupPairs(frames: org.apache.spark.sql.DataFrame,
                   minJaccard: Double): org.apache.spark.sql.DataFrame = {
    val sz = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n"))
    val a = frames.select(col("doc_id").as("doc_a"), col("fh"))
    val b = frames.select(col("doc_id").as("doc_b"), col("fh"))
    a.join(b, Seq("fh")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")),
        "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
