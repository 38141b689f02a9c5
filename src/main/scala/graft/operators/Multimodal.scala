package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the pipeline as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs per partition so a real codec would amortize its
  * init across a batch of rows.
  *
  * The decode itself is a clearly-marked STUB (this container has no
  * image/audio libraries): it derives deterministic fake dimensions from
  * the payload bytes. Everything Spark-side — the binary column, the
  * typed `Dataset` boundary, `mapPartitions` batching, the output
  * schema — is real and is what matters at 100 TB.
  */
final case class Blob(doc_id: Long, payload: Array[Byte])
final case class Decoded(
    doc_id: Long, n_bytes: Long, width: Long, height: Long, content_md5: String)

object Multimodal {

  /** Attach a binary payload column (here: utf8 bytes of `textCol`; in a
    * real corpus this is the stored media blob). */
  def withPayload(df: DataFrame, idCol: String, textCol: String): Dataset[Blob] =
    df.select(col(idCol).cast("long").as("doc_id"),
              col(textCol).cast("binary").as("payload"))
      .as(Encoders.product[Blob])

  /** STUB decoder — a real implementation would hand `it` to an image
    * codec per batch. Deterministic: dims derive from byte length, the
    * content hash is md5 (portable to the SQL oracle). */
  def decode(blobs: Dataset[Blob]): Dataset[Decoded] =
    blobs.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { b =>
        val n = b.payload.length.toLong
        val md5hex = digest.digest(b.payload)
          .map(x => f"${x & 0xff}%02x").mkString
        digest.reset()
        Decoded(b.doc_id, n, 320 + n % 320, 240 + n % 240, md5hex)
      }
    }(Encoders.product[Decoded])

  /** Frame sampling over a video-like payload: `k` evenly-spaced fixed
    * length byte slices per blob (STUB for codec-level keyframe
    * extraction — the partitioning/explode shape is the real part).
    * Blobs shorter than one frame yield no frames. */
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
}

final case class Frame(doc_id: Long, offset: Long, frame_md5: String)

final case class AudioStats(
    doc_id: Long, n_frames: Long, max_energy: Long, argmax_off: Long)

final case class Resized(
    doc_id: Long, width: Long, height: Long,
    out_w: Long, out_h: Long, out_bytes: Long)

object MultimodalResize {

  /** Resize planning (STUB for the pixel op): fit (width, height) into a
    * `maxDim` square preserving aspect ratio — never upscale. Integer
    * math only (floor division), so the SQL oracle reproduces it
    * exactly; `out_bytes` budgets the decoded RGB buffer the real
    * resizer would allocate (out_w × out_h × 3). Runs per partition like
    * [[Multimodal.decode]] so a real codec amortizes init per batch. */
  def plan(decoded: Dataset[Decoded], maxDim: Int): Dataset[Resized] =
    decoded.mapPartitions { it =>
      it.map { d =>
        val m = math.max(d.width, d.height)
        val (ow, oh) =
          if (m <= maxDim) (d.width, d.height)
          else (d.width * maxDim / m, d.height * maxDim / m)
        Resized(d.doc_id, d.width, d.height, ow, oh, ow * oh * 3)
      }
    }(Encoders.product[Resized])
}
