package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-dup — dHash (difference hash): compare
  * horizontally adjacent pixels of a small grayscale grid to get a
  * 64-bit fingerprint that survives re-encoding and mild edits, then
  * find near-duplicates by Hamming distance. The m06/m07 content-digest
  * dedup catches byte-identical media; this catches visually-identical
  * media — the image-side analogue of MinHash for text.
  *
  * The pipeline is REAL end to end (the m01 discipline): synthesis
  * renders genuine PNGs via `javax.imageio`, hashing DECODES them and
  * reads actual pixels, and the oracle recomputes the hash in closed
  * form from the synthesis parameters — a broken codec or a wrong bit
  * order fails the hash gate. The hash is carried as two sign-free
  * 32-bit halves `(hi, lo)` so band extraction and XOR popcount behave
  * identically on engines with checked 64-bit shifts.
  *
  * Scale shape: hashing is per-partition map work (no shuffle);
  * exact-hash duplicates collapse by a direct equality join; only
  * DISTINCT hashes enter the LSH-style BAND join — each emits 4
  * 16-bit bands, pairs agreeing on ANY band meet in one shuffle on
  * (band_idx, band_val), and by pigeonhole the banding is LOSSLESS
  * for Hamming distance ≤ 3 (4 bands can't all differ on ≤ 3 bit
  * flips). Verification is a codegen'd popcount on the carried
  * halves; the doc-level expansion afterwards is output-bound. The
  * 16-bit band space (65 536 values) saturates around 10⁶ DISTINCT
  * hashes — past that, candidates grow quadratically and a deployment
  * shards the band join by a coarser partition (or widens the hash);
  * the distinct-hash collapse is what keeps dup-heavy corpora far
  * below that ceiling.
  */
final case class DHash(doc_id: Long, hi: Long, lo: Long)

object PHash {

  /** Render a 9×8 patterned PNG per row: pixel value
    * `v(x,y) = ((x·17 + y·29) · (1 + id mod 5)) mod 256` (5 pattern
    * groups), with pixel (0,0) shifted +128 when `id mod 11 = 0` — a
    * planted perturbation that flips AT MOST one dHash bit, making
    * genuine near-(not exact-)duplicates. R=G=B=v, so the gray level
    * IS v and the oracle needs no luminance weighting. 9×8 is dHash's
    * native grid; production code would first Graphics2D-downscale
    * (m03 demonstrates that resize path). */
  def withPatternPng(df: DataFrame, idCol: String): Dataset[Blob] =
    df.select(col(idCol).cast("long").as("value"))
      .as(Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 9) {
              var v = (((x * 17 + y * 29) * (1 + id % 5)) % 256).toInt
              if (id % 11 == 0 && x == 0 && y == 0) v = (v + 128) % 256
              img.setRGB(x, y, v << 16 | v << 8 | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Blob(id, bos.toByteArray)
        }
      }(Encoders.product[Blob])

  /** REAL decode + dHash: read each payload with ImageIO, compare each
    * pixel to its right neighbor on the 9×8 grid (bit `y·8+x` set iff
    * `v(x+1,y) > v(x,y)`), packed into sign-free halves — bits 0–31 in
    * `lo`, 32–63 in `hi`. */
  def dhash(blobs: Dataset[Blob]): Dataset[DHash] =
    blobs.mapPartitions { it =>
      it.map { b =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b.payload))
        require(img != null && img.getWidth == 9 && img.getHeight == 8,
          s"dhash expects a decodable 9x8 image (doc ${b.doc_id})")
        var hi = 0L; var lo = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val a = (img.getRGB(x, y) >>> 16) & 0xff
            val c = (img.getRGB(x + 1, y) >>> 16) & 0xff
            if (c > a) {
              val idx = y * 8 + x
              if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
            }
            x += 1
          }
          y += 1
        }
        DHash(b.doc_id, hi, lo)
      }
    }(Encoders.product[DHash])

  /** Near-dup pairs by banded Hamming join, in two regimes:
    *
    *  - identical hashes (distance 0 — re-encodes, byte-different
    *    copies of the same image) pair by a DIRECT equality join on
    *    `(hi, lo)`, no banding at all;
    *  - distinct hashes band-join on 4×16-bit bands — candidates meet
    *    on (band_idx, band_val), verified by a codegen'd popcount, and
    *    by pigeonhole the banding is LOSSLESS for Hamming ≤ 3.
    *
    * Banding over DISTINCT hashes (not docs) matters at corpus scale:
    * a 16-bit band has only 65 536 values, so per-doc banding's bucket
    * population — and with it the candidate count — grows
    * quadratically once the corpus passes ~10⁶ images, while
    * dup-heavy corpora collapse to far fewer distinct hashes. The
    * doc-level pair expansion after verification is output-bound by
    * construction. Returns `(doc_a, doc_b, dist)`, doc_a < doc_b. */
  def nearDupPairs(hashes: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 3, s"4 bands are only lossless to distance 3, got $maxDist")
    val h = hashes.select("doc_id", "hi", "lo")
    val same = h.select(col("doc_id").as("doc_a"), col("hi"), col("lo"))
      .join(h.select(col("doc_id").as("doc_b"), col("hi"), col("lo")),
        Seq("hi", "lo"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(0L).as("dist"))
    val dh = h.select("hi", "lo").distinct()
    val banded = dh.select(col("hi"), col("lo"),
      posexplode(array(
        shiftright(col("hi"), 16).bitwiseAND(lit(0xffffL)),
        col("hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("lo"), 16).bitwiseAND(lit(0xffffL)),
        col("lo").bitwiseAND(lit(0xffffL)))).as(Seq("band_idx", "band_val")))
    val a = banded.select(col("hi").as("ahi"), col("lo").as("alo"),
      col("band_idx"), col("band_val"))
    val b = banded.select(col("hi").as("bhi"), col("lo").as("blo"),
      col("band_idx"), col("band_val"))
    val hashPairs = a.join(b, Seq("band_idx", "band_val"))
      .filter(col("ahi") < col("bhi") ||
        (col("ahi") === col("bhi") && col("alo") < col("blo")))
      .select("ahi", "alo", "bhi", "blo")
      .distinct()   // a pair can agree on several bands
      .withColumn("dist",
        (bit_count(col("ahi").bitwiseXOR(col("bhi"))) +
          bit_count(col("alo").bitwiseXOR(col("blo")))).cast("long"))
      .filter(col("dist") <= maxDist)
    val near = hashPairs
      .join(h.select(col("doc_id").as("doc_x"), col("hi").as("ahi"),
        col("lo").as("alo")), Seq("ahi", "alo"))
      .join(h.select(col("doc_id").as("doc_y"), col("hi").as("bhi"),
        col("lo").as("blo")), Seq("bhi", "blo"))
      .select(least(col("doc_x"), col("doc_y")).as("doc_a"),
        greatest(col("doc_x"), col("doc_y")).as("doc_b"), col("dist"))
    same.unionByName(near)
  }
}
