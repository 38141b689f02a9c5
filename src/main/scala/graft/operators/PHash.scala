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
  * candidate generation is an LSH-style BAND join — each hash emits 4
  * 16-bit bands, pairs agreeing on ANY band meet in one shuffle on
  * (band_idx, band_val), and by pigeonhole the join is LOSSLESS for
  * Hamming distance ≤ 3 (4 bands can't all differ on ≤ 3 bit flips).
  * Verification is a codegen'd popcount on the carried halves — no
  * join-back to re-fetch hashes.
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

  /** Near-dup pairs by banded Hamming join: 4×16-bit bands from
    * `(hi, lo)` → candidates meet on (band_idx, band_val); verify
    * `popcount(xor) <= maxDist` on the carried halves. Lossless for
    * `maxDist <= 3` by pigeonhole. Returns `(doc_a, doc_b, dist)`. */
  def nearDupPairs(hashes: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 3, s"4 bands are only lossless to distance 3, got $maxDist")
    val banded = hashes.select(col("doc_id"), col("hi"), col("lo"),
      posexplode(array(
        shiftright(col("hi"), 16).bitwiseAND(lit(0xffffL)),
        col("hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("lo"), 16).bitwiseAND(lit(0xffffL)),
        col("lo").bitwiseAND(lit(0xffffL)))).as(Seq("band_idx", "band_val")))
    val a = banded.select(col("doc_id").as("doc_a"), col("hi").as("ahi"),
      col("lo").as("alo"), col("band_idx"), col("band_val"))
    val b = banded.select(col("doc_id").as("doc_b"), col("hi").as("bhi"),
      col("lo").as("blo"), col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "ahi", "alo", "bhi", "blo")
      .distinct()   // a pair can agree on several bands
      .withColumn("dist",
        (bit_count(col("ahi").bitwiseXOR(col("bhi"))) +
          bit_count(col("alo").bitwiseXOR(col("blo")))).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("doc_a", "doc_b", "dist")
  }
}
