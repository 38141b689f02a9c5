package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed suffix-array construction by prefix doubling
  * (Manber & Myers 1990; the BSP formulation of Flick & Aluru,
  * SC'15) — the exact-substring machinery behind suffix-array corpus
  * dedup (Lee et al. ACL'22, whose gram-hash approximations are d35
  * and d70; this is the exact structure they approximate).
  *
  * Semantics: suffixes are DOCUMENT-LOCAL — the array ranks the
  * multiset of all suffixes text(off..) over all documents, ordered
  * by (suffix string, doc_id, off). Matches never cross a document
  * boundary, which is exactly the dedup semantics (a "repeat"
  * spanning two unrelated concatenated docs is noise), and it
  * removes any global-offset coordination: positions are the
  * per-document explode `(doc_id, off)`.
  *
  * Mechanism, all shuffle-parallel:
  *
  *  1. SEED: rank each position by its first `seedLen` characters in
  *     one pass (a tail shorter than `seedLen` IS its whole suffix,
  *     so short suffixes are fully ordered immediately). Seeding on
  *     64-char tails replaces the first log2(64)=6 doubling rounds
  *     with one sort.
  *  2. DOUBLE: while k < max doc length, re-key every position by
  *     the pair (rank(off), rank(off+k)) — one self-equi-join on
  *     (doc_id, off+k), with rank −1 when the suffix ends before
  *     off+k (a proper prefix sorts first, matching string order) —
  *     and replace ranks by the pair's dense rank. Rounds:
  *     ceil(log2(maxLen/seedLen)), each O(n) shuffle volume.
  *  3. TIE-BREAK: equal suffixes (full-string ties across duplicate
  *     docs) get their (doc_id, off) order in one final sort.
  *
  * Dense ranking is the sorted-distinct-pairs prefix sum: distinct →
  * range-partitioned sort → `zipWithIndex` (a count-per-partition
  * job plus per-partition offsets — the distributed form of the
  * global running count). The `Window.orderBy` alternative funnels
  * the whole corpus through ONE task; `zipWithIndex` is the only
  * RDD touch in the operator and exists precisely to avoid that.
  *
  * Scale: n = total characters. Each round moves O(n) rows keyed by
  * (doc_id, off) or by rank pairs — no skew pivot (ranks are
  * near-uniform after the seed round), no driver-side state, early
  * exit as soon as all ranks are distinct (real text individuates
  * within a few hundred chars, so the loop runs 1–4 rounds past the
  * seed regardless of corpus size). */
object SuffixArray {

  /** Global 0-based index for an ALREADY-SORTED DataFrame: the
    * distributed prefix sum (per-partition counts, then offsets) via
    * `zipWithIndex`, preserving the sort order. Shared with the other
    * global-rank consumers (d87's batch assignment) — the alternative,
    * `Window.orderBy` with no partition, funnels everything through
    * one task. */
  private[graft] def zipIndex(sorted: DataFrame, outCol: String): DataFrame = {
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** Build the suffix array: returns `(rank, doc_id, off, tail)` —
    * `rank` is the dense 0-based position in suffix order (ties by
    * (doc_id, off)); `tail` is the suffix's first `seedLen` chars,
    * kept because every downstream consumer (LCP marks, repeat
    * extraction) needs exactly that window and re-deriving it costs
    * a join back to the corpus. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            seedLen: Int = 64, maxRounds: Int = 32): DataFrame = {
    val d = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .filter(length(col("text")) > 0)
    val maxLenRow = d.agg(max(length(col("text")))).head()
    // null ⇔ zero non-empty docs: skip the loop, return an empty array
    val maxLen = if (maxLenRow.isNullAt(0)) 0 else maxLenRow.getInt(0)
    val pos = d
      .select(col("doc_id"), explode(sequence(lit(0),
        length(col("text")) - 1)).as("off"),
        col("text"))
      .select(col("doc_id"), col("off"),
        expr(s"substring(text, off + 1, $seedLen)").as("tail"))
      .localCheckpoint()
    val total = pos.count()

    val seeds = zipIndex(
      pos.select("tail").distinct().orderBy("tail"), "r")
    // The doubling loop carries ONLY (doc_id, off, r) — the 64-char
    // tail would add ~seedLen bytes/position to every round's
    // self-join shuffle and checkpoint (~64× the corpus's character
    // count per round); it is re-attached ONCE after the loop with a
    // single join back to the seed projection (VERDICT r09 #5).
    var cur = pos.join(seeds, "tail")
      .select(col("doc_id"), col("off"), col("r"))
      .localCheckpoint()
    var distinctRanks = seeds.count()

    var k = seedLen.toLong
    var round = 0
    while (k < maxLen && distinctRanks < total && round < maxRounds) {
      val right = cur.select(col("doc_id"),
        (col("off") - lit(k)).cast("int").as("off"), col("r").as("r2"))
      val paired = cur.join(right, Seq("doc_id", "off"), "left")
        .select(col("doc_id"), col("off"),
          col("r").as("r1"), coalesce(col("r2"), lit(-1L)).as("r2"))
      val ranks = zipIndex(
        paired.select("r1", "r2").distinct().orderBy("r1", "r2"), "nr")
      cur = paired.join(ranks, Seq("r1", "r2"))
        .select(col("doc_id"), col("off"), col("nr").as("r"))
        .localCheckpoint()
      distinctRanks = ranks.count()
      k *= 2
      round += 1
    }
    // The final (r, doc_id, off) sort is only a TIE-BREAK — correct
    // iff every position's rank reflects its full suffix. Exiting on
    // the round cap before that point would order unequal suffixes
    // arbitrarily and return a silently wrong array, so fail loudly
    // instead (unreachable at the default maxRounds=32: k doubles
    // past any real maxLen in far fewer rounds).
    require(k >= maxLen || distinctRanks == total,
      s"SuffixArray.build: maxRounds=$maxRounds exhausted at k=$k < " +
        s"maxLen=$maxLen with $distinctRanks/$total ranks individuated — " +
        "result would be silently unordered; raise maxRounds")

    zipIndex(cur.join(pos, Seq("doc_id", "off"))
        .orderBy("r", "doc_id", "off"), "rank")
      .select(col("rank"), col("doc_id"), col("off").cast("long").as("off"),
        col("tail"))
  }

  /** Exact substring-dedup marks (Lee et al. ACL'22 §3, the exact
    * form): a position is DUPLICATED iff its suffix shares a prefix
    * of ≥ `minLen` characters with another suffix anywhere in the
    * corpus — equivalently (suffix order groups equal prefixes) iff
    * it shares one with an ADJACENT suffix in the array, so the test
    * is two rank-neighbor equi-joins, never a pairwise scan. Needs
    * `minLen <= seedLen` (the kept tail must cover the window).
    * Returns `(doc_id, off, dup)` for every position. */
  def dupMarks(sa: DataFrame, minLen: Int): DataFrame = {
    val base = sa.select(col("rank"), col("doc_id"), col("off"),
      substring(col("tail"), 1, minLen).as("p"),
      (length(col("tail")) >= minLen).as("lenOk"))
    val nxt = base.select((col("rank") - 1).as("rank"), col("p").as("pNext"))
    val prv = base.select((col("rank") + 1).as("rank"), col("p").as("pPrev"))
    base.join(nxt, Seq("rank"), "left").join(prv, Seq("rank"), "left")
      .select(col("doc_id"), col("off"),
        coalesce(col("lenOk") && (col("p") === col("pNext") ||
          col("p") === col("pPrev")), lit(false)).as("dup"))
  }
}
