package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-bucketed BLOCKED fuzzy pairing by edit distance — the scale
  * path for character-level near-dup (the family next to the token-set
  * blockers: d07 banded LSH, d58 sorted neighborhood, d61 prefix
  * filtering).
  *
  * Pigeonhole: `lev(a,b) >= |len(a)-len(b)|`, so any pair within
  * `maxDeltaLen` has bucket ids `floor(len / maxDeltaLen)` differing
  * by AT MOST ONE — if `|la-lb| <= W` then `lb ∈ [la, la+W]` crosses
  * at most one multiple-of-W boundary. The candidate phase is
  * therefore an EQUI-join on the bucket key: each doc carries its own
  * bucket on the build side, and the probe side is replicated to
  * (own bucket, own bucket − 1) so every qualifying pair is keyed at
  * its LOWER bucket. Spark plans a shuffled equi-join and the
  * quadratic distance step runs per bucket — never a corpus-wide
  * nested loop (which is what a bare theta-join
  * `|Δlen| <= W` condition degenerates to).
  *
  * Losslessness (provable, like SSJoin's filters): a pair with
  * `|Δlen| <= W` appears in EXACTLY one join arm — same-bucket pairs
  * match once per ordered direction (the `id_a < id_b` filter keeps
  * one), adjacent-bucket pairs match only as (build = lower-bucket
  * member, probe = upper member replicated down). Pairs further than
  * one bucket apart have `Δlen > W` and are correctly absent. The
  * `fuzzy` arm of [[graft.tools.Scale]] measures the per-bucket
  * quadratic cost and asserts zero lost pairs against planted
  * ground truth at 1×/10×/30×.
  *
  * Reference scope note: the reference bundle (CreateHQL.scala) has no
  * fuzzy matching; this is part of the mandated LLM-pipeline extension
  * surface.
  */
object Fuzzy {

  /** All pairs with `|len(a)-len(b)| <= maxDeltaLen` and normalized
    * similarity `1 - lev/max(len) >= minSim`, via length-bucket
    * equi-join blocking. Output: (doc_a, doc_b, lev, sim) with
    * `doc_a < doc_b`, sim rounded to 6 dp (the d99 contract).
    */
  /** The candidate phase alone: every pair with `|Δlen| <=
    * maxDeltaLen`, found by the bucket equi-join, BEFORE the distance
    * kernel runs — columns (id_a, ta, na, id_b, tb, nb). Exposed so
    * the Scale fuzzy arm can measure candidate counts (the per-bucket
    * quadratic term) separately from verification cost.
    */
  private[graft] def candidatePairs(df: DataFrame, idCol: String,
      textCol: String, maxDeltaLen: Int): DataFrame = {
    require(maxDeltaLen >= 1, s"maxDeltaLen must be >= 1: $maxDeltaLen")
    val w = maxDeltaLen.toLong
    val d = df.select(col(idCol).cast("long").as("id"),
        col(textCol).as("txt"),
        length(col(textCol)).cast("long").as("n"))
      .withColumn("bkt", floor(col("n") / w))
    val build = d.select(col("id").as("id_a"), col("txt").as("ta"),
      col("n").as("na"), col("bkt").as("ba"))
    // probe replicated down one bucket: the join key is always the
    // pair's LOWER bucket, so adjacent pairs match exactly once
    val probe = d.select(col("id").as("id_b"), col("txt").as("tb"),
        col("n").as("nb"), col("bkt").as("bb"))
      .withColumn("k", explode(array(col("bb"), col("bb") - 1)))
    build.join(probe, col("ba") === col("k"))
      .filter((col("ba") === col("bb") && col("id_a") < col("id_b")) ||
        col("bb") === col("ba") + 1)
      .filter(abs(col("na") - col("nb")) <= w)
      .select("id_a", "ta", "na", "id_b", "tb", "nb")
  }

  def blockedLevPairs(df: DataFrame, idCol: String, textCol: String,
      maxDeltaLen: Int, minSim: Double): DataFrame =
    candidatePairs(df, idCol, textCol, maxDeltaLen)
      // the distance kernel runs ONCE per pair (a named column the
      // sim projection references, not a second levenshtein call)
      .select(
        least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("lev"),
        greatest(col("na"), col("nb")).as("mx"))
      // two zero-length texts: lev=0 over max-len 0 — an identical
      // pair, sim=1 by definition (the bare division yields null and
      // silently dropped it)
      .select(col("doc_a"), col("doc_b"), col("lev"),
        round(when(col("mx") === 0, lit(1.0)).otherwise(
          lit(1.0) - col("lev").cast("double") / col("mx")), 6)
          .as("sim"))
      .filter(col("sim") >= minSim)
}
