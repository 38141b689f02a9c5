package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repeated-span detection — the span-level exact-substring dedup of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better"): any n-gram occurring more than once ANYWHERE in the corpus
  * (across docs or within one) marks its token span for removal, and
  * the per-doc mask is the union of its repeated spans. Where d35/d47
  * count or cluster duplicated grams, this produces the actionable
  * per-doc numbers a masking pass needs: how many repeated-gram
  * occurrences, and how many tokens their span union covers.
  *
  * Scale shape: occurrences are one explode (`transform(sequence)` with
  * the position riding along) + one hash aggregation keyed on the
  * 64-bit gram hash (xxhash64 — ships 8 bytes per gram instead of the
  * n-token string, the d35 pre-shuffle discipline; hash collisions at
  * corpus scale conservatively over-mask a span, the safe direction
  * for training data). The occurrence→count join shuffles on the same
  * hash key, and the span-union coverage is a ×n explode of ONLY the
  * repeated occurrences followed by a distinct count per doc.
  */
object SpanDedup {

  /** `(doc_id, pos, gh)`: every n-gram occurrence with its 0-based
    * token position and 64-bit gram hash. */
  def gramOccurrences(docs: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(t) - $n), i -> " +
          s"struct(i AS pos, xxhash64(array_join(slice(t, i + 1, $n), ' ')) AS gh))"))
        .as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.gh").as("gh"))

  /** Per-doc repeated-span stats `(doc_id, n_occ, n_masked)`:
    * occurrences of corpus-repeated n-grams and the size of their
    * span union (distinct token indices covered). Docs with no
    * repeated gram are absent.
    *
    * One-pass shape: the per-gram occurrence count is a WINDOW over
    * `gh` (one shuffle; a groupBy+join-back would re-derive the whole
    * explode lineage on the join's probe side), and the two per-doc
    * numbers come from ONE aggregation after the span explode —
    * `pos` is unique within a doc, so distinct-pos counts occurrences
    * while distinct-ti sizes the span union. */
  def repeatedSpanStats(occ: DataFrame, n: Int): DataFrame =
    occ
      .withColumn("c_g", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("gh")))
      .filter(col("c_g") > 1)
      .select(col("doc_id"), col("pos"),
        explode(expr(s"sequence(pos, pos + ${n - 1})")).as("ti"))
      .groupBy("doc_id")
      .agg(countDistinct("pos").as("n_occ"),
        countDistinct("ti").as("n_masked"))
}
