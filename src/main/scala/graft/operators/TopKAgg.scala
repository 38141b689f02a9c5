package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k partial aggregation — the GATHER half of a
  * scatter-gather serve plan, as a Spark `Aggregator`: a k-bounded
  * buffer that `reduce`s map-side and `merge`s across partitions, so
  * the exchange moves at most one buffer row (≤ k entries) per
  * (group × partition) — the per-shard heap + coordinator merge
  * every search engine's fan-out runs. Selection order is (score
  * DESC, id ASC), identical to the window form's
  * `orderBy(col("score").desc, col("id").asc)`, so for equal inputs
  * the selected set and order are bit-identical.
  *
  * MEASURED honesty note (gather_topk scale row): on Spark ≥ 3.5 the
  * naive-looking `row_number().over(...)` + `filter(rk <= k)` plan
  * is NOT naive — Catalyst's WindowGroupLimit inserts a map-side
  * per-group limit before the exchange, so over 9.2M candidate rows
  * the window form shuffled 160k records (k per group × partition)
  * against this aggregator's 16k buffer rows, with equivalent
  * wall-clock. The reasons to use TopKAgg are therefore shape and
  * robustness, not raw shuffle: it yields the top-k as ONE ARRAY per
  * group (the serving payload — no re-explode/re-sort to assemble a
  * response), works where the limit-filter isn't adjacent to the
  * window (the pushdown pattern-matches the plan), and keeps the
  * gather a single aggregation when composed under foreachBatch.
  *
  * The buffer is a sorted `Seq` rather than a heap: k is small
  * (serving top-k, not analytics), `reduce` is O(1) for rows below
  * the current k-th (the common case once the buffer fills), and a
  * Seq encodes natively — the buffer must cross partial/final
  * aggregation as Catalyst data, which rules out `PriorityQueue`.
  */
object TopKAgg {

  /** (score, id) pairs in, top-k (score DESC, id ASC) out. */
  private final class TopK(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)],
        Seq[(Double, Long)]] {
    private def lt(x: (Double, Long), y: (Double, Long)): Boolean =
      x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)
    private def top(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortWith(lt).take(k)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)],
                        a: (Double, Long)): Seq[(Double, Long)] =
      if (b.length == k && lt(b.last, a)) b else top(b :+ a)
    override def merge(b1: Seq[(Double, Long)],
                       b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      top(b1 ++ b2)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder()
  }

  /** `topK(k)(scoreCol, idCol)` → `ARRAY<STRUCT<_1 DOUBLE, _2 BIGINT>>`
    * holding the group's k best by (score DESC, id ASC). */
  def topK(k: Int): (Column, Column) => Column = {
    val u = udaf(new TopK(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    (score, id) => u(score, id)
  }
}
