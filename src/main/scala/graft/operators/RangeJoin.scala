package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BINNED range join — the scale fix for point-in-interval theta
  * joins. Spark executes a bare `p BETWEEN lo AND hi` join as a
  * broadcast nested loop (every point × every interval — the same
  * degeneracy d99's Δlen predicate had); binning turns it into a
  * shuffled/broadcast EQUI-join: points key by `floor(p / width)`,
  * each interval replicates to every bin it touches
  * (`sequence(floor(lo/width), floor(hi/width))` — span/width + 1
  * rows, any span), and the exact BETWEEN predicate re-verifies
  * after the bin match, so the binning is LOSSLESS by construction:
  * a qualifying (point, interval) pair shares the point's bin with
  * exactly one interval replica, and non-qualifying bin collisions
  * die in the verify. This is the public "binned range join"
  * optimization shape (Databricks' range-join hint, Flink's interval
  * join bucketing), hand-expressed because vanilla Spark has no such
  * rule. Width trades interval replication against bin selectivity —
  * pick ≥ the typical span so replication stays ≤ 2×.
  *
  * Reference scope note: the reference bundle (CreateHQL.scala) has
  * no joins at all; this is part of the relational extension surface
  * next to the as-of join ([[AsOf]]).
  */
object RangeJoin {

  /** Inner join of `points` to every interval containing them:
    * `lo <= p <= hi` (inclusive both ends). `pCol`/`loCol`/`hiCol`
    * are integral (epoch days, epoch seconds, numeric keys);
    * magnitudes must stay below 2^53/width (the bin id computes via
    * FP floor-division, exact in that range, and correct — unlike a
    * truncating integer div — for negative values too). Output: all
    * point columns + all interval columns. */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, loCol: String,
                      hiCol: String, width: Long): DataFrame = {
    require(width >= 1, s"bin width must be >= 1: $width")
    val p = points.withColumn("_bin",
      floor(col(pCol) / width).cast("long"))
    val i = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol) / width).cast("long"),
        floor(col(hiCol) / width).cast("long"))))
    p.join(i, Seq("_bin"))
      .filter(col(pCol).between(col(loCol), col(hiCol)))
      .drop("_bin")
  }
}
