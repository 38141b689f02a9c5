package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * roll-your-own sibling of `session_window` (w03) for when the
  * per-session logic outgrows what a built-in window can express
  * (per-session enrichment, custom merge rules, emitting one row per
  * session rather than per aggregate).
  *
  * This variant keeps the key's full event-time history in state and
  * re-derives the session list on every micro-batch, emitting the
  * complete recomputed list each time (update semantics). That makes
  * the final emission correct under ANY split of the input across
  * micro-batches — late rows merge sessions retroactively — which is
  * what makes it exactly verifiable against a batch gaps-and-islands
  * oracle. The cost is O(events-per-key) state; a production stream at
  * 100 TB caps that with `EventTimeTimeout` + a watermark: sessions
  * older than the watermark can never merge again, so they are emitted
  * once and evicted, leaving O(open sessions) state per key (the same
  * eviction contract Spark's own streaming `session_window` uses).
  *
  * Reference analog: the processor's per-flowfile fold with O(schema)
  * state (`HiveSchemaGenerator.scala:60-114`) is the same
  * state-machine shape — per-key state updated per trigger — with
  * schemas in place of session lists.
  */
object Sessionize {

  /** (key, eventTimeMicros) stream → one row per session per emission:
    * (key, startUs, endUs, nEvents, rev). A new session starts when the
    * gap since the previous event is >= `gapUs`. `rev` is the number of
    * events folded into the key's state at emission time — monotone per
    * key, so the rows carrying the key's max `rev` are its final,
    * complete session list (the post-filter the caller applies).
    */
  def sessions(pairs: Dataset[(Long, Long)], gapUs: Long)
      : Dataset[(Long, Long, Long, Long, Long)] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (Long, Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long)],
         state: GroupState[Array[Long]]) =>
          val prev = state.getOption.getOrElse(Array.emptyLongArray)
          val all = (prev ++ rows.map(_._2)).sorted
          state.update(all)
          val out = ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
          if (all.nonEmpty) {
            var start = all(0); var last = all(0); var n = 1L
            var i = 1
            while (i < all.length) {
              val t = all(i)
              if (t - last >= gapUs) {
                out += ((key, start, last, n, all.length.toLong))
                start = t; n = 0L
              }
              last = t; n += 1; i += 1
            }
            out += ((key, start, last, n, all.length.toLong))
          }
          out.iterator
      }
  }
}
