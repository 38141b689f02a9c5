package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key bounded top-k via `transformWithState` with TWO named state
  * variables — a ListState holding the current top-k values and a
  * ValueState event counter — the state-composition shape
  * [[TwsRunningStats]]'s single tuple can't show. State stays O(k) per
  * key no matter the stream length; each micro-batch emits the updated
  * (count, top-k) snapshot, and the count is monotone, so the final
  * snapshot per key is the max-count row.
  */
object TwsTopK {

  private class Proc(k: Int)
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Seq[Double])] {
    @transient private var top: ListState[Double] = _
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState[Double](
        "topk", Encoders.scalaDouble, TTLConfig.NONE)
      n = getHandle.getValueState[Long](
        "nSeen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Seq[Double])] = {
      val incoming = rows.map(_._2).toList
      // Ordering[Double].reverse ranks NaN first — the same "NaN is
      // greatest" contract as SQL's ORDER BY ... DESC.
      val merged = (top.get().toList ++ incoming)
        .sorted(Ordering[Double].reverse)
        .take(k)
      top.clear()
      top.appendList(merged.toArray)
      val c = (if (n.exists()) n.get() else 0L) + incoming.size
      n.update(c)
      Iterator.single((key, c, merged))
    }
  }

  /** (key, value) stream → (key, running count, top-k values desc). */
  def perKey(pairs: Dataset[(Long, Double)], k: Int)
      : Dataset[(Long, Long, Seq[Double])] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .transformWithState(new Proc(k), TimeMode.None(), OutputMode.Update())
  }
}
