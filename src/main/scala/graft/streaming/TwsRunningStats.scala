package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Running per-key (count, max) via Spark 4's arbitrary-state v2 API
  * (`transformWithState` + RocksDB state store) — the successor of
  * [[RunningStats]]'s `mapGroupsWithState`: named state variables with
  * their own encoders (value/list/map), optional TTL and timers, and
  * state that lives in RocksDB with changelog checkpointing instead of
  * the executor heap — the shape that scales state past memory at
  * 100 TB. Semantics here are identical to [[RunningStats.perKey]] so
  * both share one batch oracle.
  */
object TwsRunningStats {

  /** Two longs of state per key: count + max (max carried as raw double
    * bits would lose NaN ordering; Double.compare handles it as SQL MAX
    * does — see [[RunningStats]]). */
  private class Proc
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var st: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)](
        "countMax",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      var (c, m) =
        if (st.exists()) st.get() else (0L, Double.NegativeInfinity)
      rows.foreach { r =>
        c += 1; if (java.lang.Double.compare(r._2, m) > 0) m = r._2
      }
      st.update((c, m))
      Iterator.single((key, c, m))
    }
  }

  /** (key, value) stream → (key, running count, running max) updates —
    * one snapshot per key per micro-batch, like RunningStats. Requires
    * the RocksDB state store provider (the v2 operator rejects the
    * default HDFS-backed one). */
  def perKey(pairs: Dataset[(Long, Double)]): Dataset[(Long, Long, Double)] = {
    implicit val enc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Update())
  }
}
