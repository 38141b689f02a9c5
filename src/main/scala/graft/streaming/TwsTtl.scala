package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** [[TwsRunningStats]] with a state TTL — the retention knob the v2
  * state API adds over `mapGroupsWithState`: each key's ValueState is
  * stamped with an expiration (processing-time based, maintained by the
  * RocksDB state store's TTL column family) and silently evicted once
  * it lapses. At 100 TB this is how unbounded keyspaces (user ids,
  * session ids) keep state finite WITHOUT the watermark coupling of
  * `dropDuplicatesWithinWatermark`: retention is a per-state-variable
  * policy, not a query-wide event-time bound.
  *
  * The TTL here (10 minutes) deliberately exceeds any test run's wall
  * clock, so no state expires mid-run and the result stays exactly
  * batch-equivalent for the oracle; production deployments set
  * minutes-to-hours and accept cold-start re-aggregation after expiry.
  * TTL requires `TimeMode.ProcessingTime` (enforced by Spark).
  */
object TwsTtl {

  private class Proc(ttl: java.time.Duration)
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var st: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)](
        "countMaxTtl",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        new TTLConfig(ttl))

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

  /** (key, value) stream → (key, running count, running max) updates
    * with TTL'd per-key state. Requires the RocksDB state store
    * provider, like [[TwsRunningStats.perKey]]. */
  def perKey(pairs: Dataset[(Long, Double)],
             ttl: java.time.Duration = java.time.Duration.ofMinutes(10))
      : Dataset[(Long, Long, Double)] = {
    implicit val enc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaDouble)
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .transformWithState(new Proc(ttl), TimeMode.ProcessingTime(),
        OutputMode.Update())
  }
}
