package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Running per-key (count, max) via `mapGroupsWithState` — the
  * exactly-one-output-per-key-per-batch sibling of
  * [[PerKeySchema]]'s flatMapGroupsWithState: state is two numbers per
  * key (O(keys), independent of stream length), each micro-batch folds
  * its rows into the state and emits the updated snapshot.
  */
object RunningStats {

  /** (key, value) stream → (key, running count, running max) updates. */
  def perKey(pairs: Dataset[(Long, Double)]): Dataset[(Long, Long, Double)] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          var (c, m) = state.getOption.getOrElse((0L, Double.NegativeInfinity))
          // Double.compare, not `>`: SQL MAX treats NaN as greater than
          // every value, and a bare `NaN > m` is false (NaN would be
          // silently dropped, diverging from the batch oracle).
          rows.foreach { r =>
            c += 1; if (java.lang.Double.compare(r._2, m) > 0) m = r._2
          }
          state.update((c, m))
          (uid, c, m)
      }
  }
}
