package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row whose
  * time is `<=` the left time, per key.
  *
  * Spark has no built-in as-of join; the scalable formulation here is
  * the union + window trick: tag both sides, union them, and run one
  * `last(value, ignoreNulls)` window partitioned by key and ordered by
  * (time, side, value) — a single shuffle on the key, no join blow-up,
  * no per-row subquery. Ties on the right side resolve to the greatest
  * value column (deterministic).
  */
object AsOf {

  /** @param left      probe side (rows preserved)
    * @param right     build side (rows attached)
    * @param leftKey   join key column name on `left`
    * @param rightKey  join key column name on `right`
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightVal  value column of `right` to attach
    * @return `left` columns + `asof_<rightVal>` (null when no right row
    *         is at-or-before the left time) */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVal: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Set("_k", "_t", "_v", "_vs", "_side")
    require(leftCols.forall(!reserved.contains(_)),
      s"AsOf.join: left columns may not use the reserved names $reserved")
    val asofCol = s"asof_$rightVal"
    val vType = right.schema(rightVal).dataType

    // The attached value rides inside a struct: struct(null) is itself
    // non-null, so a right row whose VALUE is null still counts as "the
    // most recent right row" (last+ignoreNulls skips only the absent
    // marker of left rows, never a real right row).
    val l = left.select(
      (col(leftKey).as("_k") +: col(leftTime).as("_t") +:
        lit(1).as("_side") +: lit(null).cast(vType).as("_v") +:
        lit(null).cast(s"struct<_v:${vType.sql}>").as("_vs") +:
        leftCols.map(c => left(c))): _*)
    val r = right.select(
      (col(rightKey).as("_k") +: col(rightTime).as("_t") +:
        lit(0).as("_side") +: col(rightVal).as("_v") +:
        struct(col(rightVal).as("_v")).as("_vs") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    // Right rows sort before left rows at equal time (side 0 < 1), so a
    // same-instant right row is visible to the left row; among equal-time
    // right rows the greatest _v wins (ordered last, nulls first).
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc, col("_v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn(asofCol, last("_vs", ignoreNulls = true).over(w).getField("_v"))
      .filter(col("_side") === 1)
      .select((leftCols.map(col) :+ col(asofCol)): _*)
  }
}
