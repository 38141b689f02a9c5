package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global ranking — `row_number()`/`ntile()` over a TOTAL
  * order without `Window.orderBy(...)`'s single-partition collapse
  * (Spark warns "Moving all data to a single partition"; at 100 TB
  * that is not a warning, it is a dead executor).
  *
  * Two-phase range-rank, the classic MPP pattern:
  *   1. `repartitionByRange` on the sort keys: partition i holds keys
  *      strictly below partition i+1 (RangePartitioner samples
  *      boundaries with a deterministic seed).
  *   2. Sort within each partition, then read the partition id and the
  *      LOCAL row position out of `monotonically_increasing_id()`
  *      (documented layout: partition id in the upper bits, per-row
  *      counter in the lower 33) — one narrow, codegen'd projection,
  *      no window, no extra shuffle.
  *   3. A tiny per-partition count aggregate (≤ numPartitions rows)
  *      becomes cumulative offsets; broadcast-join them back:
  *      global rank = offset(pid) + local position.
  *
  * The ranked output is deterministic as long as `sortCols` is a total
  * order (unique tie-break column), regardless of where the sampled
  * range boundaries land. The ranged data is localCheckpoint'ed so the
  * counts branch and the rank branch read the SAME materialization —
  * correctness never depends on ReuseExchange firing (two separate
  * executions could in principle sample different range boundaries).
  */
object RankOps {

  private val LocalMask = (1L << 33) - 1

  /** `df` + column `out` = 1-based global row number in `sortCols`
    * order. `sortCols` must be a total order (include a unique
    * tie-break). `numPartitions` bounds per-partition sort size; a
    * partition exceeding 2^33 rows (the `monotonically_increasing_id`
    * per-partition counter width) fails loudly instead of silently
    * corrupting ranks. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column], out: String,
                      numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftright(col("_mid"), 33).cast("int"))
      .withColumn("_lrn", (col("_mid").bitwiseAND(LocalMask)) + 1)
      .drop("_mid")
      .localCheckpoint()
    // Cumulative start offset per partition id. `counts` is at most
    // `numPartitions` rows, so the running sum is a tiny broadcast
    // theta-join (b._pid < a._pid) — no global window, no warning. The
    // assert_true guard rides the same job: a >2^33-row partition would
    // overflow _lrn into the partition-id bits, so it must abort.
    val counts = ranged.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      // Fold the guard INTO _cnt (assert_true is NULL on success, so
      // coalesce leaves the count unchanged) — a separate dropped
      // column would be pruned away by the optimizer.
      .select(col("_pid"),
        (col("_cnt") + coalesce(
          assert_true(col("_cnt") <= lit(LocalMask),
            lit("RankOps: a range partition exceeds 2^33 rows; " +
              "raise numPartitions")).cast("long"),
          lit(0L))).as("_cnt"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(coalesce(sum(col("b._cnt")), lit(0L)).as("_off"))
    ranged.join(broadcast(offsets), "_pid")
      .withColumn(out, col("_off") + col("_lrn"))
      .drop("_pid", "_lrn", "_off")
  }

  /** Exact `ntile(buckets)` over a total order, distributed as above.
    * Matches SQL NTILE semantics: bucket sizes differ by at most one,
    * the larger buckets first. */
  /** `df` + column `out` = INCLUSIVE running sum of `valCol` (cast to
    * LONG; nulls count as 0) over the total order `sortCols` — the
    * distributed prefix sum, same two-phase skeleton as
    * [[globalRowNumber]]: range-partition + local sort, an imperative
    * per-partition accumulator (genuine sequential logic — the one
    * place `mapPartitions` is the right tool), then a tiny
    * per-partition-total aggregate broadcast back as start offsets.
    * No global window, no second full shuffle: the totals aggregate
    * is map-side-combined to ≤ numPartitions rows. The ranged input
    * is localCheckpoint'ed so the totals branch and the output branch
    * read the same materialization. */
  def globalRunningSum(df: DataFrame, sortCols: Seq[Column],
                       valCol: Column, out: String,
                       numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("_v", coalesce(valCol.cast("long"), lit(0L)))
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
    val vIdx = ranged.schema.fieldIndex("_v")
    val schema2 = StructType(ranged.schema.fields ++
      Seq(StructField("_pid", IntegerType, nullable = false),
        StructField("_lcs", LongType, nullable = false)))
    val local = spark.createDataFrame(
      ranged.rdd.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var acc = 0L
        it.map { r =>
          acc += r.getLong(vIdx)
          // Seq[Any]: a bare Seq(pid, acc) would numerically widen
          // the Int pid to Long and break the row encoder
          Row.fromSeq(r.toSeq ++ Seq[Any](pid, acc))
        }
      }, schema2)
    // Inclusive local running sum ⇒ a partition's total is its max
    // _lcs; empty partitions simply contribute no offset row.
    val totals = local.groupBy("_pid").agg(max("_lcs").as("_tot"))
    val offsets = totals.as("a")
      .join(broadcast(totals.as("b")), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(coalesce(sum(col("b._tot")), lit(0L)).as("_off"))
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn(out, col("_off") + col("_lcs"))
      .drop("_pid", "_v", "_lcs", "_off")
  }

  def globalNtile(df: DataFrame, sortCols: Seq[Column], buckets: Int,
                  out: String, numPartitions: Int = 0): DataFrame = {
    val ranked = globalRowNumber(df, sortCols, "_grn", numPartitions)
    val total = ranked.groupBy().agg(count(lit(1)).as("_tot"))
    // q = floor(total/buckets), r = total % buckets; the first r
    // buckets hold q+1 rows. IntegralDivide throughout — Column./ is
    // double division, which loses exactness past 2^53 rows.
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    ranked.crossJoin(broadcast(total))
      .withColumn("_q", idiv(col("_tot"), lit(buckets.toLong)))
      .withColumn("_r", col("_tot") % lit(buckets))
      .withColumn(out,
        when(col("_grn") <= col("_r") * (col("_q") + 1),
          idiv(col("_grn") - 1, col("_q") + 1))
          .otherwise(col("_r") +
            idiv(col("_grn") - col("_r") * (col("_q") + 1) - 1,
              greatest(col("_q"), lit(1L)))) + 1)
      .drop("_grn", "_tot", "_q", "_r")
  }
}
