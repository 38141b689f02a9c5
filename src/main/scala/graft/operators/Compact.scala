package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — a standing chore of any 100 TB ingest
  * pipeline (streaming sinks and fine-grained routing produce
  * thousands of KB-sized files that wreck scan parallelism and
  * NameNode/listing costs).
  *
  * Strategy: measure the input's on-disk bytes via the Hadoop
  * FileSystem, pick `ceil(bytes / targetBytes)` output partitions, and
  * rewrite with `repartition(n)` (round-robin, so output files are
  * even-sized regardless of input skew). Columnar re-encoding into
  * bigger row groups also improves compression and scan throughput.
  */
object Compact {

  /** On-disk size of a path in bytes (driver-side metadata call). */
  def sizeOf(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Number of output files targeting `targetBytes` each. */
  def planPartitions(inputBytes: Long, targetBytes: Long): Int =
    math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)

  /** Rewrite `inPath` (parquet) into `outPath` with ~`targetBytes`
    * files. Returns (inputBytes, outputFiles). */
  def parquet(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): (Long, Int) = {
    val bytes = sizeOf(spark, inPath)
    val n = planPartitions(bytes, targetBytes)
    spark.read.parquet(inPath)
      .repartition(n)
      .write.mode("overwrite").parquet(outPath)
    (bytes, n)
  }

  /** Same, range-partitioned + sorted on `sortCols`: each output file
    * covers a DISJOINT key range (round-robin would smear every range
    * across all files), so parquet min/max stats actually skip files
    * for range predicates. */
  def parquetSorted(spark: SparkSession, inPath: String, outPath: String,
                    sortCols: Seq[String],
                    targetBytes: Long = 128L * 1024 * 1024): (Long, Int) = {
    val bytes = sizeOf(spark, inPath)
    val n = planPartitions(bytes, targetBytes)
    val df: DataFrame = spark.read.parquet(inPath)
    df.repartitionByRange(n, sortCols.map(df(_)): _*)
      .sortWithinPartitions(sortCols.map(df(_)): _*)
      .write.mode("overwrite").parquet(outPath)
    (bytes, n)
  }

  // --- Z-order (multi-column) clustering --------------------------------
  //
  // Single-column range sort (parquetSorted) only skips files for
  // predicates on the leading column. Interleaving the bits of k
  // per-column bucket ids into one Morton code preserves locality on
  // EVERY clustered column at once, so parquet min/max stats prune files
  // for predicates on any of them. Same layout idea as Delta/Iceberg
  // OPTIMIZE ZORDER; implemented here as plain codegen'd column
  // arithmetic + repartitionByRange — no custom physical operator.

  /** Interleave the low `bits` bits of k bucket-id columns (each must be
    * in [0, 2^bits)) into one z-value. Column 0 owns the most-significant
    * bit of each round. Pure bitwise expressions — whole-stage codegen.
    */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits * buckets.size <= 62,
      s"z-value would overflow a long: $bits bits x ${buckets.size} cols")
    val k = buckets.size
    val terms = for {
      i <- 0 until bits          // bit position within each column
      (b, j) <- buckets.zipWithIndex
    } yield {
      val outPos = i * k + (k - 1 - j)
      shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), outPos)
    }
    terms.reduce(_.bitwiseOR(_)).as("z")
  }

  /** Equal-width bucket id in [0, n) for an integral column given its
    * global min/max: `(c - min) div ceil(span / n)`. Exact integer
    * arithmetic (IntegralDivide, not Column./ which is floating-point)
    * and NO multiplication — `(c - min) * n` would overflow a long for
    * hash-derived id ranges (~2^60), silently wrapping in Spark while
    * DuckDB raises. Width-based division never exceeds the input's own
    * magnitude, so any engine computes the identical id at any range. */
  def uniformBucket(c: Column, min: Column, max: Column, n: Int): Column = {
    val off = c.cast("long") - min.cast("long")
    val span = max.cast("long") - min.cast("long") + 1L
    // ceil(span/n) as (span-1) div n + 1 — overflow-free for any span >= 1
    val width = call_function("div", span - 1L, lit(n.toLong)) + 1L
    call_function("div", off, width) // IntegralDivide: exact, codegen'd
  }

  /** Rank-based bucket id in [0, boundaries.size] — robust to skew where
    * equal-width buckets collapse. `boundaries` are ascending split
    * points (e.g. from approxQuantile); id = #boundaries <= x, evaluated
    * with a higher-order filter over a literal array (no join, no UDF). */
  def boundaryBucket(c: Column, boundaries: Seq[Double]): Column = {
    val arr = array(boundaries.map(lit): _*)
    size(filter(arr, b => c.cast("double") >= b)).cast("long")
  }

  final case class ZOrderResult(
      inputBytes: Long, files: Int, boundaries: Seq[Seq[Double]])

  /** Rank-based bucket boundaries per z-column: (2^bits - 1) ascending
    * split points from approxQuantile. Driver holds O(2^bits) doubles per
    * column — constant state at any scale; relativeError keeps bucket
    * populations near-even without a full sort. */
  def zBoundaries(df: DataFrame, zCols: Seq[String], bits: Int): Seq[Seq[Double]] = {
    val nb = 1 << bits
    // Multi-column overload: ONE stats pass over the input for all
    // z-columns (per-column calls would scan the table k times).
    df.stat.approxQuantile(
        zCols.toArray, (1 until nb).map(_.toDouble / nb).toArray, 0.25 / nb)
      .map(_.toSeq.distinct.sorted).toSeq
  }

  /** Rewrite `inPath` (parquet) z-order-clustered on `zCols` with
    * ~`targetBytes` files; files are disjoint z-ranges via
    * repartitionByRange. Returns the boundaries used so callers (and
    * tests) can recompute the exact clustering key. */
  def parquetZOrder(spark: SparkSession, inPath: String, outPath: String,
                    zCols: Seq[String], bits: Int = 8,
                    targetBytes: Long = 128L * 1024 * 1024): ZOrderResult = {
    val bytes = sizeOf(spark, inPath)
    val n = planPartitions(bytes, targetBytes)
    val df = spark.read.parquet(inPath)
    val bnds = zBoundaries(df, zCols, bits)
    val buckets = zCols.zip(bnds).map { case (c, b) => boundaryBucket(col(c), b) }
    df.withColumn("__z", zValue(buckets, bits))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
    ZOrderResult(bytes, n, bnds)
  }
}
