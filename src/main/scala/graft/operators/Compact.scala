package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
