package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.schema.{Ddl, JNull, JType}
import graft.sources.JsonIngest

/** Structured-Streaming schema inference — the reference's incremental
  * per-record fold (`CreateHQL.scala:14-20`) lifted to event streams.
  *
  * Each micro-batch runs the single-pass [[graft.schema.RouteAgg]]
  * aggregation (distributed, O(schema) per partition); the per-batch
  * schema is merged into a driver-held evolving [[JType]] — O(schema)
  * state, exactly like the reference's accumulator, but fed by
  * cluster-parallel batches — and the DDL is re-emitted only when the
  * merged schema actually changes.
  */
object InferStream {

  /** Driver-held evolving schema (the stream's only mutable state). */
  final class SchemaEvolution(typed: Boolean = false) {
    @volatile private var current: JType = JNull
    def schema: Option[StructType] = JType.toDataType(current) match {
      case s: StructType if s.nonEmpty => Some(s)
      case _                           => None
    }
    /** Merge a batch schema; true iff the merged schema changed. */
    def merge(batch: StructType): Boolean = synchronized {
      val next = JType.merge(current, JType.fromDataType(batch), typed)
      val changed = next != current
      current = next
      changed
    }
  }

  /** Stream NDJSON files appearing under `inPath`; on every schema
    * change, emit the refreshed CREATE EXTERNAL TABLE DDL via `onDdl`.
    * Invalid lines only bump counters (poison-free routing). Pass an
    * existing [[SchemaEvolution]] to keep evolving across restarts of the
    * query (the checkpoint dedups input files; the schema state lives
    * with the caller). */
  def run(
      spark: SparkSession,
      inPath: String,
      checkpoint: String,
      tableName: String,
      location: String,
      onDdl: String => Unit,
      typed: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow(),
      state: Option[SchemaEvolution] = None): StreamingQuery = {
    val evo = state.getOrElse(new SchemaEvolution(typed))
    spark.readStream.format("text").load(inPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val stats = JsonIngest.inferRoutedStats(batch, "value", typed)
        stats.schema.foreach { s =>
          if (evo.merge(s)) {
            evo.schema.foreach(merged =>
              onDdl(Ddl.createExternalTable(merged, tableName, location)))
          }
        }
      }
      .start()
  }

  /** In-stream exact dedup on `idCols` bounded by the watermark —
    * state holds only ids newer than the watermark, so memory is
    * O(ids per watermark horizon), not O(stream). The streaming form of
    * [[graft.operators.Dedup.exact]]. */
  def dedupStream(
      events: DataFrame,
      tsCol: String,
      idCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-static enrichment join: each micro-batch of the stream is
    * joined against the (bounded) dimension table, broadcast so the
    * stream side never shuffles — the standard shape for decorating a
    * 100 TB/day event stream with reference data. The static side is
    * re-planned per batch, so a dimension backed by a table picks up
    * slowly-changing updates between batches. */
  def enrich(stream: DataFrame, dim: DataFrame,
             joinExpr: org.apache.spark.sql.Column,
             joinType: String = "inner"): DataFrame =
    stream.join(broadcast(dim), joinExpr, joinType)

  /** Event-time tumbling window aggregation with a watermark — works on
    * both a streaming and a batch DataFrame (same plan either way). */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      windowDur: String = "1 hour",
      watermark: String = "10 minutes",
      groupCols: Seq[String] = Seq("event_type")): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur) +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start") +:
        (groupCols.map(col) :+ col("n")): _*)
}
