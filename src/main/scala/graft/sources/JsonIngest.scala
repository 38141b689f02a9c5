package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.Fns
import graft.schema.{Ddl, SchemaInference}

/** NDJSON ingestion with valid/invalid routing — the reference's source +
  * routing surface (SURVEY.md §2 ops #1-3, #11) as two lazily-derived
  * DataFrames instead of NiFi relationships.
  *
  * Scale notes: the validity predicate is a codegen'd native expression
  * evaluated inside the scan's whole-stage-codegen span; no row is ever
  * collected to the driver — inference moves only O(schema) aggregation
  * buffers (see [[graft.schema.SchemaAgg]]). The reference materializes the
  * whole content on one thread and reads it twice
  * (`HiveSchemaGenerator.scala:75,98,116`); we read once and route in the
  * same pass.
  */
final case class Routed(valid: DataFrame, invalid: DataFrame)

object JsonIngest {

  /** One row per NDJSON line, column `value: STRING`
    * (reference: `CreateHQL.scala:8-20` line loop). */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Route lines: `valid` = exactly-one-JSON-object lines (admissible for
    * table inference); `invalid` = everything else, content preserved
    * unchanged (reference failure route, `HiveSchemaGenerator.scala:106-111`;
    * content preservation asserted by its tests). */
  def route(lines: DataFrame, col: String = "value"): Routed = {
    val ok = Fns.json_is_object(lines(col))
    Routed(lines.filter(ok), lines.filter(!ok))
  }

  def routeNdjson(spark: SparkSession, path: String): Routed =
    route(readLines(spark, path))

  /** End-to-end reference pipeline (SURVEY.md §3.1 Spark trace): read →
    * route → infer → render DDL. Returns (ddl, routed); None when no line
    * was a valid JSON object. */
  def inferDdl(
      spark: SparkSession,
      path: String,
      tableName: String,
      location: String,
      typed: Boolean = false): (Option[String], Routed) = {
    val routed = routeNdjson(spark, path)
    val ddl = inferDdlFromLines(
      routed.valid.select("value").as(Encoders.STRING), tableName, location, typed)
    (ddl, routed)
  }

  def inferDdlFromLines(
      lines: Dataset[String],
      tableName: String,
      location: String,
      typed: Boolean = false): Option[String] =
    SchemaInference.infer(lines, typed)
      .map(Ddl.createExternalTable(_, tableName, location))

  /** Schema inference over a JSON-string column of an arbitrary DataFrame
    * (e.g. `events.props` in the test data). `mapThreshold` applies the
    * post-aggregation attribute-map normalization: nested structs with at
    * least that many uniformly-typed keys collapse to `MAP<STRING, τ>`
    * ([[graft.schema.JType.mapify]]). */
  def inferColumnSchema(
      df: DataFrame, col: String, typed: Boolean = false,
      mapThreshold: Option[Int] = None): Option[StructType] = {
    val json = df.select(
        SchemaInference.infer_schema_agg(df(col), typed).as("schema_json"))
      .as(Encoders.STRING).head()
    SchemaInference.schemaFromJson(json)
      .map(s => mapThreshold.fold(s)(th =>
        SchemaInference.mapifySchema(s, th, typed)))
  }

  /** The whole reference pipeline — validate, route-count, infer — in ONE
    * scan and ONE parse per line (the reference reads twice,
    * `HiveSchemaGenerator.scala:75,98`; SURVEY.md §4 flags it). */
  def inferRoutedStats(
      df: DataFrame, col: String, typed: Boolean = false): graft.schema.RouteStats =
    df.select(graft.schema.RouteAgg.route_infer_agg(df(col), typed).as("r"))
      .select("r.*")
      .as(Encoders.product[graft.schema.RouteStats])
      .head()

  /** One-scan routing to two materialized sinks: rows are written under
    * `_graft_valid=true|false` partitions of `outPath`; the validity
    * predicate is evaluated once per row inside the scan's codegen span
    * (the lazy two-DataFrame [[route]] re-scans if both sides are
    * consumed — use this for bulk routing at scale). */
  def routeWrite(lines: DataFrame, outPath: String, col: String = "value"): Unit =
    lines
      .withColumn("_graft_valid", Fns.json_is_object(lines(col)))
      .write.mode("overwrite")
      .partitionBy("_graft_valid")
      .parquet(outPath)
}
