package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Fns
import graft.schema.Ddl
import graft.sources.JsonIngest
import Tables.events

/** Reference-parity queries: the NiFi processor's whole capability
  * (validate → route → infer → DDL, `HiveSchemaGenerator.scala:60-114`,
  * `CreateHQL.scala:6-99`) surfaced as driver-checkable queries over the
  * `events.props` JSON column.
  */
object Parity {

  /** Independent hand-written expectation for the inferred DDL over
    * `events.props` (every record is `{"k": <int>}`; Hive lattice
    * collapses the int to STRING, typed mode keeps BIGINT). */
  private def expectedDdl(hiveType: String): String =
    "DROP TABLE IF EXISTS events_props;\n" +
      "CREATE EXTERNAL TABLE events_props (\n" +
      "\t`k` " + hiveType + "\n" +
      ") ROW FORMAT SERDE 'org.apache.hive.hcatalog.data.JsonSerDe'\n" +
      "location '/tmp/events_props';"

  private def constOracle(value: String, colName: String): String =
    "SELECT '" + value.replace("'", "''") + "' AS " + colName

  val all: Seq[Q] = Seq(

    Q("p01_route_counts",
      "Valid/invalid routing counts over events.props in ONE pass " +
        "(conditional aggregate over the codegen'd json_is_object predicate — " +
        "no double scan, unlike the reference's read-twice onTrigger).",
      (s, dir) => events(s, dir).agg(
        sum(when(Fns.json_is_object(col("props")), 1L).otherwise(0L))
          .cast("long").as("n_valid"),
        sum(when(Fns.json_is_object(col("props")), 0L).otherwise(1L))
          .cast("long").as("n_invalid")),
      Some("""SELECT
        | CAST(count(*) FILTER (WHERE json_valid(props) AND json_type(props) = 'OBJECT') AS BIGINT) AS n_valid,
        | CAST(count(*) FILTER (WHERE NOT (json_valid(props) AND json_type(props) = 'OBJECT')) AS BIGINT) AS n_invalid
        |FROM events""".stripMargin)),

    Q("p02_infer_ddl",
      "End-to-end reference pipeline: distributed schema inference over " +
        "events.props (STRING-only Hive lattice) rendered as the CREATE " +
        "EXTERNAL TABLE artifact.",
      (s, dir) => {
        val ddl = JsonIngest
          .inferColumnSchema(events(s, dir), "props")
          .map(Ddl.createExternalTable(_, "events_props", "/tmp/events_props"))
          .getOrElse("!INVALID")
        import s.implicits._
        Seq(ddl).toDF("ddl")
      },
      Some(constOracle(expectedDdl("STRING"), "ddl"))),

    Q("p03_infer_ddl_typed",
      "Same pipeline on the typed lattice: integers stay BIGINT.",
      (s, dir) => {
        val ddl = JsonIngest
          .inferColumnSchema(events(s, dir), "props", typed = true)
          .map(Ddl.createExternalTable(_, "events_props", "/tmp/events_props"))
          .getOrElse("!INVALID")
        import s.implicits._
        Seq(ddl).toDF("ddl")
      },
      Some(constOracle(expectedDdl("BIGINT"), "ddl")))
    ,
    Q("p04_route_infer_single_pass",
      "Validate + route-count + infer + DDL in ONE aggregation pass " +
        "(RouteAgg): the scalable form of the reference's read-twice loop.",
      (s, dir) => {
        val stats = JsonIngest.inferRoutedStats(events(s, dir), "props")
        val ddl = stats.schema
          .map(Ddl.createExternalTable(_, "events_props", "/tmp/events_props"))
          .getOrElse("!INVALID")
        import s.implicits._
        Seq((stats.nValid, stats.nInvalid, ddl)).toDF("n_valid", "n_invalid", "ddl")
      },
      Some(("""SELECT
        | CAST(count(*) FILTER (WHERE json_valid(props) AND json_type(props) = 'OBJECT') AS BIGINT) AS n_valid,
        | CAST(count(*) FILTER (WHERE NOT (json_valid(props) AND json_type(props) = 'OBJECT')) AS BIGINT) AS n_invalid,
        | '""" + expectedDdl("STRING").replace("'", "''") + """' AS ddl
        |FROM events""").stripMargin))
    ,
    Q("p06_group_schemas",
      "Per-key schema inference: the UDAF inside groupBy — one inferred " +
        "schema per event_type, only O(groups × schema) leaves the agg.",
      (s, dir) => events(s, dir)
        .groupBy("event_type")
        .agg(graft.schema.SchemaInference
          .infer_schema_agg(col("props")).as("schema_json"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
        | '{"type":"struct","fields":[{"name":"k","type":"string","nullable":true,"metadata":{}}]}' AS schema_json
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("p05_catalog_roundtrip",
      "Op #9 end-to-end: dump the JSON column as NDJSON, infer its " +
        "schema, register the external table in the session catalog, and " +
        "query it back through the catalog by name.",
      (s, dir) => {
        val props = events(s, dir).select(col("props"))
        val tmp = java.nio.file.Files.createTempDirectory("graft-p05").toString
        props.write.mode("overwrite").text(s"$tmp/data")
        val schema = JsonIngest
          .inferColumnSchema(props, "props")
          .getOrElse(sys.error("no schema inferred"))
        val table = s"graft_p05_${CatalogRun.n.incrementAndGet()}"
        graft.catalog.Register.externalJsonTable(s, schema, table, s"$tmp/data")
        s.table(table).agg(
          count(lit(1)).as("n"),
          sum(col("k").cast("long")).cast("long").as("sum_k"))
      },
      Some("""SELECT COUNT(*) AS n,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events""".stripMargin))
  )

  private object CatalogRun {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
  }
}
