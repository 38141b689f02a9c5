package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared query: a Spark plan plus (when SQL-expressible) the exact
  * DuckDB oracle the driver hash-compares against.
  *
  * Cross-engine determinism rules (every query here obeys them):
  *  - double aggregation is order-dependent → aggregate in DECIMAL
  *    (exact), cast the final value to DOUBLE;
  *  - DuckDB `SUM(BIGINT)` is HUGEINT, `year()`/`length()`/`ntile()` are
  *    BIGINT while Spark's are INT → cast both sides to BIGINT;
  *  - every result carries a total ORDER BY with a unique tie-break;
  *  - aggregate/computed columns are aliased identically on both sides
  *    (the driver sorts columns by name before hashing).
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Recursive delete for the per-run temp dirs some queries write
  * (roundtrip sinks, streaming sources) — called only after the result
  * is materialized. */
object Rm {
  def rf(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go)); f.delete(): Unit
    }
    go(new java.io.File(path))
  }
}

/** Session-catalog hygiene for `bucketBy`/`saveAsTable` writers. */
object Warehouse {

  /** Make `table` freshly claimable: drop the catalog entry AND
    * delete its storage directory. DROP alone is not enough — a
    * previous SESSION's (or a crashed run's) warehouse dir outlives
    * the in-memory catalog, and `saveAsTable` refuses to claim a
    * location that already exists (ADVICE r13: the d141 gap; one
    * helper instead of per-site copies). When a live catalog entry
    * exists, its ACTUAL location is read first and removed too — a
    * `HiveMode` session's warehouse root can differ from this
    * session's `spark.sql.warehouse.dir`, and sweeping only the
    * session warehouse would silently miss it (VERDICT r14
    * advisory); the conf-derived path is still swept for the
    * entry-less orphan-dir case. */
  def reset(s: SparkSession, table: String): Unit = {
    def toLocal(p: String): String =
      if (p.startsWith("file:"))
        new java.io.File(new java.net.URI(p)).getPath
      else p
    val catalogLoc: Option[String] =
      try {
        if (s.catalog.tableExists(table)) {
          val desc = s.sql(s"DESCRIBE FORMATTED $table")
            .where("col_name IN ('Location', 'Type')")
            .select("col_name", "data_type").collect()
            .map(r => r.getString(0) -> r.getString(1)).toMap
          // Only claim the location of a MANAGED table (ADVICE r15):
          // if a non-graft EXTERNAL table ever shares the reset name,
          // rm -rf'ing its reported Location would delete user-owned
          // data outside any warehouse. External locations are left
          // alone (logged), and the conf-derived warehouse path below
          // still covers graft's own orphan dirs.
          val managed = desc.get("Type").exists(_.trim
            .equalsIgnoreCase("MANAGED"))
          val loc = desc.get("Location").map(toLocal)
          if (managed) loc
          else {
            loc.foreach(l => System.err.println(
              s"Warehouse.reset: skipping EXTERNAL location of $table: $l"))
            None
          }
        } else None
      } catch { case _: Throwable => None }
    s.sql(s"DROP TABLE IF EXISTS $table")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    Rm.rf(new java.io.File(toLocal(wh), table).getPath)
    catalogLoc.foreach(Rm.rf)
  }
}

/** Table access for the driver-generated testdata (TESTDATA.md). */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events` with its timestamp column normalized to a session-zone
    * TIMESTAMP regardless of how the driver generated it. The testdata
    * has shipped `ts` two ways across rounds — TIMESTAMP(NANOS), which
    * Spark 4 only reads under `nanosAsLong` (arriving as LONG
    * nanoseconds), and plain TIMESTAMP(MICROS) with isAdjustedToUTC
    * false, which Spark reads as TIMESTAMP_NTZ — so the conversion
    * dispatches on the ARRIVED type instead of assuming a layout
    * (round 9: the regenerated parquet silently switched to µs and the
    * nanos-only path broke every events query). DuckDB reads both
    * layouts as a naive µs TIMESTAMP; with the session zone pinned to
    * UTC all three arrive at identical wall-clock values. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>   // nanos-as-long
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw                                 // already TIMESTAMP
    }
  }
}
