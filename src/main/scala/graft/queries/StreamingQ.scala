package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.InferStream
import Tables.events

/** Structured Streaming inside the correctness gate: the windowed
  * aggregation runs as a REAL streaming query (file source → watermarked
  * tumbling window → memory sink, AvailableNow trigger) and its result
  * table is hash-compared against the batch DuckDB oracle.
  */
object StreamingQ {

  private val runId = new AtomicInteger(0)

  val all: Seq[Q] = Seq(
    Q("w02_streaming_daily",
      "Event-time tumbling window computed by Structured Streaming " +
        "(complete mode, AvailableNow) — counts must equal the batch oracle.",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-w02").toString
        // Millisecond truncation in to_json cannot move an event across a
        // (ms-aligned) midnight boundary, so day-window counts are exact.
        events(s, dir).select(
          to_json(struct(col("ts"), col("event_type"))).as("value"))
          .write.mode("overwrite").text(s"$tmp/in")
        val stream = s.readStream
          .schema("ts TIMESTAMP, event_type STRING")
          .json(s"$tmp/in")
        val qname = s"graft_w02_${runId.incrementAndGet()}"
        val q = InferStream.windowedCounts(stream, "ts", "1 day", "1 hour")
          .writeStream.format("memory").queryName(qname)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(qname)
          .select(
            col("window_start").cast("date").as("day"),
            col("event_type"), col("n"))
          .orderBy("day", "event_type")
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        | COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)),

    Q("w03_session_window",
      "Session windows (1h inactivity gap) per user — Spark's " +
        "session_window vs a gaps-and-islands oracle.",
      (s, dir) => events(s, dir)
        .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          max("n_events").cast("long").as("max_session_events"),
          sum("n_events").cast("long").as("n_events_total"))
        .orderBy("user_id"),
      Some("""WITH x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id,
        |        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                            ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x),
        |z AS (SELECT user_id, sid, COUNT(*) AS n_events FROM y GROUP BY user_id, sid)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(MAX(n_events) AS BIGINT) AS max_session_events,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events_total
        |FROM z GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("w04_stream_static_enrich",
      "Stream-static enrichment (InferStream.enrich): the event stream " +
        "is broadcast-joined per micro-batch to the customer→nation " +
        "dimension (stream side never shuffles for the join), then " +
        "aggregated per nation — counts must equal the batch join oracle.",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-w04").toString
        events(s, dir).select(
          to_json(struct(col("event_id"), col("user_id"))).as("value"))
          .write.mode("overwrite").text(s"$tmp/in")
        val stream = s.readStream
          .schema("event_id LONG, user_id LONG")
          .json(s"$tmp/in")
        val dim = Tables.t(s, dir, "customer")
          .join(Tables.t(s, dir, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name"))
        val qname = s"graft_w04_${runId.incrementAndGet()}"
        val q = graft.streaming.InferStream
          .enrich(stream, dim, col("user_id") === col("c_custkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(qname)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(qname).orderBy("n_name")
      },
      Some("""SELECT n_name, COUNT(*) AS n
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    Q("w05_stream_stream_join",
      "Stream-stream interval join: the click stream joins the purchase " +
        "stream on user within [click, click+1h] — watermarks on BOTH " +
        "sides + the event-time range bound the join state (Spark drops " +
        "a buffered row once the other side's watermark passes its " +
        "range), so state is O(window), not O(stream). Pair counts must " +
        "equal the batch self-join oracle.",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-w05").toString
        val ev = events(s, dir)
        // to_json truncates ts to milliseconds; the oracle compares at
        // ms precision too (epoch_us // 1000), so the engines agree.
        Seq("click", "purchase").foreach { et =>
          ev.filter(col("event_type") === et)
            .select(to_json(struct(col("user_id"), col("ts"))).as("value"))
            .write.mode("overwrite").text(s"$tmp/$et")
        }
        def side(et: String, u: String, t: String) = s.readStream
          .schema("user_id LONG, ts TIMESTAMP")
          .json(s"$tmp/$et")
          .select(col("user_id").as(u), col("ts").as(t))
          .withWatermark(t, "2 hours")
        val clicks = side("click", "cu", "cts")
        val purchases = side("purchase", "pu", "pts")
        val qname = s"graft_w05_${runId.incrementAndGet()}"
        val q = clicks.join(purchases,
            col("cu") === col("pu") &&
              col("pts") >= col("cts") &&
              col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
          .writeStream.format("memory").queryName(qname)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(qname)
          .groupBy(col("cu").as("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      Some("""SELECT c.user_id, COUNT(*) AS n_pairs
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) // 1000 BETWEEN epoch_us(c.ts) // 1000
        |                            AND epoch_us(c.ts) // 1000 + 3600000
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin)),

    Q("w06_streaming_perkey_schema",
      "Custom stateful streaming operator in the gate: per-key evolving " +
        "schema via flatMapGroupsWithState (PerKeySchema.evolve, " +
        "O(schema) state per key, an output row only on change) — the " +
        "streamed result must equal the batch per-key inference (p06).",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-w06").toString
        events(s, dir)
          .select(to_json(struct(col("event_type"), col("props"))).as("value"))
          .write.mode("overwrite").text(s"$tmp/in")
        val stream = s.readStream
          .schema("event_type STRING, props STRING")
          .json(s"$tmp/in")
        import s.implicits._
        val pairs = stream
          .select(col("event_type"), col("props")).as[(String, String)]
        val qname = s"graft_w06_${runId.incrementAndGet()}"
        val q = graft.streaming.PerKeySchema.evolve(pairs)
          .writeStream.format("memory").queryName(qname)
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // evolve emits only on change, so each key's LAST update is its
        // final schema; max() collapses re-emissions deterministically
        // (all updates for a stable schema are the identical string).
        s.table(qname)
          .groupBy(col("key").as("event_type"))
          .agg(max("schemaJson").as("schema_json"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
        | '{"type":"struct","fields":[{"name":"k","type":"string","nullable":true,"metadata":{}}]}' AS schema_json
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
