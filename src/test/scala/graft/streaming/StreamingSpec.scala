package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class StreamingSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  describe("InferStream.run (evolving-schema NDJSON stream)") {
    it("emits DDL once per schema change across micro-batches") {
      val in = Files.createTempDirectory("graft-stream-in").toString
      val cp = Files.createTempDirectory("graft-stream-cp").toString
      val ddls = scala.collection.mutable.ArrayBuffer.empty[String]
      val evo = new InferStream.SchemaEvolution()

      Files.writeString(java.nio.file.Paths.get(s"$in/b1.ndjson"),
        """{"a": 1}""" + "\n" + """{"a": 2, "b": "x"}""" + "\n")
      val q1 = InferStream.run(spark, in, cp, "t_stream", "/loc",
        ddl => ddls.synchronized { ddls += ddl },
        trigger = Trigger.AvailableNow(), state = Some(evo))
      q1.awaitTermination()
      assert(ddls.size == 1)
      assert(ddls.head.contains("`a` STRING") && ddls.head.contains("`b` STRING"))

      // New file with a new field → schema evolves → one more DDL
      // carrying the union of everything seen so far.
      Files.writeString(java.nio.file.Paths.get(s"$in/b2.ndjson"),
        """{"a": 3, "c": [1]}""" + "\n" + "garbage-line\n")
      val q2 = InferStream.run(spark, in, cp, "t_stream", "/loc",
        ddl => ddls.synchronized { ddls += ddl },
        trigger = Trigger.AvailableNow(), state = Some(evo))
      q2.awaitTermination()
      assert(ddls.size == 2)
      assert(ddls(1).contains("`a` STRING") && ddls(1).contains("`b` STRING")
        && ddls(1).contains("`c` ARRAY"))

      // Re-delivering an already-seen shape does NOT re-emit.
      Files.writeString(java.nio.file.Paths.get(s"$in/b3.ndjson"),
        """{"a": 9}""" + "\n")
      val q3 = InferStream.run(spark, in, cp, "t_stream", "/loc",
        ddl => ddls.synchronized { ddls += ddl },
        trigger = Trigger.AvailableNow(), state = Some(evo))
      q3.awaitTermination()
      assert(ddls.size == 2)
    }
  }

  describe("InferStream.windowedCounts (watermark + tumbling window)") {
    it("computes event-time windows on a streaming source") {
      val in = Files.createTempDirectory("graft-win-in").toString
      Files.writeString(java.nio.file.Paths.get(s"$in/e.json"),
        Seq(
          """{"ts": "2024-01-01T00:10:00Z", "event_type": "click"}""",
          """{"ts": "2024-01-01T00:20:00Z", "event_type": "click"}""",
          """{"ts": "2024-01-01T01:05:00Z", "event_type": "view"}""")
          .mkString("", "\n", "\n"))
      val schema = "ts TIMESTAMP, event_type STRING"
      val stream = spark.readStream.schema(schema).json(in)
      // Complete mode: every window is emitted each batch (append mode
      // would hold the unexpired windows back until a later batch moves
      // the watermark past them).
      val q = InferStream.windowedCounts(stream, "ts", "1 hour", "10 minutes")
        .writeStream.format("memory").queryName("win_counts")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = spark.table("win_counts")
        .select($"event_type", $"n").as[(String, Long)].collect().toSet
      assert(rows == Set(("click", 2L), ("view", 1L)))
    }
  }

  describe("PerKeySchema.evolve (flatMapGroupsWithState)") {
    it("tracks one evolving schema per key (batch mode)") {
      val pairs = Seq(
        ("k1", """{"a": 1}"""),
        ("k1", """{"b": 2}"""),
        ("k2", """{"x": true}""")).toDS()
      val out = PerKeySchema.evolve(pairs).collect()
        .map(ks => ks.key -> ks.schemaJson).toMap
      assert(out.keySet == Set("k1", "k2"))
      assert(out("k1").contains("\"a\"") && out("k1").contains("\"b\""))
      assert(out("k2").contains("\"x\""))
    }
  }
}
