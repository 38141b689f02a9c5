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

  describe("InferStream.windowedCounts (late data past the watermark)") {
    it("drops a late event instead of re-opening its closed window") {
      val in = Files.createTempDirectory("graft-late-in").toString
      val cp = Files.createTempDirectory("graft-late-cp").toString
      val out = Files.createTempDirectory("graft-late-out").toString
      val schema = "ts TIMESTAMP, event_type STRING"
      def run(): Unit = {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").json(in)
        val q = InferStream.windowedCounts(stream, "ts", "1 hour", "10 minutes")
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // Run 1: one on-time click + a 03:00 event that advances the
      // watermark to 02:50, sealing the [00:00, 01:00) window.
      Files.writeString(java.nio.file.Paths.get(s"$in/a.json"),
        """{"ts": "2024-01-01T00:10:00Z", "event_type": "click"}""" + "\n" +
          """{"ts": "2024-01-01T03:00:00Z", "event_type": "click"}""" + "\n")
      run()
      // Run 2 (same checkpoint, so the watermark survives): a LATE
      // 00:20 event behind the 02:50 watermark plus a 06:00 event that
      // closes the 03:00 window too.
      Files.writeString(java.nio.file.Paths.get(s"$in/b.json"),
        """{"ts": "2024-01-01T00:20:00Z", "event_type": "click"}""" + "\n" +
          """{"ts": "2024-01-01T06:00:00Z", "event_type": "click"}""" + "\n")
      run()
      val got = spark.read.parquet(out)
        .select($"window_start".cast("string"), $"n")
        .as[(String, Long)].collect().toSet
      // The 00:00 window emits n=1 — the late 00:20 click was dropped,
      // not merged (n=2 would mean the watermark failed).
      assert(got == Set(
        ("2024-01-01 00:00:00", 1L), ("2024-01-01 03:00:00", 1L)))
    }
  }

  describe("InferStream.dedupStream (watermark-bounded exact dedup)") {
    it("drops duplicate ids within the watermark horizon") {
      val in = Files.createTempDirectory("graft-dedup-in").toString
      Files.writeString(java.nio.file.Paths.get(s"$in/e.json"),
        Seq(
          """{"ts": "2024-01-01T00:10:00Z", "id": 1}""",
          """{"ts": "2024-01-01T00:11:00Z", "id": 1}""",   // dup
          """{"ts": "2024-01-01T00:12:00Z", "id": 2}""",
          """{"ts": "2024-01-01T00:13:00Z", "id": 2}""",   // dup
          """{"ts": "2024-01-01T00:14:00Z", "id": 3}""")
          .mkString("", "\n", "\n"))
      val stream = spark.readStream.schema("ts TIMESTAMP, id LONG").json(in)
      val q = InferStream.dedupStream(stream, "ts", Seq("id"), "10 minutes")
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val ids = spark.table("dedup_out").select($"id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    }
  }

  describe("InferStream.enrich (stream-static broadcast join)") {
    it("joins each micro-batch against the static dimension") {
      val in = Files.createTempDirectory("graft-enrich-in").toString
      Files.writeString(java.nio.file.Paths.get(s"$in/e.json"),
        Seq(
          """{"uid": 1, "v": 10}""",
          """{"uid": 2, "v": 20}""",
          """{"uid": 1, "v": 30}""",
          """{"uid": 9, "v": 99}""")   // no dimension row → dropped (inner)
          .mkString("", "\n", "\n"))
      val stream = spark.readStream.schema("uid LONG, v LONG").json(in)
      val dim = Seq((1L, "gold"), (2L, "silver")).toDF("uid2", "tier")
      val q = InferStream.enrich(stream, dim, $"uid" === $"uid2")
        .groupBy($"tier").agg(org.apache.spark.sql.functions.sum($"v").as("s"))
        .writeStream.format("memory").queryName("enrich_out")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = spark.table("enrich_out")
        .as[(String, Long)].collect().toSet
      assert(rows == Set(("gold", 40L), ("silver", 20L)))
    }
  }

  describe("Compact (small-file compaction)") {
    it("rewrites many small files into the planned number of outputs") {
      import graft.operators.Compact
      val in = Files.createTempDirectory("graft-compact-in").toString
      val out = Files.createTempDirectory("graft-compact-out").toString
      // 20 tiny files
      spark.range(0, 2000).repartition(20)
        .write.mode("overwrite").parquet(in)
      val nIn = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
      assert(nIn == 20)
      val bytes = Compact.sizeOf(spark, in)
      assert(bytes > 0)
      assert(Compact.planPartitions(100, 50) == 2)
      assert(Compact.planPartitions(101, 50) == 3)
      assert(Compact.planPartitions(1, 1000) == 1)
      // Target = whole input in one file.
      val (reported, planned) = Compact.parquet(spark, in, out, targetBytes = bytes)
      assert(reported == bytes && planned == 1)
      val nOut = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
      assert(nOut == 1)
      assert(spark.read.parquet(out).count() == 2000)
      // Sorted variant keeps data + ordering within files.
      val out2 = Files.createTempDirectory("graft-compact-out2").toString
      Compact.parquetSorted(spark, in, out2, Seq("id"), targetBytes = bytes)
      assert(spark.read.parquet(out2).count() == 2000)
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

  describe("Sessionize.sessions (stateful sessionization across batches)") {
    it("retroactively merges sessions when late gap-filling rows arrive") {
      val in = Files.createTempDirectory("graft-sess-in").toString
      val cp = Files.createTempDirectory("graft-sess-cp").toString
      // foreachBatch collector (memory sink cannot recover a checkpoint).
      val seen = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long)]
      def run(): Unit = {
        val pairs = spark.readStream.schema("k LONG, ts LONG").json(in)
          .select($"k", $"ts").as[(Long, Long)]
        val q = Sessionize.sessions(pairs, gapUs = 100L)
          .writeStream
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long)],
             _: Long) => seen.synchronized { seen ++= b.collect() }; ()
          }
          .outputMode("update").option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      // Batch 1: two events 200 apart (>= gap 100) → two singleton sessions.
      Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
        """{"k":1,"ts":0}""" + "\n" + """{"k":1,"ts":200}""" + "\n")
      run()
      assert(seen.toSet == Set((1L, 0L, 0L, 1L, 2L), (1L, 200L, 200L, 1L, 2L)))
      // Batch 2 (same checkpoint → same state): late events at 60 and 140
      // bridge the gap — all four events collapse into ONE session.
      seen.clear()
      Files.writeString(java.nio.file.Paths.get(s"$in/b2.json"),
        """{"k":1,"ts":60}""" + "\n" + """{"k":1,"ts":140}""" + "\n")
      run()
      assert(seen.filter(_._5 == 4L).toSet == Set((1L, 0L, 200L, 4L, 4L)))
    }
  }

  describe("TwsRunningStats.perKey (transformWithState, RocksDB state)") {
    it("carries (count, max) state across micro-batches") {
      val in = Files.createTempDirectory("graft-tws-in").toString
      val cp = Files.createTempDirectory("graft-tws-cp").toString
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(provKey)
      spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val seen = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Double)]
        def run(): Unit = {
          val pairs = spark.readStream.schema("k LONG, v DOUBLE").json(in)
            .select($"k", $"v").as[(Long, Double)]
          val q = TwsRunningStats.perKey(pairs)
            .writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[(Long, Long, Double)],
               _: Long) => seen.synchronized { seen ++= b.collect() }; ()
            }
            .outputMode("update").option("checkpointLocation", cp)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
          """{"k":1,"v":2.5}""" + "\n" + """{"k":1,"v":1.0}""" + "\n" +
            """{"k":2,"v":-3.0}""" + "\n")
        run()
        assert(seen.toSet == Set((1L, 2L, 2.5), (2L, 1L, -3.0)))
        // Batch 2 on the same checkpoint: RocksDB state resumes — counts
        // keep climbing and key 2's max survives a smaller new value.
        seen.clear()
        Files.writeString(java.nio.file.Paths.get(s"$in/b2.json"),
          """{"k":1,"v":9.0}""" + "\n" + """{"k":2,"v":-5.0}""" + "\n")
        run()
        assert(seen.toSet == Set((1L, 3L, 9.0), (2L, 2L, -3.0)))
      } finally prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None    => spark.conf.unset(provKey)
      }
    }
  }

  describe("TwsLshGate.perBucket (TTL'd bucket-owner state)") {
    // VERDICT r08 #1(b): ownership must AGE OUT — after the TTL the
    // next arrival in the bucket is admitted and becomes the new owner,
    // and cross-batch admission is first-writer-wins (a smaller id
    // arriving later is the one rejected; an online gate cannot retract
    // an admission it already made).
    it("re-admits after the owner ages out, then the new owner wins") {
      val tmp = Files.createTempDirectory("graft-lshgate-ttl")
      val in = tmp.resolve("in"); Files.createDirectories(in)
      val stage = tmp.resolve("stage"); Files.createDirectories(stage)
      val cp = Files.createTempDirectory("graft-lshgate-cp").toString
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(provKey)
      spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val seen =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
        val rows = spark.readStream.schema("b INT, sig LONG, d LONG")
          .json(in.toString)
          .select($"b", $"sig", $"d").as[(Int, Long, Long)]
        val q = graft.streaming.TwsLshGate
          .perBucket(rows, ttl = java.time.Duration.ofSeconds(2))
          .writeStream
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[(Long, Boolean)], _: Long) =>
              seen.synchronized { seen ++= b.collect() }; ()
          }
          .outputMode("update").option("checkpointLocation", cp)
          .trigger(Trigger.ProcessingTime("100 milliseconds"))
          .start()
        // every row targets ONE bucket (band 0, sig 42): each doc emits
        // exactly one output row, so seen.size is the arrival barrier
        def put(name: String, lines: String): Unit = {
          val f = stage.resolve(name)
          Files.writeString(f, lines)
          Files.move(f, in.resolve(name),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE); ()
        }
        def waitFor(n: Int): Unit = {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (seen.synchronized(seen.size) < n && q.exception.isEmpty &&
              System.nanoTime() < deadline)
            Thread.sleep(100)
          q.exception.foreach(throw _)
          assert(seen.synchronized(seen.size) >= n)
        }
        // batch 1: 100 seeds the bucket (admitted), 150 is flagged
        put("b1.json",
          """{"b":0,"sig":42,"d":100}""" + "\n" +
            """{"b":0,"sig":42,"d":150}""" + "\n")
        waitFor(2)
        assert(seen.synchronized(seen.toSet) ==
          Set((100L, false), (150L, true)))
        // owner 100 ages out (TTL 2 s) → 200 is RE-admitted as owner
        Thread.sleep(3000)
        seen.synchronized(seen.clear())
        put("b2.json", """{"b":0,"sig":42,"d":200}""" + "\n")
        waitFor(1)
        assert(seen.synchronized(seen.toSet) == Set((200L, false)))
        // 50 < 200 but arrives LATER, inside 200's TTL → rejected
        seen.synchronized(seen.clear())
        put("b3.json", """{"b":0,"sig":42,"d":50}""" + "\n")
        waitFor(1)
        assert(seen.synchronized(seen.toSet) == Set((50L, true)))
        q.stop(); q.awaitTermination()
      } finally prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None    => spark.conf.unset(provKey)
      }
    }
  }

  describe("TwsSemGate.perCell (TTL'd admitted-vector state)") {
    // the ONLINE-greedy property that distinguishes the gate from
    // d36's batch rule: a REJECTED vector never enters the state, so a
    // later vector similar only to a rejected one is admitted; and
    // admission re-opens after the TTL ages the cell out.
    it("gates on admitted vectors only, and re-admits after TTL") {
      val tmp = Files.createTempDirectory("graft-semgate-ttl")
      val in = tmp.resolve("in"); Files.createDirectories(in)
      val stage = tmp.resolve("stage"); Files.createDirectories(stage)
      val cp = Files.createTempDirectory("graft-semgate-cp").toString
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(provKey)
      spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val seen =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
        val rows = spark.readStream
          .schema("b STRING, d LONG, v ARRAY<DOUBLE>").json(in.toString)
          .select($"b", $"d", $"v").as[(String, Long, Array[Double])]
        val q = graft.streaming.TwsSemGate
          .perCell(rows, theta = 0.35,
            ttl = java.time.Duration.ofSeconds(2))
          .writeStream
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[(Long, Boolean)], _: Long) =>
              seen.synchronized { seen ++= b.collect() }; ()
          }
          .outputMode("update").option("checkpointLocation", cp)
          .trigger(Trigger.ProcessingTime("100 milliseconds"))
          .start()
        def put(name: String, lines: String): Unit = {
          val f = stage.resolve(name)
          Files.writeString(f, lines)
          Files.move(f, in.resolve(name),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE); ()
        }
        def waitFor(n: Int): Unit = {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (seen.synchronized(seen.size) < n && q.exception.isEmpty &&
              System.nanoTime() < deadline)
            Thread.sleep(100)
          q.exception.foreach(throw _)
          assert(seen.synchronized(seen.size) >= n)
        }
        // one cell; unit vectors at 0deg/60deg/120deg/5deg:
        // cos(A,B)=0.5>=0.35, cos(A,X)=-0.5, cos(B,X)=0.5
        // batch 1: A admitted; B rejected (hits A)
        put("b1.json",
          """{"b":"c","d":100,"v":[1.0,0.0]}""" + "\n" +
            """{"b":"c","d":150,"v":[0.5,0.8660254]}""" + "\n")
        waitFor(2)
        assert(seen.synchronized(seen.toSet) ==
          Set((100L, true), (150L, false)))
        // batch 2: X hits ONLY the rejected B -> admitted (B never
        // entered the state; d36's batch any-earlier rule would say no)
        seen.synchronized(seen.clear())
        put("b2.json",
          """{"b":"c","d":50,"v":[-0.5,0.8660254]}""" + "\n")
        waitFor(1)
        assert(seen.synchronized(seen.toSet) == Set((50L, true)))
        // state {A, X} ages out (TTL 2 s) -> Y at 5deg from A admitted
        Thread.sleep(3000)
        seen.synchronized(seen.clear())
        put("b3.json",
          """{"b":"c","d":200,"v":[0.9961947,0.08715574]}""" + "\n")
        waitFor(1)
        assert(seen.synchronized(seen.toSet) == Set((200L, true)))
        q.stop(); q.awaitTermination()
      } finally prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None    => spark.conf.unset(provKey)
      }
    }

    // the admitted-vector ListState must survive a query restart: the
    // gate's decisions after resuming from the checkpoint depend on
    // vectors admitted BEFORE the stop (w23's recovery contract for
    // the TwS ListState shape, which the agg/interval restart probes
    // don't cover).
    it("recovers the admitted set from the checkpoint across restart") {
      val tmp = Files.createTempDirectory("graft-semgate-ckpt")
      val in = tmp.resolve("in"); Files.createDirectories(in)
      val stage = tmp.resolve("stage"); Files.createDirectories(stage)
      val cp = Files.createTempDirectory("graft-semgate-cp2").toString
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(provKey)
      spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val seen =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
        def startQuery() = {
          val rows = spark.readStream
            .schema("b STRING, d LONG, v ARRAY<DOUBLE>").json(in.toString)
            .select($"b", $"d", $"v").as[(String, Long, Array[Double])]
          graft.streaming.TwsSemGate
            .perCell(rows, theta = 0.35,
              ttl = java.time.Duration.ofMinutes(10))
            .writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[(Long, Boolean)], _: Long) =>
                seen.synchronized { seen ++= b.collect() }; ()
            }
            .outputMode("update").option("checkpointLocation", cp)
            .trigger(Trigger.ProcessingTime("100 milliseconds"))
            .start()
        }
        def put(name: String, lines: String): Unit = {
          val f = stage.resolve(name)
          Files.writeString(f, lines)
          Files.move(f, in.resolve(name),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE); ()
        }
        def waitFor(q: org.apache.spark.sql.streaming.StreamingQuery,
                    n: Int): Unit = {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (seen.synchronized(seen.size) < n && q.exception.isEmpty &&
              System.nanoTime() < deadline)
            Thread.sleep(100)
          q.exception.foreach(throw _)
          assert(seen.synchronized(seen.size) >= n)
        }
        // run 1: A admitted
        val q1 = startQuery()
        put("b1.json", """{"b":"c","d":100,"v":[1.0,0.0]}""" + "\n")
        waitFor(q1, 1)
        assert(seen.synchronized(seen.toSet) == Set((100L, true)))
        q1.stop(); q1.awaitTermination()
        // run 2, same checkpoint: B at 5deg from A must be REJECTED —
        // only possible if A's vector was recovered from the store
        seen.synchronized(seen.clear())
        val q2 = startQuery()
        put("b2.json",
          """{"b":"c","d":150,"v":[0.9961947,0.08715574]}""" + "\n" +
            """{"b":"c","d":151,"v":[0.0,1.0]}""" + "\n")
        waitFor(q2, 2)
        // foreachBatch is at-least-once: the restart may REPLAY the
        // last batch (re-emitting 100's decision) — filter to the new
        // ids; what matters is that 150 is rejected, which is only
        // possible if A's vector came back from the store
        assert(seen.synchronized(seen.toSet).filter(_._1 >= 150L) ==
          Set((150L, false), (151L, true)))
        q2.stop(); q2.awaitTermination()
      } finally prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None    => spark.conf.unset(provKey)
      }
    }
  }

  describe("TwsTopK.perKey (transformWithState, ListState + ValueState)") {
    it("keeps an O(k) top-k list per key across micro-batches") {
      val in = Files.createTempDirectory("graft-twstk-in").toString
      val cp = Files.createTempDirectory("graft-twstk-cp").toString
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(provKey)
      spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val seen = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Seq[Double])]
        def run(): Unit = {
          val pairs = spark.readStream.schema("k LONG, v DOUBLE").json(in)
            .select($"k", $"v").as[(Long, Double)]
          val q = TwsTopK.perKey(pairs, k = 2)
            .writeStream
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[(Long, Long, Seq[Double])],
               _: Long) => seen.synchronized { seen ++= b.collect() }; ()
            }
            .outputMode("update").option("checkpointLocation", cp)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
          """{"k":1,"v":5.0}""" + "\n" + """{"k":1,"v":1.0}""" + "\n" +
            """{"k":1,"v":3.0}""" + "\n")
        run()
        assert(seen.toList == List((1L, 3L, Seq(5.0, 3.0))))
        // Batch 2 resumes the RocksDB list: 4.0 displaces 3.0, the
        // counter keeps climbing, and the list never exceeds k=2.
        seen.clear()
        Files.writeString(java.nio.file.Paths.get(s"$in/b2.json"),
          """{"k":1,"v":4.0}""" + "\n" + """{"k":1,"v":0.5}""" + "\n")
        run()
        assert(seen.toList == List((1L, 5L, Seq(5.0, 4.0))))
      } finally prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None    => spark.conf.unset(provKey)
      }
    }
  }
}
