package graft.tools

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming scale harness (VERDICT r06 #3 — the streaming analog of
  * [[Scale]]): drives the engine's stateful streaming shapes with a
  * `rate` source at a sustained rows/sec and reports, from
  * `StreamingQueryProgress`, what the correctness gate cannot show —
  * throughput, batch duration, and STATE-STORE growth over time. The
  * claim under test is boundedness: every stateful operator the engine
  * ships keeps state proportional to the live keyspace/watermark
  * window, never to the rows-seen total (the reference capability being
  * scaled is the incremental per-record fold, P/CreateHQL.scala:14-20).
  *
  * Probes (one JSON line each):
  *  - `session_window` — w03's shape: watermarked session windows per
  *    user key. Continuous per-key traffic keeps one open session per
  *    key, so state rows plateau at ~keys.
  *  - `dedup_watermark` — w14's shape: dropDuplicatesWithinWatermark on
  *    a key that repeats every `keys` rows; state is the keys seen
  *    within the watermark horizon, not all rows.
  *  - `tws_ttl` — w19's shape: transformWithState + RocksDB with a
  *    10 s TTL over a keyspace sized to ~20 s of input, so each key's
  *    revisit arrives AFTER its TTL: without eviction state would climb
  *    to the full keyspace; with it, rows plateau near the ~10 s live
  *    set.
  *  - `lsh_gate` — w24's shape: banded-LSH near-dup admission with
  *    TTL'd bucket-owner state over an UNBOUNDED bucket keyspace;
  *    state must plateau at the TTL live horizon (4 × rate).
  *  - `interval_join` — w05/w16's shape: stream-stream interval join;
  *    state = both sides' watermark+interval buffers, plateauing at
  *    ~2 × rate × horizon while rows-seen grows without bound.
  *  - `restart` — w23's exactly-once contract mid-flight: kill a
  *    stateful windowed aggregation mid-window at sustained rate,
  *    resume from the checkpoint, require output row-identical to an
  *    uninterrupted control run.
  *  - `restart_interval` — the same kill/resume contract through a
  *    stream-stream interval join (both sides' buffers in the
  *    checkpoint); outputs compared as multisets via exceptAll.
  *  - `ann_serve` — w25's shape: online PQ k-NN serving from a
  *    persisted AnnIndex; avg_processed_rps IS queries served/sec and
  *    answer state is watermark-evicted (rate × horizon, never
  *    queries-served-total).
  *  - `store_gate` — w28's shape at rate, run to NAME its limits:
  *    per-batch store re-scan time and store file-count growth are
  *    the measured reasons the high-rate design is the TTL'd
  *    in-memory gate (w24) and the store gate is nightly (d62).
  *  - `bm25_serve` — w30's shape at rate: streamed BM25 serving from
  *    the persisted term index via foreachBatch scoring over a cached
  *    index slice; queries over the corpus's COMMON words, so
  *    sustainable qps is a lower bound (per-query work ~ Σ df).
  *  - `plaid_serve` — d141's shape at rate (VERDICT r14 #4): PLAID
  *    nominate+rerank serving from the PERSISTED doc_id-bucketed
  *    token map via foreachBatch; avg_processed_rps IS queries
  *    served/sec. Run above capacity so the number is the ceiling.
  *  - `sem_gate` — w31's shape: the SemDeDup gate's GEOMETRIC state
  *    bound. TTL far longer than the probe, so the admitted-vector
  *    count can only plateau if the θ-packing saturates — it does
  *    (admitted_cum bends flat while rows_seen_cum climbs linearly).
  *
  * Usage: runMain graft.tools.ScaleStreaming [rowsPerSec] [secs] [keys]
  *   [probe,probe,...|all]
  */
object ScaleStreaming {

  private final case class Sample(
      batchId: Long, inRows: Long, procRps: Double, batchMs: Long,
      stateRows: Long, stateMb: Double)

  /** Run `q` for `secs`, capturing EVERY data-bearing batch via a
    * `StreamingQueryListener` (ADVICE r07: polling `lastProgress` under
    * the ASAP trigger skipped batches between polls, leaving gaps in
    * the state series and biasing the throughput mean — the listener
    * receives each `QueryProgressEvent` exactly once, same pattern as
    * the w19 fix in StreamingQ). Empty batches are skipped so idle
    * ticks don't dilute the numbers. */
  private def drive(q: StreamingQuery, secs: Int): Seq[Sample] = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val out = new java.util.concurrent.ConcurrentLinkedQueue[Sample]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.id == q.id && p.numInputRows > 0) {
          val st = p.stateOperators.headOption
          out.add(Sample(
            p.batchId, p.numInputRows, p.processedRowsPerSecond,
            Option(p.durationMs.get("triggerExecution"))
              .map(_.longValue()).getOrElse(-1L),
            st.map(_.numRowsTotal).getOrElse(0L),
            st.map(_.memoryUsedBytes / 1e6).getOrElse(0.0)))
          ()
        }
      }
    }
    val streams = q.sparkSession.streams
    streams.addListener(listener)
    try {
      val deadline = System.nanoTime() + secs * 1000L * 1000 * 1000
      while (System.nanoTime() < deadline && q.exception.isEmpty)
        Thread.sleep(200)
      q.exception.foreach(throw _)
      q.stop()
      q.awaitTermination()
      // the listener bus delivers asynchronously; drain in-flight
      // events BEFORE detaching (ADVICE r08 — a sleep after
      // removeListener can't recover events still queued at stop
      // time, so tail batches went missing from the series)
      Thread.sleep(500)
    } finally streams.removeListener(listener)
    import scala.jdk.CollectionConverters._
    out.asScala.toSeq.sortBy(_.batchId)
  }

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def report(name: String, rate: Int, keys: Long,
                     samples: Seq[Sample]): Unit = {
    // steady state = drop the first third (stream warm-up: codegen,
    // RocksDB open, first checkpoint)
    val steady = samples.drop(samples.length / 3)
    val rps = steady.map(_.procRps).filter(_ > 0)
    val ms = steady.map(_.batchMs).filter(_ >= 0).sorted
    def p50(xs: Seq[Long]) = if (xs.isEmpty) -1L else xs(xs.length / 2)
    val rows = samples.map(_.stateRows)
    println(s"""{"probe":"$name","rate_rps":$rate,"keys":$keys,""" +
      s""""batches":${samples.length},""" +
      s""""avg_processed_rps":${fmt(if (rps.isEmpty) -1 else rps.sum / rps.length)},""" +
      s""""p50_batch_ms":${p50(ms)},"max_batch_ms":${ms.lastOption.getOrElse(-1L)},""" +
      s""""state_rows_first":${rows.headOption.getOrElse(-1L)},""" +
      s""""state_rows_max":${if (rows.isEmpty) -1L else rows.max},""" +
      s""""state_rows_last":${rows.lastOption.getOrElse(-1L)},""" +
      s""""state_mb_last":${fmt(samples.lastOption.map(_.stateMb).getOrElse(-1.0))},""" +
      // raw per-batch series (bounded: probes see at most dozens of
      // batches) so aggregate claims reconcile from the artifact —
      // r17's capped plaid probe had an avg_processed_rps no reader
      // could square with p50_batch_ms without these
      s""""batch_rows_series":[${samples.map(_.inRows).mkString(",")}],""" +
      s""""batch_ms_series":[${samples.map(_.batchMs).mkString(",")}],""" +
      s""""state_rows_series":[${rows.mkString(",")}]}""")
  }

  def main(args: Array[String]): Unit = {
    val rate = args.headOption.map(_.toInt).getOrElse(20000)
    val secs = args.drop(1).headOption.map(_.toInt).getOrElse(40)
    val keys = args.drop(2).headOption.map(_.toLong).getOrElse(10000L)
    // 4th arg: comma-separated probe subset (session_window,
    // dedup_watermark, tws_ttl, lsh_gate, interval_join, restart,
    // restart_interval, ann_serve, store_gate, bm25_serve, sem_gate)
    // or "all" (default).
    val what = args.drop(3).headOption.getOrElse("all")
    def want(name: String): Boolean =
      what == "all" || what.split(",").contains(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def src: DataFrame = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      // several input partitions so the source side parallelizes like a
      // real ingest, not a single-thread generator
      .option("numPartitions", 8)
      .load()

    // w03's shape: per-key session windows under a watermark.
    if (want("session_window")) {
    val sess = src
      .select(col("timestamp"), (col("value") % keys).as("user_id"))
      .withWatermark("timestamp", "5 seconds")
      .groupBy(session_window(col("timestamp"), "2 seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
    report("session_window", rate, keys, drive(
      sess.writeStream.format("noop")
        .option("checkpointLocation", ckpt("sess"))
        .outputMode("append").start(), secs))
    }

    // w14's shape: bounded-state dedup within the watermark horizon.
    if (want("dedup_watermark")) {
    val dedup = src
      .select(col("timestamp"), (col("value") % keys).as("k"))
      .withWatermark("timestamp", "5 seconds")
      .dropDuplicatesWithinWatermark(Seq("k"))
    report("dedup_watermark", rate, keys, drive(
      dedup.writeStream.format("noop")
        .option("checkpointLocation", ckpt("dedup"))
        .outputMode("append").start(), secs))
    }

    // w19's shape: TTL'd per-key state on RocksDB. Keyspace = ~20 s of
    // input with a 10 s TTL: each key's next visit lands after its TTL,
    // so eviction — not the keyspace bound — is what must hold the line.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ttlKeys = rate.toLong * 20
    if (want("tws_ttl")) {
    val pairs = src
      .select((col("value") % ttlKeys).as("_1"),
        col("value").cast("double").as("_2"))
      .as[(Long, Double)]
    val ttl = graft.streaming.TwsTtl
      .perKey(pairs, ttl = java.time.Duration.ofSeconds(10))
      .toDF("k", "n_events", "max_value")
    report("tws_ttl", rate, ttlKeys, drive(
      ttl.writeStream.format("noop")
        .option("checkpointLocation", ckpt("ttl"))
        .outputMode("update").start(), secs))
    }

    // w24's shape: banded-LSH near-dup admission (TwsLshGate, RocksDB +
    // 10 s TTL). Every 10 consecutive "docs" share signatures (the
    // near-dup group), each doc emits 4 band rows, and the bucket
    // keyspace GROWS FOREVER with the rate source's value — so without
    // eviction state would climb without bound; with the TTL it must
    // plateau near the live horizon: 4 bands x (rate/10 groups/s) x
    // 10 s = 4 x rate occupied buckets.
    if (want("lsh_gate")) {
    val gateBands = src.select(
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("_1"),
            pmod(xxhash64((col("value") / 10).cast("long"), lit(j)),
              lit(1L << 40)).as("_2"),
            col("value").as("_3"))): _*)).as("b"))
      .select(col("b._1").as("_1"), col("b._2").as("_2"),
        col("b._3").as("_3"))
      .as[(Int, Long, Long)]
    val gate = graft.streaming.TwsLshGate
      .perBucket(gateBands, ttl = java.time.Duration.ofSeconds(10))
      .toDF("doc_id", "hit")
    report("lsh_gate", rate, 4L * rate, drive(
      gate.writeStream.format("noop")
        .option("checkpointLocation", ckpt("gate"))
        .outputMode("update").start(), secs))
    }

    // w31's shape: the semantic (SemDeDup) gate's GEOMETRIC state
    // bound, measured. Pseudo-random unit-ish vectors in R^6 stream
    // at rate into 16 sign cells with a TTL far longer than the probe
    // — so state can only stop growing if the geometry stops it: each
    // cell's admitted list is a theta-packing of its sector, and once
    // it approximates a maximal packing, every later arrival is
    // within theta of a stored vector and is rejected WITHOUT
    // entering state. The series should bend to a plateau while rows
    // processed keep climbing linearly — state bounded by (theta,
    // dim, cells), never by vectors seen. (The TwsLshGate plateau
    // above is TEMPORAL — TTL horizon; this one is geometric.)
    if (want("sem_gate")) {
    val dims = 6
    val semVecs = src.select(
        concat((1 to 4).map(i =>
          when(pmod(xxhash64(col("value"), lit(100 + i)), lit(2)) === 0,
            "1").otherwise("0")): _*).as("_1"),
        col("value").as("_2"),
        array((0 until dims).map(i =>
          ((pmod(xxhash64(col("value"), lit(i)), lit(2000001L)) -
            lit(1000000L)) / lit(1000000.0))): _*).as("_3"))
      .as[(String, Long, Array[Double])]
    val sem = graft.streaming.TwsSemGate
      .perCell(semVecs, theta = 0.35,
        ttl = java.time.Duration.ofMinutes(30))
      .toDF("vec_id", "admitted")
    // numRowsTotal counts grouping KEYS (the 16 cells), not ListState
    // entries — the geometric bound is visible in the ADMITTED count,
    // so the sink tallies per-batch admissions
    val admByBatch =
      new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]
    report("sem_gate", rate, 16L, drive(
      sem.writeStream
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          val r = b.agg(
            sum(when(col("admitted"), 1L).otherwise(0L)).as("a"),
            count(lit(1)).as("n")).head()
          admByBatch.put(id,
            (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1)))
          ()
        }
        .option("checkpointLocation", ckpt("sem"))
        .outputMode("update").start(), secs))
    import scala.jdk.CollectionConverters._
    val ordered = admByBatch.asScala.toSeq.sortBy(_._1).map(_._2)
    val admCum = ordered.scanLeft(0L)(_ + _._1).drop(1)
    val rowCum = ordered.scanLeft(0L)(_ + _._2).drop(1)
    println(s"""{"probe":"sem_gate_admitted","rate_rps":$rate,""" +
      s""""theta":0.35,"dims":$dims,"cells":16,""" +
      s""""rows_seen_cum":[${rowCum.mkString(",")}],""" +
      s""""admitted_cum":[${admCum.mkString(",")}]}""")
    }

    if (want("interval_join")) intervalJoinProbe(spark, rate, keys, secs)
    if (want("restart")) restartProbe(spark, rate)
    if (want("restart_interval")) restartIntervalProbe(spark, rate)
    if (want("ann_serve")) annServeProbe(spark, rate, secs)
    if (want("store_gate")) storeGateProbe(spark, rate, secs)
    if (want("validate_monitor")) validateMonitorProbe(spark, rate, secs)
    if (want("decontam_gate")) decontamGateProbe(spark, rate, secs)
    if (want("bm25_serve")) bm25ServeProbe(spark, rate, secs)
    if (want("plaid_serve")) plaidServeProbe(spark, rate, secs)
    if (want("plaid_serve_capped"))
      plaidServeProbe(spark, rate, secs, capped = true)
    if (want("bm25_wand")) bm25WandProbe(spark, rate, secs, pruned = true)
    if (want("bm25_wand_ex"))
      bm25WandProbe(spark, rate, secs, pruned = false)
    if (want("docmap_rare"))
      bm25DocMapRareProbe(spark, rate, secs, pruned = true)
    if (want("docmap_rare_full"))
      bm25DocMapRareProbe(spark, rate, secs, pruned = false)
    if (want("restart_bm25")) restartBm25Probe(spark)

    spark.stop()
  }

  /** Kill/restart proof for the STREAMED TEXT serve (VERDICT r09 #7 —
    * w23/w27 cover aggregation and ANN serving; this is w30's shape):
    * a deterministic file-fed query stream served from the persisted
    * text index via foreachBatch, each batch's top-k written
    * idempotently to its own `b<batchId>` dir (overwrite). The query
    * is killed mid-flight (after ~half the input files are consumed),
    * resumed on the SAME checkpoint with AvailableNow, and the union
    * of outputs must be multiset-identical to an uninterrupted
    * control run on a fresh checkpoint. Grouping of queries into
    * batches may differ between the runs and must NOT matter: every
    * query is scored independently against the STORED df/stats, so
    * per-query rows are batch-invariant — which is exactly what the
    * exceptAll comparison certifies. */
  private def restartBm25Probe(spark: SparkSession): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val R = graft.operators.Retrieval
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-scale-restartbm25").toString
    R.writeIndex(
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet"),
      "doc_id", "text", tmp, nBuckets = 16)
    val stats = R.readStats(spark, tmp)
    val vocab = spark.read.parquet(
      s"${graft.operators.Retrieval.root(spark, tmp)}/terms")
      .select("term").as[String].collect().sorted.toSeq
    // static side = the cached forward index, w30's production shape
    val docMap = R.impactDocMap(
        R.readIndexSlice(spark, tmp, vocab, nBuckets = 16), stats)
      .cache()
    docMap.count()
    val nFiles = 40
    val perFile = 25
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$tmp/in"))
    (0 until nFiles).foreach { f =>
      val lines = (0 until perFile).map { i =>
        val qid = f * perFile + i
        val t1 = vocab(((qid * 7 + 3) % vocab.size + vocab.size) % vocab.size)
        val t2 = vocab(((qid * 13 + 5) % vocab.size + vocab.size) % vocab.size)
        s"""{"query_id":$qid,"terms":["$t1","$t2"]}"""
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/in/q$f.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    val nRows = nFiles.toLong * perFile
    def query(ckptDir: String, outDir: String) = spark.readStream
      .schema("query_id LONG, terms ARRAY<STRING>")
      .option("maxFilesPerTrigger", 1)
      .json(s"$tmp/in")
      .writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) {
          R.bm25TopKDocMap(docMap, batch, k = 3)
            .write.mode("overwrite").parquet(s"$outDir/b$bid")
        }
      }
      .option("checkpointLocation", ckptDir)
    val consumed = new java.util.concurrent.atomic.AtomicLong(0L)
    val watchId = new java.util.concurrent.atomic.AtomicReference[java.util.UUID]()
    val listener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          if (e.progress.id == watchId.get())
            consumed.addAndGet(e.progress.numInputRows)
          ()
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val killedAt =
      try {
        val q1 = query(s"$tmp/ckpt", s"$tmp/out")
          .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
        watchId.set(q1.id)
        val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
        while (consumed.get() < nRows / 2 && q1.exception.isEmpty &&
            System.nanoTime() < deadline)
          Thread.sleep(50)
        q1.exception.foreach(throw _)
        val at = consumed.get()
        q1.stop(); q1.awaitTermination()
        at
      } finally spark.streams.removeListener(listener)
    val q2 = query(s"$tmp/ckpt", s"$tmp/out")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val qc = query(s"$tmp/ckpt_control", s"$tmp/out_control")
      .trigger(Trigger.AvailableNow()).start()
    qc.awaitTermination()
    val restarted = spark.read.parquet(s"$tmp/out/b*")
    val control = spark.read.parquet(s"$tmp/out_control/b*")
    val nR = restarted.count()
    val nC = control.count()
    val identical = nR == nC &&
      restarted.exceptAll(control).count() == 0L &&
      control.exceptAll(restarted).count() == 0L
    println(s"""{"probe":"restart_bm25","n_queries":$nRows,""" +
      s""""n_files":$nFiles,"killed_after_rows":$killedAt,""" +
      s""""sec_to_drain":${fmt(sec)},""" +
      s""""n_out_restarted":$nR,"n_out_control":$nC,""" +
      s""""outputs_identical":$identical}""")
    docMap.unpersist()
    graft.queries.Rm.rf(tmp)
  }

  /** w28's shape under sustained rate — the PERSISTED-store gate as a
    * live stream, run to NAME its limits rather than to pass: each
    * micro-batch bucket-joins its bands against the parquet store and
    * appends the admitted buckets, so (a) the store gains one file
    * batch per trigger — the small-files growth AnnIndex.compact
    * exists to bound, reported as the file-count series — and (b) the
    * gate join re-reads a store that grows without bound, so per-batch
    * gate time RISES with rows seen (reported first-5 vs last-5 mean).
    * This is why the high-rate online design is w24's TTL'd in-memory
    * gate and the store gate is the NIGHTLY shape (d62), with the
    * store bucketed at rest (`d62_store_r09`) and compacted on the
    * maintenance boundary. Dup structure: every 7 consecutive docs
    * share signatures — 7 does not divide the rate source's
    * second-aligned batch sizes, so groups straddle batch boundaries
    * and the cross-batch gate genuinely rejects (a group size that
    * divides the batch size never straddles, and intra-batch dups are
    * by design not rejected — d62/w28 semantics). */
  /** w36's shape at rate: a STATIC benchmark's band signatures are
    * cached once (50k bench docs → 200k band rows — the "eval suite
    * ≪ corpus" broadcast regime the query documents), and arriving
    * docs are gated per batch by one broadcast join against it. 10%
    * of arrivals are planted leaks (their band construction maps
    * into the bench id space), so the rejected fraction certifies
    * the gate actually fires while the sustained docs/sec and the
    * per-batch gate latency measure its cost. Unlike store_gate the
    * reference NEVER grows — the per-batch cost must be flat in
    * stream length. */
  private def decontamGateProbe(spark: SparkSession, rate: Int,
                                secs: Int): Unit = {
    import spark.implicits._
    val benchDocs = 50000L
    val bb = spark.range(benchDocs).select(
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("j"),
            pmod(xxhash64(col("id"), lit(j)), lit(1L << 40))
              .as("sig"))): _*)).as("b"))
      .select(col("b.j").as("j"), col("b.sig").as("sig"))
      .cache()
    bb.count()
    val gateMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val rejected = new java.util.concurrent.atomic.AtomicLong(0L)
    val processed = new java.util.concurrent.atomic.AtomicLong(0L)
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", 8).load()
    val q = src.select(col("value"))
      .writeStream
      .option("checkpointLocation", ckpt("decontamgate"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        // planted leaks: every 10th doc's bands derive from a bench
        // id; the rest hash into a disjoint id space
        val srcId = when(col("value") % 10 === 0,
          pmod((col("value") / 10).cast("long"), lit(benchDocs)))
          .otherwise(col("value") + 2000000000L)
        val bands = b.select(col("value").as("doc_id"),
            explode(array((0 until 4).map(j =>
              struct(lit(j).as("j"),
                pmod(xxhash64(srcId, lit(j)), lit(1L << 40))
                  .as("sig"))): _*)).as("x"))
          .select(col("doc_id"), col("x.j").as("j"),
            col("x.sig").as("sig"))
        val t0 = System.nanoTime()
        val leaked = bands.join(broadcast(bb), Seq("j", "sig"))
          .select("doc_id").distinct().count()
        gateMs.add((System.nanoTime() - t0) / 1000000); ()
        rejected.addAndGet(leaked)
        processed.addAndGet(b.count())
        ()
      }
      .start()
    val samples = drive(q, secs)
    import scala.jdk.CollectionConverters._
    val gm = gateMs.asScala.toSeq.sorted
    val rps = samples.map(_.procRps)
    val rejFrac =
      if (processed.get() == 0) -1.0
      else rejected.get().toDouble / processed.get()
    println(s"""{"probe":"decontam_gate","rate_rps":$rate,""" +
      s""""bench_docs":$benchDocs,"batches":${samples.size},""" +
      s""""avg_processed_rps":${fmt(if (rps.isEmpty) -1 else rps.sum / rps.size)},""" +
      s""""rows_processed":${processed.get()},""" +
      s""""rows_rejected":${rejected.get()},""" +
      s""""rejected_frac":${fmt(rejFrac)},""" +
      s""""p50_gate_ms":${if (gm.isEmpty) -1 else gm(gm.size / 2)},""" +
      s""""max_gate_ms":${if (gm.isEmpty) -1 else gm.last}}""")
    require(rejFrac < 0 || (rejFrac > 0.05 && rejFrac < 0.2),
      s"decontam gate misfired: rejected fraction $rejFrac")
  }

  /** w43's shape at rate: per-batch constraint-suite counts
    * (conditional sums + count-distinct over the batch) folded into
    * the persisted additive store under the exactly-once tag. The
    * claims under test: the store NEVER grows past the check count
    * (it is the bounded artifact — asserted), the per-batch fold
    * cost is flat in stream length (first-5 vs last-5 ms), and the
    * accumulated report equals the rows actually processed. The
    * rate source's strictly-increasing `value` makes batches
    * key-range-disjoint, the property that keeps the per-batch
    * count-distinct additive (the w34 discipline). */
  private def validateMonitorProbe(spark: SparkSession, rate: Int,
                                   secs: Int): Unit = {
    import graft.operators.{RowCheck, Validation}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-valmon").toString
    val checks = Seq(
      RowCheck("qty_le_45", col("qty") > 45),
      RowCheck("disc_le_8pct", col("disc") > 0.08),
      RowCheck("flag_accepted", !col("flag").isin("F0", "F1")))
    val uniq = Some(("pk_unique", Seq("k1", "k2")))
    val foldMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val processed = new java.util.concurrent.atomic.AtomicLong(0L)
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rate).option("numPartitions", 8).load()
    val q = src.select(col("value"))
      .writeStream
      .option("checkpointLocation", ckpt("valmon"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val fact = batch.select(
            (col("value") / 4).cast("long").as("k1"),
            (col("value") % 4).cast("int").as("k2"),
            (pmod(xxhash64(col("value")), lit(50)) + 1).cast("double")
              .as("qty"),
            (pmod(xxhash64(col("value"), lit(1)), lit(11))
              .cast("double") / 100.0).as("disc"),
            concat(lit("F"), pmod(xxhash64(col("value"), lit(2)),
              lit(3))).as("flag")).localCheckpoint()
          // the disjointness witness is `value` (it functionally
          // determines the (k1, k2) key and batches never overlap on
          // it); k1 alone can touch at batch boundaries
          val vr = batch.agg(min("value"), max("value")).first()
          val t0 = System.nanoTime()
          Validation.foldCounts(
            Validation.counts(fact, checks, uniq),
            dir, Some(s"b$batchId"),
            Some((vr.getLong(0), vr.getLong(1))))
          foldMs.add((System.nanoTime() - t0) / 1000000); ()
          processed.addAndGet(fact.count()); ()
        }
        ()
      }
      .start()
    val samples = drive(q, secs)
    import scala.jdk.CollectionConverters._
    val fm = foldMs.asScala.toSeq
    def mean(xs: Seq[Long]): Double =
      if (xs.isEmpty) -1.0 else xs.sum.toDouble / xs.size
    val rep = Validation.fromCounts(Validation.readCounts(spark, dir))
      .collect()
    require(rep.length == checks.size + 1,
      s"store grew past the check count: ${rep.length}")
    val nRows = rep.head.getAs[Long]("n_rows")
    require(nRows == processed.get(),
      s"report rows $nRows != processed ${processed.get()}")
    val rps = samples.map(_.procRps)
    println(s"""{"probe":"validate_monitor","rate_rps":$rate,""" +
      s""""batches":${samples.size},""" +
      s""""avg_processed_rps":${fmt(if (rps.isEmpty) -1 else rps.sum / rps.size)},""" +
      s""""rows_processed":${processed.get()},""" +
      s""""store_rows_final":${rep.length},""" +
      s""""report_rows":$nRows,""" +
      s""""fold_ms_first5":${fmt(mean(fm.take(5)))},""" +
      s""""fold_ms_last5":${fmt(mean(fm.takeRight(5)))}}""")
  }

  private def storeGateProbe(spark: SparkSession, rate: Int,
                             secs: Int): Unit = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-storegate").toString
    val store = s"$dir/store"
    Seq.empty[(Int, Long)].toDF("j", "sig")
      .write.mode("overwrite").parquet(store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fileCounts = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val gateMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val rejected = new java.util.concurrent.atomic.AtomicLong(0L)
    val processed = new java.util.concurrent.atomic.AtomicLong(0L)
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rate).load()
    val q = src.select(col("value"))
      .writeStream
      .option("checkpointLocation", ckpt("storegate"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          val bands = batch.select(col("value").as("doc_id"),
              explode(array((0 until 4).map(j =>
                struct(lit(j).as("j"),
                  pmod(xxhash64((col("value") / 7).cast("long"), lit(j)),
                    lit(1L << 40)).as("sig"))): _*)).as("b"))
            .select(col("doc_id"), col("b.j").as("j"), col("b.sig").as("sig"))
            .localCheckpoint()
          val t0 = System.nanoTime()
          val hitDocs = bands
            .join(spark.read.parquet(store), Seq("j", "sig"))
            .select(col("doc_id")).distinct()
            .localCheckpoint()
          val nRej = hitDocs.count()
          gateMs.add((System.nanoTime() - t0) / 1000000); ()
          rejected.addAndGet(nRej)
          bands.join(hitDocs, Seq("doc_id"), "left_anti")
            .select(col("j"), col("sig")).distinct()
            .write.mode("append").parquet(store)
          processed.addAndGet(batch.count())
          fileCounts.add(fs.listStatus(
              new org.apache.hadoop.fs.Path(store))
            .count(_.getPath.getName.startsWith("part-"))); ()
        } finally batch.unpersist()
        ()
      }
      .start()
    val samples = drive(q, secs)
    import scala.jdk.CollectionConverters._
    val gm = gateMs.asScala.toSeq
    val fc = fileCounts.asScala.toSeq
    def mean(xs: Seq[Long]): Double =
      if (xs.isEmpty) -1.0 else xs.sum.toDouble / xs.size
    val storeRows = spark.read.parquet(store).count()
    val rps = samples.map(_.procRps)
    println(s"""{"probe":"store_gate","rate_rps":$rate,""" +
      s""""batches":${samples.size},""" +
      s""""avg_processed_rps":${fmt(if (rps.isEmpty) -1 else rps.sum / rps.size)},""" +
      s""""rows_processed":${processed.get()},""" +
      s""""rows_rejected":${rejected.get()},""" +
      s""""store_rows_final":$storeRows,""" +
      s""""store_files_first":${fc.headOption.getOrElse(-1)},""" +
      s""""store_files_last":${fc.lastOption.getOrElse(-1)},""" +
      s""""gate_ms_first5":${fmt(mean(gm.take(5)))},""" +
      s""""gate_ms_last5":${fmt(mean(gm.takeRight(5)))}}""")
    graft.queries.Rm.rf(dir)
  }

  /** Stream-stream interval join under sustained rate (VERDICT r07 #6,
    * the w05/w16 shape): two independent rate sources derive EVENT time
    * from `value` (1 event-second per wall-second at `rate` rows/s), a
    * 5 s watermark on both sides, equality on `value % keys` plus a
    * ±2 s interval. State = BOTH sides' watermark-bounded buffers: each
    * side retains ~rate × (watermark + interval) rows, so the series
    * must plateau near 2 × rate × 7 — the interval horizon — and never
    * track rows-seen. */
  private def intervalJoinProbe(spark: SparkSession, rate: Int,
                                keys: Long, secs: Int): Unit = {
    def evSrc(tsName: String, kName: String, vName: String): DataFrame =
      spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .option("numPartitions", 8)
        .load()
        .select(
          timestamp_micros(lit(1700000000000000L) +
            (col("value") * lit(1000000L / rate))).as(tsName),
          (col("value") % keys).as(kName),
          col("value").as(vName))
    val left = evSrc("lts", "lk", "lv").withWatermark("lts", "5 seconds")
    val right = evSrc("rts", "rk", "rv").withWatermark("rts", "5 seconds")
    val joined = left.join(right,
      col("lk") === col("rk") &&
        col("rts") >= col("lts") - expr("INTERVAL 2 SECONDS") &&
        col("rts") <= col("lts") + expr("INTERVAL 2 SECONDS"))
    report("interval_join", rate, keys, drive(
      joined.writeStream.format("noop")
        .option("checkpointLocation", ckpt("ivj"))
        .outputMode("append").start(), secs))
  }

  /** Kill/restart under sustained rate (VERDICT r07 #6 second half —
    * w23's exactly-once contract, but mid-flight through a stateful
    * windowed aggregation instead of between idle AvailableNow runs):
    * ~1M rows land as many json files; an interrupted run consumes them
    * through a watermarked 10 s-window count at a paced trigger
    * (maxFilesPerTrigger) into a parquet sink and is STOPPED mid-run
    * (~half consumed, mid-window state in the checkpoint); a second
    * query resumes from the same checkpoint and drains the rest
    * (AvailableNow). A CONTROL run processes everything uninterrupted
    * into its own sink. The two parquet outputs must be row-identical —
    * rows lost at the kill point or replayed after it would both break
    * the multiset equality. */
  private def restartProbe(spark: SparkSession, rate: Int): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-scale-restart").toString
    val nRows = 1000000L
    // 1 kHz event time: 1M rows span ~1000 s of event time → ~100
    // closed 10 s windows; 50 files of 20k rows each
    spark.range(nRows).select(
        to_json(struct(
          timestamp_micros(lit(1700000000000000L) + col("id") * 1000L)
            .as("ts"),
          (col("id") % 997L).as("k"))).as("value"))
      .repartition(50)
      .write.mode("overwrite").text(s"$tmp/in")
    def query(ckptDir: String, outDir: String) = spark.readStream
      .schema("ts TIMESTAMP, k LONG")
      .option("maxFilesPerTrigger", 2)
      .json(s"$tmp/in")
      .withWatermark("ts", "2 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("k"), col("n"))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .outputMode("append")
    val consumed = new java.util.concurrent.atomic.AtomicLong(0L)
    // count ONLY q1's batches (ADVICE r08): the session's listener bus
    // is shared, so stale queued events from an earlier probe — or any
    // concurrent query — would inflate killedAt and end the kill phase
    // early. The id is captured right after start(); an event racing
    // the capture is merely dropped, which delays the kill by one poll.
    val watchId =
      new java.util.concurrent.atomic.AtomicReference[java.util.UUID](null)
    val listener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          if (e.progress.id == watchId.get())
            consumed.addAndGet(e.progress.numInputRows)
          ()
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val killedAt =
      try {
        val q1 = query(s"$tmp/ckpt", s"$tmp/out")
          .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
        watchId.set(q1.id)
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (consumed.get() < nRows / 2 && q1.exception.isEmpty &&
            System.nanoTime() < deadline)
          Thread.sleep(50)
        q1.exception.foreach(throw _)
        val at = consumed.get()
        q1.stop(); q1.awaitTermination()
        at
      } finally spark.streams.removeListener(listener)
    // resume from the SAME checkpoint; drain the remainder
    val q2 = query(s"$tmp/ckpt", s"$tmp/out")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    // uninterrupted control into its own sink
    val qc = query(s"$tmp/ckpt_control", s"$tmp/out_control")
      .trigger(Trigger.AvailableNow()).start()
    qc.awaitTermination()
    def snapshot(dir: String): Seq[(java.sql.Timestamp, Long, Long)] = {
      import spark.implicits._
      spark.read.parquet(dir).select(col("ws"), col("k"), col("n"))
        .as[(java.sql.Timestamp, Long, Long)].collect().toSeq.sorted
    }
    val restarted = snapshot(s"$tmp/out")
    val control = snapshot(s"$tmp/out_control")
    println(s"""{"probe":"restart","rate_rps":$rate,""" +
      s""""n_rows":$nRows,"killed_after_rows":$killedAt,""" +
      s""""sec_to_drain":${fmt(sec)},""" +
      s""""n_out_restarted":${restarted.length},""" +
      s""""n_out_control":${control.length},""" +
      s""""outputs_identical":${restarted == control}}""")
    graft.queries.Rm.rf(tmp)
  }

  /** Kill/restart mid-flight through a STREAM-STREAM INTERVAL JOIN
    * (VERDICT r08 #5: the restart probe above proves the exactly-once
    * contract for windowed aggregation only; the join's state — both
    * sides' watermark+interval buffers, plus the join semantics across
    * the kill point — is a different recovery surface). Two file-source
    * sides (500 k rows each, 1 kHz event time, key = hash(id) % 997)
    * inner-join on key within ±1 s; the paced run is STOPPED once
    * roughly half the total input is consumed (mid-buffer state in the
    * checkpoint), a second query resumes from the same checkpoint and
    * drains (AvailableNow), and an uninterrupted control run consumes
    * everything into its own sink. Outputs are compared as MULTISETS
    * via two `exceptAll` counts — rows lost at the kill point or
    * replayed after it both break the equality; no driver collect of
    * the ~1 M joined rows. */
  private def restartIntervalProbe(spark: SparkSession, rate: Int): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-scale-ivjrestart").toString
    val nRows = 500000L
    // repartitionByRange on id: each file is a CONTIGUOUS event-time
    // slice and the file source consumes part-files in path order, so
    // the replay arrives in near-event-time order (the realistic
    // ingest shape). A plain repartition would put the whole time
    // range in every file — the watermark then races to the end after
    // batch 1 and drops nearly all later rows as late, leaving almost
    // no join state alive across the kill point (first cut of this
    // probe: 28 k of ~1 M potential joined rows survived).
    def gen(dir: String, seed: Int): Unit = {
      spark.range(nRows)
        .repartitionByRange(25, col("id"))
        .sortWithinPartitions("id")
        .select(
          to_json(struct(
            timestamp_micros(lit(1700000000000000L) + col("id") * 1000L)
              .as("ts"),
            pmod(xxhash64(col("id"), lit(seed)), lit(997L)).as("k"),
            col("id").as("v"))).as("value"))
        .write.mode("overwrite").text(dir)
      // FileStreamSource batches files oldest-modification-time first,
      // and the 25 write tasks finish in arbitrary order — so without
      // re-stamping, the range-ordered slices still replay shuffled
      // and most rows land behind the watermark. Stamp mod-times
      // strictly increasing in part-file path order so consumption
      // order == event-time order.
      val parts = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toSeq.sortBy(_.getFileName.toString)
      parts.zipWithIndex.foreach { case (p, i) =>
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
      }
    }
    gen(s"$tmp/inL", 1)
    gen(s"$tmp/inR", 2)
    def side(dir: String, p: String) = spark.readStream
      .schema("ts TIMESTAMP, k LONG, v LONG")
      .option("maxFilesPerTrigger", 2)
      .json(dir)
      .select(col("ts").as(s"${p}ts"), col("k").as(s"${p}k"),
        col("v").as(s"${p}v"))
      .withWatermark(s"${p}ts", "2 seconds")
    def query(ckptDir: String, outDir: String) =
      side(s"$tmp/inL", "l").join(side(s"$tmp/inR", "r"),
          col("lk") === col("rk") &&
            col("rts") >= col("lts") - expr("INTERVAL 1 SECONDS") &&
            col("rts") <= col("lts") + expr("INTERVAL 1 SECONDS"))
        .select(col("lts"), col("lk").as("k"), col("lv"), col("rv"))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
    val consumed = new java.util.concurrent.atomic.AtomicLong(0L)
    val watchId =
      new java.util.concurrent.atomic.AtomicReference[java.util.UUID](null)
    val listener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          if (e.progress.id == watchId.get())
            consumed.addAndGet(e.progress.numInputRows)
          ()
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val killedAt =
      try {
        val q1 = query(s"$tmp/ckpt", s"$tmp/out")
          .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
        watchId.set(q1.id)
        val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
        while (consumed.get() < nRows && q1.exception.isEmpty &&
            System.nanoTime() < deadline)
          Thread.sleep(50)
        q1.exception.foreach(throw _)
        val at = consumed.get()
        q1.stop(); q1.awaitTermination()
        at
      } finally spark.streams.removeListener(listener)
    val q2 = query(s"$tmp/ckpt", s"$tmp/out")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val qc = query(s"$tmp/ckpt_control", s"$tmp/out_control")
      .trigger(Trigger.AvailableNow()).start()
    qc.awaitTermination()
    val restarted = spark.read.parquet(s"$tmp/out")
    val control = spark.read.parquet(s"$tmp/out_control")
    val nR = restarted.count()
    val nC = control.count()
    val identical = nR == nC &&
      restarted.exceptAll(control).count() == 0L &&
      control.exceptAll(restarted).count() == 0L
    println(s"""{"probe":"restart_interval","rate_rps":$rate,""" +
      s""""n_rows_per_side":$nRows,"killed_after_rows":$killedAt,""" +
      s""""sec_to_drain":${fmt(sec)},""" +
      s""""n_out_restarted":$nR,""" +
      s""""n_out_control":$nC,""" +
      s""""outputs_identical":$identical}""")
    graft.queries.Rm.rf(tmp)
  }

  /** ONLINE ANN serving throughput (the w25 shape under sustained
    * rate): a persisted AnnIndex is built ONCE from the sf0.1
    * embeddings (~50 k vectors, 8×16 PQ), then a rate source of
    * synthetic query vectors is served against the STORED tables —
    * literal-baked cell routing, stream-static postings join,
    * codegen'd PQ distance, per-query min-aggregation windowed under a
    * watermark so answer state EVICTS as queries complete (each qid
    * occurs at one instant, so (qid, window) state is rate × horizon,
    * never queries-served-total). avg_processed_rps IS the serve
    * throughput: every input row is one full k-NN query — routed,
    * joined against its cell's ~1/cells of the corpus, scored and
    * folded. The query rate is the harness rate argument. */
  private def annServeProbe(spark: SparkSession, qRate: Int,
                            secs: Int): Unit = {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-scale-annserve").toString
    graft.operators.AnnIndex.write(
      spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet"),
      "vec_id", "embedding", "label", m = 8, k = 16, tmp)
    val cents = spark.read.parquet(s"$tmp/centroids")
      .select(col("label").cast("long"), col("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    val cb = graft.operators.AnnIndex.loadCodebook(spark, tmp)
    val m = cb.size
    val d = cb.head.head.size
    val dim = d * m
    val EL = graft.operators.ExprLet
    val Sim = graft.operators.Similarity
    // synthetic query vectors: 64 deterministic doubles per qid
    val qs = spark.readStream.format("rate")
      .option("rowsPerSecond", qRate)
      .option("numPartitions", 8)
      .load()
      .select(col("timestamp"), col("value").as("qid"),
        transform(sequence(lit(1), lit(dim)),
          j => (pmod(xxhash64(col("value"), j), lit(1000L)).cast("double")
            / lit(1000.0))).as("qv"))
    val routed = qs.withColumn("cell",
      EL.let(array(cents.map { case (_, cv) =>
        Sim.cosine(col("qv"), typedlit(cv)) }: _*)) { ss =>
        element_at(typedlit(cents.map(_._1)),
          array_position(ss, array_max(ss)).cast("int"))
      })
    // the two r08 serve-ceiling fixes (VERDICT r08 #3), mirroring w25:
    // (1) cache the static postings side — stream-static joins
    // re-execute the static plan per micro-batch, so uncached postings
    // re-list + re-read parquet every batch; (2) hoist the PQ segment
    // distances into a per-QUERY ADC table so the interpreted HOF
    // folds run m·k times per query instead of m times per (query ×
    // candidate) row, leaving only codegen'd element_at sums on the
    // per-candidate hot path. Arithmetic is bit-identical
    // (Quantize.adcTableExpr).
    val postings = spark.read
      .schema("vec_id LONG, codes ARRAY<INT>, label LONG")
      .parquet(s"$tmp/postings")
      .cache()
    val Qz = graft.operators.Quantize
    val served = routed
      .withWatermark("timestamp", "5 seconds")
      .withColumn("adctab", Qz.adcTableExpr(col("qv"), cb))
      .join(postings, col("cell") === col("label"))
      .select(col("timestamp"), col("qid"),
        struct(
          round(Qz.adcLookupExpr(col("adctab"), col("codes"), m), 6)
            .as("adist"),
          col("vec_id")).as("cand"))
      .groupBy(window(col("timestamp"), "10 seconds"), col("qid"))
      .agg(min(col("cand")).as("best"))
    report("ann_serve", qRate, cents.length.toLong, drive(
      served.writeStream.format("noop")
        .option("checkpointLocation", ckpt("annserve"))
        .outputMode("update").start(), secs))
    postings.unpersist()
    graft.queries.Rm.rf(tmp)
  }

  /** w30's shape under sustained rate: streamed BM25 serving from the
    * persisted term index via per-micro-batch scoring (foreachBatch —
    * w30's production shape). Each rate row is one 2-term query over
    * the corpus's common words — the WORST case for text serving
    * (every term's posting list is ~4/5 of the corpus).
    *
    * Round 10 (VERDICT r09 #2): the r09 arm served term-major from a
    * cached slice — per query it joined ~2·df ≈ 7.8k candidate rows
    * into a (query, doc) shuffle + window, so a 200-query batch
    * aggregated ~1.6M rows and the arm saturated at ~200 qps. The
    * serve now runs DOCUMENT-AT-A-TIME from the cached forward index
    * (Retrieval.impactDocMap → bm25Top1DocMap): per-(term, doc)
    * decimal contributions are precomputed ONCE at cache time, each
    * batch makes one scan of the doc-partitioned map probing the
    * query terms in codegen, and the only shuffle is the per-query
    * partial-agg'd max — scatter-gather, the plan a sharded text
    * engine runs. Output stays bit-identical to bm25TopKIndexed(k=1)
    * (spec-proved).
    *
    * Round 11 (VERDICT r10 #4): the r10 ceiling (~1.05k qps) was the
    * |docs| × |batch| row volume of the full forward-index scan per
    * batch. The serve now picks scan-vs-prune PER BATCH from the
    * dictionary df profile (the d75 plan-time-switch discipline,
    * driver-side over the vocabulary-sized dfMap): when the batch's
    * Σ df is well under |docs| × |batch|, Retrieval.bm25Top1DocMapPruned
    * derives per-(query, doc) candidates from the cached INVERTED
    * slice and probes only those docs' impact maps — Σ df scoring
    * rows; stopword-heavy batches keep the full scan (candidates
    * would approach the corpus and the broadcast would choke). Both
    * paths are bit-identical (spec-proved), so the switch is
    * invisible in results. The emitted line carries how many batches
    * each path served. On THIS corpus the dictionary is 31 common
    * words (df ≈ 4/5 · N each), so the profile correctly refuses the
    * prune for every batch — the rare-term regime where it fires is
    * measured separately by the bm25_wand arm's 500k-doc two-regime
    * corpus.
    *
    * Second round-11 lever, and the one that moves THIS workload:
    * per-batch DISTINCT-QUERY dedup (the result-cache discipline —
    * real query logs are Zipfian, and a 31-term dictionary admits at
    * most 31² distinct 2-term queries, so big batches are mostly
    * repeats): score each distinct term-set once, then join every
    * incoming query back to its set's answer. Scoring rows collapse
    * from |docs| × |batch| to |docs| × |distinct sets| while every
    * query still receives its (identical) answer — correctness
    * unchanged by determinism of the scorer. */
  private def bm25ServeProbe(spark: SparkSession, qRate: Int,
                             secs: Int): Unit = {
    import spark.implicits._
    val R = graft.operators.Retrieval
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-scale-bm25serve").toString
    R.writeIndex(
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet"),
      "doc_id", "text", tmp, nBuckets = 16)
    val dfRows = spark.read.parquet(
      s"${graft.operators.Retrieval.root(spark, tmp)}/terms")
      .select("term", "df").as[(String, Long)].collect()
    val dfMap = dfRows.toMap                    // vocabulary-sized
    val vocab = dfRows.map(_._1).sorted.toSeq
    val stats = R.readStats(spark, tmp)
    val nDocs = stats.select(col("n_docs").cast("long")).head().getLong(0)
    val slice = R.readIndexSlice(spark, tmp, vocab, nBuckets = 16)
      .cache()
    val docMap = R.impactDocMap(slice, stats).cache()
    docMap.count()
    slice.count()
    val prunedBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val scanBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val vlit = typedlit(vocab)
    val nv = lit(vocab.length.toLong)
    val qs = spark.readStream.format("rate")
      .option("rowsPerSecond", qRate)
      .option("numPartitions", 8)
      .load()
      .select(col("value").as("qid"), array(
        element_at(vlit,
          (pmod(xxhash64(col("value"), lit(1)), nv) + 1).cast("int")),
        element_at(vlit,
          (pmod(xxhash64(col("value"), lit(2)), nv) + 1).cast("int")))
        .as("terms"))
    val q = qs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one bounded collect per batch: the query set itself (it
        // broadcasts anyway) — the df-profile decision needs the
        // batch's terms on the driver, and rebuilding the queries
        // frame locally spares the rate source a second scan
        val local = batch.select(col("qid"), col("terms"))
          .as[(Long, Seq[String])].collect()
        if (local.nonEmpty) {
          // distinct-query dedup: one scoring unit per distinct
          // term-set (bounded by vocab², tiny on the driver)
          val sets = local.map(_._2.toList).distinct
          val sidOf = sets.iterator.zipWithIndex
            .map { case (ts, i) => (ts, i.toLong) }.toMap
          val setQueries = sets.zipWithIndex
            .map { case (ts, i) => (i.toLong, ts) }.toSeq
            .toDF("query_id", "terms")
          val sumDf = sets.iterator.flatten.map(t =>
            dfMap.getOrElse(t, 0L)).sum
          // prune when candidates are provably far under the full
          // scan AND broadcastable; else the full forward scan
          val usePrune = sumDf * 4 < nDocs * sets.length &&
            sumDf < 2000000L
          val served =
            if (usePrune) { prunedBatches.incrementAndGet()
              R.bm25Top1DocMapPruned(docMap, slice, setQueries) }
            else { scanBatches.incrementAndGet()
              R.bm25Top1DocMap(docMap, setQueries) }
          // fan the per-set answers back out to every incoming query
          val back = local.map { case (q, ts) => (q, sidOf(ts.toList)) }
            .toSeq.toDF("orig_qid", "query_id")
          served.join(broadcast(back), "query_id")
            .select(col("orig_qid").as("query_id"), col("rk"),
              col("doc_id"), col("score"))
            .write.format("noop").mode("overwrite").save()
        }
      }
      .option("checkpointLocation", ckpt("bm25serve"))
      .start()
    report("bm25_serve", qRate, vocab.length.toLong, drive(q, secs))
    println(s"""{"probe":"bm25_serve_paths",""" +
      s""""pruned_batches":${prunedBatches.get},""" +
      s""""scan_batches":${scanBatches.get}}""")
    docMap.unpersist()
    slice.unpersist()
    graft.queries.Rm.rf(tmp)
  }

  /** d141's shape under sustained rate (VERDICT r14 #4 — the qps
    * number the persisted PLAID serve was missing): each micro-batch
    * of 3-term queries (one rare + two common tokens, the d139 mix)
    * is served by `maxSimTopKPlaidFromMap` against a 100k-doc
    * doc_id-BUCKETED token-map table built once before the stream
    * starts (the d75/d94 memoized-index discipline). The static side
    * is cached — stream-static plans re-execute the static subtree
    * per batch, and `InMemoryRelation` preserves the bucketed scan's
    * hash partitioning, so both gather aggregations stay
    * exchange-free exactly as the PlanShapeSpec d141 assert proves
    * for the table scan. Per-batch work = one nomination pass over
    * the cached map at the bucket-collision fraction + the
    * candidate-sized exact rerank; `avg_processed_rps` IS queries
    * served/sec — run the probe above capacity so the report names
    * the ceiling. */
  private def plaidServeProbe(spark: SparkSession, qRate: Int,
                              secs: Int, capped: Boolean = false): Unit = {
    val LI = graft.operators.LateInteraction
    val n = 100000L
    val rarePool = n / 10
    graft.queries.Warehouse.reset(spark, "graft_scaleplaid_tokmap")
    LI.docTokenMap(Scale.zipfDocs(spark, n), "doc_id", "text", dim = 8)
      .write.bucketBy(32, "doc_id").format("parquet")
      .mode("overwrite").saveAsTable("graft_scaleplaid_tokmap")
    val tokMap = spark.table("graft_scaleplaid_tokmap").cache()
    tokMap.count()
    // `capped`: ADMISSION-bounded regime (VERDICT r16 #4). The plain
    // rate source has no maxOffsetsPerTrigger knob, so under overload
    // each trigger swallows the whole backlog and latency concentrates
    // into ever-bigger batches (r17 measured: one 179.6 s ~27k-query
    // batch at rate 100 — throughput fine at 150 rps, steady state
    // unmeasurable). rate-micro-batch hands each trigger EXACTLY
    // rowsPerBatch rows — the production admission cap a queue-fed
    // serve would run — so the probe measures a ≥3-batch steady state
    // whose qps is rowsPerBatch over batch time.
    // SPARK_GRAFT_PLAID_CAP sweeps the admission cap (VERDICT r17
    // #3): rowsPerBatch IS the rows/plan a queue-fed serve would
    // admit per trigger — bigger caps amortize plan overhead and
    // widen term sharing (higher qps) but concentrate latency
    // (higher p50 batch). A comma-separated list sweeps several caps
    // in ONE invocation over the SAME built+cached token map (the
    // per-cap stream restarts; conditions stay comparable and the
    // build is paid once), each cap load-gated so a sweep spanning
    // this host's waves still gives every cap a quiet start.
    val caps = sys.env.getOrElse("SPARK_GRAFT_PLAID_CAP", "7176")
      .split(",").map(_.trim.toInt).toSeq
    // r18 verdict #4 — the plan-width/pipelining levers the cap
    // sweep exposed: p50 tracks CHUNK COUNT (~4 s/chunk quiet), so
    // the latency levers are wider plans (fewer chunks) and/or
    // pipelined chunk submission (overlapped chunk jobs). Swept as
    // (maxQueriesPerPlan, chunkParallelism) pairs over the same
    // admission cap.
    val planQ = sys.env.getOrElse("SPARK_GRAFT_PLAID_PLANQ", "512")
      .trim.toInt
    val chunkPar = sys.env.getOrElse("SPARK_GRAFT_PLAID_PAR", "1")
      .trim.toInt
    def runOnce(cap: Int, driveSecs: Int): Unit = {
      // gate BEFORE the stream starts — processing begins at start()
      val startLoad = if (capped) Scale.waitQuiet() else -1.0
      val src0 =
        if (capped)
          spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", cap)
            .option("numPartitions", 8)
            .load()
        else
          spark.readStream.format("rate")
            .option("rowsPerSecond", qRate)
            .option("numPartitions", 8)
            .load()
      val qs = src0
        .select(col("value").as("query_id"), array(
          concat(lit("r"),
            pmod(xxhash64(col("value"), lit(1)), lit(rarePool))),
          concat(lit("c"), pmod(xxhash64(col("value"), lit(2)), lit(50))),
          concat(lit("c"), pmod(xxhash64(col("value"), lit(3)), lit(50))))
          .as("terms"))
      val q = qs.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            // capped serve (VERDICT r16 #4): bounds the per-PLAN batch
            // at 512 queries so a backlogged trigger can't flatten the
            // term sharing on the rare-term slot — the r16 finding of
            // one 16.6 s ~1.9k-query batch at rate 100
            LI.maxSimTopKPlaidFromMapCapped(tokMap,
              batch.select(col("query_id"), col("terms")),
              dim = 8, k = 10, bits = 8, c = 50, hamming = 2,
              maxQueriesPerPlan = planQ, chunkParallelism = chunkPar)
              .write.format("noop").mode("overwrite").save()
          }
        }
        .option("checkpointLocation",
          ckpt(s"plaidserve_$cap"))
        .start()
      // capped mode has no offered rate — the source hands a fixed
      // rowsPerBatch per trigger regardless of the CLI rate arg, so
      // recording qRate would claim an offer that was never made
      // (r17 review); batch_rows_series carries the real admission.
      // The cap and its gated start load print alongside the row.
      if (capped)
        println(s"""{"probe":"plaid_serve_capped_cfg","cap":$cap,""" +
          s""""plan_q":$planQ,"chunk_par":$chunkPar,""" +
          s""""start_loadavg":${fmt(startLoad)}}""")
      report(if (capped) "plaid_serve_capped" else "plaid_serve",
        if (capped) -1 else qRate, n, drive(q, driveSecs))
    }
    if (capped)
      // drive scales with the cap: a steady state needs >= 3 batches
      // and batch wall grows with admission size
      caps.foreach(c => runOnce(c, math.max(secs, 3 * (60 * c / 7176 + 30))))
    else runOnce(caps.head, secs)
    tokMap.unpersist()
    graft.queries.Warehouse.reset(spark, "graft_scaleplaid_tokmap")
  }

  /** The w30 serve ceiling with the d75 fix applied: streamed BM25
    * over Scale.zipfDocs' two-regime index (500k docs), every query a
    * rare+common pair — the realistic mix, and the one the round-9
    * `bm25_serve` arm identified as the per-row ceiling's fix path.
    * `pruned = true` serves each micro-batch with the dictionary-
    * planned MaxScore (`maxScoreIndexedTopK` — aggregation input is
    * candidate-sized, ~240 rows/query); `false` is the exhaustive
    * control (every query scores its common term's ~92k-row posting
    * list, so ~92k rows/query — the regime that saturated at ~200 qps
    * in `bm25_serve_r09`). Both arms pay the same per-batch planning
    * jobs' fixed cost; the contrast isolates rows-scored. */
  private def bm25WandProbe(spark: SparkSession, qRate: Int, secs: Int,
                            pruned: Boolean): Unit = {
    import spark.implicits._
    val R = graft.operators.Retrieval
    val n = 500000L
    val rarePool = n / 10
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-scale-bm25wand").toString
    R.writeIndex(Scale.zipfDocs(spark, n), "doc_id", "text", tmp,
      nBuckets = 64)
    val stats = R.readStats(spark, tmp)
    // Both arms serve from the SAME cached full slice (the
    // bm25ServeProbe/w30 caching design — a real deployment holds the
    // index hot); the contrast isolates the scorer, not I/O.
    val vocab = spark.read.parquet(
      s"${graft.operators.Retrieval.root(spark, tmp)}/terms")
      .select("term").as[String].collect().toSeq
    val slice = R.readIndexSlice(spark, tmp, vocab, nBuckets = 64)
      .cache()
    slice.count()
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", qRate)
      .option("numPartitions", 8)
      .load()
      .select(col("value").as("qid"), array(
        concat(lit("r"), pmod(xxhash64(col("value"), lit(1)),
          lit(rarePool))),
        concat(lit("c"), pmod(xxhash64(col("value"), lit(2)), lit(50))))
        .as("terms"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val queries = batch.select(col("qid").as("query_id"),
            explode(col("terms")).as("term"))
          val served =
            if (pruned)
              R.maxScoreFromSlice(slice, queries, stats, k = 10)
            else R.bm25TopKIndexed(slice, queries, stats, k = 10)
          served.write.format("noop").mode("overwrite").save()
        }
      }
      .option("checkpointLocation",
        ckpt(if (pruned) "bm25wand" else "bm25wandex"))
      .start()
    report(if (pruned) "bm25_wand" else "bm25_wand_ex", qRate, n,
      drive(q, secs))
    slice.unpersist()
    graft.queries.Rm.rf(tmp)
  }

  /** The regime the round-11 candidate prune exists for, measured:
    * doc-at-a-time serving over a 500k-doc corpus where every query is
    * two RARE terms drawn from a 50k-term pool — batches are almost
    * entirely DISTINCT (the dedup lever does nothing) and Σ df per
    * query is a handful of rows, so `pruned = true`
    * (bm25Top1DocMapPruned: candidates from the inverted slice,
    * broadcast-probed against the forward index) scores Σ df rows
    * per batch while `false` (the full forward scan) pays
    * |docs| × |distinct sets| — 500k rows PER QUERY. The qps contrast
    * at the same offered rate is the prune's measured value; both
    * paths are bit-identical (spec-proved). */
  private def bm25DocMapRareProbe(spark: SparkSession, qRate: Int,
                                  secs: Int, pruned: Boolean): Unit = {
    import spark.implicits._
    val R = graft.operators.Retrieval
    val n = 500000L
    val rarePool = n / 10
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-scale-docmaprare").toString
    R.writeIndex(Scale.zipfDocs(spark, n), "doc_id", "text", tmp,
      nBuckets = 64)
    val vocab = spark.read.parquet(
      s"${graft.operators.Retrieval.root(spark, tmp)}/terms")
      .select("term").as[String].collect().toSeq
    val stats = R.readStats(spark, tmp)
    val slice = R.readIndexSlice(spark, tmp, vocab, nBuckets = 64)
      .cache()
    val docMap = R.impactDocMap(slice, stats).cache()
    docMap.count(); slice.count()
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", qRate)
      .option("numPartitions", 8)
      .load()
      .select(col("value").as("qid"), array(
        concat(lit("r"), pmod(xxhash64(col("value"), lit(1)),
          lit(rarePool))),
        concat(lit("r"), pmod(xxhash64(col("value"), lit(2)),
          lit(rarePool))))
        .as("terms"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val queries = batch.select(col("qid").as("query_id"),
            col("terms"))
          val served =
            if (pruned) R.bm25Top1DocMapPruned(docMap, slice, queries)
            else R.bm25Top1DocMap(docMap, queries)
          served.write.format("noop").mode("overwrite").save()
        }
      }
      .option("checkpointLocation",
        ckpt(if (pruned) "docmaprare" else "docmaprarefull"))
      .start()
    report(if (pruned) "docmap_rare" else "docmap_rare_full",
      qRate, n, drive(q, secs))
    docMap.unpersist(); slice.unpersist()
    graft.queries.Rm.rf(tmp)
  }

  private def ckpt(tag: String): String =
    java.nio.file.Files
      .createTempDirectory(s"graft-scale-stream-$tag").toString
}
