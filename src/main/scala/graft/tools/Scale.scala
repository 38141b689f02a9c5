package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scale-stress harness: measures the dedup/ANN/join chain at sf0.1 and
  * at a synthesized `factor`x tier, recording wall time AND shuffle
  * bytes per query (SparkListener task metrics — the same numbers the
  * Spark UI aggregates), so the "bucketed ops scale near-linearly"
  * design claims are backed by a measured curve instead of plan-shape
  * argument alone. Results feed SCALE.md.
  *
  * Corpus synthesis (deterministic, id-offset copies into /tmp):
  *  - documents: copy i prefixes text with "c<i> " — copies are NEAR
  *    duplicates of their original, the realistic worst case for a
  *    dedup pipeline (minhash bands collide per copy-group, so LSH
  *    bucket population grows with the duplication rate, not just N);
  *  - embeddings: copy i rotates the vector by i positions — genuinely
  *    new directions (cosine-distinct), so ANN bucket populations grow
  *    ~uniformly;
  *  - orders/customer/lineitem: key columns offset per copy (custkey
  *    consistently on both join sides, so join output scales linearly,
  *    not by copy-count squared).
  *
  * Usage: runMain graft.tools.Scale [baseDir] [factor] [synthDir]
  */
object Scale {

  /** VERDICT r05 chain + q01 as the known-linear scan-agg control. */
  val chain: Seq[String] = Seq(
    "q01_pricing_summary", "q36_bucketed_join",
    "d07_neardup_pairs", "d20_neardup_clusters",
    "d35_substring_dedup", "d49_containment",
    "s03_ivf_topk", "s06_nndescent_topk")

  /** Behavioral battery probes: user-partitioned windows (q75/q79)
    * should absorb a factor-fold USER population near-linearly (more
    * partitions, same depth); q78's per-type windows deepen instead —
    * the documented type-x-day repartition point; q80's basket fold +
    * in-array pair explode is one shuffle each way. */
  val behavior: Seq[String] = Seq(
    "q75_sessionize", "q78_interval_sweep",
    "q79_gaps_islands", "q80_assoc_rules")

  /** The flat-claim families (VERDICT r06 #1): queries whose 100 TB
    * story is "runtime tracks designed work, not corpus" — the set the
    * 30x/100x tier exists to stress. Excludes the deliberately
    * worst-case near-dup chain (d07/d20/d49 measure a ~factor² pair
    * volume by design; their law is established at 10x). */
  val flat: Seq[String] = Seq(
    "q01_pricing_summary", "q36_bucketed_join", "d35_substring_dedup",
    "s03_ivf_topk", "q75_sessionize", "q78_interval_sweep",
    "q79_gaps_islands")

  private final class ShuffleMetrics extends SparkListener {
    val read = new AtomicLong
    val write = new AtomicLong
    // records (not bytes): the honest gather-cost witness on synthetic
    // corpora whose repetitive rows compress 100:1 in the shuffle
    val readRecords = new AtomicLong
    // peak single-task shuffle read — the skew witness: a whale
    // component serialized into one task shows up here as ~the whole
    // component's bytes, a skew-split plan as ~the advisory size
    val maxTaskRead = new AtomicLong
    // spill witnesses: bytes a task's sorter/aggregator pushed out of
    // memory (deserialized) and what actually hit disk (compressed)
    val memSpilled = new AtomicLong
    val diskSpilled = new AtomicLong
    // source-side bytes actually read (the file-skipping witness: a
    // layout that prunes reads FEWER of them for the same predicate)
    val input = new AtomicLong
    val inputRecords = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        val r = m.shuffleReadMetrics.totalBytesRead
        read.addAndGet(r)
        readRecords.addAndGet(m.shuffleReadMetrics.recordsRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        maxTaskRead.updateAndGet(p => math.max(p, r))
        memSpilled.addAndGet(m.memoryBytesSpilled)
        diskSpilled.addAndGet(m.diskBytesSpilled)
        input.addAndGet(m.inputMetrics.bytesRead)
        inputRecords.addAndGet(m.inputMetrics.recordsRead)
        ()
      }
    }
  }

  private def maxId(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

  /** Planted-duplicate corpus for the d61 scale arm. The testdata
    * documents share vocabulary so heavily that at J >= 0.9 the TRUE
    * pair set is itself quadratic (measured at sf0.01: 9 020 of 124 750
    * possible pairs qualify) — no exact join can beat its own output
    * size, so that corpus cannot exhibit the prefix filter's scale law.
    * A real dedup corpus is the opposite regime: mostly-unique docs
    * with a planted near-dup fraction. Synthesize exactly that,
    * deterministically: every 10th doc near-duplicates its predecessor
    * (39 of 40 tokens shared → J = 39/41 ≈ 0.95); 36 of 40 tokens are
    * doc-unique hashes (df 1–2 — these fill the rarest-first prefixes,
    * so buckets have <= 2 docs), 4 come from a 30-token common pool
    * (df ~ n/30 — never reach a prefix). Candidate volume must then
    * track the planted-pair count (n/10), not n². */
  def plantedDocs(s: SparkSession, nDocs: Long): DataFrame = {
    val base = s.range(nDocs).select(col("id").as("doc_id"),
      when(col("id") % 10 === 9, col("id") - 1).otherwise(col("id"))
        .as("seed"),
      (col("id") % 10 === 9).as("is_copy"))
    // pmod keeps hash tokens sign-free: a '-' would split the token
    // under the probe's [^a-z0-9]+ tokenizer
    val common = (0 until 4).map(j =>
      concat(lit("c"), pmod(xxhash64(col("seed"), lit(1000 + j)), lit(30))))
    val rare = (0 until 36).map { j =>
      val tok = concat(lit("r"),
        pmod(xxhash64(col("seed"), lit(j)), lit(Long.MaxValue)))
      if (j == 0)
        when(col("is_copy"), concat(lit("x"), col("doc_id"))).otherwise(tok)
      else tok
    }
    base.select(col("doc_id"),
      concat_ws(" ", (common ++ rare): _*).as("text"))
  }

  /** Two-regime retrieval corpus for the d74/d75 MaxScore probes:
    * each doc holds 10 tokens from a 50-term COMMON pool (df ~ 0.18·n
    * — stopword-class, grows with the corpus) and 20 from an
    * (n/10)-term RARE pool (df ~ 200, flat across tiers) — the
    * rare+common query mix dynamic pruning exists for. */
  def zipfDocs(s: SparkSession, n: Long): DataFrame = {
    val rarePool = n / 10
    val common = (0 until 10).map(j =>
      concat(lit("c"), pmod(xxhash64(col("id"), lit(j)), lit(50))))
    val rare = (0 until 20).map(j =>
      concat(lit("r"), pmod(xxhash64(col("id"), lit(100 + j)),
        lit(rarePool))))
    s.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (common ++ rare): _*).as("text"))
  }

  /** d61's candidate-volume evidence (untimed — the timed measurement
    * is `SSJoin.join` alone, VERDICT r07 #8): prefix-bucket count/max
    * and the Σ b·(b−1)/2 candidate bound over the array-free
    * projection, the raw prefix-share candidate count (the r06/r07
    * comparable), and the count surviving the length + positional
    * filters (the PPJoin cut — must stay ≥ the true pair count or the
    * filter lost pairs), and the count surviving the PPJoin+ suffix
    * partition bound (round 16 — must sit between the true pair count
    * and the positional count, or the filter is either unsound or a
    * no-op). Returns a JSON fragment. */
  /** Unpersist only the storage blocks created AFTER `before` — the
    * BpeTrain ckptTracked/release discipline for probe loops whose
    * per-iteration localCheckpoints are garbage once counted. Never a
    * blanket getPersistentRDDs sweep: memoized checkpointed frames
    * from other arms have truncated lineage, so unpersisting them
    * makes them unrecomputable, not just cold. */
  /** 1-minute loadavg — the bench's sample-poison witness
    * (Bench.scala), shared by scale arms whose tier records are
    * wall-clock claims. */
  def load1(): Double = try {
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0).toDouble
  } catch { case _: Throwable => -1.0 }

  /** Wait (bounded) for the host's noisy-neighbor wave to pass before
    * a timed sample starts (VERDICT r16 #7 — five gated 100x re-runs
    * all landed inside external loadavg 16–28 windows; counts were
    * byte-identical but the tier's WALL record could not be
    * re-established). Returns the loadavg at release, so the row can
    * carry the evidence either way: a sample that still started loud
    * names its own poison. */
  def waitQuiet(thresh: Double = 2.5, budgetMs: Long = 600000L): Double = {
    val deadline = System.currentTimeMillis() + budgetMs
    var l = load1()
    while (l > thresh && System.currentTimeMillis() < deadline) {
      Thread.sleep(5000)
      l = load1()
    }
    l
  }

  def releaseNewBlocks(s: SparkSession, before: Set[Int]): Unit = {
    val live = s.sparkContext.getPersistentRDDs
    (live.keySet.toSet -- before)
      .foreach(id => live.get(id).foreach(_.unpersist(blocking = true)))
  }

  def ssjoinEvidence(s: SparkSession, docs: DataFrame, t: Double): String = {
    import graft.operators.SSJoin
    // The per-tier localCheckpoints (pr, cands, and any inside
    // sortedTokenArrays) are garbage once the counts land; release
    // them under the same delta-scoped discipline as the sample loop
    // (ADVICE r16) — up to 100x these retained blocks are real memory.
    val before = s.sparkContext.getPersistentRDDs.keySet.toSet
    try {
      val sorted = SSJoin.sortedTokenArrays(docs, "doc_id", "text")
      val pr = SSJoin.prefixRows(sorted, t).localCheckpoint()
      val b = pr.groupBy("ptok").agg(count(lit(1)).as("b"))
        .agg(count(lit(1)).as("nb"), max("b").as("maxb"),
          sum(expr("b * (b - 1) DIV 2")).as("bound")).head()
      val nCandRaw = pr.toDF("a", "sza", "ia", "ptok")
        .join(pr.toDF("b", "szb", "ib", "ptok2"),
          col("ptok") === col("ptok2") && col("a") < col("b"))
        .count()
      val cands = SSJoin.candidates(pr, t).localCheckpoint()
      val nCandPos = cands.count()
      val nCandSuffix = SSJoin.suffixFiltered(sorted, cands, t).count()
      s""""n_prefix_buckets":${b.getLong(0)},"max_bucket":${b.getLong(1)},""" +
        s""""cand_bound":${b.getLong(2)},"n_candidates":$nCandRaw,""" +
        s""""n_candidates_pos":$nCandPos,"n_candidates_suffix":$nCandSuffix"""
    } finally releaseNewBlocks(s, before)
  }

  def synthesize(s: SparkSession, base: String, factor: Int,
                 out: String): Unit = {
    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionByName _)

    val docs = s.read.parquet(s"$base/documents.parquet")
    val dStride = maxId(docs, "doc_id")
    copies(docs) { (d, i) =>
      // derive n_chars from the PREFIXED text (copies i>0 are longer
      // than their source by the "c<i> " prefix) so n_chars-dependent
      // probes see consistent corpus stats at the synth tier
      d.select(
          (col("doc_id") + lit(i * dStride)).as("doc_id"),
          (if (i == 0) col("text")
           else concat(lit(s"c$i "), col("text"))).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = s.read.parquet(s"$base/embeddings.parquet")
    val vStride = maxId(emb, "vec_id")
    copies(emb) { (e, i) =>
      val dim = size(col("embedding"))
      e.select(
        (col("vec_id") + lit(i * vStride)).as("vec_id"),
        (if (i == 0) col("embedding")
         else transform(sequence(lit(0), dim - 1),
           j => element_at(col("embedding"), ((j + lit(i)) % dim) + 1)))
          .as("embedding"),
        col("label"))
    }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val cust = s.read.parquet(s"$base/customer.parquet")
    val cStride = maxId(cust, "c_custkey")
    copies(cust) { (c, i) =>
      c.select((col("c_custkey") + lit(i * cStride)).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
    }.write.mode("overwrite").parquet(s"$out/customer.parquet")

    val ord = s.read.parquet(s"$base/orders.parquet")
    val oStride = maxId(ord, "o_orderkey")
    copies(ord) { (o, i) =>
      o.select((col("o_orderkey") + lit(i * oStride)).as("o_orderkey"),
        (col("o_custkey") + lit(i * cStride)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }.write.mode("overwrite").parquet(s"$out/orders.parquet")

    val li = s.read.parquet(s"$base/lineitem.parquet")
    copies(li) { (l, i) =>
      l.withColumn("l_orderkey", col("l_orderkey") + lit(i * oStride))
    }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    synthesizeEvents(s, base, factor, out)
    synthesizePart(s, base, out)
  }

  /** `part` is a DIM table: lineitem copies keep `l_partkey`, so the
    * dim is copied verbatim — at the synthesized tier each part simply
    * appears in factor-fold more orders, which is exactly the
    * growth-mode q80's per-brand counts must absorb. */
  def synthesizePart(s: SparkSession, base: String, out: String): Unit =
    s.read.parquet(s"$base/part.parquet")
      .write.mode("overwrite").parquet(s"$out/part.parquet")

  /** events copies offset BOTH ids: the user population grows
    * factor-fold while each user's history stays the same length — the
    * realistic growth mode for an event log, and the one the
    * user-partitioned windows (q75/q79) must absorb: more partitions,
    * not deeper ones. `ts` arrives as LONG nanos under `nanosAsLong`
    * and is copied verbatim. */
  def synthesizeEvents(s: SparkSession, base: String, factor: Int,
                       out: String): Unit = {
    val ev = s.read.parquet(s"$base/events.parquet")
    val eStride = maxId(ev, "event_id")
    val uStride = maxId(ev, "user_id")
    (0 until factor).map { i =>
      ev.select(
        (col("event_id") + lit(i * eStride)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i * uStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val synthDir =
      args.drop(2).headOption.getOrElse(s"/tmp/graft_scale${factor}x")
    // 4th arg selects the probe set:
    // all (default) | chain | graph | behavior.
    val what = args.drop(3).headOption.getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val needsSynth =
      what != "skew" && what != "whale" && what != "maxscore" &&
      what != "incc" && what != "sa" && what != "bpe" && what != "spill" &&
      what != "textcompact" && what != "gather" && what != "lm" &&
      what != "fuzzy" && what != "maxsim" && what != "rangejoin" &&
      what != "ssjoinreal" && what != "ssjoin" && what != "sdmwin" &&
      what != "stats" && what != "pack" && what != "gram" &&
      what != "annpca" && what != "validate" && what != "zorder" &&
      what != "graphwalk" && what != "proxwin" &&
      what != "ssjoindecomp"
    if (needsSynth && !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$synthDir/documents.parquet"))) {
      System.err.println(s"[scale] synthesizing ${factor}x corpus -> $synthDir")
      synthesize(spark, base, factor, synthDir)
    } else System.err.println(s"[scale] reusing existing $synthDir")
    // events were added to the synth set after the graph probes ran —
    // top up an existing synth dir that predates them.
    if (needsSynth && !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$synthDir/events.parquet"))) {
      System.err.println(s"[scale] synthesizing ${factor}x events -> $synthDir")
      synthesizeEvents(spark, base, factor, synthDir)
    }
    if (needsSynth && !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$synthDir/part.parquet")))
      synthesizePart(spark, base, synthDir)

    val metrics = new ShuffleMetrics
    spark.sparkContext.addSparkListener(metrics)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val queries = SparkEntry.queries
    val probeNames = what match {
      case "graph" | "ssjoin" | "ssjoinreal" | "cc" | "ann" | "skew" | "whale" |
           "compact" | "store" | "kmeans" | "retrieval" | "phash" |
           "append" | "winnow" | "maxscore" | "incc" | "sa" | "bpe" |
           "spill" | "textcompact" | "gather" | "lm" | "fuzzy" |
           "maxsim" | "rangejoin" | "stats" | "pack" | "gram" |
           "annpca" | "validate" | "zorder" | "graphwalk" | "sdmwin" |
           "proxwin" | "cores" | "ssjoindecomp" =>
        Seq.empty[String]
      case "chain" => chain
      case "behavior" => behavior
      case "flat" => flat
      case _ => chain ++ behavior
    }
    // Skew arm: the "AQE skew-join" design claim, measured. A
    // deliberately skewed fact table (60% of rows on ONE key) sort-
    // merge-joins a 2 M-row dim (broadcast disabled — the shape where
    // skew actually bites; partial-agg shapes absorb skew in map-side
    // combine and need no mitigation). Runs the SAME join with AQE's
    // skew split off and on: off = the hot key's entire partition lands
    // in one straggler task; on = OptimizeSkewedJoin splits it by size.
    if (what == "skew") {
      val n = 2000000L * factor
      val nDim = 2000000L
      def run(skewOn: Boolean): Double = {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn)
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", skewOn)
        // the split thresholds default to executor-scale partitions
        // (256 MB); scale them to this corpus as a deployment would,
        // or the ~100 MB hot partition never qualifies for a split
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
        spark.conf.set(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
        try {
          val fact = spark.range(n).select(
            when(pmod(col("id"), lit(10)) < 6, 0L)
              .otherwise(pmod(xxhash64(col("id")), lit(nDim))).as("k"),
            (col("id") % 1000).as("v"))
          val dim = spark.range(nDim).select(col("id").as("k"),
            xxhash64(col("id")).as("attr"))
          val t0 = System.nanoTime()
          fact.join(dim, "k")
            .groupBy(pmod(col("attr"), lit(16)).as("g"))
            .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"))
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[scale] skew(on=$skewOn) failed: ${e.getMessage}")
          -1.0
        } finally {
          spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
          spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
          spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
          spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
      }
      run(skewOn = true) // warm-up (JIT + codegen), untimed
      val off = (1 to 2).map(_ => run(skewOn = false))
      val on = (1 to 2).map(_ => run(skewOn = true))
      Thread.sleep(800)
      val rd = metrics.read.getAndSet(0L) / 1e6
      val wr = metrics.write.getAndSet(0L) / 1e6
      println(s"""{"query":"skew_join_aqe","n_fact":$n,"hot_frac":0.6,""" +
        s""""samples_off":[${off.map(fmt).mkString(",")}],""" +
        s""""samples_on":[${on.map(fmt).mkString(",")}],""" +
        s""""sec_off":${fmt(off.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
        s""""sec_on":${fmt(on.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
        s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
    }
    // Persisted-ANN-index arm (s15/w25's build-once path): time the
    // full AnnIndex.write (centroid agg + encodeFast + partitioned
    // postings write) and the stored-table serve at both tiers. Build
    // is the linear-in-V path (one centroid shuffle + one scan-encode-
    // write); serve cost is cell-bounded, independent of V growth that
    // lands in other cells.
    if (what == "ann") {
      // untimed warm-up build (JIT + codegen + parquet committer init):
      // without it the 1x tier's build absorbs first-in-JVM cost and
      // reads SLOWER than the 10x tier
      locally {
        val wtmp = java.nio.file.Files
          .createTempDirectory("graft-annidx-warm").toString
        graft.operators.AnnIndex.write(
          spark.read.parquet(s"$base/embeddings.parquet")
            .filter(col("vec_id") < 2000),
          "vec_id", "embedding", "label", m = 8, k = 16, wtmp)
        graft.queries.Rm.rf(wtmp)
      }
      for ((tier, dir) <- Seq(("1x", base), (s"${factor}x", synthDir))) {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val idx = java.nio.file.Files
          .createTempDirectory(s"graft-annidx-$tier").toString
        val t0 = System.nanoTime()
        val buildSec =
          try {
            graft.operators.AnnIndex.write(
              emb, "vec_id", "embedding", "label", m = 8, k = 16, idx)
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $tier ann build failed: ${e.getMessage}")
            -1.0
          }
        val qv = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0)
          .map(_.toDouble).toSeq
        val serves = (1 to 3).map { _ =>
          val t1 = System.nanoTime()
          try {
            graft.operators.AnnIndex
              .search(spark, idx, qv, nProbe = 2, topK = 10, excludeId = 0L)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t1) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $tier ann serve failed: ${e.getMessage}")
            -1.0
          }
        }
        Thread.sleep(800)
        val rd = metrics.read.getAndSet(0L) / 1e6
        val wr = metrics.write.getAndSet(0L) / 1e6
        println(s"""{"tier":"$tier","query":"ann_index_build_serve",""" +
          s""""build_sec":${fmt(buildSec)},""" +
          s""""serve_samples":[${serves.map(fmt).mkString(",")}],""" +
          s""""serve_sec":${fmt(serves.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
        graft.queries.Rm.rf(idx)
      }
    }
    // Persisted-dedup-store probe (round 9, the d62 shape at tier
    // scale): the nightly gate joins a NEW wave's band buckets against
    // the persisted store of every prior wave's buckets. With a plain
    // parquet store, the equi-join shuffles BOTH sides — and the store
    // is the side that grows run over run, so at 100 TB the nightly
    // cost grows with corpus history. Writing the store BUCKETED on
    // the join key (bucketBy(j, sig) via saveAsTable) pre-partitions
    // it at rest: the join shuffles only the new wave, the store scans
    // in place. Both arms gate the SAME wave against the SAME store
    // content; the row reports per-arm wall time, shuffle bytes, and
    // whether the store side exchanged.
    if (what == "store") {
      import graft.operators.Dedup
      val docs = spark.read.parquet(s"$synthDir/documents.parquet")
      val isNew = col("doc_id") % 3 === 0
      // The synth corpus is built by replicating sf0.1 docs, so its
      // distinct bucket set collapses to ~13k rows — broadcastable,
      // which is NOT the regime the store reaches in production. A
      // year of nightly crawls leaves a store dominated by buckets of
      // docs the new wave never touches; model that cold history with
      // range-generated buckets (negative sigs — real MinHash sigs are
      // non-negative, so they can never match a wave bucket and the
      // gate's output is unchanged) so the store side is the big side,
      // as it is at scale.
      val coldHistory = spark.range(20L * 1000 * 1000)
        .select((col("id") % 4).cast("int").as("j"),
          (-col("id") - 1).as("sig"))
      val oldBuckets = Dedup
        .minhashBands(docs.filter(!isNew), "doc_id", "text")
        .select(col("j").cast("int").as("j"), col("sig")).distinct()
        .unionAll(coldHistory)
      val newBands = Dedup
        .minhashBands(docs.filter(isNew), "doc_id", "text")
        .localCheckpoint()
      val plainDir = s"$synthDir/d62_store_plain"
      oldBuckets.write.mode("overwrite").parquet(plainDir)
      graft.queries.Warehouse.reset(spark, "graft_d62_store")
      oldBuckets.write.mode("overwrite")
        .bucketBy(cpus.toInt, "j", "sig").sortBy("j", "sig")
        .saveAsTable("graft_d62_store")
      val nStore = spark.read.parquet(plainDir).count()
      def gate(store: DataFrame): DataFrame =
        newBands.join(store, Seq("j", "sig"))
          .select(col("doc_id")).distinct()
      // the synth store is broadcastable at probe size; at 100 TB it is
      // orders of magnitude past any broadcast threshold, so disable
      // broadcast for the arms to measure the shape that regime gets
      // (the skew probe's convention: thresholds scaled as a
      // deployment would)
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        for ((arm, store) <- Seq(
            ("plain", spark.read.parquet(plainDir)),
            ("bucketed", spark.table("graft_d62_store")))) {
          val rejected = gate(store)
          // store-side exchange check: with the bucketed table the
          // scan's existing HashPartitioning(j, sig) satisfies the
          // join, so only the new-wave side (and the final distinct)
          // exchange — one fewer than the plain arm
          rejected.write.format("noop").mode("overwrite").save() // warm
          val plan = rejected.queryExecution.executedPlan.toString
          val nExchanges = "Exchange hashpartitioning".r
            .findAllIn(plan).length
          Thread.sleep(800)
          metrics.read.getAndSet(0L); metrics.write.getAndSet(0L)
          val samples = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            rejected.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          Thread.sleep(800)
          val rd = metrics.read.getAndSet(0L) / 1e6
          val wr = metrics.write.getAndSet(0L) / 1e6
          println(s"""{"query":"d62_store_gate","arm":"$arm",""" +
            s""""n_store_buckets":$nStore,""" +
            s""""n_exchanges":$nExchanges,""" +
            s""""samples":[${samples.map(fmt).mkString(",")}],""" +
            s""""sec":${fmt(samples.min)},""" +
            s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
        }
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
        spark.sql("DROP TABLE IF EXISTS graft_d62_store")
      }
    }
    // Compaction probe (round 9): many append waves fragment the
    // postings cells into one file batch each — the small-files shape
    // an append-heavy index accumulates between maintenance passes.
    // Measures serve cost from the fragmented index, the selective
    // compact itself, and serve cost after — the before/after delta is
    // pure file-open/footer overhead, since row content and partition
    // pruning are identical.
    if (what == "compact") {
      import org.apache.hadoop.fs.Path
      val emb = spark.read.parquet(s"$synthDir/embeddings.parquet")
      val n = emb.count()
      val cut = n / 2
      val waves = 64
      val idx = java.nio.file.Files
        .createTempDirectory("graft-annidx-compactprobe").toString
      graft.operators.AnnIndex.write(
        emb.filter(col("vec_id") < cut),
        "vec_id", "embedding", "label", m = 8, k = 16, idx)
      val span = (n - cut + waves - 1) / waves
      val ta = System.nanoTime()
      (0 until waves).foreach { w =>
        val lo = cut + w * span
        val hi = math.min(n, lo + span)
        if (lo < hi) graft.operators.AnnIndex.append(
          emb.filter(col("vec_id") >= lo && col("vec_id") < hi),
          "vec_id", "embedding", "label", idx)
      }
      val appendSec = (System.nanoTime() - ta) / 1e9
      val fs = new Path(idx).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def census(): (Int, Int) =
        fs.listStatus(new Path(s"$idx/postings")).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("label="))
          .map(st => fs.listStatus(st.getPath)
            .count(_.getPath.getName.startsWith("part-")))
          .foldLeft((0, 0)) { case ((tot, mx), c) =>
            (tot + c, math.max(mx, c)) }
      val (filesFrag, maxCellFrag) = census()
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
        .map(_.toDouble).toSeq
      def serveBest(): Double = {
        // untimed warm call first: JIT/codegen, not file IO, dominates
        // the first serve in a fresh JVM
        graft.operators.AnnIndex
          .search(spark, idx, qv, nProbe = 2, topK = 10, excludeId = 0L)
          .write.format("noop").mode("overwrite").save()
        (1 to 3).map { _ =>
          val t1 = System.nanoTime()
          graft.operators.AnnIndex
            .search(spark, idx, qv, nProbe = 2, topK = 10, excludeId = 0L)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t1) / 1e9
        }.min
      }
      val serveFrag = serveBest()
      val t1 = System.nanoTime()
      val nCompacted = graft.operators.AnnIndex.compact(spark, idx).size
      val compactSec = (System.nanoTime() - t1) / 1e9
      val (filesComp, maxCellComp) = census()
      val serveComp = serveBest()
      println(s"""{"query":"ann_compact","n_vectors":$n,""" +
        s""""waves":$waves,"append_sec":${fmt(appendSec)},""" +
        s""""files_frag":$filesFrag,"max_cell_files_frag":$maxCellFrag,""" +
        s""""serve_frag_sec":${fmt(serveFrag)},""" +
        s""""cells_compacted":$nCompacted,""" +
        s""""compact_sec":${fmt(compactSec)},""" +
        s""""files_compacted":$filesComp,""" +
        s""""max_cell_files_compacted":$maxCellComp,""" +
        s""""serve_compacted_sec":${fmt(serveComp)}}""")
      graft.queries.Rm.rf(idx)
    }
    // LM-scoring arm (round 10; d97/d98 economics at tier): Stupid
    // Backoff's cost model is one positions scan + vocabulary²-bounded
    // count aggs + a per-position scoring join — on the constant-vocab
    // zipf corpus the count tables are size-invariant across tiers, so
    // time and shuffle should scale with positions alone. DSIR's
    // model is 256 rows by construction; its per-tier growth is the
    // feature scan only.
    if (what == "lm") {
      // factor == 1 would duplicate the 1x tier — run it once
      val lmTiers = Seq(("1x", 20000L)) ++
        (if (factor > 1) Seq((s"${factor}x", 20000L * factor)) else Nil)
      for ((tier, n) <- lmTiers) {
        val docs = zipfDocs(spark, n).localCheckpoint()
        Thread.sleep(800)
        metrics.read.set(0L); metrics.readRecords.set(0L)
        var t0 = System.nanoTime()
        val lmN = graft.operators.NgramLm
          .docScores(docs, "doc_id", "text").count()
        val lmSec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        val lmMb = metrics.read.getAndSet(0L) / 1e6
        val lmRec = metrics.readRecords.getAndSet(0L)
        t0 = System.nanoTime()
        val dsN = graft.operators.Dsir
          .logImportanceWeights(docs, "doc_id", "text",
            isTarget = col("doc_id") % 7 === 0).count()
        val dsSec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        val dsMb = metrics.read.getAndSet(0L) / 1e6
        val dsRec = metrics.readRecords.getAndSet(0L)
        println(s"""{"tier":"$tier","query":"lm_scoring",""" +
          s""""n_docs":$n,""" +
          s""""sbo_sec":${fmt(lmSec)},"sbo_docs":$lmN,""" +
          s""""sbo_shuffle_mb":${fmt(lmMb)},"sbo_shuffle_records":$lmRec,""" +
          s""""dsir_sec":${fmt(dsSec)},"dsir_docs":$dsN,""" +
          s""""dsir_shuffle_mb":${fmt(dsMb)},""" +
          s""""dsir_shuffle_records":$dsRec}""")
      }
    }
    // Fuzzy-blocking arm (round 11; d99's scale story made real):
    // Fuzzy.blockedLevPairs' length-bucket equi-join with PLANTED
    // ground truth. Corpus: n pseudo-random hex docs, lengths uniform
    // over a FIXED span (40..280, ~31 width-8 buckets), so occupancy
    // per bucket grows ×factor and the candidate count must grow
    // ×factor² — the per-bucket quadratic term made visible (at corpus
    // scale the length distribution bounds per-bucket occupancy, and
    // total cost is Σ occ² over buckets, never the global n²).
    // Planted twins: even ids get a 1/16-density hex substitution
    // (Δlen 0, same bucket), odd ids a 5-char suffix truncation
    // (crosses a bucket edge for lengths ≡ 0..4 mod 8). Losslessness:
    // every planted twin must be recovered (require-gated); random
    // hex pairs measure sim ≈ 0.3, far under the 0.6 threshold.
    if (what == "fuzzy") {
      val maxD = 8
      val n = 600L * factor
      val nPlant = 100L * factor
      val base = spark.range(n).select(col("id"),
        repeat(md5(col("id").cast("string")), 10).substr(lit(1),
          (lit(40) + pmod(xxhash64(col("id")), lit(240))).cast("int"))
          .as("text"))
      val twins = base.filter(col("id") < nPlant).select(
        (col("id") + n).as("id"),
        when(col("id") % 2 === 0, translate(col("text"), "a", "z"))
          .otherwise(col("text").substr(lit(1),
            (length(col("text")) - 5).cast("int"))).as("text"))
      val docs = base.unionByName(twins).localCheckpoint()
      Thread.sleep(800)
      metrics.read.set(0L); metrics.readRecords.set(0L)
      var t0 = System.nanoTime()
      val nCand = graft.operators.Fuzzy
        .candidatePairs(docs, "id", "text", maxD).count()
      val candSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      val candMb = metrics.read.getAndSet(0L) / 1e6
      val candRec = metrics.readRecords.getAndSet(0L)
      t0 = System.nanoTime()
      val pairs = graft.operators.Fuzzy
        .blockedLevPairs(docs, "id", "text", maxD, minSim = 0.6)
        .localCheckpoint()
      val verifySec = (System.nanoTime() - t0) / 1e9
      val nPairs = pairs.count()
      val found = pairs
        .filter(col("doc_b") === col("doc_a") + n &&
          col("doc_a") < nPlant).count()
      println(s"""{"query":"fuzzy_blocked","n_docs":${n + nPlant},""" +
        s""""max_delta":$maxD,"n_candidates":$nCand,""" +
        s""""cand_sec":${fmt(candSec)},""" +
        s""""cand_shuffle_mb":${fmt(candMb)},""" +
        s""""cand_shuffle_records":$candRec,""" +
        s""""verify_sec":${fmt(verifySec)},"n_pairs":$nPairs,""" +
        s""""planted":$nPlant,"planted_found":$found}""")
      require(found == nPlant,
        s"fuzzy blocking lost planted pairs: $found of $nPlant")
    }
    // MaxSim pruning arm (round 12; d105/d106's scale claim measured):
    // the same 50-query × 3-token batch against a zipf corpus, scored
    // exact (every (doc token, query token) pair) vs sign-bucket-
    // pruned (bucket + Hamming-1 probes). Reports the scored-pair
    // cut, wall/shuffle for the full top-10 serves, and recall@10 of
    // the pruned ranking vs the exact one. The pair cut must be real
    // (< 40% of exact — the 7/64-per-probe collision model predicts
    // ~11% before skew) and recall must clear a loose sanity floor.
    if (what == "maxsim") {
      import graft.operators.LateInteraction
      // SPARK_GRAFT_MAXSIM_BITS sweeps the recall/cost knob: fewer
      // sign bits → more collisions → higher recall, weaker cut
      val bits = sys.env.getOrElse("SPARK_GRAFT_MAXSIM_BITS", "6").toInt
      val n = 20000L * factor
      val docs = zipfDocs(spark, n).localCheckpoint()
      import spark.implicits._
      val qArr = (0L until 50L).map { q =>
        (q, Seq(s"r${(q * 131) % (n / 10)}", s"c${q % 50}",
          s"c${(q + 7) % 50}"))
      }.toDF("query_id", "terms")
      val nExact = LateInteraction
        .exactPairs(docs, "doc_id", "text", qArr, dim = 8).count()
      val nPruned = LateInteraction
        .prunedPairs(docs, "doc_id", "text", qArr, dim = 8,
          bits = bits)
        .count()
      Thread.sleep(800)
      metrics.read.set(0L); metrics.readRecords.set(0L)
      var t0 = System.nanoTime()
      val exact = LateInteraction.maxSimTopK(docs, "doc_id", "text",
        qArr, dim = 8, k = 10).localCheckpoint()
      val nEx = exact.count()
      val exactSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      val exMb = metrics.read.getAndSet(0L) / 1e6
      val exRec = metrics.readRecords.getAndSet(0L)
      t0 = System.nanoTime()
      val pruned = LateInteraction.maxSimTopKPruned(docs, "doc_id",
        "text", qArr, dim = 8, k = 10, bits = bits).localCheckpoint()
      val nPr = pruned.count()
      val prunedSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      val prMb = metrics.read.getAndSet(0L) / 1e6
      val prRec = metrics.readRecords.getAndSet(0L)
      val overlap = exact.select("query_id", "doc_id")
        .join(pruned.select("query_id", "doc_id"),
          Seq("query_id", "doc_id"))
        .count()
      val recall = overlap.toDouble / nEx
      println(s"""{"query":"maxsim_pruned","bits":$bits,"n_docs":$n,""" +
        s""""n_exact_pairs":$nExact,"n_pruned_pairs":$nPruned,""" +
        s""""pair_cut":${fmt(nPruned.toDouble / nExact)},""" +
        s""""exact_sec":${fmt(exactSec)},""" +
        s""""exact_shuffle_mb":${fmt(exMb)},""" +
        s""""exact_shuffle_records":$exRec,""" +
        s""""pruned_sec":${fmt(prunedSec)},""" +
        s""""pruned_shuffle_mb":${fmt(prMb)},""" +
        s""""pruned_shuffle_records":$prRec,""" +
        s""""topk_rows":$nEx,"pruned_rows":$nPr,""" +
        s""""recall_at_10":${fmt(recall)}}""")
      require(nPruned < nExact * 2 / 5,
        s"maxsim pruning cut too weak: $nPruned of $nExact pairs")
      require(recall >= 0.3,
        s"maxsim pruned recall collapsed: $recall")
      // PLAID-complete pass (VERDICT r12 #3): the pruned pass only
      // NOMINATES top-C per query, exact MaxSim re-scores the
      // nominated docs. The recall the bare pruned path loses (~0.69
      // at 1x) must come back (>= 0.95) while the wall stays a
      // fraction of exact — the nomination list keeps rerank flops
      // candidate-sized, so the gate is recall + a wall ratio.
      val nomC = sys.env.getOrElse("SPARK_GRAFT_MAXSIM_C", "500").toInt
      // Nomination probes wider than the bare pruned path (all 8 sign
      // bits, Hamming-<=2 multiprobe): the random-token collision
      // fraction stays ~37/256 = 14% while a MATCHING token (per-bit
      // sign agreement ~0.8) collides with ~0.8 probability vs ~0.65
      // at bits=6/r=1 — nomination recall is what the rerank can't
      // recover, so the nominator buys recall with probe width, not
      // candidate depth.
      val nomBits = sys.env.getOrElse("SPARK_GRAFT_MAXSIM_NOM_BITS",
        "8").toInt
      // The wall ratio of record is measured in the PRODUCTION serve
      // shape: both paths serve from the same prebuilt doc-token map,
      // stored BUCKETED by doc_id (PLAID assigns centroids at index
      // time; ColBERT doc vectors are precomputed — per-query corpus
      // re-hashing is not a serve cost on either side, and the
      // doc-clustered bucketed scan keeps every gather aggregation
      // exchange-free; a localCheckpoint would drop the clustering —
      // its LogicalRDD partitioning dangles on stale attribute ids).
      // drop + orphan-warehouse-dir sweep (shared helper, ADVICE r13)
      graft.queries.Warehouse.reset(spark, "graft_maxsim_tokmap")
      LateInteraction.docTokenMap(docs, "doc_id", "text", dim = 8)
        .write.bucketBy(32, "doc_id").format("parquet")
        .mode("overwrite").saveAsTable("graft_maxsim_tokmap")
      val tokMap = spark.table("graft_maxsim_tokmap")
      Thread.sleep(800)
      metrics.read.set(0L); metrics.readRecords.set(0L)
      t0 = System.nanoTime()
      val exactMap = LateInteraction
        .maxSimTopKFromMap(tokMap, qArr, dim = 8, k = 10)
        .localCheckpoint()
      exactMap.count()
      val exactMapSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      metrics.read.set(0L); metrics.readRecords.set(0L)
      t0 = System.nanoTime()
      val plaid = LateInteraction.maxSimTopKPlaidFromMap(tokMap, qArr,
        dim = 8, k = 10, bits = nomBits, c = nomC, hamming = 2)
        .localCheckpoint()
      val nPl = plaid.count()
      val plaidSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      val plMb = metrics.read.getAndSet(0L) / 1e6
      val plRec = metrics.readRecords.getAndSet(0L)
      val overlapPl = exact.select("query_id", "doc_id")
        .join(plaid.select("query_id", "doc_id"),
          Seq("query_id", "doc_id"))
        .count()
      val recallPl = overlapPl.toDouble / nEx
      println(s"""{"query":"maxsim_plaid","nom_bits":$nomBits,""" +
        s""""hamming":2,"c":$nomC,""" +
        s""""n_docs":$n,"plaid_sec":${fmt(plaidSec)},""" +
        s""""plaid_shuffle_mb":${fmt(plMb)},""" +
        s""""plaid_shuffle_records":$plRec,""" +
        s""""exact_map_sec":${fmt(exactMapSec)},""" +
        s""""exact_sec":${fmt(exactSec)},""" +
        s""""wall_ratio":${fmt(plaidSec / exactMapSec)},""" +
        s""""plaid_rows":$nPl,""" +
        s""""recall_at_10":${fmt(recallPl)}}""")
      require(recallPl >= 0.95,
        s"maxsim plaid rerank recall below gate: $recallPl")
      // Round 17 (VERDICT r16 #5): the wall-ratio gates here were
      // recalibrated twice in two rounds (0.25 -> 0.35 -> 0.5, and a
      // 1x "sanity factor") because every kernel landing moved one
      // arm's speed — a gate that moves per kernel is not a gate.
      // Both are now WORK-PROXY gates, invariant to either side's
      // per-row speed, with the wall ratio demoted to an advisory
      // line:
      //  - stage-1 scored pairs at the NOMINATION config must stay
      //    <= half of exact-from-map's |tokMap|·|distinct terms| at
      //    every tier (the >=2x flop cut, by pruning geometry — the
      //    measured collision fraction at bits=8/hamming<=2 is ~0.2);
      //  - stage 2 stays candidate-sized via the shuffle-records
      //    require below (~816k records, corpus-INDEPENDENT 1x..30x —
      //    VERDICT r14 #2; the localCheckpoint-style clustering loss
      //    blows through it at any scaled tier);
      //  - recall >= 0.95 (above) carries quality.
      val tokRows = tokMap.count()
      val nTermsB = qArr
        .select(explode(col("terms")).as("t")).distinct().count()
      val exactWorkPairs = tokRows * nTermsB
      val nomPairs = LateInteraction.nominationPairCount(
        tokMap, qArr, dim = 8, bits = nomBits, hamming = 2)
      println(s"""{"advisory":"maxsim_wall_ratio","n_docs":$n,""" +
        s""""plaid_sec":${fmt(plaidSec)},""" +
        s""""exact_map_sec":${fmt(exactMapSec)},""" +
        s""""wall_ratio":${fmt(plaidSec / exactMapSec)},""" +
        s""""nom_pairs":$nomPairs,"exact_work_pairs":$exactWorkPairs,""" +
        s""""pair_work_ratio":${fmt(
          nomPairs.toDouble / exactWorkPairs)}}""")
      require(nomPairs * 2 <= exactWorkPairs,
        s"plaid stage-1 scored pairs are not a real cut of the exact " +
          s"work: $nomPairs vs $exactWorkPairs")
      require(factor < 10 || plRec <= 1000000L,
        s"plaid serve shuffle records scaled with the corpus: $plRec")
      // Round 17 auto-switch arm (VERDICT r16 #1): the plan-time
      // switch must pick the tier's measured-cheaper arm — exact
      // below the ~2M-row crossover (1x: ~0.9M map rows), plaid
      // above it (10x+: >=9M) — and its wall must track the picked
      // arm (the decision costs one count()). The ARM pick is the
      // gate (kernel-independent); the walls land in the row so the
      // SCALE record shows auto ~= min(arms).
      Thread.sleep(800)
      t0 = System.nanoTime()
      val (autoArm, autoDf) = LateInteraction.maxSimServeFromMapPlan(
        tokMap, qArr, dim = 8, k = 10, bits = nomBits, c = nomC,
        hamming = 2)
      autoDf.write.format("noop").mode("overwrite").save()
      val autoSec = (System.nanoTime() - t0) / 1e9
      println(s"""{"query":"maxsim_auto","n_docs":$n,""" +
        s""""n_tokmap_rows":$tokRows,"arm":"$autoArm",""" +
        s""""auto_sec":${fmt(autoSec)},""" +
        s""""exact_map_sec":${fmt(exactMapSec)},""" +
        s""""plaid_sec":${fmt(plaidSec)}}""")
      require(factor > 2 || autoArm == "exact",
        s"auto serve picked '$autoArm' at the 1x tier where exact " +
          "is measured cheaper")
      require(factor < 10 || autoArm == "plaid",
        s"auto serve picked '$autoArm' at ${factor}x where plaid " +
          "is measured cheaper")
    }
    // StatsStore IVM arm (round 12; d115's 100 TB claim measured):
    // maintaining per-key counters for a corpus of N docs via a 1%%
    // ingest wave must cost ~wave + store, while the recompute
    // alternative scans all N — the gap should widen linearly with
    // corpus size while the incremental wall stays flat.
    if (what == "stats") {
      import graft.operators.StatsStore
      val n = 200000L * factor
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-statsprobe").toString
      try {
        // the corpus lives ON DISK (parquet), like a real lakehouse
        // table — the recompute alternative must pay the scan the
        // incremental path exists to avoid
        spark.range(n).select(col("id").as("doc_id"),
            concat(lit("l"), pmod(col("id"), lit(5))).as("lang"),
            concat_ws(" ", (0 until 20).map(j =>
              concat(lit("w"), pmod(xxhash64(col("id"), lit(j)),
                lit(5000)))): _*).as("text"))
          .write.parquet(s"$tmp/corpus")
        val corpus = spark.read.parquet(s"$tmp/corpus")
        StatsStore.init(corpus.filter(col("doc_id") < n - n / 100),
          "lang", "text", tmp)
        val wave = corpus.filter(col("doc_id") >= n - n / 100)
          .localCheckpoint()
        Thread.sleep(400)
        var t0 = System.nanoTime()
        StatsStore.applyWave(wave, "lang", "text", tmp)
        val incSec = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val full = corpus.groupBy("lang").agg(
            count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " "))).as("n_tokens"))
          .collect()
        val fullSec = (System.nanoTime() - t0) / 1e9
        // the maintained store equals the recompute (doc/token counts)
        val got = StatsStore.read(spark, tmp)
          .select("key", "n_docs", "n_tokens")
          .collect().map(r => (r.getString(0), r.getLong(1),
            r.getLong(2))).toSet
        val want = full.map(r => (s"${r.getString(0)}",
          r.getLong(1), r.getLong(2))).toSet
        require(got == want, s"IVM diverged from recompute")
        println(s"""{"query":"stats_ivm","n_docs":$n,""" +
          s""""wave_docs":${n / 100},""" +
          s""""incremental_sec":${fmt(incSec)},""" +
          s""""recompute_sec":${fmt(fullSec)}}""")
      } finally graft.queries.Rm.rf(tmp)
    }
    // Sequence-packing arm (round 12; d119/d120's scale claims
    // measured): n synthetic (doc_id, len) rows. Concat-and-chunk's
    // only global structure is the distributed prefix sum (one range
    // exchange), so wall and shuffle should track n near-linearly;
    // token conservation is asserted at every tier. pairPack's
    // padding-waste is compared against the naive one-doc-per-sequence
    // baseline — the measured "padding cut" the pairing exists for.
    if (what == "pack") {
      import graft.operators.Packing
      val n = 500000L * factor
      val docs = spark.range(n).select(col("id").as("doc_id"),
        (pmod(xxhash64(col("id")), lit(490)) + 10).as("len"))
        .localCheckpoint()
      val tot = docs.agg(sum("len")).head().getLong(0)
      Thread.sleep(400)
      metrics.read.set(0L)
      var t0 = System.nanoTime()
      val seqs = Packing.packedSequences(docs, "doc_id", "len", 1024L)
        .localCheckpoint()
      val nSeq = seqs.count()
      val chunkSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      val cMb = metrics.read.getAndSet(0L) / 1e6
      val occ = seqs.agg(sum("n_tokens")).head().getLong(0)
      require(occ == tot,
        s"concat-and-chunk lost tokens: occupied $occ vs total $tot")
      t0 = System.nanoTime()
      val packs = Packing.pairPack(docs, "doc_id", "len", 512L)
        .localCheckpoint()
      val wastePair = packs.agg(sum("waste")).head().getLong(0)
      val pairSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      val pMb = metrics.read.getAndSet(0L) / 1e6
      val wasteNaive = docs
        .agg(sum(lit(512L) - least(col("len"), lit(512L))))
        .head().getLong(0)
      println(s"""{"query":"pack","n_docs":$n,"n_tokens":$tot,""" +
        s""""n_seqs":$nSeq,"chunk_sec":${fmt(chunkSec)},""" +
        s""""chunk_shuffle_mb":${fmt(cMb)},""" +
        s""""pair_sec":${fmt(pairSec)},""" +
        s""""pair_shuffle_mb":${fmt(pMb)},""" +
        s""""waste_pair":$wastePair,"waste_naive":$wasteNaive,""" +
        s""""waste_cut":${fmt(1.0 - wastePair.toDouble / wasteNaive)}}""")
    }
    // Gram/PCA arm (round 12; d121/d122's scale claims measured):
    // n synthetic 64-dim embeddings. gramQFast is the production
    // reduction (one treeAggregate of slot-packed LONG arrays — flop
    // cost n·d², shuffle ~zero); the declarative explode path runs at
    // 1x only and is asserted exactly equal (integer sums have one
    // answer). Power iteration + projection ride the 1x tier too —
    // at 10x the topEigenQ overflow guard fires by design (the
    // rescale divisor must grow with the corpus; asserted here).
    if (what == "gram") {
      import graft.operators.LinAlg
      val n = 50000L * factor
      val dim = 64
      val emb = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          ((pmod(xxhash64(col("id"), j), lit(2001)) - lit(1000))
            .cast("double") / 1000.0).cast("float")).as("embedding"))
        .localCheckpoint()
      Thread.sleep(400)
      metrics.read.set(0L)
      var t0 = System.nanoTime()
      val fast = LinAlg.gramQFast(emb, "embedding", dim)
      val fastSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      val fMb = metrics.read.getAndSet(0L) / 1e6
      var slowSec = -1.0
      var eigSec = -1.0
      if (factor <= 1) {
        t0 = System.nanoTime()
        val slow = LinAlg.gramQ(emb, "embedding").collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
        slowSec = (System.nanoTime() - t0) / 1e9
        var k = 0
        for (i <- 0 until dim; j <- i until dim) {
          require(fast(k) == slow((i, j)),
            s"gramQFast diverged from gramQ at ($i,$j)")
          k += 1
        }
        val upper = slow.toSeq.map { case ((i, j), g) => (i, j, g) }
        t0 = System.nanoTime()
        val v = LinAlg.topEigenQ(upper, dim)
        val topN = LinAlg.projectQ(emb, "vec_id", "embedding", v)
          .orderBy(abs(col("proj_q")).desc, col("vec_id"))
          .limit(10).count()
        eigSec = (System.nanoTime() - t0) / 1e9
        require(topN == 10L, "pca projection lost rows")
      } else {
        // the overflow guard must fire loudly above the documented
        // threshold — constructed FROM the threshold itself (ADVICE
        // r12: fast.max only exceeds it around factor >= 10, so
        // intermediate tiers would spuriously fail on corpus stats)
        val overG =
          (Long.MaxValue / (dim.toLong * LinAlg.Scale) + 1L) *
            LinAlg.Scale
        val upper = Seq((0, 0, overG), (0, 1, 0L), (1, 1, 1L))
        val guarded =
          try { LinAlg.topEigenQ(upper, dim); false }
          catch { case e: IllegalArgumentException =>
            e.getMessage.contains("overflow") }
        require(guarded,
          "topEigenQ overflow guard silent at the scaled tier")
      }
      println(s"""{"query":"gram","n_vecs":$n,"dim":$dim,""" +
        s""""fast_sec":${fmt(fastSec)},""" +
        s""""fast_shuffle_mb":${fmt(fMb)},""" +
        s""""explode_sec":${fmt(slowSec)},""" +
        s""""eig_project_sec":${fmt(eigSec)}}""")
    }
    // Graph-traversal arm (round 12; d136/d137's cost claims
    // measured): a 4-regular hash graph of 200k×factor nodes;
    // frontier BFS from n/100k seeds and min-md5 walks from n/100
    // starts. The claim under test is that per-round cost is
    // frontier/walker-sized — the walker side broadcasts and the
    // shuffle stays orders of magnitude under the edge list at
    // every tier.
    if (what == "graphwalk") {
      import graft.operators.Graph
      val n = 200000L * factor
      val edges = spark.range(n).select(col("id").as("src"),
          explode(array((0 until 4).map(j =>
            pmod(xxhash64(col("id"), lit(j)), lit(n))): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .localCheckpoint()
      def run(tag: String)(f: => Long): (Double, Double, Long) = {
        Thread.sleep(300)
        metrics.read.set(0L)
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (sec, metrics.read.getAndSet(0L) / 1e6, rows)
      }
      val seeds = spark.range(n).filter(col("id") % 100000 === 0)
        .select(col("id"))
      val (bfsSec, bfsMb, reached) = run("bfs") {
        Graph.bfsDistance(
          edges.select(col("src"), col("dst")), seeds, maxDepth = 3)
          .count()
      }
      val starts = spark.range(n).filter(col("id") % 100 === 0)
        .select(col("id"))
      val (wSec, wMb, walkers) = run("walks") {
        Graph.hashWalks(edges, starts, len = 3).count()
      }
      val edgeRows = edges.count()
      println(s"""{"query":"graphwalk","n_nodes":$n,""" +
        s""""n_edges":$edgeRows,""" +
        s""""bfs_sec":${fmt(bfsSec)},"bfs_shuffle_mb":${fmt(bfsMb)},""" +
        s""""bfs_reached":$reached,""" +
        s""""walks_sec":${fmt(wSec)},""" +
        s""""walks_shuffle_mb":${fmt(wMb)},""" +
        s""""n_walkers":$walkers}""")
    }
    // Z-order layout arm (round 12; the q27/q38 layout claim
    // MEASURED): the same 2M×factor-row fact written three ways —
    // unsorted, linear-sorted by x, z-ordered (x, y) — then the same
    // two selective filters (a tight x range; a tight y range) run
    // against each layout with source input bytes captured per
    // (layout, predicate). Expectation under parquet row-group
    // min/max pruning: linear prunes x but reads ~everything for y;
    // z-order prunes BOTH (the Morton curve keeps locality on every
    // clustered column); unsorted prunes neither.
    if (what == "zorder") {
      import graft.operators.Compact
      val n = 2000000L * factor
      val fact = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(4096L)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(4096L)).as("y"),
        xxhash64(col("id"), lit(2)).as("payload"))
      val base = s"$synthDir/zorder"
      fact.repartition(32)
        .write.mode("overwrite").parquet(s"$base/unsorted")
      fact.repartitionByRange(32, col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite").parquet(s"$base/linear")
      fact.withColumn("z",
          Compact.zValue(Seq(col("x"), col("y")), bits = 12))
        .repartitionByRange(32, col("z")).sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite").parquet(s"$base/zorder")
      def probe(layout: String, c: String): (Double, Long, Long, Double) = {
        Thread.sleep(500)
        metrics.input.set(0L)
        metrics.inputRecords.set(0L)
        val t0 = System.nanoTime()
        // summing the incompressible payload forces every SURVIVING
        // row group to be materialized — bytes read now scale with
        // what the layout failed to prune, not with a dictionary-
        // encoded key column
        val cnt = spark.read.parquet(s"$base/$layout")
          .filter(col(c) >= 1000 && col(c) <= 1015)
          .agg(count(lit(1)),
            sum(pmod(col("payload"), lit(1000000L)))).head().getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        (metrics.input.getAndSet(0L), cnt,
          metrics.inputRecords.getAndSet(0L), sec)
      }
      val (ux, cx, urx, usx) = probe("unsorted", "x")
      val (uy, cy, ury, usy) = probe("unsorted", "y")
      val (lx, cx2, lrx, lsx) = probe("linear", "x")
      val (ly, cy2, lry, lsy) = probe("linear", "y")
      val (zx, cx3, zrx, zsx) = probe("zorder", "x")
      val (zy, cy3, zry, zsy) = probe("zorder", "y")
      require(cx == cx2 && cx2 == cx3 && cy == cy2 && cy2 == cy3,
        "layouts disagree on the filtered count")
      println(s"""{"query":"zorder","n_rows":$n,""" +
        s""""rows_x":$cx,"rows_y":$cy,""" +
        s""""unsorted_x_mb":${fmt(ux / 1e6)},""" +
        s""""unsorted_y_mb":${fmt(uy / 1e6)},""" +
        s""""linear_x_mb":${fmt(lx / 1e6)},""" +
        s""""linear_y_mb":${fmt(ly / 1e6)},""" +
        s""""zorder_x_mb":${fmt(zx / 1e6)},""" +
        s""""zorder_y_mb":${fmt(zy / 1e6)},""" +
        s""""scan_rows":{"unsorted_x":$urx,"unsorted_y":$ury,""" +
        s""""linear_x":$lrx,"linear_y":$lry,""" +
        s""""zorder_x":$zrx,"zorder_y":$zry},""" +
        s""""scan_sec":{"unsorted_x":${fmt(usx)},""" +
        s""""unsorted_y":${fmt(usy)},"linear_x":${fmt(lsx)},""" +
        s""""linear_y":${fmt(lsy)},"zorder_x":${fmt(zsx)},""" +
        s""""zorder_y":${fmt(zsy)}}}""")
    }
    // Constraint-validation arm (round 12; d128's one-scan claim
    // measured at tier): the same synthetic fact table validated
    // with 2 rules vs 16 rules vs 16 rules + uniqueness. If the
    // suite really is ONE aggregate, rule count is free (identical
    // wall, identical shuffle) and the only paid step is the
    // count-distinct's expand. 6M rows at 10×.
    if (what == "validate") {
      import graft.operators.{RowCheck, Validation}
      val n = 600000L * factor
      val fact = spark.range(n).select(
        (col("id") / 4).cast("long").as("k1"),
        (col("id") % 4).cast("int").as("k2"),
        (pmod(xxhash64(col("id")), lit(50)) + 1).cast("double")
          .as("qty"),
        (pmod(xxhash64(col("id"), lit(1)), lit(11)).cast("double") /
          100.0).as("disc"),
        concat(lit("F"), pmod(xxhash64(col("id"), lit(2)), lit(3)))
          .as("flag"))
        .localCheckpoint()
      def rules(m: Int): Seq[RowCheck] = (0 until m).map(i =>
        RowCheck(s"r$i", col("qty") > (20 + i) ||
          col("disc") > (0.02 + i * 0.005)))
      def run(m: Int, uniq: Boolean): (Double, Double, Long) = {
        Thread.sleep(300)
        metrics.read.set(0L)
        val t0 = System.nanoTime()
        val rep = Validation.report(fact, rules(m),
          if (uniq) Some(("pk", Seq("k1", "k2"))) else None)
          .collect()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (sec, metrics.read.getAndSet(0L) / 1e6,
          rep.map(_.getAs[Long]("n_violations")).sum)
      }
      run(2, uniq = false) // warm
      val (s2, mb2, v2) = run(2, uniq = false)
      val (s16, mb16, v16) = run(16, uniq = false)
      val (s16u, mb16u, _) = run(16, uniq = true)
      require(v16 >= v2, "rule growth lost violations")
      println(s"""{"query":"validate","n_rows":$n,""" +
        s""""rules2_sec":${fmt(s2)},"rules2_mb":${fmt(mb2)},""" +
        s""""rules16_sec":${fmt(s16)},"rules16_mb":${fmt(mb16)},""" +
        s""""rules16_uniq_sec":${fmt(s16u)},""" +
        s""""rules16_uniq_mb":${fmt(mb16u)}}""")
    }
    // PCA-pruned ANN serving arm (round 12; s20's at-rest claim
    // measured): the corpus projection is materialized SORTED by
    // proj_q (repartitionByRange + sortWithinPartitions — the
    // deployment layout), so a query's candidate step is a literal
    // range predicate the parquet reader prunes by row-group min/max
    // — the 1-D spectral IVF probe. The pruning is provably sound
    // exactly in the HIGH-similarity regime: for unit vectors,
    // cos(x, q) ≤ cos(∠x − ∠q) where ∠ is the angle to the probe
    // direction, so a near-duplicate (cos ≈ 1) MUST land within a
    // narrow |Δproj| window — this is the dedup/near-dup serve
    // path, not generic diverse top-k (s19 measures the
    // structureless generic case). The corpus is random unit-ish
    // vectors plus 10 PLANTED near-dups of each query (cos ≈
    // 0.9999 ≫ the ~0.58 random-pair ceiling at 50k docs), so
    // brute top-10 = the planted set and recall@10 is the
    // correctness witness; candidate fraction + walls the cost one.
    if (what == "annpca") {
      import graft.operators.{LinAlg, Similarity}
      val nBase = 50000L * factor
      val dim = 64
      val qids = Seq(1L, 2L, 3L)
      val base = spark.range(nBase).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          ((pmod(xxhash64(col("id"), j), lit(2001)) - lit(1000))
            .cast("double") / 1000.0).cast("float")).as("embedding"))
      // 10 near-dups of each query: x + 0.001·ε on the UNIT-scaled
      // base vector (ids beyond the base range, k = 1..10)
      val dups = spark.range(30).select(
        (lit(nBase) + col("id")).as("vec_id"),
        (col("id") % 3 + 1).as("src"), (col("id") / 3).as("k"))
      val unit = (e: org.apache.spark.sql.Column) => {
        val nrm = sqrt(aggregate(e, lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")))
        transform(e, x => (x.cast("double") / nrm).cast("float"))
      }
      val dupEmb = dups.join(
          base.filter(col("vec_id").isin(qids: _*))
            .select(col("vec_id").as("src"),
              unit(col("embedding")).as("ue")), "src")
        .select(col("vec_id"), transform(col("ue"), (x, j) =>
          (x.cast("double") +
            (pmod(xxhash64(col("vec_id"), j, lit(13)), lit(2001)) -
              lit(1000)).cast("double") / 1000.0 * 0.001)
            .cast("float")).as("embedding"))
      val emb = base.select(col("vec_id"),
          unit(col("embedding")).as("embedding"))
        .unionByName(dupEmb)
        .localCheckpoint()
      val upper = {
        val g = LinAlg.gramQFast(emb, "embedding", dim)
        var k = -1
        for (i <- 0 until dim; j <- i until dim) yield {
          k += 1; (i, j, g(k))
        }
      }
      val v = LinAlg.topEigenQ(upper, dim)
      val sortedDir = s"$synthDir/annpca_sorted"
      LinAlg.projectQ(emb, "vec_id", "embedding", v)
        .join(emb, "vec_id")
        .repartitionByRange(32, col("proj_q"))
        .sortWithinPartitions("proj_q")
        .write.mode("overwrite").parquet(sortedDir)
      val sorted = spark.read.parquet(sortedDir)
      // bounded driver artifacts: 3 query vectors + 3 projections
      val qrows = sorted.filter(col("vec_id").isin(qids: _*))
        .select("vec_id", "proj_q", "embedding").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Float](2))).sortBy(_._1)
      val span = sorted.agg(max("proj_q") - min("proj_q")).head()
        .getLong(0)
      // ±1% of the projection range: comfortably wider than the
      // planted perturbation's provable |Δproj| bound (‖Δx‖ ≈
      // 0.001·√(64/3) ≈ 0.005 of a ~1.0 span)
      val delta = span / 100
      def serve(pruned: Boolean): (Double, Map[Long, Seq[Long]], Long) = {
        var nCand = 0L
        val t0 = System.nanoTime()
        val res = qrows.map { case (qid, qproj, qv) =>
          val base0 =
            if (pruned)
              sorted.filter(col("proj_q") >= qproj - delta &&
                col("proj_q") <= qproj + delta)
            else sorted
          val base = base0.filter(col("vec_id") =!= qid)
          if (pruned) nCand += base.count()
          val top = base.select(col("vec_id"),
              Similarity.cosine(
                Similarity.asDouble(col("embedding")),
                typedlit(qv.map(_.toDouble))).as("cos"))
            .orderBy(col("cos").desc, col("vec_id"))
            .limit(10).collect().map(_.getLong(0)).toSeq
          qid -> top
        }.toMap
        ((System.nanoTime() - t0) / 1e9, res, nCand)
      }
      val (bruteSec, bruteTop, _) = serve(pruned = false)
      val (prunedSec, prunedTop, nCand) = serve(pruned = true)
      val recall = qids.map(q =>
        prunedTop(q).toSet.intersect(bruteTop(q).toSet).size).sum /
        (10.0 * qids.size)
      println(s"""{"query":"annpca","n_vecs":${nBase + 30},""" +
        s""""dim":$dim,""" +
        s""""brute_sec":${fmt(bruteSec)},""" +
        s""""pruned_sec":${fmt(prunedSec)},""" +
        s""""n_candidates":$nCand,""" +
        s""""cand_frac":${fmt(nCand.toDouble / (3.0 * (nBase + 30)))},""" +
        s""""recall_at10":${fmt(recall)}}""")
    }
    // Binned-range-join arm (round 12; q88's scale claim measured):
    // uniform points vs width-25 intervals, joined binned (width-31
    // equi-join + BETWEEN verify) and — at 1× only, where it is
    // feasible — as the bare theta join Spark plans as a broadcast
    // nested loop. Identical output asserted; the binned plan must
    // contain no nested loop.
    if (what == "rangejoin") {
      import graft.operators.RangeJoin
      val nP = 200000L * factor
      val nI = 2000L * factor
      val pts = spark.range(nP).select(col("id").as("pid"),
        pmod(xxhash64(col("id")), lit(nP)).as("v")).localCheckpoint()
      val ivs = spark.range(nI).select(col("id").as("ik"),
          pmod(xxhash64(col("id"), lit(7)), lit(nP)).as("lo"))
        .withColumn("hi", col("lo") + 25).localCheckpoint()
      Thread.sleep(800)
      metrics.read.set(0L); metrics.readRecords.set(0L)
      var t0 = System.nanoTime()
      val binned = RangeJoin.pointInInterval(pts, "v", ivs,
        "lo", "hi", width = 31)
      val nB = binned.count()
      val binnedSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      val bMb = metrics.read.getAndSet(0L) / 1e6
      val plan = binned.queryExecution.executedPlan.toString
      require(!plan.contains("NestedLoop"),
        "binned range join degenerated to a nested loop")
      val (nljSec, nN) =
        if (factor <= 3) {
          t0 = System.nanoTime()
          val n = pts.join(ivs,
            col("v").between(col("lo"), col("hi"))).count()
          ((System.nanoTime() - t0) / 1e9, n)
        } else (-1.0, nB)   // theta control infeasible at scale
      require(nB == nN,
        s"binned range join lost pairs: $nB vs theta $nN")
      println(s"""{"query":"rangejoin_binned","n_points":$nP,""" +
        s""""n_intervals":$nI,"n_pairs":$nB,""" +
        s""""binned_sec":${fmt(binnedSec)},""" +
        s""""binned_shuffle_mb":${fmt(bMb)},""" +
        s""""theta_nlj_sec":${fmt(nljSec)}}""")
    }
    // SDM window-join arm (r18 verdict #3): the stopword-bigram
    // regime where the per-(doc, bigram) pair product is the 100×
    // cost risk. Docs are R repetitions of an 8-token block holding
    // one "the" and one "of" each, so per-doc tf grows with R at
    // FIXED pair density: the r18 unbinned (doc, term)-keyed join
    // evaluates tf² candidate pairs per doc, the binned equi-join
    // (sdmWindowCounts — d147's production fragment) ~3·tf (one
    // partner bucket triple per pa). The tokenize is staged OUT of
    // the timed region (the d61 discipline: the quadratic-risk
    // region is what's measured); tfo/tfu sums must agree
    // bit-for-bit between shapes — binning changes cost, never
    // counts. Expected: unbinned grows ~R² across the tiers while
    // binned stays near-linear in R.
    if (what == "sdmwin") {
      import graft.operators.Retrieval
      import spark.implicits._
      val nDocs = 1000L * factor / 10
      val bgd = Seq(("the", "of")).toDF("ta", "tb").localCheckpoint()
      def posOf(r: Int) = {
        val text = Seq.fill(r)("the of f1 f2 f3 f4 f5 f6")
          .mkString(" ")
        Retrieval.positionalPostings(
          spark.range(nDocs).select(col("id").as("doc_id"),
            lit(text).as("text")),
          "doc_id", "text")
          .filter(col("term").isin("the", "of"))
          .localCheckpoint()
      }
      // untimed warm-up (JIT + codegen) on a tiny tier
      locally {
        val w = posOf(2)
        Retrieval.sdmWindowCounts(w, bgd, window = 8).count()
        w.unpersist()
      }
      for (r <- Seq(25, 250, 2500)) {
        val ps = posOf(r)
        Thread.sleep(400)
        var t0 = System.nanoTime()
        val b = Retrieval.sdmWindowCounts(ps, bgd, window = 8)
          .agg(sum(col("tfo")).as("so"), sum(col("tfu")).as("su"),
            count(lit(1)).as("n")).head()
        val binnedSec = (System.nanoTime() - t0) / 1e9
        // the r18 shape: equi-join on (doc, term) with the band as a
        // post-filter inside the hash join — tf_a·tf_b pairs per doc
        val pA = ps.select(col("doc_id"), col("term").as("ta"),
          col("pos").as("pa"))
        val pB = ps.select(col("doc_id").as("doc_b"),
          col("term").as("tb2"), col("pos").as("pb"))
        t0 = System.nanoTime()
        val u = pA.join(broadcast(bgd), Seq("ta"))
          .join(pB,
            col("doc_b") === col("doc_id") && col("tb2") === col("tb") &&
              abs(col("pb") - col("pa")) < lit(8) &&
              col("pb") =!= col("pa"))
          .groupBy(col("doc_id"), col("ta"), col("tb"))
          .agg(count(when(col("pb") === col("pa") + 1, 1)).as("tfo"),
            count(lit(1)).as("tfu"))
          .agg(sum(col("tfo")).as("so"), sum(col("tfu")).as("su"),
            count(lit(1)).as("n")).head()
        val unbinnedSec = (System.nanoTime() - t0) / 1e9
        require(b.getLong(0) == u.getLong(0) &&
          b.getLong(1) == u.getLong(1) && b.getLong(2) == u.getLong(2),
          s"binned/unbinned window counts diverged: $b vs $u")
        // the planted geometry: tfo = R, tfu = 2R−1 per doc
        require(b.getLong(0) == nDocs * r &&
          b.getLong(1) == nDocs * (2L * r - 1),
          s"fixture geometry broke: $b (r=$r, docs=$nDocs)")
        println(s"""{"query":"sdm_window_binned","n_docs":$nDocs,""" +
          s""""tf_per_doc":$r,"pairs_tfu":${b.getLong(1)},""" +
          s""""cand_binned_per_doc":${3 * r},""" +
          s""""cand_unbinned_per_doc":${r.toLong * r},""" +
          s""""binned_sec":${fmt(binnedSec)},""" +
          s""""unbinned_sec":${fmt(unbinnedSec)}}""")
        ps.unpersist()
      }
    }
    // Proximity min-distance probe (round 20, verdict r19 #1 — the
    // sdmwin witness pattern applied to proximityRescore's rewrite):
    // a planted high-tf fixture where each candidate doc holds r
    // occurrences of BOTH query terms, so the old pa×pb pair join
    // builds r² different-term pairs per doc while the lag-window
    // form sorts 2r+filler positions once. Both forms must agree on
    // every (query, doc) minimum (asserted); the row records the two
    // walls so the near-linear-vs-quadratic law is a measured curve.
    if (what == "proxwin") {
      import graft.operators.Retrieval
      import spark.implicits._
      val nDocs = 1000L * factor / 10
      def qpOf(r: Int): DataFrame = {
        val text = Seq.fill(r)("qa f1 f2 f3 qb f4 f5 f6").mkString(" ")
        Retrieval.positionalPostings(
          spark.range(nDocs).select(col("id").as("doc_id"),
            lit(text).as("text")),
          "doc_id", "text")
          .filter(col("term").isin("qa", "qb"))
          .select(lit(1L).as("query_id"), col("doc_id"),
            col("term"), col("pos"))
          .localCheckpoint()
      }
      def pairJoinMin(qp: DataFrame): DataFrame = {
        // the r19 shape, verbatim: all distinct-term position pairs
        val pa = qp.select(col("query_id"), col("doc_id"),
          col("term").as("ta"), col("pos").as("pa"))
        val pb = qp.select(col("query_id"), col("doc_id"),
          col("term").as("tb"), col("pos").as("pb"))
        pa.join(pb, Seq("query_id", "doc_id"))
          .filter(col("ta") < col("tb"))
          .groupBy("query_id", "doc_id")
          .agg(min(abs(col("pa") - col("pb"))).as("mind"))
      }
      locally { // untimed warm-up (JIT + codegen)
        val w = qpOf(2)
        Retrieval.minCrossTermGap(w).count(); pairJoinMin(w).count()
        w.unpersist()
      }
      for (r <- Seq(25, 250, 2500)) {
        val qp = qpOf(r)
        Thread.sleep(400)
        var t0 = System.nanoTime()
        val lw = Retrieval.minCrossTermGap(qp)
          .agg(sum(col("mind")).as("s"), count(lit(1)).as("n")).head()
        val lagSec = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val pj = pairJoinMin(qp)
          .agg(sum(col("mind")).as("s"), count(lit(1)).as("n")).head()
        val pairSec = (System.nanoTime() - t0) / 1e9
        require(lw.getLong(0) == pj.getLong(0) &&
          lw.getLong(1) == pj.getLong(1),
          s"lag-window/pair-join minima diverged: $lw vs $pj")
        // planted geometry: qa at 8k, qb at 8k+4 → every cross-term
        // gap is exactly 4 (qb−qa within a repeat, qa−qb across),
        // so min = 4 per doc, sum = 4·nDocs, one row per doc
        require(lw.getLong(0) == 4L * nDocs && lw.getLong(1) == nDocs,
          s"fixture geometry broke: $lw (r=$r, docs=$nDocs)")
        println(s"""{"query":"prox_mindist_lag","n_docs":$nDocs,""" +
          s""""tf_per_doc":$r,""" +
          s""""pairs_per_doc_old":${r.toLong * r},""" +
          s""""positions_per_doc_new":${2L * r},""" +
          s""""lag_sec":${fmt(lagSec)},""" +
          s""""pairjoin_sec":${fmt(pairSec)}}""")
        qp.unpersist()
      }
    }
    // Core-count scaling witness (round 20, verdict r19 #2: PERF_r19's
    // `suspect_cpus_ignored` flag — at sf0.1 every bench query is
    // fixed-overhead-bound, so NOTHING demonstrated parallel scaling).
    // Runs three shuffle-heavy bodies at the `factor`x tier under
    // whatever SPARK_GRAFT_CPUS this JVM was launched with and emits
    // one row per query carrying "cpus"; the harness is launched once
    // at 32 and once at 8 cores and the two rows' ratio is the
    // witness. Bodies: d35's substring dedup (gram-stream shuffle,
    // linear in corpus), d107's RM3 (three chained pruned-scan
    // stages) — both catalog functions verbatim over the synthesized
    // corpus — and d61's SSJoin over the PLANTED near-dup corpus (the
    // r17 scale-law fixture; the synth copy-corpus would be
    // quadratic in copy count by construction).
    if (what == "cores") {
      val nDocsPlanted = 5000L * factor
      val planted = plantedDocs(spark, nDocsPlanted).localCheckpoint()
      val bodies: Seq[(String, () => Unit)] = Seq(
        ("d35_substring_dedup", () =>
          queries("d35_substring_dedup")(spark, synthDir)
            .write.format("noop").mode("overwrite").save()),
        ("d107_rm3_expansion", () =>
          queries("d107_rm3_expansion")(spark, synthDir)
            .write.format("noop").mode("overwrite").save()),
        ("d61_ssjoin_planted", () =>
          graft.operators.SSJoin.joinSorted(
            graft.operators.SSJoin.sortedTokenArrays(
              planted, "doc_id", "text"), t = 0.9)
            .write.format("noop").mode("overwrite").save()))
      bodies.foreach { case (name, run) =>
        try {
          run() // untimed warm-up (JIT + codegen + parquet footers)
          val secs = (1 to 2).map { _ =>
            Thread.sleep(300)
            metrics.read.set(0); metrics.write.set(0)
            val t0 = System.nanoTime()
            run()
            (System.nanoTime() - t0) / 1e9
          }
          Thread.sleep(300)
          val mb = (metrics.read.get + metrics.write.get) / 1e6
          println(s"""{"query":"cores_$name","factor":$factor,""" +
            s""""cpus":$cpus,"sec":${fmt(secs.min)},""" +
            s""""samples":[${secs.map(fmt).mkString(",")}],""" +
            s""""shuffle_rw_mb":${fmt(mb)}}""")
        } catch { case e: Throwable =>
          System.err.println(s"[scale] cores/$name failed: ${e.getMessage}")
        }
      }
    }
    // Gather-strategy probe (round 10; d94's TopKAgg claim measured):
    // the same doc-at-a-time scored relation — (query, doc, score)
    // candidate rows for 500 two-term queries against a 200k-doc
    // zipf corpus — reduced to per-query top-10 two ways: the window
    // form (row_number over partitionBy(query): EVERY candidate row
    // shuffles to its query's partition and sorts) vs TopKAgg (a
    // k-bounded buffer that partial-aggregates map-side, ≤ k rows
    // per query × partition cross the wire). Same input, same
    // output (asserted); the contrast is pure gather shuffle.
    if (what == "gather") {
      import graft.operators.Retrieval
      val R = Retrieval
      val n = 100000L
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-gatherprobe").toString
      R.writeIndex(zipfDocs(spark, n), "doc_id", "text", tmp,
        nBuckets = 64)
      import spark.implicits._
      val vocab = spark.read.parquet(s"${graft.operators.Retrieval.root(spark, tmp)}/terms")
        .select("term").as[String].collect().toSeq
      val docMap = R.impactDocMap(
          R.readIndexSlice(spark, tmp, vocab, nBuckets = 64),
          R.readStats(spark, tmp))
        .localCheckpoint()
      // 500 queries, each one rare + one common term — the serve mix
      val qArr = (0L until 500L).map { q =>
        (q, Seq(s"r${(q * 131) % (n / 10)}", s"c${q % 50}"))
      }.toDF("query_id", "terms")
      def windowGather(): org.apache.spark.sql.DataFrame = {
        import org.apache.spark.sql.expressions.Window
        R.docMapScores(docMap, qArr)
          .withColumn("rk", row_number().over(
            Window.partitionBy("query_id")
              .orderBy(col("score").desc, col("doc_id").asc))
            .cast("long"))
          .filter(col("rk") <= 10)
          .select("query_id", "rk", "doc_id", "score")
      }
      def aggGather(): org.apache.spark.sql.DataFrame =
        R.bm25TopKDocMap(docMap, qArr, k = 10)
      def run(thunk: () => org.apache.spark.sql.DataFrame)
          : (Double, Double, Long, Long) = {
        thunk().write.format("noop").mode("overwrite").save() // warm
        Thread.sleep(800)
        metrics.read.set(0L); metrics.write.set(0L)
        metrics.readRecords.set(0L)
        val t0 = System.nanoTime()
        val cnt = thunk().count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        (sec, metrics.read.getAndSet(0L) / 1e6,
          metrics.readRecords.getAndSet(0L), cnt)
      }
      val (aggSec, aggMb, aggRec, aggN) = run(aggGather)
      val (winSec, winMb, winRec, winN) = run(windowGather)
      val a = aggGather()
      val b = windowGather().select(a.columns.map(col): _*)
      val identical = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      println(s"""{"query":"gather_topk","n_docs":$n,"n_queries":500,""" +
        s""""k":10,"topkagg_sec":${fmt(aggSec)},""" +
        s""""topkagg_shuffle_mb":${fmt(aggMb)},""" +
        s""""topkagg_shuffle_records":$aggRec,"topkagg_rows":$aggN,""" +
        s""""window_sec":${fmt(winSec)},""" +
        s""""window_shuffle_mb":${fmt(winMb)},""" +
        s""""window_shuffle_records":$winRec,"window_rows":$winN,""" +
        s""""outputs_identical":$identical}""")
      graft.queries.Rm.rf(tmp)
    }
    // Text-index compaction probe (round 10 — the ann_compact shape
    // for Retrieval.compactPostings, VERDICT r09 #4): 64 append waves
    // fragment every tb bucket into ~one file batch each; measures
    // serve cost from the fragmented postings, the selective compact,
    // and serve cost after. Row content and partition pruning are
    // identical before/after, so the delta is pure file-open/footer
    // overhead — the small-files wall an append-heavy text index hits
    // between maintenance passes.
    if (what == "textcompact") {
      import org.apache.hadoop.fs.Path
      val R = graft.operators.Retrieval
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val n = docs.count()
      val cut = n / 2
      val waves = 64
      val idx = java.nio.file.Files
        .createTempDirectory("graft-textidx-compactprobe").toString
      R.writeIndex(docs.filter(col("doc_id") < cut),
        "doc_id", "text", idx, nBuckets = 16)
      val span = (n - cut + waves - 1) / waves
      val ta = System.nanoTime()
      (0 until waves).foreach { w =>
        val lo = cut + w * span
        val hi = math.min(n, lo + span)
        if (lo < hi) R.appendIndex(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "doc_id", "text", idx, nBuckets = 16)
      }
      val appendSec = (System.nanoTime() - ta) / 1e9
      val fs = new Path(idx).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def census(): (Int, Int) =
        fs.listStatus(new Path(
            s"${graft.operators.Retrieval.root(spark, idx)}/postings"))
          .toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("tb="))
          .map(st => fs.listStatus(st.getPath)
            .count(_.getPath.getName.startsWith("part-")))
          .foldLeft((0, 0)) { case ((tot, mx), c) =>
            (tot + c, math.max(mx, c)) }
      val (filesFrag, maxBucketFrag) = census()
      val qterms = Seq("hash", "join", "window", "agg", "stream",
        "vector", "scan")
      val queries = {
        import spark.implicits._
        Seq((1L, "hash"), (1L, "join"), (2L, "window"), (2L, "agg"),
          (2L, "stream"), (3L, "vector"), (3L, "scan"))
          .toDF("query_id", "term")
      }
      def serveBest(): Double = {
        def serve() = R.bm25TopKIndexed(
            R.readIndexSlice(spark, idx, qterms, nBuckets = 16),
            queries, R.readStats(spark, idx), k = 10)
          .write.format("noop").mode("overwrite").save()
        serve()            // untimed warm call: JIT, not file IO
        (1 to 3).map { _ =>
          val t1 = System.nanoTime()
          serve()
          (System.nanoTime() - t1) / 1e9
        }.min
      }
      val serveFrag = serveBest()
      val t1 = System.nanoTime()
      val nCompacted = R.compactPostings(spark, idx).size
      val compactSec = (System.nanoTime() - t1) / 1e9
      val (filesComp, maxBucketComp) = census()
      val serveComp = serveBest()
      println(s"""{"query":"text_compact","n_docs":$n,""" +
        s""""waves":$waves,"append_sec":${fmt(appendSec)},""" +
        s""""files_frag":$filesFrag,""" +
        s""""max_bucket_files_frag":$maxBucketFrag,""" +
        s""""serve_frag_sec":${fmt(serveFrag)},""" +
        s""""buckets_compacted":$nCompacted,""" +
        s""""compact_sec":${fmt(compactSec)},""" +
        s""""files_compacted":$filesComp,""" +
        s""""max_bucket_files_compacted":$maxBucketComp,""" +
        s""""serve_compacted_sec":${fmt(serveComp)}}""")
      graft.queries.Rm.rf(idx)
    }
    // Focused cold-CC probe (VERDICT r07 #1): the d20 clustering step
    // WITHOUT the ccMemo, so every sample pays the full candidate-pair +
    // contraction cost; reports the large-star/small-star round count
    // alongside wall time so the convergence claim is in the artifact.
    if (what == "cc") {
      for ((tier, dir) <- Seq(("1x", base), (s"${factor}x", synthDir))) {
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          try {
            val pairs = graft.operators.Dedup.candidatePairs(
              graft.operators.Dedup.minhashBands(
                spark.read.parquet(s"$dir/documents.parquet"),
                "doc_id", "text"),
              "doc_id")
            graft.operators.Dedup.connectedComponents(pairs)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $tier cc failed: ${e.getMessage}")
            -1.0
          }
        }
        Thread.sleep(800)
        val rd = metrics.read.getAndSet(0L) / 1e6
        val wr = metrics.write.getAndSet(0L) / 1e6
        println(s"""{"tier":"$tier","query":"d20_cold_cc",""" +
          s""""samples":[${samples.map(fmt).mkString(",")}],""" +
          s""""sec":${fmt(samples.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""cc_rounds":${graft.operators.Dedup.lastCCIterations.get()},""" +
          s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
      }
    }
    // Incremental-CC arm (d77's economics at tier): yesterday's labels
    // (untimed — they are a persisted artifact in the nightly shape)
    // plus a 5% edge wave, measured against the full recompute over
    // the union. The planted graph is the d61-style linear regime:
    // pair chains of bounded length (edge i: 2i — 2i+1 plus every
    // 20th edge bridging two pairs), so components stay small and
    // both arms' outputs are checked identical by count + label sum.
    if (what == "incc") {
      import graft.operators.Dedup
      for ((tier, nEdges) <- Seq(("1x", 500000L),
          (s"${factor}x", 500000L * factor))) {
        val all = spark.range(nEdges).select(
          (col("id") * 2).as("d1"),
          when(col("id") % 20 === 19, col("id") * 2 - 2)
            .otherwise(col("id") * 2 + 1).as("d2"))
        val cutoff = nEdges * 95 / 100
        // stage all inputs as PARQUET and read back — the nightly
        // shape's actual storage (labels are yesterday's persisted
        // artifact), and it keeps the 100x tier out of driver heap
        // (localCheckpoint caching 100M-row frames OOMed there)
        val stageDir = s"/tmp/graft_incc_stage_${tier}_$nEdges"
        all.filter(col("id") < lit(cutoff)).select("d1", "d2")
          .write.mode("overwrite").parquet(s"$stageDir/w0")
        all.filter(col("id") >= lit(cutoff)).select("d1", "d2")
          .write.mode("overwrite").parquet(s"$stageDir/wave")
        val w0 = spark.read.parquet(s"$stageDir/w0")
        val wave = spark.read.parquet(s"$stageDir/wave")
        Dedup.connectedComponents(w0)
          .write.mode("overwrite").parquet(s"$stageDir/labels0")
        val labels0 = spark.read.parquet(s"$stageDir/labels0")
        def run(tag: String)(thunk: () => org.apache.spark.sql.DataFrame)
            : (Seq[Double], Double, Long, Long) = {
          var chk = (-1L, -1L)
          val samples = (1 to 2).map { _ =>
            Thread.sleep(800)
            metrics.read.set(0L); metrics.write.set(0L)
            val t0 = System.nanoTime()
            try {
              val r = thunk().agg(count(lit(1)), sum(col("rep"))).head()
              chk = (r.getLong(0), r.getLong(1))
              (System.nanoTime() - t0) / 1e9
            } catch { case e: Throwable =>
              System.err.println(s"[scale] $tier incc $tag failed: ${e.getMessage}")
              -1.0
            }
          }
          Thread.sleep(800)
          (samples, metrics.read.getAndSet(0L) / 1e6, chk._1, chk._2)
        }
        val (fS, fRd, fN, fSum) = run("full")(() =>
          Dedup.connectedComponents(w0.unionAll(wave)))
        val (iS, iRd, iN, iSum) = run("incr")(() =>
          Dedup.incrementalCC(labels0, wave))
        println(s"""{"tier":"$tier","query":"d77_incremental_cc",""" +
          s""""n_edges":$nEdges,"wave_edges":${nEdges - cutoff},""" +
          s""""full_samples":[${fS.map(fmt).mkString(",")}],""" +
          s""""full_sec":${fmt(fS.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""full_shuffle_read_mb":${fmt(fRd)},""" +
          s""""incr_samples":[${iS.map(fmt).mkString(",")}],""" +
          s""""incr_sec":${fmt(iS.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""incr_shuffle_read_mb":${fmt(iRd)},""" +
          s""""labels_match":${fN == iN && fSum == iSum},""" +
          s""""n_labels":$fN}""")
      }
    }
    // Suffix-array arm (d78's economics at tier): word-soup docs from
    // a 24-word vocab (heavy repeated substrings — the doubling-round
    // worst case: many positions share long prefixes, so ranks
    // individuate late) at 1x/10x/30x of the sf0.01 character volume.
    // Evidence per tier: build wall + shuffle, the round count implied
    // by maxLen, and two distributed invariants — ranks are a
    // permutation (distinct ranks == positions) and adjacent tails
    // are non-decreasing in rank order (the local sortedness the
    // sf0.01 DuckDB gate proves globally).
    if (what == "sa") {
      import graft.operators.SuffixArray
      val vocab = Seq("key", "agg", "row", "scan", "slow", "fast",
        "table", "value", "part", "hash", "merge", "batch", "spark",
        "order", "data", "column", "join", "small", "line", "customer",
        "query", "window", "group", "vector")
      val vocabCol = array(vocab.map(lit): _*)
      for ((tier, nDocs) <- Seq(("1x", 500L), (s"${factor}x",
          500L * factor))) {
        val docs = spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(50)),
            j => element_at(vocabCol,
              (pmod(hash(col("id") * 100 + j), lit(24)) + 1)
                .cast("int")))).as("text"))
          .localCheckpoint()
        val nChars = docs.agg(sum(length(col("text")))).head().getLong(0)
        val maxLen = docs.agg(max(length(col("text")))).head().getInt(0)
        Thread.sleep(800)
        metrics.read.set(0L); metrics.write.set(0L)
        val t0 = System.nanoTime()
        val sa = SuffixArray.build(docs, "doc_id", "text")
          .localCheckpoint()
        val n = sa.count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        val rd = metrics.read.getAndSet(0L) / 1e6
        // invariants (untimed)
        val distinctRanks = sa.select("rank").distinct().count()
        val nxt = sa.select((col("rank") - 1).as("rank"),
          col("tail").as("tailNext"))
        val inversions = sa.join(nxt, Seq("rank"))
          .filter(col("tail") > col("tailNext")).count()
        println(s"""{"tier":"$tier","query":"d78_suffix_array",""" +
          s""""n_docs":$nDocs,"n_positions":$n,"n_chars":$nChars,""" +
          s""""max_doc_len":$maxLen,""" +
          s""""build_sec":${fmt(sec)},"shuffle_read_mb":${fmt(rd)},""" +
          s""""rank_permutation":${distinctRanks == n},""" +
          s""""adjacent_inversions":$inversions}""")
      }
    }
    // BPE-training arm (d80's economics at tier): the claim is that
    // the corpus is touched ONCE (the word-type count) and every merge
    // round runs on the VOCABULARY-sized symbol table — so train time
    // beyond the scan should be flat in corpus size (the word-soup
    // vocab is constant across tiers). Compare full train(8) against
    // the word-count scan alone.
    if (what == "bpe") {
      import graft.operators.BpeTrain
      val vocab = Seq("key", "agg", "row", "scan", "slow", "fast",
        "table", "value", "part", "hash", "merge", "batch", "spark",
        "order", "data", "column", "join", "small", "line", "customer",
        "query", "window", "group", "vector")
      val vocabCol = array(vocab.map(lit): _*)
      for ((tier, nDocs) <- Seq(("1x", 500L), (s"${factor}x",
          500L * factor))) {
        val docs = spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(50)),
            j => element_at(vocabCol,
              (pmod(hash(col("id") * 100 + j), lit(24)) + 1)
                .cast("int")))).as("text"))
          .localCheckpoint()
        Thread.sleep(800)
        metrics.read.set(0L); metrics.write.set(0L)
        var t0 = System.nanoTime()
        val nTypes = docs
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy("w").agg(count(lit(1))).count()
        val scanSec = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val table = BpeTrain.train(docs, "text", nMerges = 8)
          .orderBy("step").select("pair", "n")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        val trainSec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        val rd = metrics.read.getAndSet(0L) / 1e6
        println(s"""{"tier":"$tier","query":"d80_bpe_train",""" +
          s""""n_docs":$nDocs,"n_word_types":$nTypes,""" +
          s""""scan_sec":${fmt(scanSec)},"train_sec":${fmt(trainSec)},""" +
          s""""shuffle_read_mb":${fmt(rd)},""" +
          s""""first_merge":"${table.head._1}","first_n":${table.head._2}}""")
      }
      // Batched-merge economics (VERDICT r09 #6): the exact trainer is
      // one driver round-trip PER MERGE, so vocab-scale training
      // (32k merges) means 32k Spark jobs; trainBatched greedily
      // admits the maximal disjoint subset of a top-256 window per
      // round. The corpus here uses 20k 8-letter word types over a
      // 26-letter alphabet (disjointness is alphabet-bounded early
      // on — a hex corpus caps admission near 4 pairs/round, letters
      // sustain ~12-15) so >1k merges exist to learn; the row reports
      // merges-per-round actually achieved and the wall-clock
      // contrast against the exact trainer pace (exact train(64)
      // timed on the same corpus, scaled linearly — the per-merge
      // job cost is constant, so the extrapolation is the comparison
      // a deployment would make).
      locally {
        import graft.operators.BpeTrain
        val nDocs2 = 20000L
        val alpha = array(('a' to 'z').map(c => lit(c.toString)): _*)
        val docs2 = spark.range(nDocs2).select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(40)),
            j => {
              val wid = pmod(xxhash64(col("id"), j), lit(20000L))
              concat_ws("", transform(sequence(lit(1), lit(8)),
                c => element_at(alpha,
                  (pmod(xxhash64(wid, c), lit(26)) + 1).cast("int"))))
            })).as("text"))
          .localCheckpoint()
        var t0 = System.nanoTime()
        val batched = BpeTrain.trainBatched(docs2, "text",
          nRounds = 90, batchSize = 256).collect()
        val batchedSec = (System.nanoTime() - t0) / 1e9
        val nMergesB = batched.length
        val nRoundsB = if (batched.isEmpty) 0L
          else batched.map(_.getLong(1)).max
        t0 = System.nanoTime()
        val exact64 = BpeTrain.train(docs2, "text", nMerges = 64).count()
        val exactSec = (System.nanoTime() - t0) / 1e9
        println(s"""{"query":"d92_bpe_batched","n_docs":$nDocs2,""" +
          s""""n_word_types":20000,"n_merges":$nMergesB,""" +
          s""""n_rounds":$nRoundsB,""" +
          s""""merges_per_round":${fmt(
            if (nRoundsB == 0) 0 else nMergesB.toDouble / nRoundsB)},""" +
          s""""batched_sec":${fmt(batchedSec)},""" +
          s""""exact_sec_64_merges":${fmt(exactSec)},""" +
          s""""exact_n":$exact64,""" +
          s""""exact_sec_extrapolated_same_merges":${fmt(
            exactSec / 64.0 * nMergesB)}}""")
      }
      // Incremental-count economics at vocab scale (VERDICT r10 #7):
      // 5k+ merges on a 60k-type letter corpus, trainBatched (full
      // pair recount every round) vs trainIncremental (maintained
      // counts — pair explode over TOUCHED words only). The row
      // reports both wall-clocks plus the incremental run's per-round
      // touched-word series quartiles: as training converges, touched
      // words per round FALL, and round cost follows them instead of
      // staying vocabulary-sized.
      locally {
        import graft.operators.BpeTrain
        val nTypes = 60000L
        val alpha = array(('a' to 'z').map(c => lit(c.toString)): _*)
        val docs3 = spark.range(30000L).select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(40)),
            j => {
              val wid = pmod(xxhash64(col("id"), j), lit(nTypes))
              concat_ws("", transform(sequence(lit(1), lit(9)),
                c => element_at(alpha,
                  (pmod(xxhash64(wid, c), lit(26)) + 1).cast("int"))))
            })).as("text"))
          .localCheckpoint()
        // Identity gate at a bounded depth: full recount vs
        // incremental must produce the SAME merge table (count +
        // content) before the long run is allowed to mean anything.
        val idRounds = 60
        val batch = 256
        // SPARK_GRAFT_BPE_ONLY=long skips the identity-depth arms so
        // a retry of the LONG pair (each arm 2.5-4 min) can fit this
        // host's short quiet windows without burning one on the
        // already-measured shallow arms.
        val longOnly =
          sys.env.get("SPARK_GRAFT_BPE_ONLY").contains("long")
        // each arm's start is LOAD-GATED (the d61 discipline — this
        // host's ~10-min external waves poison whichever arm they
        // overlap, and the r18 gate is a RATIO of arms, so both
        // sides must measure under comparable load); the release
        // loads land in the row as arm_start_loadavg
        val armLoads = scala.collection.mutable.ArrayBuffer[Double]()
        if (!longOnly) armLoads += waitQuiet()
        var t0 = System.nanoTime()
        val tabB =
          if (longOnly) Seq.empty
          else BpeTrain.trainBatched(docs3, "text", idRounds, batch)
            .orderBy("step").collect().map(_.toSeq).toSeq
        val fullSec = (System.nanoTime() - t0) / 1e9
        // AUTO (default threshold — VERDICT r15 #5's switch): must
        // stay bit-identical wherever the switch lands, and should
        // track the cheaper arm at this shallow depth
        val idArms = scala.collection.mutable
          .ArrayBuffer.empty[(Int, Boolean, Double)]
        if (!longOnly) armLoads += waitQuiet()
        t0 = System.nanoTime()
        val tabI =
          if (longOnly) Seq.empty
          else BpeTrain.trainIncremental(docs3, "text", idRounds,
            batch, onArm = Some((r, d, sg) => idArms += ((r, d, sg))))
            .orderBy("step").collect().map(_.toSeq).toSeq
        val incIdSec = (System.nanoTime() - t0) / 1e9
        // identity gates are vacuous on the skipped (empty) arms —
        // guard them so a long-only retry cannot "pass" an unmeasured
        // invariant (r18 review)
        if (!longOnly)
          require(tabB == tabI, s"incremental BPE diverged at scale: " +
            s"${tabB.length} vs ${tabI.length} merges")
        // PURE delta at the same depth (threshold = ∞ forces the
        // maintained table from round 1) — the r15 shallow-depth
        // crossover cost the switch exists to remove
        if (!longOnly) armLoads += waitQuiet()
        t0 = System.nanoTime()
        val nPd =
          if (longOnly) 0L
          else BpeTrain.trainIncremental(docs3, "text", idRounds,
            batch, recountThreshold = Double.MaxValue).count()
        val deltaIdSec = (System.nanoTime() - t0) / 1e9
        if (!longOnly)
          require(nPd == tabB.length.toLong,
            s"pure-delta arm diverged: $nPd vs ${tabB.length} merges")
        // Long AUTO run to vocab scale (>= 5k merges): record
        // per-round (touched words, wall) and the switch's decision
        // trace — as training converges, touched words fall and the
        // switch must move to (and stay on) the delta arm while
        // round cost follows the touched series.
        val rounds = 400
        // the long depth's MIN denominator (VERDICT r17 #2: "auto <=
        // 1.1x min at BOTH gated depths" needs a measured arm to
        // divide by): recount-only at the same depth — at this corpus
        // scale recount is the cheaper arm throughout (the r17
        // calibration finding), so trainBatched IS min(arms) here
        // SPARK_GRAFT_BPE_ORDER=auto_first swaps the pair so the
        // AUTO arm gets the fresh quiet window (on this host's
        // quiet-2-5-min / loud-10-min cycle the SECOND gated arm
        // tends to start at the wave's tail — alternating order
        // across retry attempts gives each arm a quiet-window best,
        // the d61 retry-trail discipline).
        val autoFirst =
          sys.env.get("SPARK_GRAFT_BPE_ORDER").contains("auto_first")
        val perRound = scala.collection.mutable
          .ArrayBuffer.empty[(Long, Double)]
        val longArms = scala.collection.mutable
          .ArrayBuffer.empty[(Int, Boolean, Double)]
        var nRec400 = 0L
        var recount400Sec = 0.0
        var nI = 0L
        var incSec = 0.0
        def runRecountArm(): Unit = {
          armLoads += waitQuiet()
          val tR0 = System.nanoTime()
          nRec400 = BpeTrain.trainBatched(docs3, "text", rounds,
            batch).count()
          recount400Sec = (System.nanoTime() - tR0) / 1e9
        }
        // SPARK_GRAFT_BPE_NOOBS=1 drops the per-round OBSERVER from
        // the auto arm (round-19 finding: the onRound touched-count
        // callback runs one extra `cur.filter(touchedPred).count()`
        // JOB per round — ~400 extra corpus-filter counts the recount
        // arm never pays, measured ~70 s over the 400-round run, i.e.
        // the whole 1.5-1.6× "gap" of the two r19 gated attempts that
        // survived their weather. The wall GATE must compare
        // uninstrumented arm against uninstrumented arm; the touched/
        // wall decile series already exists from the instrumented
        // runs and doesn't need re-measuring per attempt). The cheap
        // driver-side onArm decision trace stays either way.
        val noObs = sys.env.get("SPARK_GRAFT_BPE_NOOBS").contains("1")
        def runAutoArm(): Unit = {
          armLoads += waitQuiet()
          var lastT = System.nanoTime()
          val tA0 = System.nanoTime()
          val obs: Option[(Int, Long, Int) => Unit] =
            if (noObs) None
            else Some((_, t, _) => {
              val now = System.nanoTime()
              perRound += ((t, (now - lastT) / 1e9)); lastT = now
            })
          nI = BpeTrain.trainIncremental(docs3, "text", rounds,
            batch, obs,
            onArm = Some((r, d, sg) => longArms += ((r, d, sg))))
            .count()
          incSec = (System.nanoTime() - tA0) / 1e9
        }
        if (autoFirst) { runAutoArm(); runRecountArm() }
        else { runRecountArm(); runAutoArm() }
        val ts = perRound.toSeq
        val dec = math.max(1, ts.length / 10)
        def mu(xs: Seq[Double]): Double =
          if (xs.isEmpty) -1.0 else xs.sum / xs.length
        val la = longArms.toSeq
        val firstDelta = la.find(_._2).map(_._1).getOrElse(-1)
        println(s"""{"query":"bpe_incremental","n_word_types":$nTypes,""" +
          s""""arm_start_loadavg":[${armLoads.map(fmt).mkString(",")}],""" +
          s""""batch":$batch,"identity_rounds":$idRounds,""" +
          // unmeasured (long-only) identity arms emit the established
          // -1 poisoned/absent sentinel, never a plausible ~0.0 wall
          // (r18 review); identity_arms_skipped makes the skip legible
          s""""identity_arms_skipped":$longOnly,""" +
          s""""full_recount_sec_${idRounds}r":${fmt(
            if (longOnly) -1.0 else fullSec)},""" +
          s""""auto_sec_${idRounds}r":${fmt(
            if (longOnly) -1.0 else incIdSec)},""" +
          s""""pure_delta_sec_${idRounds}r":${fmt(
            if (longOnly) -1.0 else deltaIdSec)},""" +
          s""""auto_recount_rounds_${idRounds}r":${
            if (longOnly) -1 else idArms.count(!_._2)},""" +
          s""""auto_delta_rounds_${idRounds}r":${
            if (longOnly) -1 else idArms.count(_._2)},""" +
          s""""long_rounds":${ts.length},"long_merges":$nI,""" +
          s""""observer_skipped":$noObs,""" +
          s""""long_sec":${fmt(incSec)},""" +
          s""""long_recount_sec":${fmt(recount400Sec)},""" +
          s""""long_recount_merges":$nRec400,""" +
          s""""long_recount_rounds":${la.count(!_._2)},""" +
          s""""long_delta_rounds":${la.count(_._2)},""" +
          s""""long_first_delta_round":$firstDelta,""" +
          s""""signal_first_round":${fmt(la.headOption.map(_._3).getOrElse(-1.0))},""" +
          s""""signal_last_round":${fmt(la.lastOption.map(_._3).getOrElse(-1.0))},""" +
          s""""touched_first_decile":${fmt(mu(ts.take(dec).map(_._1.toDouble)))},""" +
          s""""touched_last_decile":${fmt(mu(ts.takeRight(dec).map(_._1.toDouble)))},""" +
          s""""round_sec_first_decile":${fmt(mu(ts.take(dec).map(_._2)))},""" +
          s""""round_sec_last_decile":${fmt(mu(ts.takeRight(dec).map(_._2)))}}""")
        // Production-vocab depth (VERDICT r12 #7): ≥ 8k merges on the
        // same 60k-type corpus, wide window (batch 1024), maxMerges
        // stop — the FastBPE delta property must hold ALL the way up:
        // per-round wall tracks the touched-word series, not the
        // vocabulary. Gated to the scaled tiers (the run is minutes).
        if (factor >= 10) {
          val target = 8192
          val deepRounds = scala.collection.mutable
            .ArrayBuffer.empty[(Long, Int, Double)]
          var lastD = System.nanoTime()
          t0 = System.nanoTime()
          val nDeep = BpeTrain.trainIncremental(docs3, "text",
            nRounds = 100000, batchSize = 1024,
            Some((_, t, a) => {
              val now = System.nanoTime()
              deepRounds += ((t, a, (now - lastD) / 1e9)); lastD = now
            }), maxMerges = target).count()
          val deepSec = (System.nanoTime() - t0) / 1e9
          val ds = deepRounds.toSeq
          val dd = math.max(1, ds.length / 10)
          val touchedF = mu(ds.take(dd).map(_._1.toDouble))
          val touchedL = mu(ds.takeRight(dd).map(_._1.toDouble))
          val wallF = mu(ds.take(dd).map(_._3))
          val wallL = mu(ds.takeRight(dd).map(_._3))
          // the honest unit is cost PER MERGE: as training converges,
          // symbol diversity lets a round admit MORE disjoint pairs
          // (measured: ~13/round early, 40+ late), so per-round wall
          // can rise while per-merge cost falls with the touched set
          val perMergeF = mu(ds.take(dd).map(r => r._3 / r._2))
          val perMergeL = mu(ds.takeRight(dd).map(r => r._3 / r._2))
          println(s"""{"query":"bpe_vocab_scale","n_word_types":$nTypes,""" +
            s""""batch":1024,"target_merges":$target,""" +
            s""""merges":$nDeep,"rounds":${ds.length},""" +
            s""""total_sec":${fmt(deepSec)},""" +
            s""""touched_first_decile":${fmt(touchedF)},""" +
            s""""touched_last_decile":${fmt(touchedL)},""" +
            s""""admitted_first_decile":${fmt(mu(ds.take(dd).map(_._2.toDouble)))},""" +
            s""""admitted_last_decile":${fmt(mu(ds.takeRight(dd).map(_._2.toDouble)))},""" +
            s""""round_sec_first_decile":${fmt(wallF)},""" +
            s""""round_sec_last_decile":${fmt(wallL)},""" +
            s""""sec_per_merge_first_decile":${fmt(perMergeF)},""" +
            s""""sec_per_merge_last_decile":${fmt(perMergeL)},""" +
            s""""touched_ratio":${fmt(touchedL / touchedF)}}""")
          require(nDeep >= target,
            s"bpe vocab-scale run stopped at $nDeep merges")
          // The convergence property AS DOCUMENTED (BpeTrain
          // scaladoc): the touched series must COLLAPSE as training
          // converges — that is the corpus/training property every
          // incremental-cost claim rests on, and it is
          // kernel/arm/load-independent (measured at 8.2k merges:
          // 45x fall, 5,774 -> 130). The per-merge and per-round
          // wall ratios that used to be requires here are demoted to
          // the advisory line below (VERDICT r16 #5: r17's run
          // failed the 0.85 per-merge bar at 0.043 -> 0.040 under
          // host load — a wall ratio on a noisy host gates the
          // neighbor, not the code; and with the r17 wall-feedback
          // switch the cheaper arm at this corpus scale is often the
          // RECOUNT, whose round wall is deliberately flat).
          require(touchedL <= 0.05 * touchedF,
            s"touched series did not collapse: $touchedF -> $touchedL")
          println(s"""{"advisory":"bpe_vocab_scale_walls",""" +
            s""""per_merge_first_decile":${fmt(perMergeF)},""" +
            s""""per_merge_last_decile":${fmt(perMergeL)},""" +
            s""""round_sec_first_decile":${fmt(wallF)},""" +
            s""""round_sec_last_decile":${fmt(wallL)}}""")
        }
      }
    }
    // Spill probe — the "size partitions so they fit in executor
    // memory" guideline, MEASURED instead of asserted: the same global
    // sort of a ~5.5 GB payload under two shuffle-partition settings.
    // At 4 partitions each sort task must hold ~1.4 GB — over the
    // per-task execution share, so the sorter spills (memory/disk
    // spill bytes from task metrics are the witness); at 128
    // partitions each task sorts ~45 MB in memory and spill is zero.
    // Same rows, same output, the knob is the whole difference — at
    // 100 TB this is the difference between a sort that runs and one
    // that thrashes.
    if (what == "spill") {
      import org.apache.spark.sql.functions.{concat => fconcat}
      val n = 50000000L
      val payload = spark.range(n).select(col("id"),
        fconcat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string")),
          md5((col("id") + 2).cast("string"))).as("s"))
      for ((tag, parts) <- Seq(("undersized", 4), ("sized", 128))) {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        Thread.sleep(800)
        metrics.read.set(0L); metrics.write.set(0L)
        metrics.memSpilled.set(0L); metrics.diskSpilled.set(0L)
        metrics.maxTaskRead.set(0L)
        val t0 = System.nanoTime()
        payload.orderBy("s").write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        println(s"""{"tier":"$tag","query":"spill_sort",""" +
          s""""n_rows":$n,"shuffle_partitions":$parts,""" +
          s""""sort_sec":${fmt(sec)},""" +
          s""""shuffle_read_mb":${fmt(metrics.read.getAndSet(0L) / 1e6)},""" +
          s""""max_task_read_mb":${fmt(metrics.maxTaskRead.getAndSet(0L) / 1e6)},""" +
          s""""mem_spilled_mb":${fmt(metrics.memSpilled.getAndSet(0L) / 1e6)},""" +
          s""""disk_spilled_mb":${fmt(metrics.diskSpilled.getAndSet(0L) / 1e6)}}""")
      }
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
    }
    // Whale-component probe (VERDICT r08 #2): one component holding 60%
    // of all nodes — the late-round star-skew worst case the Dedup
    // scaladoc documents. The whale is a balanced binary tree (node i —
    // i DIV 2), so contraction reaches the full-width star on node 0
    // within ~log(depth) rounds; the rest of the graph is 2-node
    // components. With the per-node min as a partial-aggregable groupBy
    // (map-side combine) and the join-back skew-splittable by AQE, the
    // peak single-task shuffle read must stay near the advisory
    // partition size, NOT the whale's full neighborhood; the window
    // formulation this replaced had no such bound. Invariants checked
    // untimed: max component size == whale size, component count exact.
    if (what == "whale") {
      val n = 200000L * factor
      val nWhale = n * 6 / 10
      // deployment-scale AQE skew thresholds (same rationale as the
      // skew arm: the defaults are executor-sized, not sandbox-sized)
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      val edges = spark.range(1, nWhale)
        .select(col("id").as("s"), expr("id DIV 2").as("d"))
        .unionAll(spark.range(nWhale, n - 1, 2)
          .select(col("id").as("s"), (col("id") + 1).as("d")))
        .localCheckpoint()
      metrics.maxTaskRead.set(0L)
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try {
          graft.operators.Dedup.connectedComponents(edges)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[scale] whale cc failed: ${e.getMessage}")
          -1.0
        }
      }
      Thread.sleep(800)
      val rd = metrics.read.getAndSet(0L) / 1e6
      val wr = metrics.write.getAndSet(0L) / 1e6
      val mx = metrics.maxTaskRead.getAndSet(0L) / 1e6
      val comp = graft.operators.Dedup.connectedComponents(edges)
        .groupBy("rep").agg(count(lit(1)).as("sz"))
        .agg(max("sz").as("mxsz"), count(lit(1)).as("ncomp")).head()
      spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      println(s"""{"query":"whale_cc","n_nodes":$n,"whale_nodes":$nWhale,""" +
        s""""samples":[${samples.map(fmt).mkString(",")}],""" +
        s""""sec":${fmt(samples.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
        s""""cc_rounds":${graft.operators.Dedup.lastCCIterations.get()},""" +
        s""""max_component":${comp.getLong(0)},""" +
        s""""n_components":${comp.getLong(1)},""" +
        s""""max_task_shuffle_read_mb":${fmt(mx)},""" +
        s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
    }
    // k-means training probe (round 9, d64's mechanism at tier):
    // whole-vector Lloyd (trainCodebook m=1) over the synthesized
    // embeddings. Train arm: FIXED k — per-iteration cost is one
    // corpus scan + one (cid, dim) aggregation of scaled-long partial
    // sums, so wall time must grow ~linearly in vectors while driver
    // state stays k·d doubles. Prune arm: the published SemDeDup knob —
    // k grows with the corpus (k ≈ n/250) so mean cluster size stays
    // ~constant and the within-cluster pair join's work per cluster is
    // bounded; reports the pruned count so the arm is evidence, not a
    // no-op (rotated synth copies are cosine-distinct by design, so
    // pruning stays sparse — the timing measures the JOIN's shape).
    if (what == "kmeans") {
      for ((tier, dir) <- Seq(("1x", base), (s"${factor}x", synthDir))) {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val nv = emb.count()
        metrics.read.getAndSet(0L); metrics.write.getAndSet(0L)
        val t0 = System.nanoTime()
        graft.operators.Quantize.trainCodebook(
          emb, "vec_id", "embedding", m = 1, k = 8, iters = 2)
        val trainSec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        val trd = metrics.read.getAndSet(0L) / 1e6
        metrics.write.getAndSet(0L)
        val kPrune = math.max(8, (nv / 250).toInt)
        val t1 = System.nanoTime()
        val cb = graft.operators.Quantize.trainCodebook(
          emb, "vec_id", "embedding", m = 1, k = kPrune, iters = 2)
        val av = emb.select(col("vec_id"),
          graft.operators.Similarity.asDouble(col("embedding")).as("v"),
          graft.operators.Quantize.encodeFast(col("embedding"), cb)
            .getItem(0).as("cid"))
        val nPruned = av.as("a").join(av.as("b"),
            col("a.cid") === col("b.cid") &&
              col("a.vec_id") < col("b.vec_id"))
          .where(graft.operators.Similarity.cosine(
            col("a.v"), col("b.v")) > lit(0.35))
          .select(col("b.vec_id")).distinct().count()
        val pruneSec = (System.nanoTime() - t1) / 1e9
        Thread.sleep(800)
        val prd = metrics.read.getAndSet(0L) / 1e6
        metrics.write.getAndSet(0L)
        println(s"""{"query":"d64_kmeans","tier":"$tier",""" +
          s""""n_vectors":$nv,"train_k8_sec":${fmt(trainSec)},""" +
          s""""train_shuffle_read_mb":${fmt(trd)},""" +
          s""""prune_k":$kPrune,"prune_sec":${fmt(pruneSec)},""" +
          s""""n_pruned":$nPruned,""" +
          s""""prune_shuffle_read_mb":${fmt(prd)}}""")
      }
    }
    // Retrieval arm (round 9, d67/w30's index at tier): index BUILD is
    // the linear path (one explode+agg, one df window, one partitioned
    // write); SERVE cost must track the query terms' postings (Σ df),
    // not the corpus — the term-bucket partition filter keeps the scan
    // to the buckets the query hashes into. The demo queries use
    // common terms (worst case: df grows ~linearly with the corpus),
    // so serve time growing ~linearly in Σ df while build-side corpus
    // grows is the honest contract; a production engine caps this
    // with WAND/df-cut, noted in SCALE.md. d70's span stats ride
    // along as the corpus-linear explode control.
    if (what == "retrieval") {
      import graft.operators.{Retrieval, SpanDedup}
      val qterms = Seq("hash", "join", "window", "agg", "stream",
        "vector", "scan")
      val queriesDf = Seq(1L -> "hash", 1L -> "join", 2L -> "window",
        2L -> "agg", 2L -> "stream", 3L -> "vector", 3L -> "scan")
      for ((tier, dir) <- Seq(("1x", base), (s"${factor}x", synthDir))) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val nDocs = docs.count()
        val idx = java.nio.file.Files
          .createTempDirectory(s"graft-ridx-$tier").toString
        metrics.read.set(0L); metrics.write.set(0L)
        val t0 = System.nanoTime()
        val buildSec =
          try {
            Retrieval.writeIndex(docs, "doc_id", "text", idx, nBuckets = 16)
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $tier index build failed: ${e.getMessage}")
            -1.0
          }
        Thread.sleep(800)
        val brd = metrics.read.getAndSet(0L) / 1e6
        val bwr = metrics.write.getAndSet(0L) / 1e6
        import spark.implicits._
        val stats = Retrieval.readStats(spark, idx)
        val qdf = queriesDf.toDF("query_id", "term")
        var sliceRows = -1L
        val serves = (1 to 3).map { _ =>
          val t1 = System.nanoTime()
          try {
            val slice = Retrieval.readIndexSlice(spark, idx, qterms, 16)
            Retrieval.bm25TopKIndexed(slice, qdf, stats, k = 10)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t1) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $tier serve failed: ${e.getMessage}")
            -1.0
          }
        }
        sliceRows = Retrieval.readIndexSlice(spark, idx, qterms, 16).count()
        Thread.sleep(800)
        val srd = metrics.read.getAndSet(0L) / 1e6
        metrics.write.getAndSet(0L)
        // d70 control: corpus-linear explode + one gh shuffle
        val t2 = System.nanoTime()
        val spanSec =
          try {
            SpanDedup.repeatedSpanStats(
              SpanDedup.gramOccurrences(docs, "doc_id", "text", n = 10),
              n = 10).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t2) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $tier spans failed: ${e.getMessage}")
            -1.0
          }
        Thread.sleep(800)
        val xrd = metrics.read.getAndSet(0L) / 1e6
        metrics.write.getAndSet(0L)
        println(s"""{"tier":"$tier","query":"d67_retrieval_index",""" +
          s""""n_docs":$nDocs,"build_sec":${fmt(buildSec)},""" +
          s""""build_shuffle_read_mb":${fmt(brd)},""" +
          s""""build_write_mb":${fmt(bwr)},""" +
          s""""serve_samples":[${serves.map(fmt).mkString(",")}],""" +
          s""""serve_sec":${fmt(serves.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""slice_rows":$sliceRows,"serve_shuffle_read_mb":${fmt(srd)},""" +
          s""""d70_spans_sec":${fmt(spanSec)},""" +
          s""""d70_shuffle_read_mb":${fmt(xrd)}}""")
        graft.queries.Rm.rf(idx)
      }
    }
    // Append arm (d71's maintenance contract at tier): the nightly
    // index update's cost must track the WAVE, not the corpus. Build
    // the index from the synth corpus minus a fixed-size wave, then
    // time appendIndex of the wave. Across tiers the wave is CONSTANT
    // (5k docs): postings append is wave-sized file adds; the term
    // dictionary rewrite is vocabulary-sized (the synth corpus's
    // vocab is near-constant, so the merge cost should stay flat
    // while the corpus grows factor-fold). A full rebuild at the same
    // tier is the contrast arm.
    if (what == "append") {
      import graft.operators.Retrieval
      for ((tier, dir) <- Seq(("1x", base), (s"${factor}x", synthDir))) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val nDocs = docs.count()
        // constant 5k-doc wave where the corpus allows it (the flat-
        // append contract is judged across the BIG tiers; the 1x
        // corpus IS 5k docs, so its wave is half the corpus)
        val wave = math.min(5000L, nDocs / 2)
        val waveFrom = nDocs - wave
        val idx = java.nio.file.Files
          .createTempDirectory(s"graft-apx-$tier").toString
        Retrieval.writeIndex(docs.filter(col("doc_id") < waveFrom),
          "doc_id", "text", idx, nBuckets = 16)
        metrics.read.set(0L); metrics.write.set(0L)
        val t0 = System.nanoTime()
        val appendSec =
          try {
            Retrieval.appendIndex(docs.filter(col("doc_id") >= waveFrom),
              "doc_id", "text", idx, nBuckets = 16)
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $tier append failed: ${e.getMessage}")
            -1.0
          }
        Thread.sleep(800)
        val ard = metrics.read.getAndSet(0L) / 1e6
        val awr = metrics.write.getAndSet(0L) / 1e6
        val t1 = System.nanoTime()
        val rebuildSec =
          try {
            val idx2 = java.nio.file.Files
              .createTempDirectory(s"graft-apx2-$tier").toString
            Retrieval.writeIndex(docs, "doc_id", "text", idx2, nBuckets = 16)
            val s2 = (System.nanoTime() - t1) / 1e9
            graft.queries.Rm.rf(idx2); s2
          } catch { case e: Throwable => -1.0 }
        Thread.sleep(800)
        val rrd = metrics.read.getAndSet(0L) / 1e6
        metrics.write.getAndSet(0L)
        val nTerms = spark.read.parquet(s"${graft.operators.Retrieval.root(spark, idx)}/terms").count()
        println(s"""{"tier":"$tier","query":"d71_index_append",""" +
          s""""n_docs":$nDocs,"wave_docs":$wave,"n_terms":$nTerms,""" +
          s""""append_sec":${fmt(appendSec)},""" +
          s""""append_shuffle_read_mb":${fmt(ard)},""" +
          s""""append_write_mb":${fmt(awr)},""" +
          s""""rebuild_sec":${fmt(rebuildSec)},""" +
          s""""rebuild_shuffle_read_mb":${fmt(rrd)}}""")
        graft.queries.Rm.rf(idx)
      }
    }
    // Winnow arm (d72's selection + pairing at tier) over the PLANTED
    // corpus (the d61 synthesizer: mostly-unique docs, every 10th a
    // near-dup of its predecessor) — the linear regime a fingerprint
    // probe needs (the copy-synth corpus would make pair volume grow
    // factor² by construction). Fingerprinting is one window per doc;
    // pairing shuffles on the fingerprint with the df cap bounding
    // fan-out; output must track the planted-pair count (~n/10).
    if (what == "winnow") {
      import graft.operators.{SpanDedup, Winnow}
      for ((tier, n) <- Seq(("1x", 50000L), (s"${factor}x", 50000L * factor))) {
        val corpus = s"/tmp/graft_ssjoin_planted_$n"
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpus)))
          plantedDocs(spark, n).write.parquet(corpus)
        val docs = spark.read.parquet(corpus)
        var nPairs = -1L
        val samples = (1 to 2).map { _ =>
          Thread.sleep(800)
          metrics.read.set(0L); metrics.write.set(0L)
          val t0 = System.nanoTime()
          try {
            nPairs = Winnow.sharedFingerprintPairs(
              Winnow.fingerprints(
                SpanDedup.gramOccurrences(docs, "doc_id", "text", n = 5),
                w = 4),
              minShared = 2, maxFpDf = 64).count()
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $tier winnow failed: ${e.getMessage}")
            -1.0
          }
        }
        Thread.sleep(800)
        val rd = metrics.read.getAndSet(0L) / 1e6
        val wr = metrics.write.getAndSet(0L) / 1e6
        println(s"""{"tier":"$tier","query":"d72_winnow_planted",""" +
          s""""n_docs":$n,"n_pairs":$nPairs,""" +
          s""""samples":[${samples.map(fmt).mkString(",")}],""" +
          s""""sec":${fmt(samples.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
      }
    }
    // MaxScore arm (round 9, d74's pruning at tier): serve cost for
    // rare+common query mixes must track the RARE lists, not the
    // corpus. The synthesized corpus separates the regimes cleanly:
    // 10 of each doc's 30 tokens come from a 50-term common pool
    // (df ~ 0.18·n — stopword-class, grows linearly with the corpus)
    // and 20 from an (n/10)-term rare pool (df ~ 200, FLAT across
    // tiers). Every probe query pairs one rare term with one common
    // term — the mix MaxScore exists for. The exhaustive scorer's
    // aggregation input grows with Σ df ~ 0.18·n per query; MaxScore
    // classifies the common term non-essential (its ub falls below
    // the k-th best rare-list score), so its aggregation input stays
    // ~rare-df-sized — flat — and the output is verified IDENTICAL
    // (exceptAll both ways) at every tier. Both arms serve from the
    // same persisted tb-partitioned index.
    if (what == "maxscore") {
      import graft.operators.Retrieval
      import spark.implicits._
      for ((tier, n) <- Seq(("1x", 50000L), (s"${factor}x", 50000L * factor))) {
        val rarePool = n / 10
        val docs = zipfDocs(spark, n)
        val idx = java.nio.file.Files
          .createTempDirectory(s"graft-maxscore-$tier").toString
        Retrieval.writeIndex(docs, "doc_id", "text", idx, nBuckets = 64)
        val stats = Retrieval.readStats(spark, idx)
        // 500 queries per serve batch: enough that the scoring
        // aggregation (the corpus-coupled term) dominates the fixed
        // scan/planning overhead — the regime the 100 TB serve path
        // actually lives in (one plan amortizes planning over the
        // batch; per-query aggregation input is what scales).
        val nQ = 500
        val queryRows = (0 until nQ).flatMap { q =>
          Seq((q.toLong, s"r${(q * 37L) % rarePool}"),
              (q.toLong, s"c${q % 50}"))
        }
        val qdf = queryRows.toDF("query_id", "term")
        val qterms = queryRows.map(_._2).distinct
        // serve from a cached slice — w30's production serving shape
        // (the scan cost is identical for both arms and not what the
        // probe measures; the contrast is aggregation input)
        val cached =
          Retrieval.readIndexSlice(spark, idx, qterms, nBuckets = 64)
            .cache()
        cached.count()
        def slice() = cached
        def timeArm(run: () => Unit): (Seq[Double], Double, Double) = {
          val samples = (1 to 2).map { _ =>
            Thread.sleep(800)
            metrics.read.set(0L); metrics.write.set(0L)
            val t0 = System.nanoTime()
            try { run(); (System.nanoTime() - t0) / 1e9 }
            catch { case e: Throwable =>
              System.err.println(s"[scale] $tier maxscore failed: ${e.getMessage}")
              -1.0
            }
          }
          Thread.sleep(800)
          (samples, metrics.read.getAndSet(0L) / 1e6,
            metrics.write.getAndSet(0L) / 1e6)
        }
        val (exS, exRd, _) = timeArm(() =>
          Retrieval.bm25TopKIndexed(slice(), qdf, stats, k = 10)
            .write.format("noop").mode("overwrite").save())
        val (msS, msRd, _) = timeArm(() =>
          Retrieval.maxScoreFromSlice(slice(), qdf, stats, k = 10)
            .write.format("noop").mode("overwrite").save())
        // the production shape: dictionary-planned, bucket-pruned
        // reads per phase — measured from STORAGE, not the cache
        val (mxS, mxRd, _) = timeArm(() =>
          Retrieval.maxScoreIndexedTopK(spark, idx, qdf, k = 10,
              nBuckets = 64)
            .write.format("noop").mode("overwrite").save())
        val (rowsEx, rowsMs) = Retrieval.maxScoreRowCountsFromSlice(
          slice(), qdf, stats, k = 10)
        // lossless check at tier: set-identical output, all arms
        val a = Retrieval.bm25TopKIndexed(slice(), qdf, stats, k = 10)
        val b = Retrieval.maxScoreFromSlice(slice(), qdf, stats, k = 10)
        val c = Retrieval.maxScoreIndexedTopK(spark, idx, qdf, k = 10,
          nBuckets = 64)
        val nDiff = a.exceptAll(b).count() + b.exceptAll(a).count() +
          a.exceptAll(c).count() + c.exceptAll(a).count()
        println(s"""{"tier":"$tier","query":"d74_maxscore_planted",""" +
          s""""n_docs":$n,"n_queries":$nQ,""" +
          s""""rows_exhaustive":$rowsEx,"rows_maxscore":$rowsMs,""" +
          s""""n_diff":$nDiff,""" +
          s""""exhaustive_samples":[${exS.map(fmt).mkString(",")}],""" +
          s""""exhaustive_sec":${fmt(exS.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""exhaustive_shuffle_read_mb":${fmt(exRd)},""" +
          s""""maxscore_samples":[${msS.map(fmt).mkString(",")}],""" +
          s""""maxscore_sec":${fmt(msS.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""maxscore_shuffle_read_mb":${fmt(msRd)},""" +
          s""""indexed_samples":[${mxS.map(fmt).mkString(",")}],""" +
          s""""indexed_sec":${fmt(mxS.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""indexed_shuffle_read_mb":${fmt(mxRd)}}""")
        cached.unpersist()
        graft.queries.Rm.rf(idx)
      }
    }
    // pHash arm (round 9, m09's band join at tier): the banded Hamming
    // join's scale law. Hashing is per-partition map work; the join
    // shuffles 4 band rows per doc and meets pairs in (band_idx,
    // band_val) buckets. Planted structure holds GROUP SIZE constant
    // (20 members) while the group count grows with n — candidate and
    // output volume then grow linearly in n, and so must wall time.
    // Hashes are synthesized directly from the group id (the image
    // round-trip is per-partition map cost, measured by m09 itself);
    // a planted single-bit flip on every 7th member keeps the verify
    // stage honest (distance 1 pairs must survive).
    if (what == "phash") {
      import graft.operators.PHash
      for ((tier, n) <- Seq(("1x", 100000L), (s"${factor}x", 100000L * factor))) {
        val nGroups = n / 20
        val hashes = spark.range(n).select(
          col("id").as("doc_id"),
          shiftright(xxhash64(pmod(col("id"), lit(nGroups))), 33)
            .bitwiseAND(lit(0xffffffffL)).as("hi0"),
          xxhash64(pmod(col("id"), lit(nGroups)), lit(7))
            .bitwiseAND(lit(0xffffffffL)).as("lo0"))
          .select(col("doc_id"),
            when(col("doc_id") % 7 === 0,
              col("hi0").bitwiseXOR(lit(1L << 20))).otherwise(col("hi0"))
              .as("hi"),
            col("lo0").as("lo"))
        var nPairs = -1L
        val samples = (1 to 2).map { _ =>
          Thread.sleep(800)
          metrics.read.set(0L); metrics.write.set(0L)
          val t0 = System.nanoTime()
          try {
            nPairs = PHash.nearDupPairs(hashes, maxDist = 3).count()
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $tier phash failed: ${e.getMessage}")
            -1.0
          }
        }
        Thread.sleep(800)
        val rd = metrics.read.getAndSet(0L) / 1e6
        val wr = metrics.write.getAndSet(0L) / 1e6
        // distinct hashes = what actually enters the band join — the
        // saturation witness for the 16-bit band space
        val nDistinct = hashes.select("hi", "lo").distinct().count()
        println(s"""{"tier":"$tier","query":"m09_phash_bandjoin",""" +
          s""""n_docs":$n,"n_groups":$nGroups,""" +
          s""""n_distinct_hashes":$nDistinct,"n_pairs":$nPairs,""" +
          s""""samples":[${samples.map(fmt).mkString(",")}],""" +
          s""""sec":${fmt(samples.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
      }
    }
    for ((tier, dir) <- Seq(("1x", base), (s"${factor}x", synthDir));
         name <- probeNames) {
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try {
          queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[scale] $tier $name failed: ${e.getMessage}")
          -1.0
        }
      }
      // listener events drain asynchronously; the sleep bounds the error
      // to well under a MB at these volumes
      Thread.sleep(800)
      val rd = metrics.read.getAndSet(0L) / 1e6
      val wr = metrics.write.getAndSet(0L) / 1e6
      println(s"""{"tier":"$tier","query":"$name",""" +
        s""""samples":[${samples.map(fmt).mkString(",")}],""" +
        s""""sec":${fmt(samples.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
        s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
    }
    // s06's documented scale contract: raise `bits` with V to hold the
    // LSH bucket population constant (Similarity.nnDescentTopK doc).
    // Measure it — the Nx tier re-run with bits = 6 + ceil(log2 N)
    // should land near the 1x fixed-bits time, turning the contract
    // from argument into evidence.
    // d61 scale arm: full-corpus prefix-filter join on the planted-
    // duplicate corpus at 1x and Nx doc counts. The corpus is persisted
    // to parquet ONCE per tier and the join measured on the stored
    // table (VERDICT r07 #8: synthesis out of the timed window); the
    // candidate-volume evidence runs untimed after the measurement.
    // 50k docs at 1x.
    if (what == "all" || what == "flat" || what == "ssjoin") {
      for ((tier, n) <- Seq(("1x", 50000L), (s"${factor}x", 50000L * factor))) {
        // Deployment-shaped partition sizing ("size shuffle.partitions
        // so partitions fit in memory at the target SF"): the
        // harness's fixed 32 shuffle partitions put ~370 MB in each
        // sort at the 100× tier's ~12 GB token shuffle — deep into
        // spill (measured: 231 s → 103 s at 100×). Raising AQE's
        // INITIAL partition count lets big shuffles keep up to 256
        // partitions while AQE still coalesces small ones down — a
        // real cluster config's shape. Scaled with the tier (big tiers
        // only): the blanket setting cost the 50 k-doc tier ~4 s of
        // per-block overhead for nothing.
        if (n >= 500000L)
          spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            "256")
        else spark.conf.unset(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
        val corpus = s"/tmp/graft_ssjoin_planted_$n"
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpus)))
          plantedDocs(spark, n).write.parquet(corpus)
        val docs = spark.read.parquet(corpus)
        // best-of-2 like the cc/whale arms (this host's noisy-neighbor
        // spikes put +40% on single samples; both raw samples are
        // emitted so a swing stays attributable from the artifact)
        var nPairs = -1L
        // each sample start is LOAD-GATED (VERDICT r16 #7): wait
        // (bounded) for the host's external load wave to pass, then
        // record the release loadavg in the row — a tier wall record
        // is only a record from a quiet window, and a sample that
        // still started loud names its own poison in the artifact
        val startLoads = scala.collection.mutable.ArrayBuffer[Double]()
        val prepSecs = scala.collection.mutable.ArrayBuffer[Double]()
        val samples = (1 to 2).map { _ =>
          // free each sample's localCheckpoint blocks before the next
          // one starts: at the 100x tier the retained sorted-array +
          // candidate blocks from sample 1 OOM'd an 8g driver under
          // load-stretched GC (observed r16) — the blocks are
          // per-sample garbage by construction. DELTA-scoped (the
          // BpeTrain ckptTracked discipline), NOT a blanket
          // getPersistentRDDs sweep: a blanket sweep would also kill
          // memoized checkpointed frames other arms still serve
          // (their lineage is truncated — unpersist makes them
          // unrecomputable, not just cold).
          val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
          try {
            // STAGE the tokenize+checkpoint pass BEFORE the quiet
            // gate (VERDICT r17 #6): the r17 gated trail showed this
            // host's quiet windows (2-5 min) are shorter than
            // setup + sample, so the timed region is trimmed to the
            // quadratic-risk stages (prefix candidates + suffix
            // verify) a deployment actually gates — the linear
            // tokenize pass is a staged, separately-reported cost
            // (prep_sec), exactly like the corpus synthesis above.
            val p0 = System.nanoTime()
            val sorted = graft.operators.SSJoin
              .sortedTokenArrays(docs, "doc_id", "text")
            prepSecs += (System.nanoTime() - p0) / 1e9
            startLoads += waitQuiet()
            Thread.sleep(800)
            metrics.read.set(0L); metrics.write.set(0L)
            val t0 = System.nanoTime()
            nPairs = graft.operators.SSJoin
              .joinSorted(sorted, t = 0.9).count()
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $tier ssjoin failed: ${e.getMessage}")
            -1.0
          } finally {
            releaseNewBlocks(spark, before)
          }
        }
        Thread.sleep(800)
        val rd = metrics.read.getAndSet(0L) / 1e6
        val wr = metrics.write.getAndSet(0L) / 1e6
        val evidence =
          try ssjoinEvidence(spark, docs, t = 0.9)
          catch { case e: Throwable =>
            System.err.println(s"[scale] $tier ssjoin evidence failed: " +
              e.getMessage)
            """"n_candidates":-1"""
          }
        metrics.read.set(0L); metrics.write.set(0L)
        println(s"""{"tier":"$tier","query":"d61_ssjoin_planted",""" +
          s""""n_docs":$n,""" +
          s""""samples":[${samples.map(fmt).mkString(",")}],""" +
          s""""prep_sec":[${prepSecs.map(fmt).mkString(",")}],""" +
          s""""start_loadavg":[${startLoads.map(fmt).mkString(",")}],""" +
          s""""sec":${fmt(samples.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""timed_region":"candidates+suffix_verify (tokenize staged)",""" +
          s""""n_pairs":$nPairs,$evidence,""" +
          s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
      }
      spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    }
    // Suffix-filter evidence on the CLIQUE-HEAVY corpus (the sf
    // documents table at t=0.9 — 5k docs, ~965k true pairs, the
    // regime where candidates run 3.4× over true and the planted
    // corpus's exact positional filter has nothing left to prune):
    // the PPJoin+ partition bound must land strictly between the
    // true-pair count and the positional candidate count here, or it
    // is a no-op exactly where it was added to help (VERDICT r15 #8).
    if (what == "ssjoinreal") {
      import graft.operators.SSJoin
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val t = 0.9
      for (depth <- Seq(1, 2, 3, 4)) {
        // each depth pins ~4 checkpoint generations (evidence sorted +
        // cands, SSJoin.join's internal pair) — release them before
        // the next depth (the same retained-block class the planted
        // arm's fix covers)
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        val sorted = SSJoin.sortedTokenArrays(docs, "doc_id", "text")
        val cands = SSJoin.candidates(SSJoin.prefixRows(sorted, t), t)
          .localCheckpoint()
        val nPos = cands.count()
        val t0 = System.nanoTime()
        val nSuffix = SSJoin.suffixFiltered(sorted, cands, t, depth).count()
        val filterSec = (System.nanoTime() - t0) / 1e9
        val nTrue = SSJoin.join(docs, "doc_id", "text", t, depth).count()
        println(s"""{"query":"d61_ssjoin_clique_suffix","depth":$depth,""" +
          s""""n_candidates_pos":$nPos,"n_candidates_suffix":$nSuffix,""" +
          s""""n_true":$nTrue,"filter_sec":${fmt(filterSec)}}""")
        releaseNewBlocks(spark, before)
      }
    }
    // d61 shuffle decomposition (round 20, verdict r19 #4: the bench
    // arm's 59.5 MB shuffle is 10x any other row and was defended as
    // output-bound but never ATTRIBUTED per stage). Runs the exact
    // bench body over the REAL base corpus in three cuts —
    // (A) sortedTokenArrays (tokenize + df attach + per-doc sort,
    // materialized by construction), (B) candidate generation incl.
    // the pair `distinct`, (C) suffix filter + exact verify — and
    // records each cut's wall and shuffle read+write bytes from the
    // task-metrics listener.
    if (what == "ssjoindecomp") {
      import graft.operators.SSJoin
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val t = 0.9
      def cut[A](f: => A): (A, Double, Double) = {
        Thread.sleep(400)
        metrics.read.set(0); metrics.write.set(0)
        val t0 = System.nanoTime()
        val a = f
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400)
        (a, sec, (metrics.read.get + metrics.write.get) / 1e6)
      }
      // untimed warm-up of the whole body (JIT + codegen)
      SSJoin.join(docs, "doc_id", "text", t).count()
      for (round <- 1 to 2) {
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        val (sorted, secA, mbA) =
          cut(SSJoin.sortedTokenArrays(docs, "doc_id", "text"))
        val ((cands, nCand), secB, mbB) = cut {
          val c = SSJoin.candidates(SSJoin.prefixRows(sorted, t), t)
            .localCheckpoint()
          (c, c.count())
        }
        val (nTrue, secC, mbC) = cut {
          SSJoin.suffixFiltered(sorted, cands, t, 3)
            .select(col("a"), col("b"),
              org.apache.spark.sql.GraftBridge.column(
                graft.functions.SortedOverlapCount(
                  org.apache.spark.sql.GraftBridge.expression(col("arra")),
                  org.apache.spark.sql.GraftBridge.expression(col("arrb"))))
                .as("ov"), col("sza"), col("szb"))
            .withColumn("jaccard", col("ov").cast("double") /
              (col("sza") + col("szb") - col("ov")).cast("double"))
            .filter(col("jaccard") >= t).count()
        }
        println(s"""{"query":"d61_decomp","round":$round,""" +
          s""""n_candidates":$nCand,"n_true":$nTrue,""" +
          s""""tokenize_sec":${fmt(secA)},"tokenize_mb":${fmt(mbA)},""" +
          s""""candidates_sec":${fmt(secB)},"candidates_mb":${fmt(mbB)},""" +
          s""""verify_sec":${fmt(secC)},"verify_mb":${fmt(mbC)}}""")
        releaseNewBlocks(spark, before)
      }
    }
    if (what == "all" || what == "chain" || what == "flat") {
      val extraBits = 32 - Integer.numberOfLeadingZeros(factor - 1)
      val bitsN = 6 + extraBits
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try {
          graft.operators.Similarity.nnDescentTopK(
            spark.read.parquet(s"$synthDir/embeddings.parquet"),
            "vec_id", "embedding", k = 5, bits = bitsN, probeMax = 20L)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[scale] s06 bits=$bitsN failed: ${e.getMessage}")
          -1.0
        }
      }
      Thread.sleep(800)
      val rd = metrics.read.getAndSet(0L) / 1e6
      val wr = metrics.write.getAndSet(0L) / 1e6
      println(s"""{"tier":"${factor}x","query":"s06_nndescent_topk_bits$bitsN",""" +
        s""""samples":[${samples.map(fmt).mkString(",")}],""" +
        s""""sec":${fmt(samples.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
        s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
    }
    // Graph probe: d52's catalog query runs on a correctness-sized
    // 150-doc slice; the SCALE evidence runs the inverted-index edge
    // derivation + 3 PageRank rounds over EVERY document at both tiers.
    // The df<=64 cap engages at the synthesized tier (near-dup copies
    // multiply gram document frequency ~factor-fold), which is the
    // guard's job — candidate work stays O(Σ min(df,64)²) while the
    // corpus grows.
    if (what == "all" || what == "graph") {
      val probes: Seq[(String, String => Unit)] = Seq(
        ("d52_pagerank_fullcorpus", { dir: String =>
          graft.operators.Graph.pageRank(
            graft.operators.Graph.symmetrize(
              graft.operators.Graph.sharedGramEdges(
                spark.read.parquet(s"$dir/documents.parquet"),
                "doc_id", "text")), iters = 3)
            .write.format("noop").mode("overwrite").save()
        }),
        ("d53_triangles_fullcorpus", { dir: String =>
          graft.operators.Graph.clustering(
            graft.operators.Graph.sharedGramEdges(
              spark.read.parquet(s"$dir/documents.parquet"),
              "doc_id", "text"))
            .write.format("noop").mode("overwrite").save()
        }))
      for ((tier, dir) <- Seq(("1x", base), (s"${factor}x", synthDir));
           (name, run) <- probes) {
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          try { run(dir); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[scale] $tier $name failed: ${e.getMessage}")
            -1.0
          }
        }
        Thread.sleep(800)
        val rd = metrics.read.getAndSet(0L) / 1e6
        val wr = metrics.write.getAndSet(0L) / 1e6
        println(s"""{"tier":"$tier","query":"$name",""" +
          s""""samples":[${samples.map(fmt).mkString(",")}],""" +
          s""""sec":${fmt(samples.filter(_ >= 0).minOption.getOrElse(-1.0))},""" +
          s""""shuffle_read_mb":${fmt(rd)},"shuffle_write_mb":${fmt(wr)}}""")
      }
    }
    spark.stop()
  }
}
