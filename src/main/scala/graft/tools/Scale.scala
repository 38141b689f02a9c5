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

  private final class ShuffleMetrics extends SparkListener {
    val read = new AtomicLong
    val write = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
  }

  private def maxId(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

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

    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$synthDir/documents.parquet"))) {
      System.err.println(s"[scale] synthesizing ${factor}x corpus -> $synthDir")
      synthesize(spark, base, factor, synthDir)
    } else System.err.println(s"[scale] reusing existing $synthDir")
    // events were added to the synth set after the graph probes ran —
    // top up an existing synth dir that predates them.
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$synthDir/events.parquet"))) {
      System.err.println(s"[scale] synthesizing ${factor}x events -> $synthDir")
      synthesizeEvents(spark, base, factor, synthDir)
    }
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$synthDir/part.parquet")))
      synthesizePart(spark, base, synthDir)

    val metrics = new ShuffleMetrics
    spark.sparkContext.addSparkListener(metrics)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val queries = SparkEntry.queries
    val probeNames = what match {
      case "graph" => Seq.empty[String]
      case "chain" => chain
      case "behavior" => behavior
      case _ => chain ++ behavior
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
    if (what == "all" || what == "chain") {
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
