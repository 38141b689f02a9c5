package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Executed-plan shape assertions (VERDICT r12 #6) — the PLANS.md
  * scale claims that were prose become specs: d121's one-scan /
  * one-exchange Gram, d105's corpus-independent gather shuffle, s20's
  * zero-parquet-scan serve, d123's broadcast-only join spine. A claim
  * asserted here fails the build the day a refactor regresses the
  * plan, which a results-only oracle can never catch. */
class PlanShapeSpec extends AnyFunSuite {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def count(plan: String, needle: String): Int =
    plan.sliding(needle.length).count(_ == needle)

  /** Shuffle exchanges only — "Exchange hashpartitioning/range…",
    * NOT BroadcastExchange. */
  private def shuffles(plan: String): Int =
    count(plan, "- Exchange")

  test("d121 claim: gramQ is ONE FileScan and ONE shuffle exchange " +
      "(the d(d+1)/2-bounded partial-agg output) at any corpus size") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-planspec").toString
    try {
      spark.range(200).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(7)), j =>
            ((pmod(xxhash64(col("id"), j), lit(2001)) - lit(1000))
              .cast("double") / 1000.0).cast("float")).as("embedding"))
        .write.parquet(s"$tmp/emb")
      val plan = planOf(
        LinAlg.gramQ(spark.read.parquet(s"$tmp/emb"), "embedding"))
      assert(count(plan, "Scan parquet") == 1, plan)
      assert(shuffles(plan) == 1, plan)
      assert(count(plan, "BroadcastExchange") == 0, plan)
    } finally graft.queries.Rm.rf(tmp)
  }

  test("d105 claim: on a doc-clustered corpus the MaxSim gather " +
      "shuffle is corpus-independent — both aggregation levels run " +
      "map-side, only the query-token distinct and the bounded " +
      "per-query window exchange") {
    def run(n: Long): (String, Long) = {
      // spark.range is range-partitioned on id = doc_id, the layout
      // an ingest-sorted or doc_id-bucketed corpus keeps; the
      // localCheckpoint preserves the partitioning report
      val docs = spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 12).map(j =>
            concat(lit("w"), pmod(xxhash64(col("id"), lit(j)),
              lit(300)))): _*).as("text"))
        .localCheckpoint()
      val q = Seq((1L, Seq("w3", "w17")), (2L, Seq("w42", "w7")))
        .toDF("query_id", "terms")
      val topk = LateInteraction
        .maxSimTopK(docs, "doc_id", "text", q, dim = 4, k = 5)
      val rec = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            rec.addAndGet(m.shuffleReadMetrics.recordsRead); ()
          }
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        topk.write.format("noop").mode("overwrite").save()
        Thread.sleep(400) // listener events drain asynchronously
      } finally spark.sparkContext.removeSparkListener(l)
      (planOf(topk), rec.get())
    }
    val (plan, recSmall) = run(500L)
    // exactly 1 shuffle exchange: the per-query top-k window
    // (WindowGroupLimit-bounded). Round 20 — the inner max computes
    // each distinct query term's dot INLINE as an aggregate
    // expression over the token stream (query vectors are
    // driver-computed literals, the fan-back pairs a LocalTableScan
    // broadcast), so no pair relation and no query-side distinct
    // exchange exists at all; NONE between the stacked
    // HashAggregates either
    assert(shuffles(plan) == 1, plan)
    // the four spine aggregates are the ones keyed by doc_id (the
    // query-token distinct prints its own aggs in the broadcast
    // subtree below the join — not the spine)
    val spine = plan.linesIterator.toSeq
    val aggIdx = spine.zipWithIndex
      .filter { case (l, _) =>
        l.contains("HashAggregate") && l.contains("doc_id")
      }.map(_._2)
    assert(aggIdx.size == 4, plan)
    assert(!spine.slice(aggIdx.min, aggIdx.max)
      .exists(_.contains("- Exchange")), plan)
    // and the records crossing the wire do NOT scale with the corpus
    val (_, recBig) = run(4000L)
    assert(recBig <= recSmall * 3 / 2,
      s"gather shuffle grew with the corpus: $recSmall -> $recBig")
  }

  test("s20 claim: the PCA-pruned serve's final plan reads ONLY the " +
      "materialized projection table — zero parquet scans") {
    val df = graft.SparkEntry
      .queries("s20_pca_prefilter_topk")(spark, "/root/testdata/sf0.001")
    assert(count(planOf(df), "Scan parquet") == 0, planOf(df))
  }

  test("d139 claim: the PLAID rerank semi-join broadcasts BEFORE the " +
      "vector hashing — the corpus scan below the LeftSemi carries no " +
      "token explode, and no join in the plan shuffles") {
    val df = graft.SparkEntry
      .queries("d139_maxsim_plaid")(spark, "/root/testdata/sf0.001")
    val plan = planOf(df)
    assert(count(plan, "SortMergeJoin") == 0, plan)
    assert(count(plan, "ShuffledHashJoin") == 0, plan)
    val lines = plan.linesIterator.toSeq
    val semiIdx = lines.indexWhere(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    assert(semiIdx >= 0, plan)
    // the streamed subtree of the semi-join: the lines between the
    // join node and its build-side BroadcastExchange sibling — must
    // be the bare corpus scan (no Generate = no token explode, which
    // is where the md5 vector projection hangs), proving only
    // NOMINATED docs pay the rerank's feature hashing
    val buildIdx = lines.indexWhere(
      _.contains("BroadcastExchange"), semiIdx + 1)
    assert(buildIdx > semiIdx, plan)
    val streamed = lines.slice(semiIdx + 1, buildIdx)
    assert(streamed.exists(_.contains("Scan parquet")), plan)
    assert(!streamed.exists(_.contains("Generate")), plan)
  }

  test("d141 claim: serving PLAID from the doc_id-bucketed token map " +
      "keeps BOTH gather aggregations exchange-free — every shuffle " +
      "in the plan is query-sized, none partitions on doc_id") {
    spark.sql("DROP TABLE IF EXISTS planspec_tokmap")
    val docs = spark.range(300).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)),
          lit(120)))): _*).as("text"))
    try {
      LateInteraction.docTokenMap(docs, "doc_id", "text", dim = 4)
        .write.bucketBy(4, "doc_id").format("parquet")
        .mode("overwrite").saveAsTable("planspec_tokmap")
      val q = Seq((1L, Seq("w3", "w17")), (2L, Seq("w42", "w7")))
        .toDF("query_id", "terms")
      val topk = LateInteraction.maxSimTopKPlaidFromMap(
        spark.table("planspec_tokmap"), q, dim = 4, k = 5,
        bits = 4, c = 20)
      val plan = planOf(topk)
      val exchanges = plan.linesIterator
        .filter(_.contains("- Exchange")).toSeq
      assert(exchanges.nonEmpty, plan)
      assert(!exchanges.exists(_.contains("doc_id")),
        s"a shuffle partitions on doc_id — a gather aggregation " +
          s"lost the bucketed clustering:\n$plan")
      // both stages scan the bucketed table; no other source
      assert(count(plan, "Scan parquet") == 2, plan)
      // and the result is the same top-k the unbucketed path produces
      val expected = LateInteraction.maxSimTopKPlaid(
        docs, "doc_id", "text", q, dim = 4, k = 5, bits = 4, c = 20)
      assert(topk.orderBy("query_id", "rk").collect().toSeq ==
        expected.orderBy("query_id", "rk").collect().toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS planspec_tokmap")
  }

  test("plaid_serve claim: CACHING the bucketed token map preserves " +
      "its hash partitioning — the per-batch gathers stay " +
      "exchange-free off the InMemoryRelation (unlike localCheckpoint)") {
    spark.sql("DROP TABLE IF EXISTS planspec_cachemap")
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 8).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)),
          lit(90)))): _*).as("text"))
    try {
      LateInteraction.docTokenMap(docs, "doc_id", "text", dim = 4)
        .write.bucketBy(4, "doc_id").format("parquet")
        .mode("overwrite").saveAsTable("planspec_cachemap")
      val cached = spark.table("planspec_cachemap").cache()
      cached.count()
      try {
        val q = Seq((1L, Seq("w3", "w7"))).toDF("query_id", "terms")
        val topk = LateInteraction.maxSimTopKPlaidFromMap(
          cached, q, dim = 4, k = 5, bits = 4, c = 20)
        val plan = planOf(topk)
        // both stages read the cache (the InMemoryRelation node still
        // PRINTS its cached FileScan child, so don't count those)
        assert(count(plan, "InMemoryTableScan") == 2, plan)
        val exchanges = plan.linesIterator
          .filter(_.contains("- Exchange")).toSeq
        assert(exchanges.nonEmpty, plan)
        assert(!exchanges.exists(_.contains("doc_id")),
          s"caching dropped the bucketed clustering:\n$plan")
      } finally cached.unpersist()
    } finally spark.sql("DROP TABLE IF EXISTS planspec_cachemap")
  }

  test("d123 claim: the hard-negative verify joins are broadcast-only " +
      "— 3 BroadcastExchanges, no shuffle join, no corpus rescan") {
    val df = graft.SparkEntry
      .queries("d123_hard_negative_mining")(spark, "/root/testdata/sf0.001")
    val plan = planOf(df)
    assert(count(plan, "BroadcastExchange") == 3, plan)
    assert(count(plan, "SortMergeJoin") == 0, plan)
    assert(count(plan, "ShuffledHashJoin") == 0, plan)
    assert(count(plan, "Scan parquet") == 0, plan)
  }

  test("d61 claim: the verify stage's filter ladder executes in cost " +
      "order — the suffix partition bound prunes BELOW the exact " +
      "merge projection, and the semi-filtered array table rides " +
      "BROADCAST joins in the final adaptive plan (never reshuffling " +
      "an array per candidate pair)") {
    // near-dup-bearing corpus so the verify stage has real pairs
    val rnd = new scala.util.Random(3)
    val vocab = (0 until 50).map(i => s"w$i")
    val base = (0L until 40L).map { i =>
      (i, rnd.shuffle(vocab).take(9 + rnd.nextInt(6)).mkString(" "))
    }
    val docs = (base ++ base.take(10).map { case (i, txt) =>
      (i + 500L, txt + s" x$i")
    }).toDF("doc_id", "text")
    val df = SSJoin.join(docs, "doc_id", "text", t = 0.8)
    // collect() executes THIS dataset's QueryExecution, so the
    // AdaptiveSparkPlan below prints the FINAL runtime plan (count()
    // or a noop write would plan a separate query execution)
    assert(df.collect().length >= 10)
    val plan = planOf(df)
    assert(plan.contains("isFinalPlan=true"), plan)
    // Catalyst pushes the suffix-bound predicate (and the jaccard
    // test) INTO the second verify join's condition — pruned pairs
    // never materialize a joined row at all. Assert both kernels are
    // in the plan and that the suffix bound sits in a join condition
    // at or below the merge projection (tree prints top-down).
    val iMerge = plan.indexOf("sorted_overlap_count")
    val iBound = plan.indexOf("suffix_bound")
    assert(iMerge >= 0 && iBound >= 0, plan)
    assert(iMerge <= iBound, plan)
    // the verify attaches arrays via broadcast of the semi-filtered
    // table on both sides; no sort-merge join anywhere in the final
    // plan (the shuffles that remain are the agg/distinct exchanges)
    assert(count(plan, "BroadcastHashJoin") >= 2, plan)
    assert(count(plan, "SortMergeJoin") == 0, plan)
  }

  test("d143 claim: on its exact fixture (the FULL documents table " +
      "at t=0.9) the suffix stage PRUNES — positional candidates > " +
      "suffix survivors >= true pairs (VERDICT r16 #6: the oracled " +
      "regime where the PPJoin+ filter actually works, not just " +
      "holds)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val t = 0.9
    val sorted = SSJoin.sortedTokenArrays(docs, "doc_id", "text")
    val cands = SSJoin.candidates(SSJoin.prefixRows(sorted, t), t)
      .localCheckpoint()
    val nPos = cands.count()
    val nSuffix = SSJoin.suffixFiltered(sorted, cands, t).count()
    val nTrue = SSJoin.join(docs, "doc_id", "text", t).count()
    assert(nSuffix < nPos,
      s"suffix filter was a no-op on the d143 fixture: $nSuffix of $nPos")
    assert(nSuffix >= nTrue && nTrue > 0,
      s"suffix filter unsound or fixture empty: $nSuffix vs $nTrue")
  }
}
