package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ExplodeShingles

/** Benchmark-contamination detection — the standard n-gram-overlap
  * check every serious training corpus runs before a model ships
  * (flag training documents sharing word n-grams with an evaluation
  * set, à la the GPT-3/Llama decontamination appendices).
  *
  * Scale shape: the benchmark side is DISTINCT n-grams of the eval
  * suite — thousands of documents at most, so the set broadcasts; the
  * corpus side streams through the codegen'd [[ExplodeShingles]]
  * generator (rows ≈ tokens, no per-doc arrays) into a broadcast left
  * join + one hash aggregation per doc. Nothing in the plan grows
  * with corpus size except the embarrassingly-parallel scan. If the
  * benchmark set ever outgrows broadcast, drop `broadcast()` and the
  * same plan becomes a shuffle join; [[bloomFlag]] is the
  * constant-memory probabilistic variant.
  */
object Contamination {

  /** Distinct word n-grams of the benchmark set. */
  def shingleSet(bench: DataFrame, textCol: String, n: Int = 5): DataFrame =
    bench.select(ExplodeShingles(col(textCol), n).as("shingle")).distinct()

  /** Per-document overlap stats against `benchShingles` (output of
    * [[shingleSet]]): keyCols + n_shingles (total n-gram occurrences)
    * + n_hits (occurrences that appear in the benchmark set). Docs
    * with fewer than n tokens produce no row. */
  def stats(corpus: DataFrame, keyCols: Seq[String], textCol: String,
            benchShingles: DataFrame, n: Int = 5): DataFrame =
    corpus
      .select(keyCols.map(col) :+ ExplodeShingles(col(textCol), n).as("shingle"): _*)
      .join(broadcast(benchShingles.withColumn("_hit", lit(1))),
        Seq("shingle"), "left")
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_hits"))

  /** Probabilistic scale path: flag contaminated docs with a Bloom
    * filter built over the benchmark n-grams (`fpp` false-positive
    * rate, zero false negatives — safe direction for decontamination:
    * you only ever over-drop). Constant executor memory regardless of
    * benchmark size.
    *
    * Both sides ride Spark's codegen'd runtime-filter expressions
    * instead of a Scala UDF (ADVICE r13: a deserialized-row UDF
    * boundary on the corpus-side scan is measurable at 100 TB):
    * the filter is built by `BloomFilterAggregate` over
    * `xxhash64(shingle)` and probed by `BloomFilterMightContain` on
    * the same hash — the exact expression pair Catalyst's
    * InjectRuntimeFilter plants, stages in whole-stage codegen, and
    * ships as an ordinary binary literal (no broadcast pinned to the
    * SparkContext). Neither expression has a public SQL/DataFrame
    * name in Spark 4.1 (`might_contain` is unregistered), hence the
    * GraftBridge wrapping.
    *
    * Sizing cap (ADVICE r14): `BloomFilterAggregate` silently CLAMPS
    * its arguments to `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems` (default 4,000,000) and `.maxNumBits` (default
    * 67,108,864) — unlike `df.stat.bloomFilter`, which sizes exactly.
    * A clamped filter still has zero false negatives (the safe
    * direction) but its realized false-positive rate silently exceeds
    * the requested `fpp`, degrading without bound as the benchmark
    * grows. This method therefore REQUIRES the requested size to fit
    * under both session caps and fails loudly otherwise — for
    * benchmarks past ~4M n-grams (or very small fpp), raise the two
    * confs before calling. */
  def bloomFlag(corpus: DataFrame, idCol: String, textCol: String,
                bench: DataFrame, benchTextCol: String,
                n: Int = 5, expectedItems: Long = 1000000L,
                fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val conf = corpus.sparkSession.conf
    val maxItems = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
    val maxBits = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloomFlag: expectedItems=$expectedItems/numBits=$numBits exceed " +
        s"the session caps (maxNumItems=$maxItems, maxNumBits=$maxBits) " +
        "— BloomFilterAggregate would silently clamp the filter and " +
        "loosen the realized fpp; raise spark.sql.optimizer.runtime." +
        "bloomFilter.{maxNumItems,maxNumBits} for this benchmark size")
    val bfAgg = GraftBridge.column(
      new BloomFilterAggregate(
        GraftBridge.expression(xxhash64(col("shingle"))),
        GraftBridge.expression(lit(expectedItems)),
        GraftBridge.expression(lit(numBits)))
        .toAggregateExpression())
    // one bounded driver value: the serialized filter (numBits/8 B)
    val bfBin = shingleSet(bench, benchTextCol, n)
      .agg(bfAgg.as("bf")).head().getAs[Array[Byte]](0)
    val hit =
      if (bfBin == null) lit(false)   // empty benchmark: nothing leaks
      else GraftBridge.column(BloomFilterMightContain(
        GraftBridge.expression(lit(bfBin)),
        GraftBridge.expression(xxhash64(col("shingle")))))
    val flagged = corpus
      .select(col(idCol), ExplodeShingles(col(textCol), n).as("shingle"))
      .groupBy(col(idCol))
      .agg(max(when(hit, 1).otherwise(0)).as("_c"))
    // Docs shorter than n tokens emit no shingles and would vanish from
    // the grouped result; left-join back to the id set so every corpus
    // doc gets a verdict (short doc => contaminated = false). distinct:
    // keep the one-row-per-id contract even if idCol is not unique.
    corpus.select(col(idCol)).distinct()
      .join(flagged, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_c") === 1, lit(false)).as("contaminated"))
  }

  /** NEAR-duplicate decontamination — the Dolma/FineWeb discipline
    * layered on the exact n-gram check above: a training doc that is
    * a light paraphrase/crop of an eval doc shares no exact 5-gram
    * run yet still leaks the benchmark. Candidates come from a
    * MinHash band-bucket EQUI-join ACROSS the two relations (the d07
    * self-join family, two-sided): both sides band with
    * [[Dedup.minhashBands]]'s integer signatures, the benchmark side
    * broadcasts (eval suites are tiny next to a corpus), and only
    * band-collided (corpus, bench) pairs pay the exact
    * distinct-token Jaccard verify. Returns one row per flagged
    * corpus doc: `(doc_id, n_bench_hits, max_jaccard)` over verified
    * pairs with jaccard >= `minJaccard`. Never corpus × bench; the
    * corpus side is one scan + one band shuffle-free broadcast join
    * + one doc-keyed aggregation. Recall is the banded-LSH curve
    * (≥ 1 of 4 single-row bands collides: 1-(1-j)^4 — 0.9999 at
    * j = 0.9); the oracle replays the banding, so the gate checks
    * the implementation, not the probability. */
  def nearDupFlags(corpus: DataFrame, corpusId: String, textCol: String,
                   bench: DataFrame, benchId: String, benchTextCol: String,
                   minJaccard: Double): DataFrame = {
    val cband = Dedup.minhashBands(corpus, corpusId, textCol)
      .filter(col("sig").isNotNull)
    val bband = Dedup.minhashBands(bench, benchId, benchTextCol)
      .filter(col("sig").isNotNull)
      .withColumnRenamed(benchId, "_bench_id")
    val cand = cband
      .join(broadcast(bband), Seq("j", "sig"))
      .select(col(corpusId), col("_bench_id"))
      .distinct()
    val ctok = corpus.select(col(corpusId),
      array_distinct(split(col(textCol), " ")).as("_cs"))
    val btok = bench.select(col(benchId).as("_bench_id"),
      array_distinct(split(col(benchTextCol), " ")).as("_bs"))
    cand
      .join(ctok, corpusId)
      .join(broadcast(btok), "_bench_id")
      .select(col(corpusId),
        Dedup.jaccard(col("_cs"), col("_bs")).as("_j"))
      .filter(col("_j") >= minJaccard)
      .groupBy(corpusId)
      .agg(count(lit(1)).cast("long").as("n_bench_hits"),
        max(col("_j")).as("max_jaccard"))
  }
}
