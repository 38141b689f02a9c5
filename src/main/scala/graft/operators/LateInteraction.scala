package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-vector "late interaction" retrieval (ColBERT, Khattab &
  * Zaharia, SIGIR'20): a document is a BAG of per-token vectors, a
  * query likewise, and the score is
  * `MaxSim(q, d) = Σ_{t∈q} max_{u∈d} (v_t · v_u)` — every query token
  * finds its best-matching document token and the per-token maxima
  * add. Ranking quality sits between single-vector cosine (s01) and
  * full cross-attention, at corpus-scan cost.
  *
  * Spark-first shape, exact path ([[maxSimTopK]]): token vectors are
  * DERIVED (deterministic hash features, [[tokenVec]] — the repo has
  * no learned token encoder, and the operator is agnostic to where
  * the vectors come from), so the corpus side never materializes a
  * `Array[Array[Float]]` column — one explode streams (doc, token)
  * pairs, each computes its vector ONCE below a broadcast
  * nested-loop join against the tiny query-token set, and ONE hash
  * aggregation takes `max` per (doc, query-token) — the MaxSim inner
  * max — with map-side partial aggregation collapsing repeated
  * tokens before anything shuffles. Shuffled rows are
  * `|docs| × |query tokens|`, never corpus-token-sized. A second agg
  * sums the maxima per (query, doc) and a bounded window takes
  * top-k (WindowGroupLimit keeps it map-side limited).
  *
  * Scale path ([[maxSimTopKPruned]]): PLAID's (Santhanam et al.,
  * CIKM'22) centroid-pruning idea with the repo's deterministic
  * sign-bucket family (Similarity.signBucketInt's hyperplanes)
  * standing in for learned centroids: each token vector buckets on
  * the signs of its first `bits` components, a query token probes
  * its own bucket plus all Hamming-1 neighbors (the s05 multiprobe
  * discipline), and only bucket-matched (query-token, doc-token)
  * pairs are scored. The candidate phase is a broadcast EQUI-join on
  * the bucket key — `(bits+1)·|query tokens|` probe rows against one
  * streamed corpus pass — so the scored pairs collapse from
  * `corpus-tokens × |query tokens|` to the bucket-collision fraction
  * (~`(bits+1)/2^bits` per probe). Approximate: a query token whose
  * true best match flips ≥ 2 probed sign bits scores against its
  * best CANDIDATE instead (or contributes 0 if nothing collides) —
  * the d105 oracle replays the pruning exactly, and the `maxsim`
  * Scale arm measures the candidate-count cut and the recall\@k
  * overlap vs the exact path.
  *
  * Reference scope note: the reference bundle (CreateHQL.scala) has
  * no retrieval; this extends the mandated ANN/similarity surface
  * (s01/s05's vector family, d67's ranked-serving output contract).
  */
object LateInteraction {

  /** Deterministic pseudo token embedding, dim components in
    * [-0.5, 0.5): component j is `hash60("j_" + term) % 1000 / 1000
    * - 0.5` on [[Dedup.hash60]]'s engine-portable 60-bit md5 prefix
    * — the SQL oracles replay it verbatim as
    * `(('0x' || substr(md5(j || '_' || t), 1, 15))::BIGINT % 1000)
    * / 1000.0 - 0.5`. NATIVE codegen'd expression since round 20
    * ([[graft.functions.TokenVec]] — the DotProduct/MinHashSigs
    * treatment): the HOF form ([[tokenVecHof]], kept as the spec
    * reference) is CodegenFallback and paid dim interpreted md5 →
    * hex-string → conv walks per doc token on every MaxSim scoring
    * path. Bit-identity is spec-gated. */
  def tokenVec(term: Column, dim: Int): Column =
    graft.functions.TokenVec(term, dim)

  /** The pre-round-20 HOF form of [[tokenVec]] — retained ONLY as the
    * bit-identity reference for the native expression's spec (the
    * DotProduct discipline: the declarative form IS the documented
    * semantics the DuckDB oracles replay). */
  private[graft] def tokenVecHof(term: Column, dim: Int): Column =
    transform(sequence(lit(1), lit(dim)), j =>
      (Dedup.hash60(concat(j.cast("string"), lit("_"), term)) % 1000L)
        .cast("double") / lit(1000.0) - 0.5)

  /** Sign-bit bucket of a DOUBLE vector's first `bits` components
    * (the [[Similarity.signBucketInt]] hyperplane family; that one
    * compares floats). */
  def vecSignBucket(v: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(v, i + 1) > 0.0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Query-token table with vectors: `queries` is
    * `(query_id, terms ARRAY<STRING>)`; duplicates within a query
    * collapse (identical tokens contribute identical maxima — ColBERT
    * scores distinct token columns, and dedup here keeps the
    * broadcast side minimal). */
  private def queryTokens(queries: DataFrame, dim: Int): DataFrame =
    queries
      .select(col("query_id"), explode(col("terms")).as("qterm"))
      .distinct()
      .withColumn("qv", tokenVec(col("qterm"), dim))

  /** Corpus (doc, token, vector) stream — ONE explode with PER-ROW
    * duplicate collapse (`array_distinct` inside the row — no
    * shuffle): identical tokens share a vector, so instances add
    * nothing to the inner max, and collapsing them BEFORE the vector
    * projection cuts both the md5 feature hashing and the
    * × |query tokens| dot fan-out by the within-doc repetition
    * factor (measured: d105 5.7 → 2.6 s, d106 3.5 → 1.8 s at sf0.1). */
  private def docTokens(docs: DataFrame, idCol: String,
                        textCol: String, dim: Int): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(split(col(textCol), " "))).as("term"))
      .filter(length(col("term")) > 0)
      .withColumn("dv", tokenVec(col("term"), dim))

  /** Per-token dot, rounded to 9 decimals at the pair (the
    * cross-engine convention: maxima compare rounded values, sums
    * fold DECIMAL(28,9)). */
  private def pairDot: Column =
    round(Similarity.dot(col("qv"), col("dv")), 9)

  /** max-per-(query-token, doc) → Σ-per-(query, doc) → top-k, shared
    * by the exact and pruned paths (they differ only in which
    * (query-token, doc-token) pairs reach the first agg). */
  private def gather(pairs: DataFrame, k: Int): DataFrame = {
    val byScore = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    pairs
      .groupBy("doc_id", "query_id", "qterm")
      .agg(max(col("d")).as("mx"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("mx").cast("decimal(28,9)")).cast("double"), 6)
        .as("score"))
      .withColumn("rk", row_number().over(byScore).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "doc_id", "score")
  }

  /** The exact path's scored-pair relation (every (doc token, query
    * token) pair) — exposed for the `maxsim` Scale arm to count. */
  private[graft] def exactPairs(docs: DataFrame, idCol: String,
      textCol: String, queries: DataFrame, dim: Int): DataFrame =
    docTokens(docs, idCol, textCol, dim)
      .crossJoin(broadcast(queryTokens(queries, dim)))
      .select(col("doc_id"), col("query_id"), col("qterm"),
        pairDot.as("d"))

  /** The pruned path's scored-pair relation (bucket-collided pairs
    * only). `hamming` is the multiprobe radius: a query token probes
    * every bucket within that Hamming distance of its own —
    * `Σ_{r≤hamming} C(bits, r)` probe rows per token, still a tiny
    * broadcast side (37 rows/token at bits=8, r=2). */
  private[graft] def prunedPairs(docs: DataFrame, idCol: String,
      textCol: String, queries: DataFrame, dim: Int,
      bits: Int, hamming: Int = 1): DataFrame =
    prunedPairsFromMap(docTokens(docs, idCol, textCol, dim), queries,
      dim, bits, hamming)

  /** ONE definition of the multiprobe collision set (factored in r16
    * — it was duplicated between the per-query and shared-term
    * paths, which must agree on what "collides" means): each row of
    * `withQv` (any frame carrying a `qv` vector) probes its own sign
    * bucket plus every bucket within the Hamming radius, as an
    * exploded `bkt` column. */
  /** The stage-1 collision relation — the bucketed token map joined
    * against the broadcast multiprobe set of `terms` (which must
    * carry `qterm` and `qv`). ONE definition shared by
    * [[maxSimTopKPlaidFromMap]]'s nomination pass and the scale
    * gates' [[nominationPairCount]] work proxy, so the proxy counts
    * exactly the pairs the serve scores (r17 review: a drifted copy
    * would certify work the serve no longer does). */
  private def termCollisions(tokMap: DataFrame, terms: DataFrame,
                             bits: Int, hamming: Int): DataFrame =
    tokMap
      .withColumn("bkt", vecSignBucket(col("dv"), bits))
      .join(broadcast(multiprobe(terms, bits, hamming)), Seq("bkt"))

  private def multiprobe(withQv: DataFrame, bits: Int,
                         hamming: Int): DataFrame = {
    val masks = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= hamming)
    withQv
      .withColumn("qb", vecSignBucket(col("qv"), bits))
      .withColumn("bkt", explode(array(
        masks.map(m => col("qb").bitwiseXOR(lit(m))): _*)))
  }

  /** [[prunedPairs]] over a prebuilt `(doc_id, term, dv)` token map —
    * the serve-from-index form (vectors and buckets are per-token
    * projections of the map, no corpus re-hash). */
  private def prunedPairsFromMap(tokMap: DataFrame, queries: DataFrame,
      dim: Int, bits: Int, hamming: Int): DataFrame = {
    val probes = multiprobe(queryTokens(queries, dim), bits, hamming)
    tokMap
      .withColumn("bkt", vecSignBucket(col("dv"), bits))
      .join(broadcast(probes), Seq("bkt"))
      .select(col("doc_id"), col("query_id"), col("qterm"),
        pairDot.as("d"))
  }

  /** Exact MaxSim top-k. Output `(query_id, rk, doc_id, score)` —
    * the d67 ranked-serving contract. Round 20: routes through the
    * shared-maxima gather ([[maxSimTopKFromMap]]'s shape, which was
    * already spec-gated bit-identical): the inner max is computed
    * per (doc, DISTINCT query term) and fanned back to queries, so
    * a term shared by several queries is dotted against the corpus
    * once instead of once per query — the d141 term-sharing
    * discipline applied to the batch exact path. The batch-vs-brute
    * spec and the d105 oracle gate the rewrite; [[exactPairs]] (the
    * per-(query, token) pair relation) remains the Scale arm's work
    * proxy for the unshared shape. */
  def maxSimTopK(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, dim: Int, k: Int): DataFrame =
    maxSimTopKFromMap(docTokens(docs, idCol, textCol, dim),
      queries, dim, k)

  /** The cacheable STATIC side of a streamed MaxSim serve (the w25/
    * w30 discipline): per-(doc, distinct token) vectors, computed
    * once before the stream starts — `(doc_id, term, dv)`. Exactly
    * the exact path's stream side ([[docTokens]]), exposed for
    * pre-stream materialization. */
  def docTokenMap(docs: DataFrame, idCol: String, textCol: String,
                  dim: Int): DataFrame =
    docTokens(docs, idCol, textCol, dim)

  /** MaxSim top-k against a prebuilt [[docTokenMap]] — the per-batch
    * serve body. Bit-identical to [[maxSimTopK]] over the same docs
    * (spec-gated). Round 16: shares the per-(term, doc) inner maxima
    * across queries exactly as [[maxSimTopKPlaidFromMap]] does.
    *
    * Round 20 — the inner max no longer materializes the
    * (doc token × query term) pair RELATION at all: the query-term
    * set is a bounded collect (the w25/w30 discipline — every caller
    * passes a per-batch query frame), each term's vector is computed
    * ON THE DRIVER by the same [[graft.functions.TokenVec]] kernel
    * the column form runs (spec-gated bit-identical), and the
    * per-(doc, term) maxima come from ONE aggregation over the token
    * map whose aggregate expressions each compute their term's
    * rounded dot inline — `max(round(vec_dot(dv, <qv literal>), 9))`
    * per term. The old shape pushed |doc tokens| × |terms| joined
    * ROWS through a BroadcastNestedLoopJoin into a hash aggregate;
    * this one streams |doc tokens| rows once and never copies a
    * pair. Same dots, same rounding, same max — the maxima table is
    * value-identical, and the fan-back/gather tail is unchanged. */
  def maxSimTopKFromMap(tokMap: DataFrame, queries: DataFrame,
                        dim: Int, k: Int): DataFrame = {
    val spark = tokMap.sparkSession
    val qpairsDf = queries
      .select(col("query_id"), explode(col("terms")).as("qterm"))
      .distinct()
    val qpRows = qpairsDf.collect()
    val qpairs = spark.createDataFrame(
      java.util.Arrays.asList(qpRows: _*), qpairsDf.schema)
    val qtIdx = qpairsDf.schema.fieldIndex("qterm")
    val qts = qpRows.map(_.getString(qtIdx)).distinct.sorted
    val mx =
      if (qts.isEmpty)
        // no query terms: the old cross join produced an empty maxima
        // relation; keep the same (empty) shape
        tokMap.select(col("doc_id"), lit("").as("qterm"),
          lit(0.0).as("mx")).limit(0)
      else {
        val maxCols = qts.zipWithIndex.map { case (t, j) =>
          val qv = typedlit(graft.functions.TokenVec.compute(
            org.apache.spark.unsafe.types.UTF8String.fromString(t), dim)
            .toDoubleArray().toSeq)
          max(round(Similarity.dot(col("dv"), qv), 9)).as(s"_mx$j")
        }
        tokMap.groupBy(col("doc_id"))
          .agg(maxCols.head, maxCols.tail: _*)
          .select(col("doc_id"), explode(array(
            qts.zipWithIndex.map { case (t, j) =>
              struct(lit(t).as("qterm"), col(s"_mx$j").as("mx"))
            }: _*)).as("e"))
          .select(col("doc_id"), col("e.qterm").as("qterm"),
            col("e.mx").as("mx"))
      }
    gatherFromTermMaxima(mx, qpairs, Seq("qterm"), k)
  }

  /** Sign-bucket-pruned MaxSim top-k: each query token probes its
    * bucket + all Hamming-1 neighbors; only collided pairs score. */
  def maxSimTopKPruned(docs: DataFrame, idCol: String, textCol: String,
                       queries: DataFrame, dim: Int, k: Int,
                       bits: Int = 6): DataFrame =
    gather(prunedPairs(docs, idCol, textCol, queries, dim, bits), k)

  /** PLAID-complete two-stage serve (VERDICT r12 #3 — the s09
    * shortlist→rerank discipline applied to late interaction): the
    * sign-bucket pruned pass only NOMINATES the top-`c` docs per
    * query (scoring TRUE dots on the collided pairs — a pure
    * centroid-score stage 1 was measured and rejected: recall\@10
    * collapsed to 0.51 on the uniform hash-feature vectors, where
    * PLAID's learned centroids assume clustered embeddings), then
    * the EXACT MaxSim scorer re-scores the nominated docs alone and
    * takes the final top-`k`. Recall lost to pruning comes back as
    * long as the true top-k docs survive nomination — PLAID
    * (Santhanam et al., CIKM'22) recovers recall with exactly this
    * final exact re-score of candidates.
    *
    * Plan shape: the nomination list is bounded at `c·|queries|`
    * rows, so BOTH rerank joins broadcast — the corpus streams once
    * more through [[docTokens]], keeps only nominated docs' tokens
    * (a broadcast semi-join BEFORE the vector hashing), and the
    * rerank gather aggregates `≤ c·|queries|·|qterms|` rows. Only
    * the nomination pass pays corpus-sized work, at the bucket
    * collision fraction of the exact path's dot products. */
  def maxSimTopKPlaid(docs: DataFrame, idCol: String, textCol: String,
                      queries: DataFrame, dim: Int, k: Int,
                      bits: Int = 6, c: Int = 100,
                      hamming: Int = 1): DataFrame = {
    val nominated =
      gather(
        prunedPairs(docs, idCol, textCol, queries, dim, bits, hamming),
        c)
        .select("query_id", "doc_id")
    // The rerank restricts the CORPUS before the token explode and
    // vector hashing — only nominated docs pay the md5 feature
    // projection on this pass (a broadcast semi-join; the nomination
    // list is c·|queries| rows).
    val restricted = docs.join(
      broadcast(nominated.select(col("doc_id").as("_nom_id")).distinct()),
      docs(idCol).cast("long") === col("_nom_id"), "left_semi")
    gather(
      docTokens(restricted, idCol, textCol, dim)
        .join(broadcast(nominated), Seq("doc_id"))
        .join(broadcast(queryTokens(queries, dim)), Seq("query_id"))
        .select(col("doc_id"), col("query_id"), col("qterm"),
          pairDot.as("d")),
      k)
  }

  /** Σ-of-maxima → top-k from PER-TERM maxima `mx(doc_id, qterm)` —
    * the shared-gather tail (see [[maxSimTopKPlaidFromMap]]): `fan`
    * carries the (query_id, …, qterm) tuples that re-expand the
    * term-level maxima to query-level scores (joined on `keys`).
    * Identical arithmetic to [[gather]]'s tail: the inner max is a
    * function of (doc, term) only — every query sharing a term reads
    * the SAME max — and the DECIMAL(28,9) sum is order-free, so
    * summing joined-back maxima is bit-identical to summing
    * per-(query, term) maxima. */
  private def gatherFromTermMaxima(mx: DataFrame, fan: DataFrame,
                                   keys: Seq[String], k: Int): DataFrame = {
    val byScore = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    mx.join(broadcast(fan), keys)
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("mx").cast("decimal(28,9)")).cast("double"), 6)
        .as("score"))
      .withColumn("rk", row_number().over(byScore).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "doc_id", "score")
  }

  /** [[maxSimTopKPlaid]] over a prebuilt [[docTokenMap]] — the
    * production serve shape (PLAID assigns centroids at INDEX time;
    * here both the token vectors and their sign buckets are
    * projections of the stored map, so a query batch pays only the
    * bucket-set join against the broadcast score table and the
    * candidate-sized exact rerank — never a corpus re-hash). Store
    * the map BUCKETED by doc_id (`bucketBy(n, "doc_id")`): the
    * doc-clustered scan keeps every gather aggregation exchange-free,
    * same as the exact path. Bit-identical to [[maxSimTopKPlaid]]
    * over the same docs (spec-gated).
    *
    * Round 16 (VERDICT r15 #2 — the plaid_serve ceiling): both stages
    * now compute their expensive inner maxima per DISTINCT TERM, not
    * per (query, term). `max_{u∈d}(v_t · v_u)` depends only on the
    * term and the document — the candidate set (stage 1: t's probed
    * buckets; stage 2: all of d's tokens) is query-independent — so a
    * batch where many queries share common tokens (every real query
    * log; w30's distinct-query discipline applied at TERM granularity)
    * pays the bucket join, the dot products, and the first aggregation
    * ONCE per (term, doc) and fans the maxima back out with a
    * broadcast join. Stage 2 re-expands through the nomination list
    * (`needs` = nominated (query, doc) × the query's terms) so only
    * nominated pairs are scored — exactly the pairs the unshared form
    * scored. Exchange profile is unchanged (every aggregation keys on
    * a doc_id superset, so the bucketed scan's clustering carries
    * through both stages; only the per-query windows shuffle). */
  def maxSimTopKPlaidFromMap(tokMap: DataFrame, queries: DataFrame,
                             dim: Int, k: Int, bits: Int = 6,
                             c: Int = 100, hamming: Int = 1): DataFrame = {
    val qpairs = queries
      .select(col("query_id"), explode(col("terms")).as("qterm"))
      .distinct()
    val terms = qpairs.select("qterm").distinct()
      .withColumn("qv", tokenVec(col("qterm"), dim))
    // stage 1: per-(term, doc) maxima over bucket-collided pairs
    // (collision is query-independent), fanned back to (query, doc)
    // sums — the same (query, doc, term) triples the per-query join
    // produced, since a query-doc pair scores iff SOME query term
    // collides, which sharing preserves.
    val mx1 = termCollisions(tokMap, terms, bits, hamming)
      .select(col("doc_id"), col("qterm"), pairDot.as("d"))
      .groupBy("doc_id", "qterm")
      .agg(max(col("d")).as("mx"))
    val nominated = gatherFromTermMaxima(mx1, qpairs, Seq("qterm"), c)
      .select("query_id", "doc_id")
    // stage 2: exact rerank of nominated docs — maxima per distinct
    // (doc, term) actually needed, re-expanded through the nomination
    // list so no un-nominated (query, doc) pair leaks in via a shared
    // term.
    // Distinct (doc, term) pairs PACKED with the query ids that need
    // them, so the nomination subtree is referenced exactly once (a
    // second reference would re-plan — and re-scan — stage 1; the
    // d141 two-scans claim is plan-asserted) and the fan-back is an
    // explode of the rider list instead of a join. The two groupings
    // shuffle on qterm alone — a plain .distinct() would be the one
    // exchange in the serve mentioning doc_id (query-sized, but the
    // exchange-free-gather claim is asserted literally); the second
    // grouping's (qterm, doc_id) keys are a superset of the first
    // shuffle's qterm clustering, so it runs exchange-free.
    val needLists = nominated.join(qpairs, Seq("query_id"))
      .groupBy("qterm")
      .agg(collect_set(struct(col("doc_id"), col("query_id"))).as("_qd"))
      .select(col("qterm"), explode(col("_qd")).as("_p"))
      .select(col("qterm"), col("_p.doc_id").as("doc_id"),
        col("_p.query_id").as("query_id"))
      .groupBy("qterm", "doc_id")
      .agg(collect_set(col("query_id")).as("qids"))
      .withColumn("qv", tokenVec(col("qterm"), dim))
    // stage-2 maxima per distinct (doc, term); every row of a
    // (doc, term) group carries the SAME rider list, so first() is
    // deterministic in value.
    val byScore = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    tokMap
      .join(broadcast(needLists), Seq("doc_id"))
      .select(col("doc_id"), col("qterm"), col("qids"), pairDot.as("d"))
      .groupBy("doc_id", "qterm")
      .agg(max(col("d")).as("mx"), first(col("qids")).as("qids"))
      .select(explode(col("qids")).as("query_id"), col("doc_id"),
        col("mx"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("mx").cast("decimal(28,9)")).cast("double"), 6)
        .as("score"))
      .withColumn("rk", row_number().over(byScore).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "doc_id", "score")
  }

  /** [[maxSimTopKPlaidFromMap]] under a per-PLAN query cap (VERDICT
    * r16 #4 — the plaid_serve giant-batch regime): when a backlogged
    * trigger hands the serve thousands of queries in ONE batch, the
    * term-sharing economics flatten on the rare-term slot (every
    * query contributes a near-unique rare term, so the probe
    * broadcast and the stage-2 rider lists grow with the batch while
    * sharing only collapses the common-term slots) and per-batch
    * latency grows superlinearly — r16 measured a single 16.6 s
    * ~1.9k-query batch at rate 100. The cap is admission control at
    * PLAN granularity (maxOffsetsPerTrigger-style, applied where the
    * rate source offers no offset knob): queries hash-partition into
    * `ceil(n/maxQueriesPerPlan)` chunks (expected chunk size ≤ cap;
    * hashing avoids a global row_number shuffle) and each chunk runs
    * the full two-stage serve independently — batch composition
    * cannot change any query's answer (nomination windows partition
    * by query_id), so the union is bit-identical to the uncapped
    * serve. Costs one count() per batch to size the chunking; under
    * the cap it delegates straight through. */
  def maxSimTopKPlaidFromMapCapped(tokMap: DataFrame,
      queries: DataFrame, dim: Int, k: Int, bits: Int = 6,
      c: Int = 100, hamming: Int = 1,
      maxQueriesPerPlan: Int = 512,
      chunkParallelism: Int = 1): DataFrame = {
    // Checkpoint FIRST, then count the checkpointed frame (r17
    // review): counting the raw frame and checkpointing it after
    // executed the caller's upstream lineage twice — precisely on
    // the giant backlogged batches the cap exists for (e.g. a
    // foreachBatch groupBy ran twice on a ~27k-query batch).
    // Deterministic release (r18 review): a long-running serve with
    // frequent small batches used to accumulate each batch's pinned
    // query blocks until the ContextCleaner's next GC-driven pass;
    // now the serve materializes its (k·|batch|-row) RESULT, then
    // unpersists the query frame's blocks explicitly before
    // returning. The only GC-timed residue left per batch is the
    // tiny result checkpoint. The released RDD is taken from the
    // checkpointed frame's OWN LogicalRDD (not a getPersistentRDDs
    // delta — concurrent streams could pin blocks inside a delta
    // window; the plan handle is race-free by construction). A
    // non-LogicalRDD analyzed plan (a future Spark reshaping) just
    // skips the release and falls back to the old cleaner-timed
    // behavior.
    val q2 = queries.localCheckpoint()
    val qRdd = q2.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }
    val n = q2.count()
    // Per-chunk checkpoint handles (pipelined mode) — released after
    // the final result materializes, same discipline as qRdd.
    var chunkRdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    def chunk(i: Int, nChunks: Int): DataFrame =
      maxSimTopKPlaidFromMap(
        tokMap,
        q2.filter(
          pmod(xxhash64(col("query_id")), lit(nChunks)) === i),
        dim, k, bits, c, hamming)
    val served =
      if (n <= maxQueriesPerPlan)
        maxSimTopKPlaidFromMap(tokMap, q2, dim, k, bits, c, hamming)
      else {
        val nChunks =
          ((n + maxQueriesPerPlan - 1) / maxQueriesPerPlan).toInt
        if (chunkParallelism <= 1)
          (0 until nChunks).map(chunk(_, nChunks))
            .reduce(_.unionByName(_))
        else {
          // PIPELINED chunk submission (r18 verdict #4): the lazy
          // union serializes on the driver — each branch's broadcast
          // builds, window sorts and AQE stage materializations run
          // one after another, the measured ~4 s/chunk orchestration
          // floor. Here each chunk materializes EAGERLY
          // (localCheckpoint) on its own driver thread from a
          // bounded pool, so the per-chunk small jobs overlap on the
          // executor pool; the final union reads the pinned results.
          // Chunk composition is hash-determined, each chunk's serve
          // is the full two-stage plan, and the union of checkpointed
          // results is row-identical to the sequential shape — the
          // pool changes job OVERLAP, never content (spec-gated).
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(chunkParallelism, nChunks))
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutorService(pool)
          try {
            val futs = (0 until nChunks).map { i =>
              scala.concurrent.Future(chunk(i, nChunks).localCheckpoint())
            }
            val parts = scala.concurrent.Await.result(
              scala.concurrent.Future.sequence(futs),
              scala.concurrent.duration.Duration.Inf)
            chunkRdds = parts.flatMap(_.queryExecution.analyzed match {
              case lr: org.apache.spark.sql.execution.LogicalRDD =>
                Some(lr.rdd)
              case _ => None
            })
            parts.reduce(_.unionByName(_))
          } finally pool.shutdown()
        }
      }
    val out = served.localCheckpoint()
    qRdd.foreach(_.unpersist(blocking = false))
    chunkRdds.foreach(_.unpersist(blocking = false))
    out
  }

  /** Default serve-arm crossover, in TOKEN-MAP ROWS (VERDICT r16 #1).
    * Derived from the round-16 maxsim scale arm's measured walls on
    * the 50-query batch (SCALE_r16.jsonl): exact-from-map ≈
    * 1.6 + 2.53·f sec, plaid ≈ 5.7 + 0.75·f sec over tiers f of 20k
    * docs (exact pays one shared crossJoin that scales with the
    * corpus; plaid pays two-stage orchestration that amortizes over
    * it), crossing at f ≈ 2.3 ≈ 46k docs ≈ 2.0M map rows at that
    * corpus's ~45 distinct terms/doc. Rows, not docs: the map's row
    * count is the actual work driver of the exact arm's crossJoin
    * and is readable from the relation itself at plan time. The r17
    * SCALE maxsim_auto rows validate the pick at 1× and 30×. */
  val DefaultServeCrossoverRows: Long = 2000000L

  /** The token map's row count as a PLAN-TIME stat: the Catalyst
    * estimate when the relation carries an exact one (CBO-analyzed
    * table), else one count() job — metadata-cheap on a parquet map
    * and paid once per serve-site build, never per query batch (the
    * d141/d145 sites memoize the table).
    *
    * Stale-ANALYZE caveat (r17 review): catalog stats are a snapshot
    * from ANALYZE time, so a table mutated since carries a stale
    * rowCount here. Stale-LOW (appends since ANALYZE) holds the
    * switch on the exact arm past the real crossover — a latency
    * miss only, the exact arm is lossless. Stale-HIGH (deletes or an
    * overwrite-smaller since ANALYZE) is worse: it can flip the
    * serve to the PLAID arm below the real crossover, which is
    * RESULT-visible (plaid serves at its documented ~0.978 recall
    * where exact was both faster and exact). A caller that mutates
    * its token map must re-ANALYZE after the mutation — or drop the
    * table's stats entirely, which routes this method to the always-
    * fresh count(). The d141/d145 memo sites write-once and never
    * mutate, so their stats cannot go stale. */
  private def tokMapRows(tokMap: DataFrame): Long =
    tokMap.queryExecution.optimizedPlan.stats.rowCount
      .map(_.toLong)
      .getOrElse(tokMap.count())

  /** Plan-time serve-arm switch over a prebuilt [[docTokenMap]] — the
    * measured PLAID/exact crossover wired into code (VERDICT r16 #1,
    * the d75/maxScore plan-time-switch discipline): below
    * `crossoverRows` the whole corpus is cheaper to score EXACTLY
    * (one shared crossJoin; per-term maxima shared across the batch)
    * than to run plaid's two-stage nominate→rerank orchestration, so
    * a small-corpus caller gets the exact serve — and with it exact
    * results; above it, plaid's corpus-scaling advantage dominates
    * (30×: 28.2 vs 77.4 s measured) and the switch takes the
    * nominate→rerank path at plaid's documented recall (≥ 0.95
    * gated, 0.978 measured). Unlike the MaxScore switch this one is
    * visible in results by design — the exact arm IS the better
    * answer where it is also the faster one, so the switch only ever
    * trades up. Returns the chosen tag ("exact" | "plaid") so specs
    * and serve sites can assert the regime. */
  def maxSimServeFromMapPlan(tokMap: DataFrame, queries: DataFrame,
                             dim: Int, k: Int, bits: Int = 6,
                             c: Int = 100, hamming: Int = 1,
                             crossoverRows: Long =
                               DefaultServeCrossoverRows)
      : (String, DataFrame) =
    if (tokMapRows(tokMap) <= crossoverRows)
      ("exact", maxSimTopKFromMap(tokMap, queries, dim, k))
    else
      ("plaid",
        maxSimTopKPlaidFromMap(tokMap, queries, dim, k, bits, c,
          hamming))

  /** Stage-1 scored-pair count of [[maxSimTopKPlaidFromMap]] at the
    * given probe config — the KERNEL-INDEPENDENT work proxy the scale
    * gates compare against exact-from-map's |tokMap|·|distinct terms|
    * (VERDICT r16 #5: wall ratios moved with every kernel landing;
    * the collided-pair count only moves with the pruning geometry).
    * Counts over [[termCollisions]] — the SAME relation stage 1
    * scores — so the proxy cannot drift from the serve's geometry. */
  private[graft] def nominationPairCount(tokMap: DataFrame,
      queries: DataFrame, dim: Int, bits: Int,
      hamming: Int): Long = {
    val terms = queries
      .select(explode(col("terms")).as("qterm")).distinct()
      .withColumn("qv", tokenVec(col("qterm"), dim))
    termCollisions(tokMap, terms, bits, hamming).count()
  }

  /** MaxSim over ARBITRARY multi-vector relations — the form a real
    * per-token (or per-chunk) embedding table feeds, decoupled from
    * [[tokenVec]]'s hash features: `docVecs` is
    * `(doc_id, dv ARRAY<DOUBLE>)` (one row per document vector),
    * `queryVecs` is `(query_id, qidx, qv ARRAY<DOUBLE>)` (qidx
    * distinguishes the query's vectors — the "token column" slot).
    * Same plan as the text path: broadcast query vectors under a
    * nested-loop join, inner max as one hash agg with map-side
    * partials, Σ-of-maxima, bounded top-k window. */
  def maxSimTopKVectors(docVecs: DataFrame, queryVecs: DataFrame,
                        k: Int): DataFrame =
    gather(
      docVecs.select(col("doc_id"), col("dv"))
        .crossJoin(broadcast(queryVecs
          .select(col("query_id"), col("qidx").as("qterm"),
            col("qv"))))
        .select(col("doc_id"), col("query_id"), col("qterm"),
          pairDot.as("d")),
      k)
}
