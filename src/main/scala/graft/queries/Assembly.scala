package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{LinAlg, Packing, Staged}
import graft.queries.Tables.t

/** Training-sequence assembly + embedding linear algebra — the last
  * mile between a curated corpus and the dataloader/projector
  * (operators in [[graft.operators.Packing]] and
  * [[graft.operators.LinAlg]]). */
object Assembly {

  /** Whitespace token lengths of `documents` — the d112 convention,
    * shared verbatim by every packing oracle. */
  private val TokCte = """WITH tok AS (
    |  SELECT doc_id,
    |    CAST(len(list_filter(string_split(text, ' '),
    |      w -> len(w) > 0)) AS BIGINT) AS len
    |  FROM documents)""".stripMargin

  /** The concat-and-chunk rollup over any prior CTE chain ending in
    * `tok(doc_id, <lenCol>)` — the exact SQL mirror of
    * `Packing.spansToSequences`: window prefix sum (DuckDB is
    * single-node — there the window IS the right plan), span
    * arithmetic, per-sequence aggregate. */
  private def packRollupSql(budget: Int, lenCol: String): String = s""",
    |c AS (SELECT doc_id, $lenCol AS len,
    |    CAST(SUM($lenCol) OVER (ORDER BY doc_id) AS BIGINT) AS e
    |  FROM tok WHERE $lenCol > 0),
    |ex AS (SELECT e - len AS s, e,
    |    unnest(generate_series((e - len) // $budget,
    |      (e - 1) // $budget)) AS seq
    |  FROM c)
    |SELECT CAST(seq AS BIGINT) AS seq,
    |  CAST(COUNT(*) AS BIGINT) AS n_docs,
    |  CAST(SUM(LEAST(e, (seq + 1) * $budget) -
    |           GREATEST(s, seq * $budget)) AS BIGINT) AS n_tokens,
    |  CAST(SUM(CASE WHEN e > (seq + 1) * $budget THEN 1 ELSE 0 END)
    |    AS BIGINT) AS n_continued
    |FROM ex GROUP BY seq ORDER BY seq""".stripMargin

  /** d119's concat-and-chunk rollup at budget 128 — shared VERBATIM
    * by d119 (batch) and w39 (streamed with a persisted carry): the
    * streamed assembly must reproduce the batch packing exactly
    * under any micro-batch split of an ordered ingest. */
  private val SeqPackOracleSql = TokCte + packRollupSql(128, "len")

  /** Quantized embeddings CTE — shared by the d121/d122 oracles;
    * floor(x·10⁶) of a FLOAT is the same BIGINT in every engine. */
  private val QuantCte = """WITH q AS (
    |  SELECT vec_id,
    |    list_transform(embedding,
    |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
    |  FROM embeddings),
    |idx AS (SELECT unnest(generate_series(0, 63)) AS i)""".stripMargin

  /** d121's upper-triangle quantized Gram — shared VERBATIM by d121
    * (batch) and w42 (streamed additive store): integer sums are
    * batching- and order-invariant, so the maintained store must
    * equal the one-pass Gram exactly. */
  private val GramOracleSql = s"""$QuantCte
    |SELECT a.i AS i, b.i AS j,
    |  CAST(SUM(qv[a.i + 1] * qv[b.i + 1]) AS BIGINT) AS g_q
    |FROM q, idx a, idx b WHERE a.i <= b.i
    |GROUP BY a.i, b.i ORDER BY i, j""".stripMargin

  /** The d122 oracle: quantized Gram → trunc-div rescale → 8 UNROLLED
    * power-iteration rounds (exact integer mat-vec + IEEE
    * max-normalize + floor-requantize, each engine-identical) →
    * exact integer projection → top-10 by |proj|. */
  private[queries] val PcaChainSql = {
    val base = s"""$QuantCte,
      |g AS (SELECT a.i AS i, b.i AS j,
      |    CAST(SUM(qv[a.i + 1] * qv[b.i + 1]) AS BIGINT) // 1000000
      |      AS gs
      |  FROM q, idx a, idx b GROUP BY a.i, b.i),
      |v0 AS (SELECT i, CAST(1000000 AS BIGINT) AS v FROM idx)""".stripMargin
    val its = (1 to 8).map { k =>
      s""",
      |w$k AS (SELECT g.i AS i, CAST(SUM(g.gs * v.v) AS BIGINT) AS w
      |  FROM g JOIN v${k - 1} v ON g.j = v.i GROUP BY g.i),
      |m$k AS (SELECT MAX(ABS(w)) AS m FROM w$k),
      |v$k AS (SELECT i, CAST(floor(CAST(w AS DOUBLE) /
      |    CAST(m AS DOUBLE) * 1000000) AS BIGINT) AS v
      |  FROM w$k, m$k)""".stripMargin
    }.mkString
    base + its + s""",
      |pr AS (SELECT vec_id,
      |    CAST(SUM(qv[v.i + 1] * v.v) AS BIGINT) AS proj_q
      |  FROM q, v8 v GROUP BY vec_id)""".stripMargin
  }

  private val PcaOracleSql = PcaChainSql + s"""
    |SELECT vec_id, proj_q FROM pr
    |ORDER BY ABS(proj_q) DESC, vec_id LIMIT 10""".stripMargin

  /** d125's Efraimidis–Spirakis top-20 — shared VERBATIM by d125
    * (batch) and w41 (streamed reservoir merge): top-k of a union is
    * the top-k of per-batch top-k's, and the keys are content-hash
    * deterministic, so the streamed store must equal the batch draw
    * exactly. */
  private val EsSampleOracleSql = s"""WITH k AS (SELECT doc_id,
    |    CAST(n_chars AS BIGINT) AS w,
    |    round(ln(CAST((('0x' || substr(md5(text), 1, 15))::BIGINT
    |        % ${graft.operators.Dedup.HashP} + 1) AS DOUBLE) /
    |        ${graft.operators.Dedup.HashP + 1}.0) /
    |      CAST(n_chars AS DOUBLE), 9) AS es_key
    |  FROM documents WHERE n_chars > 0)
    |SELECT doc_id, w, es_key FROM k
    |ORDER BY es_key DESC, doc_id LIMIT 20""".stripMargin

  /** The d126 PSI report — shared VERBATIM by d126 (batch) and w40
    * (streamed with a persisted counts store): bucket counts are
    * additive, so the streamed monitor must equal the batch report
    * exactly under any micro-batch split. */
  private val PsiOracleSql = """WITH b AS (SELECT
    |    LEAST(n_chars // 100, 9) AS bucket,
    |    doc_id % 2 = 0 AS is_ref
    |  FROM documents),
    |c AS (SELECT bucket,
    |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
    |      AS n_ref,
    |    CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
    |      AS n_cur
    |  FROM b GROUP BY bucket),
    |dom AS (SELECT unnest(generate_series(0, 9)) AS bucket),
    |f AS (SELECT dom.bucket,
    |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
    |  FROM dom LEFT JOIN c ON c.bucket = dom.bucket),
    |t AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM f)
    |SELECT CAST(f.bucket AS BIGINT) AS bucket, n_ref, n_cur,
    |  round((CAST(n_ref + 1 AS DOUBLE) /
    |      CAST(t_ref + 10 AS DOUBLE) -
    |    CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + 10 AS DOUBLE)) *
    |    ln((CAST(n_ref + 1 AS DOUBLE) /
    |      CAST(t_ref + 10 AS DOUBLE)) /
    |      (CAST(n_cur + 1 AS DOUBLE) /
    |        CAST(t_cur + 10 AS DOUBLE))), 9) AS psi_term
    |FROM f, t ORDER BY bucket""".stripMargin

  def all: Seq[Q] = Seq(

    Q("d119_seq_packing",
      "Concat-and-chunk training-sequence packing (the GPT/T5 " +
        "dataloader discipline): documents in doc_id order are " +
        "concatenated into one token stream cut every 128 tokens — " +
        "zero padding except the tail; cut-crossing docs split. Per " +
        "sequence: contributing docs, occupied tokens, right-cut " +
        "splits. The ONLY global structure is an exclusive prefix " +
        "sum of lengths (RankOps.globalRunningSum — one range " +
        "exchange + per-partition accumulate + broadcast offsets, " +
        "never a single-partition window), then each doc explodes to " +
        "its own bounded sequence range (≤ len/128 + 1 rows) and a " +
        "hash aggregate rolls sequences up. The oracle replays the " +
        "prefix sum as a window (DuckDB is single-node — there the " +
        "window IS the right plan) and the same span arithmetic.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), Packing.tokenLen(col("text")).as("len"))
        Packing.packedSequences(docs, "doc_id", "len", budget = 128L)
      },
      Some(SeqPackOracleSql)),

    Q("w39_streaming_seq_packing",
      "STREAMED concat-and-chunk packing — d119 driven by a live " +
        "ordered ingest: doc batches arrive as range files; each " +
        "micro-batch prefix-sums its own lengths (the d119 " +
        "distributed prefix sum, batch-local) and offsets them by a " +
        "PERSISTED CARRY — the concatenated stream's next free token " +
        "offset — committed per batch by staged rename with the " +
        "batch marker inside the staged dir (StatsStore's " +
        "exactly-once discipline: replay is a no-op after the " +
        "commit, a deterministic rewrite before it; the new carry is " +
        "read back from COMMITTED span files, never the batch's own " +
        "lineage). The final rollup runs over the committed spans " +
        "through the IDENTICAL spansToSequences arithmetic, and the " +
        "oracle is d119's VERBATIM — ordered streamed assembly must " +
        "equal batch assembly exactly, under any micro-batch split.",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-w39").toString
        try {
          val docs = t(s, dir, "documents")
            .select(col("doc_id"), Packing.tokenLen(col("text")).as("len"))
          // three ordered waves, one range file each
          val ids = Seq(0L, 170L, 340L, Long.MaxValue)
          (0 to 2).foreach(w =>
            docs.filter(col("doc_id") >= ids(w) &&
                col("doc_id") < ids(w + 1))
              .coalesce(1).write.mode("append").parquet(s"$tmp/in"))
          Packing.initStream(s, tmp)
          val stream = s.readStream
            .schema("doc_id LONG, len LONG")
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$tmp/in")
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             batchId: Long) =>
              if (!batch.isEmpty)
                Packing.applyStreamBatch(batch.localCheckpoint(),
                  "doc_id", "len", tmp, s"b$batchId")
            }
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          Packing.spansToSequences(Packing.readSpans(s, tmp), 128L)
            .localCheckpoint()
        } finally Rm.rf(tmp)
      },
      Some(SeqPackOracleSql)),

    Q("d120_pair_packing",
      "Complementary-length pairing packer (the packed-BERT padding " +
        "cut as an exact, replayable rule): rank docs by (len, " +
        "doc_id); the r-th shortest pairs with the r-th longest " +
        "(pack = least(r, n+1-r)) — long docs absorb short ones, the " +
        "classic two-pointer first-fit. A pair fitting the " +
        "112-token budget shares one padded sequence; one that does " +
        "not keeps its members in their own (truncated) sequences. " +
        "Global rank is RankOps.globalRowNumber (two-phase range " +
        "rank, no single-partition window); the rollup is one hash " +
        "aggregate on pack_id. Waste = padding tokens the GPU would " +
        "burn; the d104 sorted-batch baseline for the same corpus " +
        "pads every batch to its max — the PLANS entry records the " +
        "measured reduction.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), Packing.tokenLen(col("text")).as("len"))
        Packing.pairPack(docs, "doc_id", "len", budget = 112L)
      },
      Some(s"""$TokCte,
        |rk AS (SELECT doc_id, len,
        |    row_number() OVER (ORDER BY len, doc_id) AS r,
        |    COUNT(*) OVER () AS n
        |  FROM tok),
        |pk AS (SELECT LEAST(r, n + 1 - r) AS pack_id, len FROM rk),
        |ag AS (SELECT pack_id, COUNT(*) AS n_docs, SUM(len) AS content,
        |    MAX(len) AS max_len, SUM(LEAST(len, 112)) AS cap
        |  FROM pk GROUP BY pack_id)
        |SELECT CAST(pack_id AS BIGINT) AS pack_id,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(content AS BIGINT) AS content,
        |  CAST(max_len AS BIGINT) AS max_len,
        |  content <= 112 AS fits,
        |  CAST(CASE WHEN content <= 112 THEN 1 ELSE n_docs END
        |    AS BIGINT) AS n_seqs,
        |  CAST(CASE WHEN content <= 112 THEN 112 - content
        |    ELSE n_docs * 112 - cap END AS BIGINT) AS waste
        |FROM ag ORDER BY pack_id""".stripMargin)),

    Q("d121_gram_matrix",
      "Single-pass Gram/covariance matrix over the embedding corpus " +
        "(LinAlg.gramQ) — the reduction behind PCA, whitening, and " +
        "linear-probe fitting: Σ v·vᵀ as EXACT integer sums over " +
        "1e-6-quantized embeddings (floor(x·1e6) of a float is the " +
        "same BIGINT in every engine; integer addition is order-free " +
        "— zero cross-engine float drift by construction). " +
        "Declarative: two chained posexplodes feed the d² per-row " +
        "products straight into a partial hash aggregate, so the " +
        "shuffle is ≤ d(d+1)/2 rows per map partition at ANY corpus " +
        "size; gramQFast does the identical reduction as one " +
        "treeAggregate of slot-packed LONG arrays (spec-gated " +
        "equal). The oracle replays quantization and the " +
        "upper-triangle sums.",
      (s, dir) => {
        LinAlg.gramQ(t(s, dir, "embeddings"), "embedding")
          .select(col("i").cast("long").as("i"),
            col("j").cast("long").as("j"), col("g_q"))
          .orderBy("i", "j")
      },
      Some(GramOracleSql)),

    Q("w42_streaming_gram",
      "STREAMED Gram maintenance — d121's covariance pass kept " +
        "fresh under a live embedding ingest: the quantized Gram is " +
        "an exact-integer SUM, so each micro-batch's d²-bounded " +
        "partial Gram folds additively into a persisted 2 080-row " +
        "store by staged rename under the exactly-once commit tag " +
        "(the algebra makes it batching- and order-invariant; a " +
        "replayed batch is a no-op). This is how a 100 TB pipeline " +
        "keeps PCA/whitening statistics current without recomputing " +
        "the corpus pass — the store is the bounded artifact, the " +
        "per-batch cost is batch-sized. Oracle = d121 verbatim.",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-w42").toString
        try {
          val emb = t(s, dir, "embeddings")
          emb.repartitionByRange(3, col("vec_id"))
            .write.parquet(s"$tmp/in")
          LinAlg.gramQ(emb.limit(0), "embedding")
            .write.mode("overwrite").parquet(s"$tmp/store")
          val stream = s.readStream
            .schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$tmp/in")
          // Shared staged-rename commit + crash-window self-heal
          // (graft.operators.Staged — VERDICT r13 #2 closed the
          // inline copies too).
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             batchId: Long) =>
              Staged.heal(s, tmp)
              if (!batch.isEmpty &&
                  !Staged.isApplied(s, tmp, s"b$batchId")) {
                s.read.parquet(s"$tmp/store")
                  .unionByName(LinAlg.gramQ(
                    batch.localCheckpoint(), "embedding"))
                  .groupBy("i", "j").agg(sum("g_q").as("g_q"))
                  .write.mode("overwrite").parquet(Staged.staging(tmp))
                Staged.commit(s, tmp, Some(s"b$batchId"))
              }
            }
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          s.read.parquet(s"$tmp/store")
            .select(col("i").cast("long").as("i"),
              col("j").cast("long").as("j"), col("g_q"))
            .orderBy("i", "j")
            .localCheckpoint()
        } finally Rm.rf(tmp)
      },
      Some(GramOracleSql)),

    Q("d122_pca_projection",
      "PCA by POWER ITERATION, exactly replayable end-to-end: the " +
        "d121 Gram collapses the corpus to a bounded d² integer " +
        "artifact; 8 driver-side iteration rounds (trunc-div " +
        "rescale, exact integer mat-vec, IEEE max-normalize, floor " +
        "requantize — every step engine-identical, LinAlg." +
        "topEigenQ) yield the dominant eigenvector at 1e6 scale; " +
        "one codegen'd map pass projects every embedding (exact " +
        "integer dot) and take-ordered top-10 by |projection| " +
        "surfaces the most-aligned vectors. The oracle UNROLLS all " +
        "8 rounds as CTEs over the same integer arithmetic — a " +
        "cross-engine-bit-exact PCA, which a double-valued " +
        "implementation could never gate this hard.",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val upper = LinAlg.gramQ(emb, "embedding").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
        val v = LinAlg.topEigenQ(upper, dim = 64, iters = 8)
        LinAlg.projectQ(emb, "vec_id", "embedding", v)
          .orderBy(abs(col("proj_q")).desc, col("vec_id"))
          .limit(10)
      },
      Some(PcaOracleSql)),

    Q("s20_pca_prefilter_topk",
      "PCA-projection-pruned cosine ANN — d122's dominant direction " +
        "as a 1-D coarse quantizer (the spectral cousin of the IVF " +
        "cell probe): every embedding carries its exact integer " +
        "projection; a query's candidates are the 50 docs NEAREST " +
        "in projection (|Δproj| — a scalar compare over a bounded " +
        "WindowGroupLimit rank, not a 64-d distance), and only " +
        "candidates pay the exact cosine. At rest the projection is " +
        "a sorted/bucketed column, making the candidate step a " +
        "range probe instead of a scan. The pruning is DETERMINISTIC " +
        "integer arithmetic, so the oracle replays it exactly (the " +
        "d106 discipline — the gate checks the implementation, not " +
        "the recall curve; recall vs s01 is the audit below).",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.{LinAlg, Similarity}
        val emb = t(s, dir, "embeddings")
        val upper = LinAlg.gramQ(emb, "embedding").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
        val v = LinAlg.topEigenQ(upper, dim = 64, iters = 8)
        // the serving layout: probe scalar materialized NEXT TO the
        // vector (one projection pass; candidate fetch and rerank
        // both read this table — the corpus is never rescanned)
        val proj = LinAlg.withProjQ(emb, "embedding", v)
          .localCheckpoint()
        val qp = proj.filter(col("vec_id").isin(1L, 2L, 3L))
          .select(col("vec_id").as("query_id"),
            col("proj_q").as("qproj"))
        val cand = proj
          .join(broadcast(qp), col("vec_id") =!= col("query_id"))
          .withColumn("crk", row_number().over(
            Window.partitionBy("query_id")
              .orderBy(abs(col("proj_q") - col("qproj")).asc,
                col("vec_id").asc)))
          .filter(col("crk") <= 50)
          .select("query_id", "vec_id")
        val e = proj.select(col("vec_id"),
          Similarity.asDouble(col("embedding")).as("v"))
        val qv = e.filter(col("vec_id").isin(1L, 2L, 3L))
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
        e.join(broadcast(cand), "vec_id")
          .join(broadcast(qv), "query_id")
          .select(col("query_id"), col("vec_id").as("doc_id"),
            round(Similarity.cosine(col("v"), col("qv")), 9)
              .as("cosine"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("query_id")
              .orderBy(col("cosine").desc, col("doc_id").asc)))
          .filter(col("rk") <= 10)
          .select(col("query_id"), col("rk").cast("long").as("rk"),
            col("doc_id"), col("cosine"))
          .orderBy("query_id", "rk")
      },
      Some(PcaChainSql + s""",
        |qp AS (SELECT vec_id AS query_id, proj_q AS qproj FROM pr
        |  WHERE vec_id IN (1, 2, 3)),
        |cand AS (SELECT query_id, vec_id FROM (
        |    SELECT qp.query_id, p.vec_id,
        |      row_number() OVER (PARTITION BY qp.query_id
        |        ORDER BY ABS(p.proj_q - qp.qproj) ASC, p.vec_id ASC)
        |        AS crk
        |    FROM pr p JOIN qp ON p.vec_id <> qp.query_id)
        |  WHERE crk <= 50),
        |emb2 AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |qv2 AS (SELECT vec_id AS query_id, v AS qv FROM emb2
        |  WHERE vec_id IN (1, 2, 3)),
        |cosr AS (SELECT c.query_id, c.vec_id AS doc_id,
        |    round(list_reduce(list_transform(generate_series(1, len(v)),
        |        i -> v[i] * qv[i]), (a,b) -> a + b) /
        |      (sqrt(list_reduce(list_transform(v, x -> x * x),
        |        (a,b) -> a + b)) *
        |       sqrt(list_reduce(list_transform(qv, x -> x * x),
        |        (a,b) -> a + b))), 9) AS cosine
        |  FROM cand c JOIN emb2 e ON e.vec_id = c.vec_id
        |    JOIN qv2 ON qv2.query_id = c.query_id),
        |rk2 AS (SELECT query_id, doc_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, doc_id ASC) AS BIGINT) AS rk
        |  FROM cosr)
        |SELECT CAST(query_id AS BIGINT) AS query_id, rk, doc_id,
        |  cosine
        |FROM rk2 WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("d127_bpe_seq_packing",
      "Tokenizer-aware sequence packing — the COMPLETE dataloader " +
        "line in one gated query: train the BPE merge table (d80), " +
        "tokenize every document with it (d81's type-join apply), " +
        "then concat-and-chunk the LEARNED token stream into " +
        "512-token training sequences (d119's distributed prefix " +
        "sum over the true lengths the GPU will see — not " +
        "whitespace proxies). Train is vocabulary-bounded with one " +
        "corpus scan; tokenize is one type-join pass; packing adds " +
        "one range exchange. The oracle replays all three stages in " +
        "one CTE chain (d104's train+apply prefix feeding d119's " +
        "rollup) — drift in any stage fails the gate.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = graft.operators.BpeTrain
          .train(docs, "text", nMerges = 8)
          .orderBy("step").select("pair")
          .collect().map(_.getString(0)).toSeq
        val tok = graft.operators.BpeTrain
          .tokenCounts(docs, "doc_id", "text", merges)
          .select(col("doc_id"), col("n_tokens").as("len"))
        Packing.packedSequences(tok, "doc_id", "len", budget = 512L)
      },
      Some(Mining.bpeTokenCountsCte(8) +
        packRollupSql(512, "n_tokens"))),

    Q("d124_preference_winrate",
      "Pairwise-preference aggregation with Wilson confidence bounds " +
        "— the arena/RLHF-data report: consecutive-id doc pairs from " +
        "different sources are 'matches' (winner = more content, tie " +
        "→ lower id), aggregated per unordered source pair into " +
        "games, wins, winrate, and the 95% Wilson LOWER bound (the " +
        "ranking statistic that does not over-trust small samples). " +
        "One equi-join on doc_id+1 (never all-pairs), one hash " +
        "aggregate; the Wilson formula is written as the IDENTICAL " +
        "expression in both engines (z² stays 1.96*1.96 — the " +
        "(1.2 + 1.0) discipline; exact integer wins/games feed IEEE " +
        "ops in the same order).",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val z2 = lit(1.96) * lit(1.96)
        val n = col("n_games").cast("double")
        val p = col("wins_a").cast("double") / n
        d.as("a").join(d.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1)
          .filter(col("a.source") =!= col("b.source"))
          .select(
            least(col("a.source"), col("b.source")).as("model_a"),
            greatest(col("a.source"), col("b.source")).as("model_b"),
            // a wins on more chars; tie → lower doc_id (= a). The
            // win belongs to model_a iff the winner's source is the
            // lexicographically smaller one.
            when((col("a.n_chars") >= col("b.n_chars")) ===
                (col("a.source") < col("b.source")), 1L)
              .otherwise(0L).as("win_a"))
          .groupBy("model_a", "model_b")
          .agg(count(lit(1)).as("n_games"),
            sum("win_a").as("wins_a"))
          .withColumn("winrate", round(p, 6))
          .withColumn("wilson_low", round(
            (p + z2 / (lit(2.0) * n) - lit(1.96) *
              sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * n)) / n)) /
              (lit(1.0) + z2 / n), 6))
          .orderBy("model_a", "model_b")
      },
      Some("""WITH d AS (SELECT doc_id, source, n_chars
        |  FROM documents),
        |m AS (SELECT
        |    LEAST(a.source, b.source) AS model_a,
        |    GREATEST(a.source, b.source) AS model_b,
        |    CASE WHEN (a.n_chars >= b.n_chars) =
        |      (a.source < b.source) THEN 1 ELSE 0 END AS win_a
        |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |  WHERE a.source <> b.source),
        |ag AS (SELECT model_a, model_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_games,
        |    CAST(SUM(win_a) AS BIGINT) AS wins_a
        |  FROM m GROUP BY model_a, model_b)
        |SELECT model_a, model_b, n_games, wins_a,
        |  round(CAST(wins_a AS DOUBLE) / CAST(n_games AS DOUBLE), 6)
        |    AS winrate,
        |  round((CAST(wins_a AS DOUBLE) / CAST(n_games AS DOUBLE) +
        |    (1.96 * 1.96) / (2.0 * CAST(n_games AS DOUBLE)) - 1.96 *
        |    sqrt((CAST(wins_a AS DOUBLE) / CAST(n_games AS DOUBLE) *
        |      (1.0 - CAST(wins_a AS DOUBLE) /
        |        CAST(n_games AS DOUBLE)) +
        |      (1.96 * 1.96) / (4.0 * CAST(n_games AS DOUBLE))) /
        |      CAST(n_games AS DOUBLE))) /
        |    (1.0 + (1.96 * 1.96) / CAST(n_games AS DOUBLE)), 6)
        |    AS wilson_low
        |FROM ag ORDER BY model_a, model_b""".stripMargin)),

    Q("d125_weighted_sample",
      "Weighted sampling without replacement (Efraimidis–Spirakis " +
        "exponential keys, IPL 2006) — importance-weighted corpus " +
        "selection as a one-pass top-k: key = ln(u)/w for a " +
        "deterministic content-hash uniform u (no RNG state — " +
        "identical across runs, partitionings, and engines), global " +
        "top-20 by key. The top-k is TakeOrdered (per-partition " +
        "k-heap + driver merge — no global sort); keys round to 9 " +
        "decimals BEFORE ranking so both engines order identical " +
        "values, ties on doc_id. Weight = n_chars: long docs are " +
        "proportionally likelier, the standard token-budget draw.",
      (s, dir) => {
        graft.operators.Sampling.weightedTopK(
          t(s, dir, "documents"), "doc_id",
          col("n_chars"), col("text"), k = 20)
      },
      Some(EsSampleOracleSql)),

    Q("w40_streaming_psi_monitor",
      "STREAMED drift monitoring — d126's PSI report maintained " +
        "against a LIVE ingest: the reference histogram is static " +
        "(cached once pre-stream, the w35/w36 static-side " +
        "discipline); current-snapshot docs arrive in micro-batches " +
        "and each batch folds its bucket counts into the persisted " +
        "StatsStore (ONE signed fold per batch under the exactly-" +
        "once commit tag — replay is a no-op). Counts are additive " +
        "⇒ the final store is batching-invariant by algebra, and " +
        "the post-stream PSI computation is d126's arithmetic " +
        "verbatim — oracle shared, so streamed monitoring must " +
        "equal the batch report exactly under any micro-batch " +
        "split.",
      (s, dir) => {
        import graft.operators.StatsStore
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-w40").toString
        val cached = scala.collection.mutable
          .Buffer.empty[org.apache.spark.sql.DataFrame]
        try {
          val docs = t(s, dir, "documents")
          val bucketed = docs.select(col("doc_id"),
            least(call_function("div", col("n_chars"), lit(100L)),
              lit(9L)).cast("string").as("bkt"))
          val ref = bucketed.filter(col("doc_id") % 2 === 0)
            .groupBy("bkt").agg(count(lit(1)).as("n_ref")).cache()
          ref.count()                    // materialize pre-stream
          cached += ref
          bucketed.filter(col("doc_id") % 2 === 1)
            .repartitionByRange(3, col("doc_id"))
            .write.parquet(s"$tmp/in")
          StatsStore.init(
            bucketed.limit(0).withColumn("txt", lit("")),
            "bkt", "txt", tmp)
          val stream = s.readStream
            .schema("doc_id LONG, bkt STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$tmp/in")
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             batchId: Long) =>
              if (!batch.isEmpty)
                StatsStore.applyDelta(
                  batch.localCheckpoint()
                    .withColumn("txt", lit(""))
                    .withColumn("op", lit(1)),
                  "bkt", "txt", "op", tmp, Some(s"b$batchId"))
            }
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val cur = StatsStore.read(s, tmp)
            .select(col("key").cast("long").as("bucket"),
              col("n_docs").as("n_cur"))
          val domain = s.range(10).select(col("id").as("bucket"))
          val full = domain
            .join(cur, Seq("bucket"), "left")
            .join(ref.select(col("bkt").cast("long").as("bucket"),
              col("n_ref")), Seq("bucket"), "left")
            .select(col("bucket"),
              coalesce(col("n_ref"), lit(0L)).as("n_ref"),
              coalesce(col("n_cur"), lit(0L)).as("n_cur"))
          val tot = full.agg(sum("n_ref").as("t_ref"),
            sum("n_cur").as("t_cur"))
          val pa = (col("n_ref") + 1).cast("double") /
            (col("t_ref") + 10).cast("double")
          val pb = (col("n_cur") + 1).cast("double") /
            (col("t_cur") + 10).cast("double")
          full.crossJoin(broadcast(tot))
            .select(col("bucket"), col("n_ref"), col("n_cur"),
              round((pa - pb) * log(pa / pb), 9).as("psi_term"))
            .orderBy("bucket")
            .localCheckpoint()
        } finally {
          cached.foreach(_.unpersist())
          Rm.rf(tmp)
        }
      },
      Some(PsiOracleSql)),

    Q("w41_streaming_weighted_sample",
      "STREAMED weighted sampling — d125's Efraimidis–Spirakis draw " +
        "maintained online, the textbook distributed-reservoir " +
        "merge: because the global sample is exactly the top-k " +
        "ES-keys and top-k is an associative, idempotent fold " +
        "(top-k of union = top-k of top-k's), each micro-batch " +
        "computes its own k-bounded candidate list and merges it " +
        "into a persisted k-row store by staged rename under the " +
        "exactly-once commit tag (replayed batch = no-op; a " +
        "re-merge of the same candidates is idempotent by the " +
        "fold's algebra even across the crash window). Keys are " +
        "content-hash-deterministic, so the final store must equal " +
        "the batch draw EXACTLY — oracle = d125 verbatim, under " +
        "any micro-batch split.",
      (s, dir) => {
        import graft.operators.Sampling
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-w41").toString
        try {
          val docs = t(s, dir, "documents")
            .select("doc_id", "text", "n_chars")
          docs.repartitionByRange(3, col("doc_id"))
            .write.parquet(s"$tmp/in")
          // empty k-row store bootstrap
          docs.limit(0)
            .select(col("doc_id"), col("n_chars").cast("long").as("w"),
              lit(0.0).as("es_key"))
            .write.mode("overwrite").parquet(s"$tmp/store")
          val stream = s.readStream
            .schema("doc_id LONG, text STRING, n_chars LONG")
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$tmp/in")
          // Shared staged-rename commit + crash-window self-heal
          // (graft.operators.Staged — VERDICT r13 #2).
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             batchId: Long) =>
              Staged.heal(s, tmp)
              if (!batch.isEmpty &&
                  !Staged.isApplied(s, tmp, s"b$batchId")) {
                val cand = Sampling.weightedTopK(
                  batch.localCheckpoint(), "doc_id",
                  col("n_chars"), col("text"), k = 20)
                s.read.parquet(s"$tmp/store")
                  .unionByName(cand)
                  .orderBy(col("es_key").desc, col("doc_id"))
                  .limit(20)
                  .write.mode("overwrite").parquet(Staged.staging(tmp))
                Staged.commit(s, tmp, Some(s"b$batchId"))
              }
            }
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          s.read.parquet(s"$tmp/store")
            .orderBy(col("es_key").desc, col("doc_id"))
            .localCheckpoint()
        } finally Rm.rf(tmp)
      },
      Some(EsSampleOracleSql)),

    Q("d126_psi_drift",
      "Population Stability Index drift report between two corpus " +
        "snapshots (the ingest-monitoring statistic model-risk teams " +
        "run on every feature): docs split into reference " +
        "(doc_id%2=0) and current (doc_id%2=1) snapshots, length " +
        "bucketed into a FIXED 10-bin domain (empty bins " +
        "materialized from a range frame — PSI needs the domain, " +
        "not just observed buckets), Laplace+1 smoothing on exact " +
        "counts, per-bin contribution (pa−pb)·ln(pa/pb). Two scans " +
        "collapse to one: both snapshots' counts come from a SINGLE " +
        "conditional-sum aggregate over one corpus pass (the d100 " +
        "discipline). Totals broadcast as a 1-row cross join.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val counts = docs.select(
            least(call_function("div", col("n_chars"), lit(100L)),
              lit(9L)).as("bucket"),
            (col("doc_id") % 2 === 0).as("is_ref"))
          .groupBy("bucket").agg(
            sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
            sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_cur"))
        val domain = s.range(10).select(col("id").as("bucket"))
        val full = domain.join(counts, Seq("bucket"), "left")
          .select(col("bucket"),
            coalesce(col("n_ref"), lit(0L)).as("n_ref"),
            coalesce(col("n_cur"), lit(0L)).as("n_cur"))
        val tot = full.agg(sum("n_ref").as("t_ref"),
          sum("n_cur").as("t_cur"))
        val pa = (col("n_ref") + 1).cast("double") /
          (col("t_ref") + 10).cast("double")
        val pb = (col("n_cur") + 1).cast("double") /
          (col("t_cur") + 10).cast("double")
        full.crossJoin(broadcast(tot))
          .select(col("bucket"), col("n_ref"), col("n_cur"),
            round((pa - pb) * log(pa / pb), 9).as("psi_term"))
          .orderBy("bucket")
      },
      Some(PsiOracleSql))
  )
}
