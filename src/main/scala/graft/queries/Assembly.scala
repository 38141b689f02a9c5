package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{LinAlg, Packing}
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

  /** d119's concat-and-chunk rollup at budget 128 — shared VERBATIM
    * by d119 (batch) and w39 (streamed with a persisted carry): the
    * streamed assembly must reproduce the batch packing exactly
    * under any micro-batch split of an ordered ingest. */
  private val SeqPackOracleSql = s"""$TokCte,
    |c AS (SELECT doc_id, len,
    |    CAST(SUM(len) OVER (ORDER BY doc_id) AS BIGINT) AS e
    |  FROM tok WHERE len > 0),
    |ex AS (SELECT e - len AS s, e,
    |    unnest(generate_series((e - len) // 128, (e - 1) // 128))
    |      AS seq
    |  FROM c)
    |SELECT CAST(seq AS BIGINT) AS seq,
    |  CAST(COUNT(*) AS BIGINT) AS n_docs,
    |  CAST(SUM(LEAST(e, (seq + 1) * 128) -
    |           GREATEST(s, seq * 128)) AS BIGINT) AS n_tokens,
    |  CAST(SUM(CASE WHEN e > (seq + 1) * 128 THEN 1 ELSE 0 END)
    |    AS BIGINT) AS n_continued
    |FROM ex GROUP BY seq ORDER BY seq""".stripMargin

  /** Quantized embeddings CTE — shared by the d121/d122 oracles;
    * floor(x·10⁶) of a FLOAT is the same BIGINT in every engine. */
  private val QuantCte = """WITH q AS (
    |  SELECT vec_id,
    |    list_transform(embedding,
    |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
    |  FROM embeddings),
    |idx AS (SELECT unnest(generate_series(0, 63)) AS i)""".stripMargin

  /** The d122 oracle: quantized Gram → trunc-div rescale → 8 UNROLLED
    * power-iteration rounds (exact integer mat-vec + IEEE
    * max-normalize + floor-requantize, each engine-identical) →
    * exact integer projection → top-10 by |proj|. */
  private val PcaOracleSql = {
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
      |  FROM q, v8 v GROUP BY vec_id)
      |SELECT vec_id, proj_q FROM pr
      |ORDER BY ABS(proj_q) DESC, vec_id LIMIT 10""".stripMargin
  }

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
      Some(s"""$QuantCte
        |SELECT a.i AS i, b.i AS j,
        |  CAST(SUM(qv[a.i + 1] * qv[b.i + 1]) AS BIGINT) AS g_q
        |FROM q, idx a, idx b WHERE a.i <= b.i
        |GROUP BY a.i, b.i ORDER BY i, j""".stripMargin)),

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
      Some(PcaOracleSql))
  )
}
