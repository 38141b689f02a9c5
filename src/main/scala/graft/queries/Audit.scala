package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{RowCheck, Validation}
import graft.queries.Tables.t

/** Data-quality governance: constraint-suite validation (the
  * Deequ/Great-Expectations report as ONE Spark aggregate —
  * [[graft.operators.Validation]]), keyed snapshot diff (the CDC
  * acceptance report), and exact classifier evaluation (rank-exact
  * AUC + confusion) — the audit surface a production ingest runs
  * before data reaches training. */
object Audit {

  /** The lineitem constraint suite — shared VERBATIM by d128 (batch)
    * and w43 (streamed monitor): every violation count is an exact
    * additive integer, so the streamed store must equal the batch
    * report under any range-disjoint micro-batch split. Violation
    * columns reference the post-FK-join frame (`o_orderkey` is the
    * left-joined reference key). */
  private def liChecks = Seq(
    RowCheck("qty_le_45", col("l_quantity") > 45),
    RowCheck("disc_le_8pct", col("l_discount") > 0.08),
    RowCheck("flag_accepted", !col("l_returnflag").isin("N", "R")),
    RowCheck("ship_before_1998",
      col("l_shipdate") >= lit("1998-01-01").cast("timestamp")),
    RowCheck("ship_not_null", col("l_shipdate").isNull),
    RowCheck("fk_orderkey", col("o_orderkey").isNull))

  private val LiUnique =
    Some(("pk_unique", Seq("l_orderkey", "l_linenumber")))

  /** d128's oracle — the whole suite as one DuckDB aggregate over the
    * FK-joined frame, reshaped to the LONG report. Shared verbatim by
    * w43. `COUNT(DISTINCT (a, b))` is DuckDB's composite distinct;
    * Spark's two-column `count_distinct` counts the same tuples
    * (neither key column is nullable here). */
  private val ValidationOracleSql = """WITH j AS (
    |  SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
    |    l.l_discount, l.l_returnflag, l.l_shipdate,
    |    o.o_orderkey AS ok
    |  FROM lineitem l LEFT JOIN orders o
    |    ON l.l_orderkey = o.o_orderkey),
    |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
    |    CAST(SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END)
    |      AS BIGINT) AS v_qty,
    |    CAST(SUM(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END)
    |      AS BIGINT) AS v_disc,
    |    CAST(SUM(CASE WHEN l_returnflag NOT IN ('N', 'R')
    |      THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
    |    CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
    |      THEN 1 ELSE 0 END) AS BIGINT) AS v_ship,
    |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
    |      AS BIGINT) AS v_null,
    |    CAST(SUM(CASE WHEN ok IS NULL THEN 1 ELSE 0 END)
    |      AS BIGINT) AS v_fk,
    |    CAST(COUNT(*) -
    |      COUNT(DISTINCT (l_orderkey, l_linenumber))
    |      AS BIGINT) AS v_uniq
    |  FROM j)
    |SELECT check_name, n_rows, n_violations,
    |  n_violations = 0 AS pass
    |FROM (
    |  SELECT 'qty_le_45' AS check_name, n_rows,
    |    v_qty AS n_violations FROM a
    |  UNION ALL SELECT 'disc_le_8pct', n_rows, v_disc FROM a
    |  UNION ALL SELECT 'flag_accepted', n_rows, v_flag FROM a
    |  UNION ALL SELECT 'ship_before_1998', n_rows, v_ship FROM a
    |  UNION ALL SELECT 'ship_not_null', n_rows, v_null FROM a
    |  UNION ALL SELECT 'fk_orderkey', n_rows, v_fk FROM a
    |  UNION ALL SELECT 'pk_unique', n_rows, v_uniq FROM a)
    |ORDER BY check_name""".stripMargin

  /** The FK-joined lineitem frame both validation queries check. */
  private def liJoined(s: org.apache.spark.sql.SparkSession,
                       dir: String) =
    t(s, dir, "lineitem").join(
      t(s, dir, "orders").select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left")

  val all: Seq[Q] = Seq(

    Q("d128_constraint_validation",
      "Constraint-suite data validation — the Deequ/Great-" +
        "Expectations report as ONE Spark aggregate: six row-wise " +
        "rules (range, set membership, date bound, NOT NULL, " +
        "referential integrity via a left join on orders) plus a " +
        "composite-key uniqueness rule all computed as conditional " +
        "sums / count-distinct inside a single scan of lineitem — " +
        "constraint count does not multiply corpus passes (the d100 " +
        "one-scan discipline applied to data quality). Output: the " +
        "pass/fail report with exact violation counts; pk_unique " +
        "genuinely trips on this data (45,832 distinct of 60,000 at " +
        "sf0.01), so the gate covers both verdicts. At rest, " +
        "bucketing both tables by the FK key makes the join " +
        "shuffle-free; everything else is map-side partials into a " +
        "1-row aggregate.",
      (s, dir) =>
        Validation.report(liJoined(s, dir), liChecks, LiUnique),
      Some(ValidationOracleSql)),

    Q("w43_streaming_constraint_monitor",
      "STREAMED constraint monitoring — d128's validation suite " +
        "maintained against a live ingest: lineitem arrives in " +
        "l_orderkey-RANGED micro-batches (range-disjoint ingest, the " +
        "w34 discipline — what makes the per-batch count-distinct " +
        "additive), the orders reference keys are cached once " +
        "pre-stream (the w35/w40 static-side discipline), and each " +
        "batch folds its one-pass violation counts into the " +
        "persisted additive store by staged rename under the " +
        "exactly-once commit tag (replay is a no-op). Exact integer " +
        "counts make the store batching-invariant by algebra; the " +
        "post-stream report is d128's verbatim — oracle shared, so " +
        "streamed monitoring must equal batch validation exactly.",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-w43").toString
        val cached = scala.collection.mutable
          .Buffer.empty[org.apache.spark.sql.DataFrame]
        try {
          val ok = t(s, dir, "orders").select("o_orderkey").cache()
          ok.count() // materialize pre-stream
          cached += ok
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_quantity",
              "l_discount", "l_returnflag", "l_shipdate")
            .repartitionByRange(3, col("l_orderkey"))
            .write.parquet(s"$tmp/in")
          val stream = s.readStream
            .schema("l_orderkey LONG, l_linenumber INT, " +
              "l_quantity DOUBLE, l_discount DOUBLE, " +
              "l_returnflag STRING, l_shipdate TIMESTAMP")
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$tmp/in")
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             batchId: Long) =>
              if (!batch.isEmpty) {
                val b = batch.localCheckpoint()
                // the batch's key range rides the fold — the
                // range-disjoint contract the uniqueness count's
                // additivity stands on is CHECKED, not assumed
                val r = b.agg(min("l_orderkey"), max("l_orderkey"))
                  .first()
                Validation.foldCounts(
                  Validation.counts(
                    b.join(ok,
                      col("l_orderkey") === col("o_orderkey"),
                      "left"),
                    liChecks, LiUnique),
                  tmp, Some(s"b$batchId"),
                  Some((r.getLong(0), r.getLong(1))))
              }
            }
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          Validation.fromCounts(Validation.readCounts(s, tmp))
            .localCheckpoint()
        } finally {
          cached.foreach(_.unpersist())
          Rm.rf(tmp)
        }
      },
      Some(ValidationOracleSql)),

    Q("d129_snapshot_diff",
      "Keyed snapshot diff — the CDC acceptance report between two " +
        "corpus snapshots: one FULL OUTER join on the document key " +
        "classifies every doc as added / removed / changed / " +
        "unchanged, with per-column change attribution (text vs " +
        "lang) as conditional sums in the same aggregate. The " +
        "snapshots derive deterministically from the corpus " +
        "(membership by doc_id residues, planted text/lang edits) " +
        "so both engines diff identical inputs. One shuffle per " +
        "side for the key join; at rest, snapshots bucketed by key " +
        "make the diff a zero-shuffle sort-merge — the plan shape " +
        "nightly 100 TB snapshot reconciliation needs.",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select("doc_id", "text", "lang")
        val a = d.filter(col("doc_id") % 7 =!= 0)
        val b = d.filter(col("doc_id") % 11 =!= 0).select(
          col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" rev2")))
            .otherwise(col("text")).as("text"),
          when(col("doc_id") % 13 === 0, lit("xx"))
            .otherwise(col("lang")).as("lang"))
        val both = col("a.doc_id").isNotNull &&
          col("b.doc_id").isNotNull
        a.as("a").join(b.as("b"),
            col("a.doc_id") === col("b.doc_id"), "full_outer")
          .select(
            when(col("a.doc_id").isNull, "added")
              .when(col("b.doc_id").isNull, "removed")
              .when(col("a.text") =!= col("b.text") ||
                col("a.lang") =!= col("b.lang"), "changed")
              .otherwise("unchanged").as("change_class"),
            when(both && col("a.text") =!= col("b.text"), 1L)
              .otherwise(0L).as("td"),
            when(both && col("a.lang") =!= col("b.lang"), 1L)
              .otherwise(0L).as("ld"))
          .groupBy("change_class")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("td").cast("long").as("n_text_changed"),
            sum("ld").cast("long").as("n_lang_changed"))
          .orderBy("change_class")
      },
      Some("""WITH a AS (
        |  SELECT doc_id, text, lang FROM documents
        |  WHERE doc_id % 7 <> 0),
        |b AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
        |      ELSE text END AS text,
        |    CASE WHEN doc_id % 13 = 0 THEN 'xx'
        |      ELSE lang END AS lang
        |  FROM documents WHERE doc_id % 11 <> 0),
        |f AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
        |    a.text AS ta, b.text AS tb, a.lang AS la, b.lang AS lb
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id),
        |c AS (SELECT
        |    CASE WHEN ida IS NULL THEN 'added'
        |      WHEN idb IS NULL THEN 'removed'
        |      WHEN ta <> tb OR la <> lb THEN 'changed'
        |      ELSE 'unchanged' END AS change_class,
        |    CASE WHEN ida IS NOT NULL AND idb IS NOT NULL
        |      AND ta <> tb THEN 1 ELSE 0 END AS td,
        |    CASE WHEN ida IS NOT NULL AND idb IS NOT NULL
        |      AND la <> lb THEN 1 ELSE 0 END AS ld
        |  FROM f)
        |SELECT change_class, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(td) AS BIGINT) AS n_text_changed,
        |  CAST(SUM(ld) AS BIGINT) AS n_lang_changed
        |FROM c GROUP BY change_class
        |ORDER BY change_class""".stripMargin)),

    Q("d130_classifier_eval",
      "Exact binary-classifier evaluation — rank-exact ROC-AUC " +
        "(Mann-Whitney with tie correction) plus the thresholded " +
        "confusion matrix, for the quality-classifier line (d27/" +
        "d03): label = (lang = 'en'), score = the integer " +
        "tokens-per-kilochar ratio (exact integer division — " +
        "engine-identical). AUC numerator is computed ENTIRELY in " +
        "integers (2·Σ pos·neg_below + Σ pos·neg_tied), divided " +
        "once at the end — no per-pair float accumulation, no " +
        "O(N²) pairs: the corpus collapses to per-score-level " +
        "counts first (≤ 1001 levels by construction — the score " +
        "is capped — so the ordering window runs over a BOUNDED " +
        "frame at any corpus size, the 2080-row Gram discipline), " +
        "and tp/fp/fn/tn are conditional sums over the same " +
        "levels. One corpus scan total.",
      (s, dir) =>
        graft.operators.IrEval.binaryEval(
          t(s, dir, "documents").filter(col("n_chars") > 0),
          pos = when(col("lang") === "en", 1L).otherwise(0L),
          // score ∈ [0, 1000] by construction ⇒ the operator's
          // ordering window is bounded at ANY corpus size
          score = least(lit(1000L), expr(
            "1000 * cast(size(filter(split(text, ' '), " +
              "w -> length(w) > 0)) as bigint) div n_chars")),
          thr = 182L),
      Some("""WITH s AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        |    LEAST(CAST(1000 AS BIGINT),
        |      1000 * CAST(len(list_filter(string_split(text, ' '),
        |        w -> len(w) > 0)) AS BIGINT) // n_chars) AS score
        |  FROM documents WHERE n_chars > 0),
        |g AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg
        |  FROM s GROUP BY score),
        |lv AS (SELECT score, n_pos, n_neg,
        |    COALESCE(SUM(n_neg) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS cneg
        |  FROM g),
        |t AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(n_neg) AS BIGINT) AS n_neg,
        |    CAST(SUM(2 * n_pos * cneg + n_pos * n_neg) AS BIGINT)
        |      AS auc_num2,
        |    CAST(SUM(CASE WHEN score >= 182 THEN n_pos ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN score >= 182 THEN n_neg ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN score < 182 THEN n_pos ELSE 0 END)
        |      AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN score < 182 THEN n_neg ELSE 0 END)
        |      AS BIGINT) AS tn
        |  FROM lv)
        |SELECT n_pos, n_neg, auc_num2,
        |  round(CAST(auc_num2 AS DOUBLE) /
        |    (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)),
        |    9) AS auc,
        |  tp, fp, fn, tn,
        |  round((CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE)) /
        |    (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE)), 9)
        |    AS accuracy,
        |  round(CAST(tp AS DOUBLE) /
        |    (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)), 9) AS prec,
        |  round(CAST(tp AS DOUBLE) /
        |    (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)), 9) AS rec,
        |  round(2.0 * CAST(tp AS DOUBLE) /
        |    (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE) +
        |      CAST(fn AS DOUBLE)), 9) AS f1
        |FROM t""".stripMargin)),

    Q("d138_sliced_eval",
      "Per-slice classifier evaluation — the fairness/regression " +
        "audit every quality gate needs BESIDE its global number " +
        "(d130): a classifier can hold aggregate AUC while failing " +
        "one source or language outright. IrEval.binaryEvalBy " +
        "computes the full metric set independently per source in " +
        "ONE pass — level counts keyed by (slice, score), the " +
        "below-count window partitioned by slice (frames stay " +
        "score-domain-bounded), rollup per slice; degenerate " +
        "one-class slices report auc = NULL instead of a fabricated " +
        "number. Same corpus-scan cost as the global eval.",
      (s, dir) =>
        graft.operators.IrEval.binaryEvalBy(
          t(s, dir, "documents").filter(col("n_chars") > 0),
          slice = col("source"),
          pos = when(col("lang") === "en", 1L).otherwise(0L),
          score = least(lit(1000L), expr(
            "1000 * cast(size(filter(split(text, ' '), " +
              "w -> length(w) > 0)) as bigint) div n_chars")),
          thr = 182L),
      Some("""WITH s AS (
        |  SELECT source AS slice,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        |    LEAST(CAST(1000 AS BIGINT),
        |      1000 * CAST(len(list_filter(string_split(text, ' '),
        |        w -> len(w) > 0)) AS BIGINT) // n_chars) AS score
        |  FROM documents WHERE n_chars > 0),
        |g AS (SELECT slice, score,
        |    CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg
        |  FROM s GROUP BY slice, score),
        |lv AS (SELECT slice, score, n_pos, n_neg,
        |    COALESCE(SUM(n_neg) OVER (PARTITION BY slice
        |      ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS cneg
        |  FROM g),
        |t AS (SELECT slice,
        |    CAST(SUM(n_pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(n_neg) AS BIGINT) AS n_neg,
        |    CAST(SUM(2 * n_pos * cneg + n_pos * n_neg) AS BIGINT)
        |      AS auc_num2,
        |    CAST(SUM(CASE WHEN score >= 182 THEN n_pos ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN score >= 182 THEN n_neg ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN score < 182 THEN n_pos ELSE 0 END)
        |      AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN score < 182 THEN n_neg ELSE 0 END)
        |      AS BIGINT) AS tn
        |  FROM lv GROUP BY slice)
        |SELECT slice, n_pos, n_neg, auc_num2,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |    ELSE round(CAST(auc_num2 AS DOUBLE) /
        |      (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)),
        |      9) END AS auc,
        |  tp, fp, fn, tn,
        |  round((CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE)) /
        |    (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE)), 9)
        |    AS accuracy
        |FROM t ORDER BY slice""".stripMargin)),

    Q("d131_dataset_fingerprint",
      "Content-addressed dataset fingerprint — the reproducibility/" +
        "provenance line of a data card: every doc hashes to a " +
        "64-bit content id (md5 over id|text), and each shard's " +
        "digest is the exact MULTISET hash Σ h64 (a DECIMAL sum — " +
        "order-independent, so any partitioning computes the same " +
        "digest, and an ADDITIVE group, so an ingest wave updates a " +
        "stored fingerprint by adding its docs' sum and a retraction " +
        "subtracts — the StatsStore maintenance algebra applied to " +
        "dataset identity). Two equal corpora produce equal rows; " +
        "any single changed/missing/extra doc flips its shard's " +
        "digest. One scan, one 16-row aggregate — map-side partials " +
        "do all the work at any corpus size.",
      (s, dir) =>
        t(s, dir, "documents").select(
            (col("doc_id") % 16).as("shard"),
            conv(substring(md5(concat(col("doc_id").cast("string"),
              lit("|"), col("text")).cast("binary")), 1, 15), 16, 10)
              .cast("long").as("h64"))
          .groupBy("shard").agg(
            count(lit(1)).cast("long").as("n_docs"),
            // exact DECIMAL multiset sum, carried as STRING so the
            // cross-engine compare stays exact (a DOUBLE digest
            // would defeat the point of a fingerprint)
            sum(col("h64").cast("decimal(38,0)")).cast("string")
              .as("digest"))
          .orderBy("shard"),
      Some("""WITH h AS (
        |  SELECT doc_id % 16 AS shard,
        |    CAST(concat('0x', substr(md5(
        |      CAST(doc_id AS VARCHAR) || '|' || text), 1, 15))
        |      AS BIGINT) AS h64
        |  FROM documents)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(CAST(SUM(h64) AS DECIMAL(38, 0)) AS VARCHAR)
        |    AS digest
        |FROM h GROUP BY shard ORDER BY shard""".stripMargin)),

    Q("w44_streaming_fingerprint",
      "STREAMED dataset-fingerprint maintenance — d131's provenance " +
        "digest kept current under a live ingest: the per-shard " +
        "digest is an exact DECIMAL multiset SUM, so each micro-" +
        "batch's shard-level (count, Σ h64) folds additively into a " +
        "persisted ≤ 16-row store by staged rename under the " +
        "exactly-once commit tag — the algebra makes the store " +
        "batching- and order-invariant (and retraction-capable: a " +
        "delete wave folds with sign −1), so a 100 TB pipeline " +
        "always has the CURRENT dataset identity without a corpus " +
        "pass. Oracle = d131 verbatim.",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-w44").toString
        try {
          def digests(df: org.apache.spark.sql.DataFrame) =
            df.select((col("doc_id") % 16).as("shard"),
                conv(substring(md5(concat(
                  col("doc_id").cast("string"), lit("|"),
                  col("text")).cast("binary")), 1, 15), 16, 10)
                  .cast("long").as("h64"))
              .groupBy("shard").agg(
                count(lit(1)).cast("long").as("n_docs"),
                sum(col("h64").cast("decimal(38,0)")).as("digest"))
          val docs = t(s, dir, "documents").select("doc_id", "text")
          docs.repartitionByRange(3, col("doc_id"))
            .write.parquet(s"$tmp/in")
          digests(docs.limit(0))
            .write.mode("overwrite").parquet(s"$tmp/store")
          val stream = s.readStream
            .schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$tmp/in")
          // Shared staged-rename commit + crash-window self-heal
          // (graft.operators.Staged — VERDICT r13 #2).
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             batchId: Long) =>
              graft.operators.Staged.heal(s, tmp)
              if (!batch.isEmpty &&
                  !graft.operators.Staged.isApplied(s, tmp,
                    s"b$batchId")) {
                s.read.parquet(s"$tmp/store")
                  .unionByName(digests(batch.localCheckpoint()))
                  .groupBy("shard").agg(
                    sum("n_docs").cast("long").as("n_docs"),
                    sum("digest").cast("decimal(38,0)").as("digest"))
                  .write.mode("overwrite")
                  .parquet(graft.operators.Staged.staging(tmp))
                graft.operators.Staged.commit(s, tmp, Some(s"b$batchId"))
              }
            }
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          s.read.parquet(s"$tmp/store")
            .select(col("shard"), col("n_docs"),
              col("digest").cast("string").as("digest"))
            .orderBy("shard")
            .localCheckpoint()
        } finally Rm.rf(tmp)
      },
      Some("""WITH h AS (
        |  SELECT doc_id % 16 AS shard,
        |    CAST(concat('0x', substr(md5(
        |      CAST(doc_id AS VARCHAR) || '|' || text), 1, 15))
        |      AS BIGINT) AS h64
        |  FROM documents)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(CAST(SUM(h64) AS DECIMAL(38, 0)) AS VARCHAR)
        |    AS digest
        |FROM h GROUP BY shard ORDER BY shard""".stripMargin)),

    Q("d134_pr_curve",
      "Precision/recall curve — the threshold-sweep report every " +
        "quality-classifier deployment tunes against (d130 gives " +
        "one operating point; this gives the curve): d130's label/" +
        "score convention swept over 8 thresholds spanning the " +
        "score's observed range. The corpus collapses to score " +
        "levels ONCE, a broadcast cross join against the 8-row " +
        "threshold frame feeds one conditional aggregate — exact " +
        "integer tp/fp/fn per threshold, one IEEE division each " +
        "for the rates. Cost is the same single corpus scan as " +
        "d130 regardless of how many thresholds the sweep carries.",
      (s, dir) =>
        graft.operators.IrEval.prCurve(
          t(s, dir, "documents").filter(col("n_chars") > 0),
          pos = when(col("lang") === "en", 1L).otherwise(0L),
          score = least(lit(1000L), expr(
            "1000 * cast(size(filter(split(text, ' '), " +
              "w -> length(w) > 0)) as bigint) div n_chars")),
          thrs = Seq(160L, 170L, 175L, 180L, 185L, 190L, 200L, 215L)),
      Some("""WITH s AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        |    LEAST(CAST(1000 AS BIGINT),
        |      1000 * CAST(len(list_filter(string_split(text, ' '),
        |        w -> len(w) > 0)) AS BIGINT) // n_chars) AS score
        |  FROM documents WHERE n_chars > 0),
        |g AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg
        |  FROM s GROUP BY score),
        |tf AS (SELECT unnest([160, 170, 175, 180, 185, 190, 200,
        |    215]) AS thr),
        |c AS (SELECT thr,
        |    CAST(SUM(CASE WHEN score >= thr THEN n_pos ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN score >= thr THEN n_neg ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN score < thr THEN n_pos ELSE 0 END)
        |      AS BIGINT) AS fn
        |  FROM g CROSS JOIN tf GROUP BY thr)
        |SELECT CAST(thr AS BIGINT) AS thr, tp, fp, fn,
        |  round(CASE WHEN tp + fp = 0 THEN 1.0
        |    ELSE CAST(tp AS DOUBLE) /
        |      (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)) END, 9)
        |    AS prec,
        |  round(CAST(tp AS DOUBLE) /
        |    (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)), 9) AS rec,
        |  round(CASE WHEN tp = 0 THEN 0.0
        |    ELSE 2.0 * CAST(tp AS DOUBLE) /
        |      (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE) +
        |       CAST(fn AS DOUBLE)) END, 9) AS f1
        |FROM c ORDER BY thr""".stripMargin)),

    Q("d133_epoch_shuffle",
      "Deterministic seeded epoch shuffle + shard assignment — the " +
        "dataloader-order primitive a multi-epoch training run " +
        "needs: epoch order is the sort by md5(epoch:doc_id) (no " +
        "RNG state — every worker, every engine, every retry " +
        "derives the identical permutation), ranks come from the " +
        "two-phase global rank (ONE range exchange + broadcast " +
        "offsets — no single-partition window), and shards are " +
        "rank div 16. Gate: per-(epoch, shard) doc count, id sum, " +
        "and the first doc in shard order — rank-dependent " +
        "aggregates that fail if the permutation or the sharding " +
        "drifts anywhere. Epochs are a 2-row broadcast cross join; " +
        "everything else is linear per epoch.",
      (s, dir) => {
        import graft.operators.RankOps
        val docs = t(s, dir, "documents").select("doc_id")
        val epochs = s.range(2).select(col("id").as("epoch"))
        val n1 = docs.agg(count(lit(1)).as("n"))
        val keyed = docs.crossJoin(broadcast(epochs))
          .select(col("epoch"), col("doc_id"),
            md5(concat(col("epoch").cast("string"), lit(":"),
              col("doc_id").cast("string")).cast("binary")).as("k"))
        RankOps.globalRowNumber(
            keyed, Seq(col("epoch"), col("k")), "rn")
          .crossJoin(broadcast(n1))
          .select(col("epoch"), col("doc_id"), col("k"),
            expr("(rn - 1 - epoch * n) div 16").as("shard"))
          .groupBy("epoch", "shard")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("doc_id").cast("long").as("id_sum"),
            min_by(col("doc_id"), col("k")).cast("long")
              .as("first_doc"))
          .orderBy("epoch", "shard")
      },
      Some("""WITH k AS (
        |  SELECT e.epoch, d.doc_id,
        |    md5(CAST(e.epoch AS VARCHAR) || ':' ||
        |      CAST(d.doc_id AS VARCHAR)) AS k
        |  FROM documents d
        |  CROSS JOIN (VALUES (0), (1)) AS e(epoch)),
        |r AS (SELECT epoch, doc_id, k,
        |    row_number() OVER (PARTITION BY epoch ORDER BY k) AS rn
        |  FROM k)
        |SELECT CAST(epoch AS BIGINT) AS epoch,
        |  CAST((rn - 1) // 16 AS BIGINT) AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  CAST(min_by(doc_id, k) AS BIGINT) AS first_doc
        |FROM r GROUP BY epoch, shard
        |ORDER BY epoch, shard""".stripMargin)),

    Q("d135_bpe_table_roundtrip",
      "Tokenizer-artifact lifecycle — the merge table SHIPS: train " +
        "d80's 8 merges, persist the ordered table to parquet (the " +
        "artifact a training cluster actually loads), RELOAD it, and " +
        "tokenize the corpus with the reloaded table. BPE inference " +
        "is training replay in merge order, so a persistence layer " +
        "that loses, reorders, or mangles one merge changes token " +
        "counts somewhere — the gate is d81's oracle verbatim " +
        "(re-trains and re-applies in CTEs), so the round-trip must " +
        "be bit-faithful end to end.",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-d135").toString
        try {
          val docs = t(s, dir, "documents")
          graft.operators.BpeTrain.train(docs, "text", nMerges = 8)
            .select("step", "pair")
            .write.mode("overwrite").parquet(s"$tmp/merges")
          val reloaded = s.read.parquet(s"$tmp/merges")
            .orderBy("step").select("pair")
            .collect().map(_.getString(0)).toSeq
          graft.operators.BpeTrain
            .tokenCounts(docs, "doc_id", "text", reloaded)
            .orderBy("doc_id")
            .localCheckpoint()
        } finally Rm.rf(tmp)
      },
      Some(s"""${Mining.bpeTokenCountsCte(8)}
        |SELECT doc_id, n_tokens FROM tok
        |ORDER BY doc_id""".stripMargin)),

    Q("d132_l_diversity",
      "l-diversity audit (Machanavajjhala 2007) — the gap " +
        "k-anonymity (d56) leaves open: a group can be large yet " +
        "reveal its sensitive attribute if every row shares one " +
        "value. Rows group by the d56 quasi-identifier tuple " +
        "(event_type × value decade); a group with fewer than l = 3 " +
        "DISTINCT sensitive values (user_id) is a homogeneity-" +
        "attack risk. Per event_type: group count, low-diversity " +
        "groups, rows at risk, and the diversity floor actually " +
        "achieved. Two aggregations (QI groups → rollup), both " +
        "partial+final — the d56 shape plus one count-distinct.",
      (s, dir) => {
        val g = Tables.events(s, dir)
          .select(col("event_type"),
            floor(col("value") / 10).cast("long").as("vb"),
            col("user_id"))
          .groupBy("event_type", "vb")
          .agg(count(lit(1)).as("sz"),
            count_distinct(col("user_id")).as("ndist"))
        g.groupBy("event_type").agg(
            count(lit(1)).cast("long").as("n_groups"),
            sum(when(col("ndist") < 3, 1L).otherwise(0L))
              .cast("long").as("n_low_diversity"),
            sum(when(col("ndist") < 3, col("sz")).otherwise(0L))
              .cast("long").as("n_rows_at_risk"),
            min("ndist").cast("long").as("min_diversity"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (
        |  SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS vb,
        |    COUNT(*) AS sz, COUNT(DISTINCT user_id) AS ndist
        |  FROM events GROUP BY event_type, vb)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN ndist < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_diversity,
        |  CAST(SUM(CASE WHEN ndist < 3 THEN sz ELSE 0 END)
        |    AS BIGINT) AS n_rows_at_risk,
        |  CAST(MIN(ndist) AS BIGINT) AS min_diversity
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin)))
}
