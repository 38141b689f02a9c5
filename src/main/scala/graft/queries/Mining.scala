package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Colloc, EntityRes, FsField, PHash, SpanDedup, Winnow}
import graft.queries.Tables.t

/** Corpus-mining queries: collocation discovery and span-level repeat
  * detection (operators in [[graft.operators.Colloc]] and
  * [[graft.operators.SpanDedup]]). */
object Mining {

  /** The five-stage curation-funnel oracle — shared VERBATIM by d100
    * (batch) and w33 (streamed with a persisted seen-hash store):
    * every stage count is batching-invariant (per-doc gates are
    * additive, the dedup stage counts DISTINCT hashes, and chunk
    * counts per distinct hash are representative-independent since
    * equal texts chunk equally), so the streamed funnel must equal
    * the batch one exactly under ANY micro-batch split. */
  private val FunnelOracleSql = """WITH base AS (
    |  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tok,
    |    len(list_filter(string_split(text, ' '),
    |      t -> list_contains(['the','a','of','and','to','in','is',
    |                          'it','for','on'], t))) AS n_stop
    |  FROM documents),
    |s1 AS (SELECT * FROM base WHERE n_tok BETWEEN 20 AND 500),
    |s2 AS (SELECT * FROM s1
    |       WHERE CAST(n_stop AS DOUBLE) / n_tok >= 0.02),
    |s3 AS (SELECT * FROM s2 QUALIFY row_number()
    |       OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
    |chunks AS (SELECT CASE WHEN n_tok <= 64 THEN 1
    |    ELSE CAST(ceil((n_tok - 16) / 48.0) AS BIGINT) END AS nc
    |  FROM s3)
    |SELECT * FROM (
    |  SELECT 1 AS stage, 'raw' AS name, COUNT(*) AS n FROM base
    |  UNION ALL SELECT 2, 'length', COUNT(*) FROM s1
    |  UNION ALL SELECT 3, 'quality', COUNT(*) FROM s2
    |  UNION ALL SELECT 4, 'exact_dedup', COUNT(*) FROM s3
    |  UNION ALL SELECT 5, 'chunks', CAST(SUM(nc) AS BIGINT)
    |    FROM chunks
    |) ORDER BY stage""".stripMargin

  /** The SIX-stage funnel oracle (round 11 — d102 batch + w34
    * streamed): FunnelOracleSql's five stages plus a banded-LSH
    * NEAR-dup stage between exact dedup and chunking, the
    * CCNet/Gopher→MinHash order real curation runs. Stage-5
    * semantics: among exact-dedup survivors, a doc is dropped iff it
    * shares ANY (perm, signature) band bucket with a SMALLER-doc_id
    * survivor (keep-best = min id, the d24 discipline; the pairs CTE
    * is d07's verbatim, restricted to the survivors). Batch-split
    * invariant under id-ordered ingest: the dedup stage counts
    * distinct hashes, and the LSH drop set depends only on the
    * survivor SET and their ids, which ordered arrival lets an online
    * first-writer-wins bucket store reproduce exactly (w34). */
  private val FunnelNearDupOracleSql = {
    import graft.operators.Dedup
    val perms = (0 until 4).map { j =>
      val (a, b) = (Dedup.HashA(j), Dedup.HashB(j))
      s"SELECT doc_id, $j AS j, list_aggregate(list_transform(hs, " +
        s"h -> (h * $a + $b) % ${Dedup.HashP}), 'min') AS m FROM sh"
    }.mkString("\n    |  UNION ALL ")
    s"""WITH base AS (
    |  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tok,
    |    len(list_filter(string_split(text, ' '),
    |      t -> list_contains(['the','a','of','and','to','in','is',
    |                          'it','for','on'], t))) AS n_stop
    |  FROM documents),
    |s1 AS (SELECT * FROM base WHERE n_tok BETWEEN 20 AND 500),
    |s2 AS (SELECT * FROM s1
    |       WHERE CAST(n_stop AS DOUBLE) / n_tok >= 0.02),
    |s3 AS (SELECT * FROM s2 QUALIFY row_number()
    |       OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
    |sh AS (
    |  SELECT doc_id,
    |    list_transform(
    |      list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
    |        i -> string_split(text, ' ')[i] || ' ' ||
    |             string_split(text, ' ')[i+1] || ' ' ||
    |             string_split(text, ' ')[i+2]),
    |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT %
    |        ${Dedup.HashP}) AS hs
    |  FROM s3),
    |sig AS (
    |  $perms),
    |pairs AS (
    |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
    |  FROM sig a JOIN sig b
    |    ON a.j = b.j AND a.m = b.m AND a.doc_id < b.doc_id
    |  WHERE a.m IS NOT NULL),
    |s4 AS (SELECT * FROM s3
    |       WHERE doc_id NOT IN (SELECT d2 FROM pairs)),
    |chunks AS (SELECT CASE WHEN n_tok <= 64 THEN 1
    |    ELSE CAST(ceil((n_tok - 16) / 48.0) AS BIGINT) END AS nc
    |  FROM s4)
    |SELECT * FROM (
    |  SELECT 1 AS stage, 'raw' AS name, COUNT(*) AS n FROM base
    |  UNION ALL SELECT 2, 'length', COUNT(*) FROM s1
    |  UNION ALL SELECT 3, 'quality', COUNT(*) FROM s2
    |  UNION ALL SELECT 4, 'exact_dedup', COUNT(*) FROM s3
    |  UNION ALL SELECT 5, 'near_dup', COUNT(*) FROM s4
    |  UNION ALL SELECT 6, 'chunks', CAST(SUM(nc) AS BIGINT)
    |    FROM chunks
    |) ORDER BY stage""".stripMargin
  }

  /** The d81 oracle's train-then-apply CTE chain as a reusable
    * prefix: re-trains `k` exact BPE merges and re-applies them over
    * word types, ending in a relation `tok(doc_id, n_tokens)` — the
    * per-document LEARNED-tokenizer token count. d81 selects it
    * directly; d104 feeds it into the batching replay. */
  private[queries] def bpeTokenCountsCte(k: Int): String = {
    def stage(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""pc$i AS MATERIALIZED (
        |  SELECT p, CAST(SUM(cnt) AS BIGINT) AS n FROM (
        |    SELECT unnest(list_transform(generate_series(1, len(l) - 1),
        |      k -> l[k] || ' ' || l[k+1])) AS p, cnt
        |    FROM (SELECT string_split(s, '  ') AS l, cnt FROM $prev))
        |  GROUP BY p),
        |b$i AS MATERIALIZED (
        |  SELECT p, n FROM pc$i ORDER BY n DESC, p ASC LIMIT 1),
        |r$i AS MATERIALIZED (
        |  SELECT w, trim(replace('  ' || s || '  ',
        |    ' ' || split_part((SELECT p FROM b$i), ' ', 1) || '  ' ||
        |      split_part((SELECT p FROM b$i), ' ', 2) || ' ',
        |    ' ' || replace((SELECT p FROM b$i), ' ', '') || ' '))
        |    AS s, cnt
        |  FROM $prev)""".stripMargin
    }
    s"""WITH r0 AS MATERIALIZED (
      |  SELECT w, array_to_string(string_split(w, ''), '  ') AS s,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE length(w) > 0 GROUP BY w),
      |${(1 to k).map(stage).mkString(",\n")},
      |tok AS MATERIALIZED (
      |  SELECT d.doc_id,
      |    CAST(SUM(len(string_split(r$k.s, '  '))) AS BIGINT)
      |      AS n_tokens
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents) d
      |  JOIN r$k ON d.w = r$k.w
      |  WHERE length(d.w) > 0
      |  GROUP BY d.doc_id)""".stripMargin
  }

  /** The cross-corpus decontamination CTE chain (corpus/bench split,
    * d07's integer MinHash signatures for both sides, the (j, sig)
    * candidate join, the exact Jaccard verify) — through `ver`,
    * shared VERBATIM by d108 (batch flags) and w36 (streamed ingest
    * gate: survivors = corp ANTI ver-over-threshold). */
  private def decontamCtes: String = {
    def sigCtes(rel: String, idAs: String, pfx: String): String = {
      val perms = (0 until 4).map { j =>
        val (a, b) = (graft.operators.Dedup.HashA(j),
          graft.operators.Dedup.HashB(j))
        s"SELECT $idAs, $j AS j, list_aggregate(list_transform(" +
          s"hs, h -> (h * $a + $b) % ${graft.operators.Dedup.HashP}" +
          s"), 'min') AS m FROM ${pfx}s"
      }.mkString("\n  UNION ALL ")
      s"""${pfx}s AS (
         |  SELECT $idAs,
         |    list_transform(
         |      list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
         |        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]),
         |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % ${graft.operators.Dedup.HashP}) AS hs
         |  FROM $rel),
         |${pfx}sig AS (
         |  $perms)""".stripMargin
    }
    s"""WITH corp AS (SELECT doc_id, text FROM documents
    |            WHERE doc_id % 10 <> 0),
    |bench AS (SELECT doc_id AS bench_id, text FROM documents
    |          WHERE doc_id % 10 = 0),
    |${sigCtes("corp", "doc_id", "c")},
    |${sigCtes("bench", "bench_id", "b")},
    |cand AS (
    |  SELECT DISTINCT c.doc_id, b.bench_id
    |  FROM csig c JOIN bsig b ON c.j = b.j AND c.m = b.m
    |  WHERE c.m IS NOT NULL),
    |ctok AS (SELECT doc_id,
    |    list_distinct(string_split(text, ' ')) AS cs FROM corp),
    |btok AS (SELECT bench_id,
    |    list_distinct(string_split(text, ' ')) AS bs FROM bench),
    |ver AS (
    |  SELECT doc_id,
    |    CAST(len(list_intersect(cs, bs)) AS DOUBLE) /
    |      CAST(len(list_distinct(list_concat(cs, bs))) AS DOUBLE)
    |      AS jc
    |  FROM cand JOIN ctok USING (doc_id) JOIN btok USING (bench_id))"""
      .stripMargin
  }

  val all: Seq[Q] = Seq(

    Q("d69_pmi_collocations",
      "Collocation mining by pointwise mutual information (Church & " +
        "Hanks 1990; graft.operators.Colloc): bigram and unigram " +
        "counts are each one explode + hash agg; the PMI join keys on " +
        "the Zipf-skewed word columns (count tables NOT assumed " +
        "broadcastable at corpus scale); totals are 1-row aggregates " +
        "OF the count tables so numerators and denominators can never " +
        "disagree on tokenization edges. PMI rounds to 6 decimals " +
        "over an identically-parenthesized double expression — libm " +
        "ulp differences can't flip the ranking key.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Colloc.pmiTopK(
          Colloc.bigramCounts(docs, "text"),
          Colloc.unigramCounts(docs, "text"),
          minCount = 5, k = 20)
      },
      Some("""WITH bg AS (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1])) AS b
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)),
        |bc AS (SELECT b, COUNT(*) AS c_ab FROM bg GROUP BY b),
        |uc AS (SELECT w, COUNT(*) AS c_w FROM
        |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |tot AS (SELECT (SELECT SUM(c_ab) FROM bc) AS nb,
        |               (SELECT SUM(c_w) FROM uc) AS nt),
        |sc AS (SELECT split_part(b, ' ', 1) AS w1,
        |    split_part(b, ' ', 2) AS w2, c_ab,
        |    round(ln((CAST(c_ab AS DOUBLE) * nt * nt) /
        |             (CAST(nb AS DOUBLE) * u1.c_w * u2.c_w)), 6) AS pmi
        |  FROM bc
        |  JOIN uc u1 ON split_part(b, ' ', 1) = u1.w
        |  JOIN uc u2 ON split_part(b, ' ', 2) = u2.w, tot
        |  WHERE c_ab >= 5)
        |SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab, pmi FROM sc
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin)),

    Q("d70_repeated_spans",
      "Span-level exact-substring repeat detection (Lee et al. 2022; " +
        "graft.operators.SpanDedup): every 10-gram occurrence ships " +
        "as (doc, pos, xxhash64(gram)) — 8 bytes per gram, the d35 " +
        "pre-shuffle discipline — corpus-repeated grams come from one " +
        "hash agg on the gram hash, and each doc's maskable-token " +
        "count is the size of its repeated-span UNION (a ×10 explode " +
        "of only the repeated occurrences + distinct count). The " +
        "numbers a masking pass acts on, not just a dup count.",
      (s, dir) => SpanDedup.repeatedSpanStats(
          SpanDedup.gramOccurrences(
            t(s, dir, "documents"), "doc_id", "text", n = 10),
          n = 10)
        .orderBy("doc_id"),
      Some("""WITH flat AS (
        |  SELECT doc_id, o.pos AS pos, o.g AS g FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(w) - 9),
        |        i -> {'pos': i - 1, 'g': array_to_string(w[i:i+9], ' ')}))
        |        AS o
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w
        |          FROM documents))),
        |cnt AS (SELECT g, COUNT(*) AS c FROM flat GROUP BY g),
        |rep AS (SELECT doc_id, pos FROM flat JOIN cnt USING (g)
        |        WHERE c > 1),
        |n_occ AS (SELECT doc_id, COUNT(*) AS n_occ FROM rep
        |          GROUP BY doc_id),
        |cov AS (SELECT doc_id,
        |    CAST(COUNT(DISTINCT ti) AS BIGINT) AS n_masked FROM
        |  (SELECT doc_id, unnest(generate_series(pos, pos + 9)) AS ti
        |   FROM rep)
        |  GROUP BY doc_id)
        |SELECT doc_id, CAST(n_occ AS BIGINT) AS n_occ, n_masked
        |FROM n_occ JOIN cov USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    Q("d73_entity_resolution",
      "Fellegi-Sunter record linkage (JASA 1969; " +
        "graft.operators.EntityRes): 300 planted dirty duplicates of " +
        "the customer table (one name character replaced at an " +
        "id-dependent position, balance shifted 0.01 — synthesized " +
        "identically in both engines), blocked on (nation, " +
        "balance-kilobucket) so the quadratic pairing stays inside " +
        "bounded blocks; per-field agreement (levenshtein<=1 name, " +
        "|bal diff|<=0.02, segment equality) weighted ln(m/u) / " +
        "ln((1-m)/(1-u)) with published-style error rates; matches " +
        "at score>=6.5. All 300 planted pairs are recovered — a pair " +
        "straddling a kilobucket boundary would be blocking-recall " +
        "loss, the documented multi-pass/d58 territory.",
      (s, dir) => {
        val base = t(s, dir, "customer").select(
          col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_nationkey").as("nat"), col("c_acctbal").as("bal"),
          col("c_mktsegment").as("seg"))
        val dirty = base.filter(col("id") % 5 === 0).select(
          (col("id") + 10000).as("id"),
          expr("concat(substr(name, 1, id % 9 + 4), 'X', " +
            "substr(name, id % 9 + 6))").as("name"),
          col("nat"), (col("bal") + lit(0.01)).as("bal"), col("seg"))
        val recs = base.unionByName(dirty)
          .withColumn("bb", floor(col("bal") / 1000).cast("long"))
        EntityRes.fsScorePairs(recs, "id", Seq("nat", "bb"), Seq(
            FsField("name", (a, b) => levenshtein(a, b) <= 1,
              m = 0.95, u = 0.001),
            FsField("bal", (a, b) => abs(a - b) <= 0.02,
              m = 0.9, u = 0.01),
            FsField("seg", (a, b) => a === b, m = 0.9, u = 0.2)))
          .filter(col("score") >= 6.5)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH base AS (
        |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
        |         c_acctbal AS bal, c_mktsegment AS seg
        |  FROM customer),
        |dirty AS (
        |  SELECT id + 10000 AS id,
        |    concat(substr(name, 1, id % 9 + 4), 'X',
        |           substr(name, id % 9 + 6)) AS name,
        |    nat, bal + 0.01 AS bal, seg
        |  FROM base WHERE id % 5 = 0),
        |rec AS (SELECT * FROM base UNION ALL SELECT * FROM dirty),
        |blk AS (SELECT *, CAST(floor(bal / 1000) AS BIGINT) AS bb
        |        FROM rec),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    (levenshtein(a.name, b.name) <= 1) AS name_agree,
        |    (abs(a.bal - b.bal) <= 0.02) AS bal_agree,
        |    (a.seg = b.seg) AS seg_agree
        |  FROM blk a JOIN blk b
        |    ON a.nat = b.nat AND a.bb = b.bb AND a.id < b.id),
        |scored AS (
        |  SELECT id_a, id_b,
        |    CAST(CAST(name_agree AS INT) + CAST(bal_agree AS INT) +
        |      CAST(seg_agree AS INT) AS BIGINT) AS n_agree,
        |    round(
        |      (CASE WHEN name_agree THEN ln(0.95 / 0.001)
        |            ELSE ln(0.05 / 0.999) END) +
        |      (CASE WHEN bal_agree THEN ln(0.9 / 0.01)
        |            ELSE ln(0.1 / 0.99) END) +
        |      (CASE WHEN seg_agree THEN ln(0.9 / 0.2)
        |            ELSE ln(0.1 / 0.8) END), 6) AS score
        |  FROM pairs)
        |SELECT id_a, id_b, n_agree, score
        |FROM scored WHERE score >= 6.5 ORDER BY id_a, id_b""".stripMargin)),

    Q("d72_winnowing",
      "Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03 — " +
        "the MOSS algorithm; graft.operators.Winnow): hash every " +
        "5-gram (md5-derived 60-bit value — winnowing SELECTS by hash " +
        "value, so the gate hash must agree across engines, the d17 " +
        "discipline), keep each 4-window's MINIMUM as the doc's " +
        "fingerprint set (guaranteed density: any match of length >= " +
        "w+k-1 is caught, selections survive edits elsewhere — what " +
        "d10's fixed-stride fingerprints lack), then pair docs " +
        "sharing >= 2 fingerprints with a df<=10 cap on boilerplate " +
        "fingerprints (the d52 fan-out discipline). One window per " +
        "doc, one shuffle on the fingerprint.",
      (s, dir) => Winnow.sharedFingerprintPairs(
          Winnow.fingerprints(
            Winnow.gramOccurrencesMd5(
              t(s, dir, "documents"), "doc_id", "text", n = 5),
            w = 4),
          minShared = 2, maxFpDf = 10)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH occ AS (
        |  SELECT doc_id, o.pos AS pos, o.gh AS gh FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(w) - 4),
        |        i -> {'pos': i - 1,
        |              'gh': ('0x' || substr(md5(
        |                array_to_string(w[i:i+4], ' ')), 1, 15))::BIGINT}))
        |        AS o
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w
        |          FROM documents))),
        |wm AS (
        |  SELECT doc_id, pos,
        |    min(gh) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM occ),
        |fp AS (SELECT DISTINCT doc_id, wmin AS fp FROM wm
        |       WHERE pos <= n - 4),
        |capped AS (SELECT doc_id, fp FROM (
        |  SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS fdf
        |  FROM fp)
        |  WHERE fdf <= 10),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    COUNT(*) AS n_shared
        |  FROM capped a JOIN capped b
        |    ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
        |FROM pairs ORDER BY doc_a, doc_b""".stripMargin)),

    Q("m09_phash_neardup",
      "Perceptual-hash image near-dup (graft.operators.PHash): REAL " +
        "PNG synthesis → ImageIO decode → dHash (64 bits as two " +
        "sign-free halves) → LSH-style band join on 4×16-bit bands " +
        "(pigeonhole-lossless at Hamming ≤ 3) → codegen'd popcount " +
        "verify on the carried halves, no join-back. The planted " +
        "+128 pixel perturbation (id%11=0) makes 180 of the 950 " +
        "pairs distance-1 NEAR-dups — the oracle recomputes every " +
        "hash in closed form from the synthesis parameters, so a " +
        "broken codec round-trip or bit order fails the gate.",
      (s, dir) => PHash.nearDupPairs(
          PHash.dhash(PHash.withPatternPng(
            t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id"))
            .toDF(),
          maxDist = 3)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH px AS (
        |  SELECT doc_id, x, y,
        |    CASE WHEN doc_id % 11 = 0 AND x = 0 AND y = 0
        |      THEN (((x*17 + y*29) * (1 + doc_id % 5)) % 256 + 128) % 256
        |      ELSE ((x*17 + y*29) * (1 + doc_id % 5)) % 256 END AS v
        |  FROM (SELECT doc_id FROM documents WHERE doc_id < 100),
        |       generate_series(0, 8) gx(x), generate_series(0, 7) gy(y)),
        |bits AS (
        |  SELECT a.doc_id, a.y * 8 + a.x AS idx,
        |    CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND b.y = a.y
        |   AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |h AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN idx >= 32
        |      THEN bit * (1::BIGINT << (idx - 32)) ELSE 0 END) AS BIGINT)
        |      AS hi,
        |    CAST(SUM(CASE WHEN idx < 32
        |      THEN bit * (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.hi, b.hi)) +
        |       bit_count(xor(a.lo, b.lo)) AS BIGINT) AS dist
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.hi, b.hi)) +
        |      bit_count(xor(a.lo, b.lo)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin)),

    Q("d78_suffix_array",
      "Distributed suffix array by prefix doubling (Manber & Myers " +
        "1990; graft.operators.SuffixArray) — the exact structure " +
        "behind suffix-array corpus dedup (Lee et al. ACL'22), over " +
        "DOCUMENT-LOCAL suffixes so matches never cross doc " +
        "boundaries. One 64-char-tail seed sort replaces the first " +
        "six doubling rounds; each later round is a self-equi-join " +
        "on (doc_id, off+k) plus a dense re-rank via the " +
        "sorted-distinct zipWithIndex prefix sum (never a " +
        "single-task Window.orderBy); loop exits as soon as ranks " +
        "individuate. The gate checks the FULL array: every " +
        "(rank, doc_id, off) triple against DuckDB sorting the " +
        "materialized suffix strings themselves.",
      (s, dir) => graft.operators.SuffixArray
        .build(t(s, dir, "documents"), "doc_id", "text")
        .select(col("rank").as("r"), col("doc_id"), col("off"))
        .orderBy("r"),
      Some("""WITH sfx AS (
        |  SELECT doc_id,
        |    unnest(range(0, CAST(length(text) AS BIGINT))) AS off,
        |    text FROM documents),
        |s2 AS (SELECT doc_id, off,
        |  substr(text, CAST(off + 1 AS INT)) AS s FROM sfx)
        |SELECT CAST(row_number() OVER (ORDER BY s, doc_id, off) - 1
        |         AS BIGINT) AS r,
        |       doc_id, CAST(off AS BIGINT) AS off
        |FROM s2 ORDER BY r""".stripMargin)),

    Q("d79_sa_substring_dedup",
      "EXACT substring dedup over the suffix array (Lee et al. " +
        "ACL'22 §3 — the exact form of what d35/d70 approximate " +
        "with gram hashes): a position is duplicated iff its suffix " +
        "shares a >= 30-char prefix with another suffix anywhere in " +
        "the corpus, which in suffix order is a property of the " +
        "ADJACENT array entries alone — two rank-neighbor " +
        "equi-joins on the kept 64-char tails, never a pairwise " +
        "scan and no LCP recursion. Output: per-doc duplicated- " +
        "position counts. The oracle recomputes the marks off " +
        "DuckDB's own suffix sort with lag/lead prefix equality.",
      (s, dir) => graft.operators.SuffixArray
        .dupMarks(graft.operators.SuffixArray
          .build(t(s, dir, "documents"), "doc_id", "text"), minLen = 30)
        .groupBy("doc_id")
        .agg(sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup"),
          count(lit(1)).as("n_pos"))
        .orderBy("doc_id"),
      Some("""WITH sfx AS (
        |  SELECT doc_id,
        |    unnest(range(0, CAST(length(text) AS BIGINT))) AS off,
        |    text FROM documents),
        |s2 AS (SELECT doc_id, off,
        |  substr(text, CAST(off + 1 AS INT)) AS s FROM sfx),
        |ord AS (SELECT doc_id, off, s,
        |  row_number() OVER (ORDER BY s, doc_id, off) AS rn FROM s2),
        |marked AS (SELECT doc_id,
        |  (substr(s, 1, 30) = substr(lag(s)  OVER (ORDER BY rn), 1, 30)
        |   OR
        |   substr(s, 1, 30) = substr(lead(s) OVER (ORDER BY rn), 1, 30))
        |  AND length(s) >= 30 AS dup FROM ord)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  count(*) AS n_pos
        |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("d80_bpe_train",
      "BPE vocabulary TRAINING (Sennrich et al. ACL 2016; " +
        "graft.operators.BpeTrain): learn the tokenizer's merge table " +
        "from the corpus — 8 rounds of corpus-weighted pair argmax " +
        "(ties count DESC then pair ASC) + greedy merge apply. The " +
        "corpus is scanned ONCE (word counts); every round after runs " +
        "on the vocabulary-sized symbol table, and the merge applies " +
        "as a literal left-to-right string replace — which IS BPE's " +
        "non-overlapping greedy order and exists identically in " +
        "DuckDB, so the oracle replays the whole training loop as 8 " +
        "chained MATERIALIZED CTE stages and must reproduce the merge " +
        "table bit-for-bit.",
      (s, dir) => graft.operators.BpeTrain
        .train(t(s, dir, "documents"), "text", nMerges = 8)
        .orderBy("step"),
      Some {
        def stage(i: Int): String = {
          val prev = s"r${i - 1}"
          s"""pc$i AS MATERIALIZED (
            |  SELECT p, CAST(SUM(cnt) AS BIGINT) AS n FROM (
            |    SELECT unnest(list_transform(generate_series(1, len(l) - 1),
            |      k -> l[k] || ' ' || l[k+1])) AS p, cnt
            |    FROM (SELECT string_split(s, '  ') AS l, cnt FROM $prev))
            |  GROUP BY p),
            |b$i AS MATERIALIZED (
            |  SELECT p, n FROM pc$i ORDER BY n DESC, p ASC LIMIT 1),
            |r$i AS MATERIALIZED (
            |  SELECT trim(replace('  ' || s || '  ',
            |    ' ' || split_part((SELECT p FROM b$i), ' ', 1) || '  ' ||
            |      split_part((SELECT p FROM b$i), ' ', 2) || ' ',
            |    ' ' || replace((SELECT p FROM b$i), ' ', '') || ' '))
            |    AS s, cnt
            |  FROM $prev)""".stripMargin
        }
        val k = 8
        s"""WITH r0 AS MATERIALIZED (
          |  SELECT array_to_string(string_split(w, ''), '  ') AS s,
          |         CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM (SELECT unnest(string_split(text, ' ')) AS w
          |        FROM documents)
          |  WHERE length(w) > 0 GROUP BY w),
          |${(1 to k).map(stage).mkString(",\n")}
          |${(1 to k).map(i => s"SELECT $i AS step, " +
            s"(SELECT p FROM b$i) AS pair, (SELECT n FROM b$i) AS n")
            .mkString("\nUNION ALL\n")}
          |ORDER BY step""".stripMargin
      }),

    Q("d81_bpe_tokenize",
      "BPE tokenization with the LEARNED merge table — d80's apply " +
        "phase (BpeTrain.tokenCounts), closing the train-then-encode " +
        "loop: train 8 merges on the corpus (bounded driver " +
        "artifact), replay them in training order over word TYPES " +
        "with the same double-space greedy replace (BPE inference IS " +
        "training replay — its defining property), then join word " +
        "instances back to their type's segmentation and sum tokens " +
        "per document. The oracle re-trains AND re-applies in one CTE " +
        "chain, so a drift anywhere in train or apply fails the gate.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = graft.operators.BpeTrain
          .train(docs, "text", nMerges = 8)
          .orderBy("step").select("pair")
          .collect().map(_.getString(0)).toSeq
        graft.operators.BpeTrain
          .tokenCounts(docs, "doc_id", "text", merges)
          .orderBy("doc_id")
      },
      Some(s"""${bpeTokenCountsCte(8)}
        |SELECT doc_id, n_tokens FROM tok ORDER BY doc_id""".stripMargin)),

    Q("d92_bpe_train_batched",
      "BATCHED BPE training (BpeTrain.trainBatched — VERDICT r09 #6): " +
        "d80's exact trainer pays one driver round-trip per merge, so " +
        "a 32k vocabulary means 32k Spark jobs; this learns a BATCH " +
        "per round — rank pairs by (count DESC, pair ASC), keep the " +
        "top-8 window, GREEDILY admit the maximal rank-order disjoint " +
        "subset (a pair is admitted iff none of its symbols {a, b, " +
        "ab} was used by an already-admitted pair — so admitted pairs " +
        "are pairwise disjoint INCLUDING merge results, the round's " +
        "replaces commute, and one chained pass applies them all). " +
        "Divergence from Sennrich's order is documented on the " +
        "operator (post-first pairs use pre-round counts; batchSize=1 " +
        "degenerates to the exact trainer, spec-proved). Round 11: " +
        "the gated path is trainIncremental — FastBPE's delta update, " +
        "where the pair-count table is MAINTAINED (only words " +
        "containing an admitted pair's pattern change any count, so " +
        "each round explodes pairs over the TOUCHED words only; " +
        "bit-identical to trainBatched, spec-proved, and measured at " +
        "5k+ merges in the bpe scale arm). The oracle " +
        "replays all 4 rounds — window, the greedy admission as a " +
        "LINEAR RECURSIVE CTE carrying the admitted-symbol set, the " +
        "list_reduce'd replace chain — and must reproduce the merge " +
        "table bit-for-bit, admission pattern included.",
      (s, dir) => graft.operators.BpeTrain
        .trainIncremental(t(s, dir, "documents"), "text",
          nRounds = 4, batchSize = 8)
        .orderBy("step"),
      Some {
        def stage(i: Int): String = {
          val prev = s"r${i - 1}"
          s"""pc$i AS MATERIALIZED (
            |  SELECT p, CAST(SUM(cnt) AS BIGINT) AS n FROM (
            |    SELECT unnest(list_transform(generate_series(1, len(l) - 1),
            |      k -> l[k] || ' ' || l[k+1])) AS p, cnt
            |    FROM (SELECT string_split(s, '  ') AS l, cnt FROM $prev))
            |  GROUP BY p),
            |w$i AS MATERIALIZED (
            |  SELECT p, n, row_number() OVER (ORDER BY n DESC, p ASC) AS rk,
            |    split_part(p, ' ', 1) AS a, split_part(p, ' ', 2) AS b,
            |    replace(p, ' ', '') AS ab
            |  FROM pc$i ORDER BY n DESC, p ASC LIMIT 8),
            |g$i(rk, used, adm) AS (
            |  SELECT 0, []::VARCHAR[], false
            |  UNION ALL
            |  SELECT w.rk,
            |    CASE WHEN NOT (list_contains(g.used, w.a) OR
            |                   list_contains(g.used, w.b) OR
            |                   list_contains(g.used, w.ab))
            |         THEN list_concat(g.used, [w.a, w.b, w.ab])
            |         ELSE g.used END,
            |    NOT (list_contains(g.used, w.a) OR
            |         list_contains(g.used, w.b) OR
            |         list_contains(g.used, w.ab))
            |  FROM g$i g JOIN w$i w ON w.rk = g.rk + 1),
            |adm$i AS MATERIALIZED (
            |  SELECT w.p, w.n, w.rk, w.a, w.b FROM w$i w
            |  JOIN g$i g ON g.rk = w.rk WHERE g.adm),
            |r$i AS MATERIALIZED (
            |  SELECT trim(list_reduce(
            |    list_prepend('  ' || s || '  ',
            |      (SELECT COALESCE(
            |         list(' ' || a || '  ' || b || ' ' ORDER BY rk), [])
            |       FROM adm$i)),
            |    (acc, x) -> replace(acc, x,
            |      ' ' || replace(trim(x), '  ', '') || ' '))) AS s, cnt
            |  FROM $prev)""".stripMargin
        }
        val k = 4
        s"""WITH RECURSIVE r0 AS MATERIALIZED (
          |  SELECT array_to_string(string_split(w, ''), '  ') AS s,
          |         CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM (SELECT unnest(string_split(text, ' ')) AS w
          |        FROM documents)
          |  WHERE length(w) > 0 GROUP BY w),
          |${(1 to k).map(stage).mkString(",\n")},
          |allm AS (${(1 to k)
            .map(i => s"SELECT $i AS round, rk, p, n FROM adm$i")
            .mkString(" UNION ALL ")})
          |SELECT CAST(row_number() OVER (ORDER BY round, rk) AS BIGINT)
          |    AS step,
          |  CAST(round AS BIGINT) AS round, p AS pair, n
          |FROM allm ORDER BY step""".stripMargin
      }),

    Q("d96_passage_chunks",
      "Token-window passage chunking (TextAnalysis.chunkExprs) — the " +
        "embedding/RAG prep op every retrieval pipeline runs before " +
        "vectorizing: 64-token windows advancing by 48 (16-token " +
        "overlap preserves context across boundaries), chunk count " +
        "ceil((n-overlap)/step) so the tail window is emitted once " +
        "and never as an overlap-contained duplicate. Pure per-row " +
        "codegen'd array expressions — zero shuffle; at 100 TB this " +
        "rides the corpus scan. Output: (doc_id, chunk_id, n_tokens, " +
        "chunk); the oracle replays the window arithmetic with " +
        "DuckDB's 1-based inclusive list slicing, which must agree " +
        "with Spark's slice(arr, start, length) element-for-element.",
      (s, dir) => t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          explode(graft.operators.TextAnalysis
            .chunkExprs(col("text"), size = 64, overlap = 16)).as("c"))
        .select(col("doc_id"), col("c.chunk_id"), col("c.n_tokens"),
          col("c.chunk"))
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents WHERE length(text) > 0),
        |c AS (
        |  SELECT doc_id, toks, n, unnest(range(0,
        |    CASE WHEN n <= 64 THEN 1
        |         ELSE CAST(ceil((n - 16) / 48.0) AS BIGINT) END))
        |    AS chunk_id
        |  FROM d)
        |SELECT doc_id, chunk_id,
        |  CAST(len(toks[chunk_id * 48 + 1 :
        |               least(chunk_id * 48 + 64, n)]) AS BIGINT)
        |    AS n_tokens,
        |  array_to_string(toks[chunk_id * 48 + 1 :
        |                       least(chunk_id * 48 + 64, n)], ' ')
        |    AS chunk
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    Q("d97_stupid_backoff_ppl",
      "Count-based LM quality scoring with STUPID BACKOFF (Brants et " +
        "al. EMNLP 2007 — the distributed web-scale LM recipe behind " +
        "the CCNet/KenLM perplexity-filter family): one corpus pass " +
        "builds positions, unigram/bigram counts are hash " +
        "aggregations over it, and each token scores " +
        "ln(cb/cu(prev)) when its bigram was seen, ln(0.4·cu/N) on " +
        "backoff, ln(cu/N) with no context — scores, not normalized " +
        "probabilities, which is exactly why no discount-estimation " +
        "pass is needed at web scale. Per-doc mean log-score is the " +
        "filter signal (low = gibberish/boilerplate/wrong-language " +
        "under the corpus LM). Joins are declarative — broadcastable " +
        "count tables here, shuffle joins on (prev, w) at 100 TB. " +
        "Determinism: per-token ln rounds to 9 dp, DECIMAL sum, mean " +
        "rounds to 6 (the BM25 discipline).",
      (s, dir) => graft.operators.NgramLm
        .docScores(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH l0 AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |pos AS (
        |  SELECT doc_id, CAST(o - 1 AS BIGINT) AS i, l[o] AS w
        |  FROM l0, unnest(generate_series(1, len(l))) AS t(o)
        |  WHERE length(l[o]) > 0),
        |prevs AS (SELECT doc_id, i + 1 AS i, w AS prev FROM pos),
        |uni AS (SELECT w, COUNT(*) AS cu FROM pos GROUP BY w),
        |tot AS (SELECT COUNT(*) AS n_total FROM pos),
        |big AS (SELECT prev, w, COUNT(*) AS cb
        |        FROM prevs JOIN pos USING (doc_id, i) GROUP BY prev, w),
        |sc AS (
        |  SELECT p.doc_id,
        |    round(CASE
        |      WHEN pr.prev IS NULL THEN ln(CAST(u.cu AS DOUBLE) / n_total)
        |      WHEN b.cb IS NOT NULL THEN ln(CAST(b.cb AS DOUBLE) / up.cu)
        |      ELSE ln(0.4 * CAST(u.cu AS DOUBLE) / n_total) END, 9) AS lp
        |  FROM pos p
        |  LEFT JOIN prevs pr USING (doc_id, i)
        |  JOIN uni u ON u.w = p.w
        |  LEFT JOIN uni up ON up.w = pr.prev
        |  LEFT JOIN big b ON b.prev = pr.prev AND b.w = p.w,
        |  tot)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  round(CAST(SUM(CAST(lp AS DECIMAL(28,9))) AS DOUBLE)
        |        / COUNT(*), 6) AS avg_logp
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("d98_dsir_importance",
      "DSIR importance weights (Xie et al. NeurIPS 2023 — Data " +
        "Selection via Importance Resampling): every raw doc scored " +
        "by log w = Σ over its hashed n-gram features of " +
        "[ln p_target(b) − ln p_raw(b)], features = unigrams ∪ " +
        "bigrams md5-hashed into 256 buckets, both distributions " +
        "Laplace-smoothed histograms; target here = doc_id % 7 = 0 " +
        "(a deterministic stand-in for a curated corpus). The " +
        "importance model is O(buckets) — λ(b) is a 256-row " +
        "broadcast, so at 100 TB the plan is one feature explode + " +
        "hash aggs + a broadcast-join fold, nothing corpus-sized in " +
        "driver or model state (the paper's scalability point, kept " +
        "structurally). λ rounds to 9 dp, DECIMAL sum, final 6.",
      (s, dir) => graft.operators.Dsir
        .logImportanceWeights(t(s, dir, "documents"), "doc_id", "text",
          isTarget = col("doc_id") % 7 === 0)
        .orderBy("doc_id"),
      Some("""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |feats AS (
        |  SELECT doc_id, u.f FROM toks, unnest(list_concat(t,
        |    CASE WHEN len(t) >= 2 THEN
        |      list_transform(generate_series(1, len(t) - 1),
        |        k -> t[k] || ' ' || t[k+1])
        |    ELSE [] END)) AS u(f)),
        |fb AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS b
        |  FROM feats),
        |raw AS (SELECT b, COUNT(*) AS cr FROM fb GROUP BY b),
        |tgtc AS (SELECT b, COUNT(*) AS ct FROM fb
        |         WHERE doc_id % 7 = 0 GROUP BY b),
        |tots AS (SELECT COUNT(*) AS nr,
        |    COUNT(*) FILTER (doc_id % 7 = 0) AS nt FROM fb),
        |lam AS (
        |  SELECT r.b,
        |    round(ln((COALESCE(ct, 0) + 1.0) / (nt + 256.0)) -
        |          ln((cr + 1.0) / (nr + 256.0)), 9) AS lam
        |  FROM raw r LEFT JOIN tgtc USING (b), tots)
        |SELECT doc_id, COUNT(*) AS n_feats,
        |  round(CAST(SUM(CAST(lam AS DECIMAL(28,9))) AS DOUBLE), 6)
        |    AS log_weight
        |FROM fb JOIN lam USING (b)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("d99_edit_distance_pairs",
      "Character-level fuzzy near-dup via EDIT DISTANCE — the " +
        "classic fuzzy-match family next to the token-set ones (d09 " +
        "Jaccard, d07 MinHash, d08 SimHash): Fuzzy.blockedLevPairs " +
        "turns the pigeonhole LENGTH prefilter (lev(a,b) >= " +
        "|len(a) - len(b)|) into an EQUI-JOIN on floor(len/40) " +
        "length buckets with adjacent-bucket probing — a |Δlen| <= " +
        "40 pair spans at most two adjacent buckets, so the " +
        "quadratic distance step runs per bucket under a shuffled " +
        "equi-join, never a corpus-wide nested loop; provably " +
        "lossless (each qualifying pair matches exactly one join " +
        "arm), Scale's fuzzy arm asserts zero lost pairs at " +
        "1×/10×/30×. Normalized similarity 1 − lev/max(len), " +
        "threshold 0.3. Spark's levenshtein and DuckDB's must agree " +
        "exactly — the oracle is the unblocked theta-join pipeline.",
      (s, dir) => graft.operators.Fuzzy
        .blockedLevPairs(t(s, dir, "documents")
          .filter(col("doc_id") < 40), "doc_id", "text",
          maxDeltaLen = 40, minSim = 0.3)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH d AS (
        |  SELECT doc_id, text, length(text) AS n FROM documents
        |  WHERE doc_id < 40)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
        |  round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) /
        |        greatest(a.n, b.n), 6) AS sim
        |FROM d a JOIN d b
        |  ON a.doc_id < b.doc_id AND abs(a.n - b.n) <= 40
        |WHERE round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) /
        |      greatest(a.n, b.n), 6) >= 0.3
        |ORDER BY doc_a, doc_b""".stripMargin)),

    Q("m12_audio_fingerprint_neardup",
      "AUDIO near-dup — the acoustic counterpart of m09's image " +
        "dHash, closing the modality set: Haitsma & Kalker's " +
        "fingerprint (ISMIR 2002, the Philips hash) = SIGNS of " +
        "frame-energy differences over a fixed grid (65 overlapping " +
        "16-byte PCM frames every 4, bit k = E(k+1) > E(k)), robust " +
        "because perturbations move energies but rarely flip an " +
        "inequality — the planted 're-encode' (every letter shifted " +
        "one alphabet slot, a deterministic volume-shift stand-in) " +
        "lands within Hamming <= 1 of its original for every " +
        "fixture doc, measured. Pairs via PHash.nearDupPairs " +
        "VERBATIM (same (hi, lo) layout): dist-0 equality join + " +
        "4x16-bit banded Hamming, pigeonhole-lossless to distance 3. " +
        "The oracle recomputes fingerprints and pairs closed-form.",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .filter(col("doc_id") < 120 && length(col("text")) >= 276 &&
            octet_length(col("text")) === length(col("text")))
        val shifted = base.select(
          (col("doc_id") + 100000).as("doc_id"),
          translate(col("text"), "abcdefghijklmnopqrstuvwxyz",
            "bcdefghijklmnopqrstuvwxyza").as("text"))
        // Pinned (round 19): the fingerprint is a ~2000-node
        // higher-order expression (65 frames × 16 substr+ascii each)
        // that HOF evaluation runs INTERPRETED, and nearDupPairs
        // consumes the hash relation from several join sides — raw
        // lineage re-evaluated the giant expression once per consumer
        // (Verify wall at sf0.01: 48.8 s → 7.1 s with the pin, and
        // that residue includes the run's JVM warmup; the frame is
        // one (hi, lo) row per doc, tiny).
        val hashes = graft.operators.AudioFp.fingerprint(
          base.select("doc_id", "text").unionByName(shifted),
          "doc_id", "text").localCheckpoint()
        graft.operators.PHash.nearDupPairs(hashes, maxDist = 3)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id < 120 AND length(text) >= 276
        |    AND octet_length(CAST(text AS BLOB)) = length(text)),
        |alldocs AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    translate(text, 'abcdefghijklmnopqrstuvwxyz',
        |              'bcdefghijklmnopqrstuvwxyza')
        |  FROM base),
        |e AS (
        |  SELECT doc_id, list_transform(generate_series(0, 64), i ->
        |    list_reduce(list_transform(generate_series(1, 16), j ->
        |      unicode(substr(text, CAST(i * 4 + j AS INT), 1)) *
        |      unicode(substr(text, CAST(i * 4 + j AS INT), 1))),
        |      (a, b) -> a + b)) AS es
        |  FROM alldocs),
        |bits AS (
        |  SELECT doc_id, list_transform(generate_series(1, 64), k ->
        |    CASE WHEN es[k + 1] > es[k] THEN 1 ELSE 0 END) AS b
        |  FROM e),
        |h AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, 32),
        |        k -> CAST(b[k] AS BIGINT))),
        |      (acc, x) -> acc * 2 + x) AS hi,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(33, 64),
        |        k -> CAST(b[k] AS BIGINT))),
        |      (acc, x) -> acc * 2 + x) AS lo
        |  FROM bits),
        |same AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(0 AS BIGINT) AS dist
        |  FROM h a JOIN h b
        |    ON a.hi = b.hi AND a.lo = b.lo AND a.doc_id < b.doc_id),
        |dh AS (SELECT DISTINCT hi, lo FROM h),
        |hp AS (
        |  SELECT x.hi AS ahi, x.lo AS alo, y.hi AS bhi, y.lo AS blo,
        |    CAST(bit_count(xor(x.hi, y.hi)) +
        |         bit_count(xor(x.lo, y.lo)) AS BIGINT) AS dist
        |  FROM dh x JOIN dh y
        |    ON (x.hi < y.hi OR (x.hi = y.hi AND x.lo < y.lo))),
        |near AS (
        |  SELECT least(hx.doc_id, hy.doc_id) AS doc_a,
        |    greatest(hx.doc_id, hy.doc_id) AS doc_b, hp.dist
        |  FROM hp
        |  JOIN h hx ON hx.hi = hp.ahi AND hx.lo = hp.alo
        |  JOIN h hy ON hy.hi = hp.bhi AND hy.lo = hp.blo
        |  WHERE hp.dist <= 3)
        |SELECT * FROM (SELECT * FROM same UNION ALL
        |               SELECT * FROM near)
        |ORDER BY doc_a, doc_b""".stripMargin)),

    Q("d100_pipeline_funnel",
      "End-to-end training-data pipeline FUNNEL — the acceptance " +
        "artifact a curation run reports: raw corpus → token-length " +
        "gate (20–500) → stopword-ratio quality gate (>= 0.02) → " +
        "exact dedup (md5 keep-min-doc_id) → 64/16 passage chunks, " +
        "all five survivor counts from ONE corpus scan: the gates " +
        "are pure functions of text, so every row of an md5(text) " +
        "window partition shares them and the unconditional " +
        "row_number equals the post-filter dedup rank for surviving " +
        "partitions — one pass computes flags + rank, one aggregate " +
        "emits the five counts as conditional sums (no union of " +
        "per-stage aggregates, which would re-scan the corpus per " +
        "branch). Composes the gated primitives (d02 token stats, " +
        "d03 quality, d01 dedup, d96 chunking); the oracle replays " +
        "all five stages.",
      (s, dir) => {
        val TA2 = graft.operators.TextAnalysis
        val flagged = t(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            size(TA2.tokens(col("text"))).cast("long").as("n_tok"),
            TA2.stopwordCount(TA2.tokens(col("text"))).as("n_stop"))
          .withColumn("len_ok", col("n_tok").between(20, 500))
          .withColumn("qual_ok", col("len_ok") &&
            col("n_stop").cast("double") / col("n_tok") >= 0.02)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
        val keep = col("qual_ok") && col("rn") === 1
        flagged.agg(
            count(lit(1)).as("n1"),
            count(when(col("len_ok"), 1)).as("n2"),
            count(when(col("qual_ok"), 1)).as("n3"),
            count(when(keep, 1)).as("n4"),
            coalesce(sum(when(keep,
              size(TA2.chunkExprs(col("text"), 64, 16)).cast("long"))),
              lit(0L)).as("n5"))
          .select(explode(array(
            struct(lit(1).as("stage"), lit("raw").as("name"),
              col("n1").as("n")),
            struct(lit(2).as("stage"), lit("length").as("name"),
              col("n2").as("n")),
            struct(lit(3).as("stage"), lit("quality").as("name"),
              col("n3").as("n")),
            struct(lit(4).as("stage"), lit("exact_dedup").as("name"),
              col("n4").as("n")),
            struct(lit(5).as("stage"), lit("chunks").as("name"),
              col("n5").as("n")))).as("r"))
          .select(col("r.stage").as("stage"), col("r.name").as("name"),
            col("r.n").as("n"))
          .orderBy("stage")
      },
      Some(FunnelOracleSql)),

    Q("d102_funnel_neardup",
      "SIX-stage curation funnel — d100 plus the banded-LSH NEAR-dup " +
        "stage real curation runs after exact dedup (CCNet/Gopher → " +
        "MinHash order): raw → length → quality → exact dedup → " +
        "near-dup (d07's banded MinHash verbatim over the survivors; " +
        "a doc drops iff it shares any band bucket with a smaller-id " +
        "survivor — keep-best = min id, the d24 discipline) → 64/16 " +
        "chunks. One corpus scan computes gate flags + the dedup " +
        "rank, then the lineage is PINNED (localCheckpoint — the " +
        "near-dup self-join would otherwise re-derive the scan+window " +
        "on both sides, the d100-r10 lesson); stages 1–4 come from " +
        "one conditional-sum aggregate, stages 5–6 from one aggregate " +
        "over the survivor set. The oracle replays all six stages, " +
        "LSH included.",
      (s, dir) => {
        val TA2 = graft.operators.TextAnalysis
        val flagged = t(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            size(TA2.tokens(col("text"))).cast("long").as("n_tok"),
            TA2.stopwordCount(TA2.tokens(col("text"))).as("n_stop"))
          .withColumn("len_ok", col("n_tok").between(20, 500))
          .withColumn("qual_ok", col("len_ok") &&
            col("n_stop").cast("double") / col("n_tok") >= 0.02)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
          .localCheckpoint()
        val keep = col("qual_ok") && col("rn") === 1
        val s3 = flagged.filter(keep)
          .select("doc_id", "text", "n_tok")
        val dropped = graft.operators.Dedup.candidatePairs(
            graft.operators.Dedup.minhashBands(s3, "doc_id", "text"),
            "doc_id")
          .select(col("d2").as("doc_id")).distinct()
        val s4 = s3.join(dropped, Seq("doc_id"), "left_anti")
        val head = flagged.agg(
          count(lit(1)).as("n1"),
          count(when(col("len_ok"), 1)).as("n2"),
          count(when(col("qual_ok"), 1)).as("n3"),
          count(when(keep, 1)).as("n4"))
        val tail = s4.agg(
          count(lit(1)).as("n5"),
          coalesce(sum(when(col("n_tok") <= 64, 1L).otherwise(
            ceil((col("n_tok") - lit(16)).cast("double") / 48.0)
              .cast("long"))), lit(0L)).as("n6"))
        head.crossJoin(tail)
          .select(explode(array(
            struct(lit(1).as("stage"), lit("raw").as("name"),
              col("n1").as("n")),
            struct(lit(2).as("stage"), lit("length").as("name"),
              col("n2").as("n")),
            struct(lit(3).as("stage"), lit("quality").as("name"),
              col("n3").as("n")),
            struct(lit(4).as("stage"), lit("exact_dedup").as("name"),
              col("n4").as("n")),
            struct(lit(5).as("stage"), lit("near_dup").as("name"),
              col("n5").as("n")),
            struct(lit(6).as("stage"), lit("chunks").as("name"),
              col("n6").as("n")))).as("r"))
          .select(col("r.stage").as("stage"), col("r.name").as("name"),
            col("r.n").as("n"))
          .orderBy("stage")
      },
      Some(FunnelNearDupOracleSql)),

    Q("w33_streaming_funnel",
      "The d100 curation funnel as a LIVE INGEST — documents arrive " +
        "in micro-batches (repartitioned NDJSON, maxFilesPerTrigger)" +
        " and foreachBatch applies the per-doc gates, dedups against " +
        "a PERSISTED seen-hash store (parquet on disk — data, not " +
        "checkpoint, the w28 discipline: batch survivors anti-join " +
        "the store as read, only NEW hashes append back), and " +
        "accumulates the five stage counters as exact driver-side " +
        "integer adds — all five observed on the ONE store-append " +
        "action per batch via Dataset.observe (the w29/q85 " +
        "discipline: a multi-action foreachBatch body re-scans its " +
        "source per action). Every stage count is BATCHING-INVARIANT: " +
        "per-doc gates are additive, cross-batch dedup counts " +
        "distinct hashes regardless of which arrival won, and equal " +
        "texts chunk equally — so the oracle is d100's VERBATIM and " +
        "any micro-batch split must reproduce the batch funnel " +
        "exactly.",
      (s, dir) => {
        import s.implicits._
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-w33").toString
        try {
          t(s, dir, "documents")
            .select(to_json(struct(col("doc_id"), col("text")))
              .as("value"))
            .repartition(12)
            .write.mode("overwrite").text(s"$tmp/in")
          val store = s"$tmp/store"
          // seed an empty store so the first batch's anti-join has a
          // dir to read (same schema as every later append)
          s.range(0).select(md5(col("id").cast("string")).as("h"))
            .write.mode("overwrite").parquet(store)
          val nRaw = new java.util.concurrent.atomic.AtomicLong(0L)
          val nLen = new java.util.concurrent.atomic.AtomicLong(0L)
          val nQual = new java.util.concurrent.atomic.AtomicLong(0L)
          val nDedup = new java.util.concurrent.atomic.AtomicLong(0L)
          val nChunks = new java.util.concurrent.atomic.AtomicLong(0L)
          val TA2 = graft.operators.TextAnalysis
          val q = s.readStream
            .schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", "3")
            .json(s"$tmp/in")
            .writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             batchId: Long) =>
              if (!batch.isEmpty) {
                val gateObs = new org.apache.spark.sql.Observation(
                  s"w33_gates_$batchId")
                val freshObs = new org.apache.spark.sql.Observation(
                  s"w33_fresh_$batchId")
                val qualOk = col("n_tok").between(20, 500) &&
                  col("n_stop").cast("double") / col("n_tok") >= 0.02
                // one row per distinct hash among quality survivors
                // (equal texts share n_tok, so min is a determinate
                // pick), anti-joined against the store AS READ; the
                // three per-doc gate counters and the two
                // post-dedup counters all observe the SAME plan
                val fresh = batch
                  .select(col("doc_id"), col("text"),
                    size(TA2.tokens(col("text"))).cast("long")
                      .as("n_tok"),
                    TA2.stopwordCount(TA2.tokens(col("text")))
                      .as("n_stop"))
                  .observe(gateObs,
                    count(lit(1)).as("raw"),
                    count(when(col("n_tok").between(20, 500), 1))
                      .as("len"),
                    count(when(qualOk, 1)).as("qual"))
                  .filter(qualOk)
                  .groupBy(md5(col("text")).as("h"))
                  .agg(min(col("n_tok")).as("n_tok"))
                  .join(s.read.parquet(store), Seq("h"), "left_anti")
                  .observe(freshObs,
                    count(lit(1)).as("dedup"),
                    coalesce(sum(
                      when(col("n_tok") <= 64, 1L).otherwise(
                        ceil((col("n_tok") - lit(16)).cast("double") /
                          48.0).cast("long"))), lit(0L)).as("chunks"))
                // the ONE action per batch: metrics ride the append
                fresh.select("h").write.mode("append").parquet(store)
                val g = gateObs.get
                val f = freshObs.get
                nRaw.addAndGet(g("raw").asInstanceOf[Long])
                nLen.addAndGet(g("len").asInstanceOf[Long])
                nQual.addAndGet(g("qual").asInstanceOf[Long])
                nDedup.addAndGet(f("dedup").asInstanceOf[Long])
                nChunks.addAndGet(f("chunks").asInstanceOf[Long])
                ()
              }
            }
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger
              .AvailableNow())
            .start()
          q.awaitTermination()
          Seq((1, "raw", nRaw.get()), (2, "length", nLen.get()),
            (3, "quality", nQual.get()),
            (4, "exact_dedup", nDedup.get()),
            (5, "chunks", nChunks.get()))
            .toDF("stage", "name", "n")
            .orderBy("stage")
        } finally Rm.rf(tmp)
      },
      Some(FunnelOracleSql)),

    Q("w34_streaming_funnel_neardup",
      "The d102 SIX-stage funnel as LIVE ingest with TWO persisted " +
        "stores (parquet on disk — data, not checkpoint, the w28 " +
        "discipline): a seen-hash store gates exact dedup and a " +
        "band-bucket store gates near-dup, each batch anti-joining " +
        "the stores AS READ and appending its new entries back. " +
        "Ingest is ID-ORDERED (range-partitioned files with " +
        "monotonic mtimes — the nightly-crawl shape where ids are " +
        "assigned monotonically at ingest), so every doc's potential " +
        "smaller-id bucket-sharers arrive in the same or an earlier " +
        "micro-batch and the online first-writer-wins bucket gate " +
        "decides EXACTLY the batch semantics (drop iff a smaller-id " +
        "exact-dedup survivor shares a band bucket) — w26 covers the " +
        "out-of-order regime where an online gate necessarily " +
        "diverges. All six counters are batch-split invariant under " +
        "that ordering, so the oracle is d102's VERBATIM.",
      (s, dir) => {
        import s.implicits._
        val TA2 = graft.operators.TextAnalysis
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-w34").toString
        try {
          val docs = t(s, dir, "documents")
            .select(col("doc_id"), col("text"))
          val maxId = docs.agg(max("doc_id")).head().getLong(0)
          val span = maxId / 12 + 1
          new java.io.File(s"$tmp/in").mkdirs()
          val t0 = System.currentTimeMillis() - 3600000L
          (0 until 12).foreach { i =>
            val pdir = s"$tmp/stage_$i"
            docs.filter(col("doc_id") >= i * span &&
                col("doc_id") < (i + 1) * span)
              .select(to_json(struct(col("doc_id"), col("text")))
                .as("value"))
              .coalesce(1).write.mode("overwrite").text(pdir)
            val src = new java.io.File(pdir).listFiles()
              .find(_.getName.startsWith("part-")).get
            val dst = new java.io.File(s"$tmp/in/" + f"$i%05d.json")
            java.nio.file.Files.move(src.toPath, dst.toPath)
            dst.setLastModified(t0 + i * 2000L)
            Rm.rf(pdir)
          }
          val hstore = s"$tmp/hstore"
          val bstore = s"$tmp/bstore"
          s.range(0).select(md5(col("id").cast("string")).as("h"))
            .write.mode("overwrite").parquet(hstore)
          s.range(0).select(lit(0).cast("int").as("j"),
              col("id").as("sig"))
            .write.mode("overwrite").parquet(bstore)
          val nRaw = new java.util.concurrent.atomic.AtomicLong(0L)
          val nLen = new java.util.concurrent.atomic.AtomicLong(0L)
          val nQual = new java.util.concurrent.atomic.AtomicLong(0L)
          val nDedup = new java.util.concurrent.atomic.AtomicLong(0L)
          val nNear = new java.util.concurrent.atomic.AtomicLong(0L)
          val nChunks = new java.util.concurrent.atomic.AtomicLong(0L)
          val q = s.readStream
            .schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", "3")
            .json(s"$tmp/in")
            .writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             _: Long) =>
              if (!batch.isEmpty) {
                val staged = batch
                  .select(col("doc_id"), col("text"),
                    size(TA2.tokens(col("text"))).cast("long")
                      .as("n_tok"),
                    TA2.stopwordCount(TA2.tokens(col("text")))
                      .as("n_stop"))
                  .persist()
                try {
                  nRaw.addAndGet(staged.count())
                  val s1 = staged.filter(col("n_tok").between(20, 500))
                  nLen.addAndGet(s1.count())
                  val s2 = s1.filter(col("n_stop").cast("double") /
                    col("n_tok") >= 0.02)
                  nQual.addAndGet(s2.count())
                  // exact-dedup gate: one row per NEW hash, its
                  // min-id row carried whole (ordered ingest makes
                  // the first arrival the global min)
                  val fresh = s2
                    .groupBy(md5(col("text")).as("h"))
                    .agg(min(struct(col("doc_id"), col("text"),
                      col("n_tok"))).as("m"))
                    .join(s.read.parquet(hstore), Seq("h"),
                      "left_anti")
                    .select(col("h"), col("m.doc_id").as("doc_id"),
                      col("m.text").as("text"),
                      col("m.n_tok").as("n_tok"))
                    .localCheckpoint()
                  nDedup.addAndGet(fresh.count())
                  // near-dup gate: dropped iff a band bucket is owned
                  // by the store (an earlier batch's survivor —
                  // smaller id by ordering) or by a smaller-id doc of
                  // THIS batch
                  val bands = graft.operators.Dedup.minhashBands(
                      fresh.select("doc_id", "text"), "doc_id", "text")
                    .localCheckpoint()
                  val dropStore = bands
                    .join(s.read.parquet(bstore), Seq("j", "sig"),
                      "left_semi")
                    .select("doc_id")
                  val dropBatch = bands
                    .join(bands.groupBy("j", "sig")
                      .agg(min(col("doc_id")).as("mn")), Seq("j", "sig"))
                    .filter(col("mn") < col("doc_id"))
                    .select("doc_id")
                  val kept = fresh
                    .join(dropStore.unionByName(dropBatch).distinct(),
                      Seq("doc_id"), "left_anti")
                    .localCheckpoint()
                  nNear.addAndGet(kept.count())
                  nChunks.addAndGet(kept.agg(coalesce(sum(
                      when(col("n_tok") <= 64, 1L).otherwise(
                        ceil((col("n_tok") - lit(16)).cast("double") /
                          48.0).cast("long"))), lit(0L)))
                    .head().getLong(0))
                  // store updates: EVERY exact-dedup survivor's hash
                  // and band buckets register (a doc dropped at
                  // stage 5 still owns its buckets — d102's pairs
                  // CTE pairs against all s3 survivors)
                  fresh.select("h").write.mode("append")
                    .parquet(hstore)
                  bands.select("j", "sig").distinct()
                    .write.mode("append").parquet(bstore)
                } finally { staged.unpersist(); () }
              }
            }
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger
              .AvailableNow())
            .start()
          q.awaitTermination()
          Seq((1, "raw", nRaw.get()), (2, "length", nLen.get()),
            (3, "quality", nQual.get()),
            (4, "exact_dedup", nDedup.get()),
            (5, "near_dup", nNear.get()),
            (6, "chunks", nChunks.get()))
            .toDF("stage", "name", "n")
            .orderBy("stage")
        } finally Rm.rf(tmp)
      },
      Some(FunnelNearDupOracleSql)),

    Q("d104_bpe_token_batching",
      "Tokenizer-AWARE dataloader batching — the end of the " +
        "training-data prep line: train the BPE merge table (d80), " +
        "tokenize every document with it (d81's apply), then pack " +
        "docs into fixed batches of 8 sorted by (LEARNED token " +
        "count, doc_id) with padding-waste accounting (d87's " +
        "discipline, but over the tokenizer's true lengths instead " +
        "of whitespace counts — the lengths the GPU actually pads " +
        "to). Per batch: (n_docs, max_len, n_tokens, waste). At " +
        "100 TB: train is vocabulary-bounded, tokenize is one " +
        "type-join pass, the sort is one range exchange + zipIndex " +
        "prefix sum (never a partitionless window). The oracle " +
        "re-trains, re-applies, and replays the batching in one CTE " +
        "chain — drift anywhere in the three stages fails the gate.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = graft.operators.BpeTrain
          .train(docs, "text", nMerges = 8)
          .orderBy("step").select("pair")
          .collect().map(_.getString(0)).toSeq
        val tok = graft.operators.BpeTrain
          .tokenCounts(docs, "doc_id", "text", merges)
          .select(col("doc_id"), col("n_tokens").as("len"))
        graft.operators.SuffixArray
          .zipIndex(tok.orderBy("len", "doc_id"), "idx")
          .withColumn("batch", expr("idx div 8"))
          .groupBy("batch").agg(
            count(lit(1)).as("n_docs"),
            max("len").as("max_len"),
            sum("len").as("n_tokens"),
            (max("len") * count(lit(1)) - sum("len")).as("waste"))
          .orderBy("batch")
      },
      Some(s"""${bpeTokenCountsCte(8)},
        |b AS (SELECT n_tokens AS len,
        |  (row_number() OVER (ORDER BY n_tokens, doc_id) - 1) // 8
        |    AS batch
        |  FROM tok)
        |SELECT batch, COUNT(*) AS n_docs,
        |  CAST(MAX(len) AS BIGINT) AS max_len,
        |  CAST(SUM(len) AS BIGINT) AS n_tokens,
        |  CAST(MAX(len) * COUNT(*) - SUM(len) AS BIGINT) AS waste
        |FROM b GROUP BY batch ORDER BY batch""".stripMargin)),

    Q("d112_tokenizer_eval",
      "Tokenizer quality evaluation — the per-language FERTILITY " +
        "(learned tokens per whitespace word) and COMPRESSION " +
        "(characters per learned token) report every multilingual " +
        "tokenizer ships with: train the BPE table (d80), tokenize " +
        "every doc with it (d81's type-join apply), aggregate by " +
        "language. High fertility on a language = the vocab " +
        "under-serves it (the token-budget fairness metric from the " +
        "NLLB/XLM-R line of work). One corpus pass for per-doc word/" +
        "char counts, one type-join tokenize pass, one lang " +
        "aggregation; ratios are ratios of EXACT long sums, rounded " +
        "at the very end. Oracle replays train + apply + the report.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = graft.operators.BpeTrain
          .train(docs, "text", nMerges = 8)
          .orderBy("step").select("pair")
          .collect().map(_.getString(0)).toSeq
        val tok = graft.operators.BpeTrain
          .tokenCounts(docs, "doc_id", "text", merges)
        docs.select(col("doc_id"), col("lang"),
            size(filter(split(col("text"), " "),
              w => length(w) > 0)).cast("long").as("n_words"),
            length(regexp_replace(col("text"), " ", ""))
              .cast("long").as("n_chars"))
          .join(tok, "doc_id")
          .groupBy("lang").agg(
            count(lit(1)).cast("long").as("n_docs"),
            sum("n_words").cast("long").as("n_words"),
            sum("n_tokens").cast("long").as("n_tokens"),
            sum("n_chars").cast("long").as("n_chars"),
            round(sum("n_tokens").cast("double") / sum("n_words"), 6)
              .as("fertility"),
            round(sum("n_chars").cast("double") / sum("n_tokens"), 6)
              .as("compression"))
          .orderBy("lang")
      },
      Some(s"""${bpeTokenCountsCte(8)},
        |per AS (SELECT doc_id, lang,
        |    len(list_filter(string_split(text, ' '),
        |        w -> len(w) > 0)) AS n_words,
        |    length(replace(text, ' ', '')) AS n_chars
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_words) AS BIGINT) AS n_words,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  round(CAST(SUM(n_tokens) AS DOUBLE) /
        |    CAST(SUM(n_words) AS BIGINT), 6) AS fertility,
        |  round(CAST(SUM(n_chars) AS DOUBLE) /
        |    CAST(SUM(n_tokens) AS BIGINT), 6) AS compression
        |FROM per JOIN tok USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("d108_neardup_decontamination",
      "CROSS-corpus near-dup decontamination (Contamination." +
        "nearDupFlags — the Dolma/FineWeb discipline): training docs " +
        "that are light paraphrases of an eval doc share no exact " +
        "5-gram (d19's check misses them) but collide in MinHash " +
        "band buckets. Both relations band with the d07 integer " +
        "signatures, the BENCHMARK side broadcasts (eval suites ≪ " +
        "corpus), candidates are the band-bucket equi-join across " +
        "the two — never corpus × bench — and only collided pairs " +
        "pay the exact distinct-token Jaccard verify (τ=0.9). " +
        "Benchmark here is the deterministic doc_id%10=0 slice. The " +
        "oracle replays the banding, the cross-join-on-buckets and " +
        "the verify, so the gate checks the implementation, not the " +
        "LSH recall curve.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.operators.Contamination.nearDupFlags(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 10 === 0)
            .select(col("doc_id").as("bench_id"), col("text")),
          "bench_id", "text", minJaccard = 0.9)
          .orderBy("doc_id")
      },
      Some(s"""$decontamCtes
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
        |  MAX(jc) AS max_jaccard
        |FROM ver WHERE jc >= 0.9
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("w36_streaming_decontamination_gate",
      "STREAMED near-dup decontamination ingest gate — d108 at the " +
        "pipeline's front door: the benchmark is STATIC, so its band " +
        "signatures AND token sets are cached ONCE before the stream " +
        "starts (the w35 static-side discipline); training docs " +
        "arrive in micro-batches (range files), and each batch " +
        "bands itself, candidate-joins the broadcast cached bench " +
        "bands, Jaccard-verifies only collisions, and emits the " +
        "SURVIVORS (anti-join of verified leaks). The gate is " +
        "stateless per-doc against a static reference → trivially " +
        "batching-invariant; the oracle replays d108's chain and " +
        "anti-joins it from the corpus slice.",
      (s, dir) => {
        import s.implicits._
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-w36").toString
        val cached = scala.collection.mutable
          .Buffer.empty[org.apache.spark.sql.DataFrame]
        try {
          val docs = t(s, dir, "documents")
          val bench = docs.filter(col("doc_id") % 10 === 0)
            .select(col("doc_id").as("bench_id"), col("text"))
          val bb = graft.operators.Dedup
            .minhashBands(bench, "bench_id", "text")
            .filter(col("sig").isNotNull).cache()
          val btok = bench.select(col("bench_id"),
            array_distinct(split(col("text"), " ")).as("bs")).cache()
          bb.count(); btok.count()       // materialize pre-stream
          cached += bb; cached += btok
          docs.filter(col("doc_id") % 10 =!= 0)
            .select("doc_id", "text")
            .repartitionByRange(3, col("doc_id"))
            .write.parquet(s"$tmp/in")
          val stream = s.readStream
            .schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$tmp/in")
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             batchId: Long) =>
              if (!batch.isEmpty) {
                val b = batch.localCheckpoint()
                val cand = graft.operators.Dedup
                  .minhashBands(b, "doc_id", "text")
                  .filter(col("sig").isNotNull)
                  .join(broadcast(bb), Seq("j", "sig"))
                  .select("doc_id", "bench_id").distinct()
                val leaked = cand
                  .join(b.select(col("doc_id"),
                    array_distinct(split(col("text"), " ")).as("cs")),
                    "doc_id")
                  .join(broadcast(btok), "bench_id")
                  .filter(graft.operators.Dedup
                    .jaccard(col("cs"), col("bs")) >= 0.9)
                  .select("doc_id").distinct()
                b.select("doc_id")
                  .join(leaked, Seq("doc_id"), "left_anti")
                  .write.mode("overwrite").parquet(s"$tmp/out/b$batchId")
              }
            }
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          s.read.parquet(s"$tmp/out/b*")
            .orderBy("doc_id")
            .localCheckpoint()
        } finally {
          cached.foreach(_.unpersist())
          Rm.rf(tmp)
        }
      },
      Some(s"""$decontamCtes
        |SELECT doc_id FROM corp
        |ANTI JOIN (SELECT DISTINCT doc_id FROM ver WHERE jc >= 0.9) v
        |  USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    Q("d115_incremental_corpus_stats",
      "Incrementally-maintained corpus statistics (StatsStore) — " +
        "materialized-view maintenance for the per-language " +
        "doc/token/char counters every curation dashboard reads: at " +
        "100 TB a per-wave recompute is a full corpus scan, but the " +
        "aggregates form a commutative GROUP, so each ingest wave " +
        "merges only its own stats and each deletion wave retracts " +
        "exactly with sign −1. The gate drives the full lifecycle — " +
        "bootstrap, two add waves, one retraction wave — against the " +
        "store AS READ FROM DISK each time (staged-rename swaps), " +
        "and the oracle is a FULL RECOMPUTE over the surviving docs: " +
        "incremental maintenance must be indistinguishable from " +
        "recomputation.",
      (s, dir) => {
        import graft.operators.StatsStore
        val docs = t(s, dir, "documents")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-d115").toString
        try {
          StatsStore.init(docs.filter(col("doc_id") % 3 === 0),
            "lang", "text", tmp)
          StatsStore.applyWave(docs.filter(col("doc_id") % 3 === 1),
            "lang", "text", tmp)
          StatsStore.applyWave(docs.filter(col("doc_id") % 3 === 2),
            "lang", "text", tmp)
          StatsStore.applyWave(docs.filter(col("doc_id") % 5 === 0),
            "lang", "text", tmp, retract = true)
          StatsStore.read(s, tmp).orderBy("key").localCheckpoint()
        } finally Rm.rf(tmp)
      },
      Some("""SELECT lang AS key, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split(text, ' '),
        |      w -> len(w) > 0))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(length(replace(text, ' ', ''))) AS BIGINT)
        |    AS n_chars
        |FROM documents WHERE doc_id % 5 <> 0
        |GROUP BY lang ORDER BY key""".stripMargin)),

    Q("w37_streaming_incremental_stats",
      "STREAMED incremental corpus statistics — d115's store driven " +
        "by a live ingest: add waves and a retraction wave arrive as " +
        "separate range files (one micro-batch each, op = ±1), and " +
        "every batch folds into the on-disk StatsStore with the " +
        "matching sign — adds merge, retractions subtract — via the " +
        "same staged-rename swap. The counters form a commutative " +
        "group, so the final store is batching-invariant by algebra " +
        "(any split of the waves commutes); the oracle is d115's " +
        "full recompute over the surviving docs, VERBATIM.",
      (s, dir) => {
        import graft.operators.StatsStore
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-w37").toString
        try {
          val docs = t(s, dir, "documents")
            .select("doc_id", "lang", "text")
          // three add waves + one retraction wave, one file each
          (0 to 2).foreach(w =>
            docs.filter(col("doc_id") % 3 === w)
              .withColumn("op", lit(1))
              .coalesce(1).write.mode("append").parquet(s"$tmp/in"))
          docs.filter(col("doc_id") % 5 === 0)
            .withColumn("op", lit(-1))
            .coalesce(1).write.mode("append").parquet(s"$tmp/in")
          StatsStore.init(docs.limit(0), "lang", "text", tmp)
          val stream = s.readStream
            .schema("doc_id LONG, lang STRING, text STRING, op INT")
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$tmp/in")
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             batchId: Long) =>
              // ONE signed fold per batch (op = ±1 per row) under an
              // exactly-once commit tag: the marker rides inside the
              // staged store, so the single swap commits data+marker
              // atomically and a replayed batch is a no-op
              // (spec-gated)
              if (!batch.isEmpty)
                StatsStore.applyDelta(batch.localCheckpoint(),
                  "lang", "text", "op", tmp, Some(s"b$batchId"))
            }
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          StatsStore.read(s, tmp).orderBy("key").localCheckpoint()
        } finally Rm.rf(tmp)
      },
      Some("""SELECT lang AS key, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split(text, ' '),
        |      w -> len(w) > 0))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(length(replace(text, ' ', ''))) AS BIGINT)
        |    AS n_chars
        |FROM documents WHERE doc_id % 5 <> 0
        |GROUP BY lang ORDER BY key""".stripMargin)),

    Q("m14_video_keyframe_neardup",
      "VIDEO near-dup by keyframe-signature sets (Multimodal." +
        "VideoSig) — the video member of the modality near-dup " +
        "family (m09 image dHash, m12 audio fingerprint): clips " +
        "reduce to the SET of their frame hashes (8 full 32-char " +
        "windows, hash60 each), candidates share ANY frame hash (a " +
        "frame-hash bucket equi-join, never all-pairs), and the " +
        "verify is exact set Jaccard computed relationally — shared " +
        "count from the bucket join, sizes from a per-doc count, no " +
        "arrays. The planted 'clipped re-upload' (same clip minus " +
        "its last frame) shares 7 of 8 keyframes → Jaccard 7/8 = " +
        "0.875, above the 0.6 bar; unrelated clips share nothing. " +
        "Frames are the repo's deterministic byte stand-in (no video " +
        "codec in the container — the plumbing is real, the decode " +
        "is a stand-in, m12's discipline).",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .filter(col("doc_id") < 150 && length(col("text")) >= 256)
        val clipped = base.select(
          (col("doc_id") + 100000).as("doc_id"),
          substring(col("text"), 1, 224).as("text"))
        val frames = graft.operators.VideoSig.frameHashes(
          base.select("doc_id", "text").unionByName(clipped),
          "doc_id", "text", frameLen = 32, maxFrames = 8)
        graft.operators.VideoSig.nearDupPairs(frames, minJaccard = 0.6)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id < 150 AND length(text) >= 256),
        |alld AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000, substr(text, 1, 224) FROM base),
        |fr0 AS (SELECT doc_id, text,
        |    unnest(range(0, least(length(text) // 32, 8))) AS i
        |  FROM alld),
        |fr AS (SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(substr(text,
        |      CAST(i * 32 + 1 AS INT), 32)), 1, 15))::BIGINT AS fh
        |  FROM fr0),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM fr GROUP BY doc_id),
        |sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    COUNT(*) AS ns
        |  FROM fr a JOIN fr b
        |    ON a.fh = b.fh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (SELECT doc_a, doc_b, ns,
        |    round(CAST(ns AS DOUBLE) / (x.n + y.n - ns), 6) AS jac
        |  FROM sh JOIN sz x ON x.doc_id = doc_a
        |          JOIN sz y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, CAST(ns AS BIGINT) AS n_shared,
        |  jac AS jaccard
        |FROM p WHERE jac >= 0.6 ORDER BY doc_a, doc_b""".stripMargin))
  )
}
