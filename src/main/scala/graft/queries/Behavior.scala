package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.{events, t}

/** Event-sequence / behavioral analytics battery — the classic
  * clickstream operators a training-data pipeline's upstream product
  * analytics would run over the same event log: batch sessionization,
  * retention cohorts, time-bounded funnels, interval-sweep concurrency,
  * gaps-and-islands runs, association rules, and sorted-neighborhood
  * dedup blocking (Hernández & Stolfo's merge/purge alternative to the
  * LSH blocking in `Dedup`).
  *
  * Cross-engine determinism: all time arithmetic is on integer
  * MICROSECONDS (`unix_micros` / `epoch_us` — exact in both engines, no
  * interval or seconds-truncation semantics), every window order carries
  * the `(ts, event_id)` unique tie-break, and every ratio is a SINGLE
  * IEEE division of exactly-computed BIGINTs.
  *
  * Scale notes are per-query; the common pattern is that every window is
  * partitioned by a bounded-cardinality key (user, event_type, block),
  * never global.
  */
object Behavior {

  /** `events` reduced to the integer-µs timeline used by every query
    * here: (event_id, user_id, event_type, tus). */
  private def eline(s: org.apache.spark.sql.SparkSession, dir: String) =
    events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"))

  /** q80's per-order sorted brand baskets, localCheckpoint'ed once per
    * (session, dir) — the basket table feeds THREE consumers (pair
    * explode, per-brand counts, basket count) and without the memo each
    * would re-run the lineitem+part join and the distinct shuffle (the
    * d44 re-evaluation defect class). Same memo discipline as
    * Extended.pairsMemo / LlmOps.ccMemo. */
  private val basketsMemo =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String),
      org.apache.spark.sql.DataFrame]()
  private def brandBaskets(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val key = (s, dir)
    // registry-tracked (VERDICT r17 #7): Bench retires these blocks
    // after q80's samples; a release clears the entry so a later
    // caller rebuilds (the documented cold-sample shape).
    Option(basketsMemo.get(key)).getOrElse {
      MemoRegistry.tracked("q80_baskets", s) {
        Option(basketsMemo.get(key)).getOrElse {
          val b = t(s, dir, "lineitem")
            .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
            .groupBy(col("l_orderkey").as("ok"))
            .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
            .localCheckpoint()
          basketsMemo.put(key, b)
          b
        }
      }(() => { basketsMemo.remove(key); () })
    }
  }

  /** The SSJoin brute-force oracle — ONE template shared by d61
    * (doc_id < 100 slice) and d143 (full table, the pruning-active
    * clique regime): the all-shared-token join whose hash would
    * mismatch on any unsound pruning. `where` restricts the corpus
    * ("" = whole table); tokenization mirrors SSJoin.tokenize
    * verbatim. */
  private def ssjoinBruteOracle(where: String): String =
    s"""WITH tk0 AS (
    |  SELECT doc_id, list_distinct(list_filter(
    |    string_split_regex(lower(text), '[^a-z0-9]+'),
    |    x -> x <> '')) AS arr
    |  FROM documents$where),
    |tk AS (
    |  SELECT doc_id, len(arr) AS sz, unnest(arr) AS tok FROM tk0),
    |pairs AS (
    |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS ov,
    |    MIN(x.sz) AS sza, MIN(y.sz) AS szb
    |  FROM tk x JOIN tk y ON x.tok = y.tok AND x.doc_id < y.doc_id
    |  GROUP BY 1, 2)
    |SELECT a, b, CAST(ov AS BIGINT) AS ov,
    |  CAST(ov AS DOUBLE) / CAST(sza + szb - ov AS DOUBLE) AS jaccard
    |FROM pairs
    |WHERE CAST(ov AS DOUBLE) / CAST(sza + szb - ov AS DOUBLE)
    |      >= CAST(0.9 AS DOUBLE)
    |ORDER BY a, b""".stripMargin

  private val GapUs = 1800000000L  // 30-minute session gap
  private val HourUs = 3600000000L

  val all: Seq[Q] = Seq(

    Q("q75_sessionize",
      "Batch sessionization: per-user 30-min-gap sessions via lag + " +
        "running sum of session-start flags, folded to per-user session " +
        "stats. SCALE: both windows partition by user_id — the shuffle " +
        "is one hash exchange on the user key reused by lag, the " +
        "running sum, and the final aggregation; no global sort.",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
        val sess = eline(s, dir)
          .withColumn("ns",
            when(lag("tus", 1).over(w).isNull
              .or(col("tus") - lag("tus", 1).over(w) > GapUs), 1L)
              .otherwise(0L))
          .withColumn("sid",
            sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sid")
          .agg(count(lit(1)).as("ev"))
        sess.groupBy("user_id")
          .agg(
            max("sid").as("n_sessions"),
            max("ev").as("max_sess_events"),
            sum("ev").as("n_events"))
          .orderBy("user_id")
      },
      Some(s"""WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |g AS (
        |  SELECT user_id, event_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w > $GapUs
        |         THEN 1 ELSE 0 END AS ns
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |per AS (
        |  SELECT user_id, sid, COUNT(*) AS ev FROM sess GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(MAX(sid) AS BIGINT) AS n_sessions,
        |  CAST(MAX(ev) AS BIGINT) AS max_sess_events,
        |  CAST(SUM(ev) AS BIGINT) AS n_events
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("q76_retention_cohorts",
      "Retention cohort matrix: cohort = ISO week of a user's first " +
        "event; cell = distinct users active at each whole-week offset. " +
        "SCALE: first-event is a user-key aggregation (map-side " +
        "partial), the matrix is a tiny (weeks x offsets) grid however " +
        "large the log; the user->cohort join broadcasts the per-user " +
        "first-week table when dims allow.",
      (s, dir) => {
        val e = events(s, dir).select(
          col("user_id"), to_date(date_trunc("week", col("ts"))).as("aw"))
        val cohort = e.groupBy("user_id").agg(min("aw").as("cw"))
        e.join(cohort, "user_id")
          .select(
            col("cw").as("cohort_week"),
            expr("CAST(datediff(aw, cw) / 7 AS BIGINT)").as("week_offset"),
            col("user_id"))
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS aw
        |  FROM events),
        |cohort AS (SELECT user_id, MIN(aw) AS cw FROM e GROUP BY 1)
        |SELECT cw AS cohort_week,
        |  CAST(date_diff('day', cw, aw) // 7 AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q77_funnel_steps",
      "Time-bounded funnel view -> click -> purchase: each stage's entry " +
        "is the user's first qualifying event within ONE HOUR of the " +
        "previous stage (strictly after it). SCALE: three user-keyed " +
        "min-aggregations chained by joins on user_id — each stage " +
        "SHRINKS the key set, so later joins broadcast; no windows, no " +
        "per-event state.",
      (s, dir) => {
        val e = eline(s, dir)
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("tus").as("t1"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("tus") > col("t1") && col("tus") <= col("t1") + HourUs)
          .groupBy("user_id").agg(min("tus").as("t2"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id")
          .filter(col("tus") > col("t2") && col("tus") <= col("t2") + HourUs)
          .groupBy("user_id").agg(min("tus").as("t3"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
      },
      Some(s"""WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |v AS (SELECT user_id, MIN(tus) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(tus) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click'
        |        AND tus > t1 AND tus <= t1 + $HourUs GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(tus) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase'
        |        AND tus > t2 AND tus <= t2 + $HourUs GROUP BY 1)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |       (SELECT COUNT(*) FROM c) AS n_view_click,
        |       (SELECT COUNT(*) FROM p) AS n_view_click_purchase""".stripMargin)),

    Q("q78_interval_sweep",
      "Max-concurrency sweep: each event opens a 5-minute half-open " +
        "activity interval; +1/-1 boundary events, running sum ordered " +
        "(t, delta, event_id) — ends sort before starts at the same " +
        "instant, so touching intervals do not overlap. SCALE: the " +
        "running sum partitions by (event_type, UTC hour), so window " +
        "depth is the per-type-per-HOUR boundary count — the grid " +
        "width is the depth knob (r07 used days; the 100x tier showed " +
        "day partitions deepening with the user population, so the " +
        "grid refines to hours: 24x more partitions, 24x shallower " +
        "windows, and the stitch aggregate stays bounded at " +
        "types x hours). Bucket boundaries stitch exactly: each " +
        "bucket's max prefix is offset by the carried open count " +
        "(cumulative sum of prior buckets' delta totals), computed on " +
        "the BOUNDED type x hour aggregate. The global max = max over " +
        "buckets of (carry + within-bucket max), because concatenating " +
        "buckets in time order reproduces the global boundary order — " +
        "for ANY grid width.",
      (s, dir) => {
        val e = eline(s, dir)
        val hourUs = 3600000000L
        val bounds = e.select(
            col("event_type"), col("tus").as("t"),
            lit(1L).as("delta"), col("event_id"))
          .unionByName(e.select(
            col("event_type"), (col("tus") + 300000000L).as("t"),
            lit(-1L).as("delta"), col("event_id")))
          .withColumn("bkt", expr(s"t DIV ${hourUs}L"))
        val w = Window.partitionBy("event_type", "bkt")
          .orderBy("t", "delta", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        val perBkt = bounds
          .withColumn("open_in_bkt", sum("delta").over(w))
          .groupBy("event_type", "bkt")
          .agg(max("open_in_bkt").as("max_in_bkt"),
            sum("delta").as("bkt_total"))
        val wd = Window.partitionBy("event_type").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        perBkt
          .withColumn("carry", coalesce(sum("bkt_total").over(wd), lit(0L)))
          .groupBy("event_type")
          .agg(max(col("carry") + col("max_in_bkt")).as("max_concurrent"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS tus FROM events),
        |b AS (
        |  SELECT event_type, tus AS t, 1 AS delta, event_id FROM e
        |  UNION ALL
        |  SELECT event_type, tus + 300000000, -1, event_id FROM e),
        |r AS (
        |  SELECT event_type,
        |    SUM(delta) OVER (PARTITION BY event_type
        |                     ORDER BY t, delta, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS open
        |  FROM b)
        |SELECT event_type, CAST(MAX(open) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("q79_gaps_islands",
      "Gaps-and-islands: runs of CONSECUTIVE same-type events per user " +
        "via the row_number-difference trick (rn_overall - rn_per_type " +
        "is constant within a run), folded to per-type run statistics. " +
        "SCALE: both row_numbers share the user_id partitioning (one " +
        "shuffle, two window specs over the same exchange); the " +
        "(user, type, grp) aggregation is map-side partial.",
      (s, dir) => {
        val w1 = Window.partitionBy("user_id").orderBy("tus", "event_id")
        val w2 = Window.partitionBy("user_id", "event_type")
          .orderBy("tus", "event_id")
        eline(s, dir)
          .withColumn("grp",
            row_number().over(w1) - row_number().over(w2))
          .groupBy("user_id", "event_type", "grp")
          .agg(count(lit(1)).as("run_len"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_runs"),
            max("run_len").as("max_run"),
            sum(when(col("run_len") >= 3, 1L).otherwise(0L)).as("runs_ge3"))
          .orderBy("event_type")
      },
      Some("""WITH o AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus
        |  FROM events),
        |g AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY tus, event_id)
        |    - row_number() OVER (PARTITION BY user_id, event_type
        |                         ORDER BY tus, event_id) AS grp
        |  FROM o),
        |runs AS (
        |  SELECT user_id, event_type, grp, COUNT(*) AS run_len
        |  FROM g GROUP BY 1, 2, 3)
        |SELECT event_type,
        |  COUNT(*) AS n_runs,
        |  CAST(MAX(run_len) AS BIGINT) AS max_run,
        |  CAST(SUM(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS runs_ge3
        |FROM runs GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("q80_assoc_rules",
      "Association rules over order baskets: brand pairs co-purchased " +
        "in one order; support >= 0.5% of baskets; lift and confidence " +
        "as single divisions of exact BIGINT counts (pair*n / ca*cb — " +
        "bit-identical cross-engine). SCALE: baskets fold to a sorted " +
        "brand array in ONE order-key shuffle (memoized checkpoint, 3 " +
        "consumers); pairs are generated INSIDE each basket row by an " +
        "array-combination explode — (width choose 2) per order, no " +
        "self-join shuffle; basket count stays in-plan (broadcast " +
        "1-row agg, the d52 discipline — no driver count()).",
      (s, dir) => {
        val baskets = brandBaskets(s, dir)
        val nDf = baskets.agg(count(lit(1)).as("n"))
        val single = baskets
          .select(explode(col("bs")).as("b"))
          .groupBy("b").agg(count(lit(1)).as("cb"))
        val pairs = baskets
          .select(explode(expr(
            """flatten(transform(bs, (x, i) ->
              |  transform(slice(bs, i + 2, size(bs)),
              |    y -> struct(x AS b, y AS b2))))""".stripMargin)).as("p"))
          .select(col("p.b"), col("p.b2"))
          .groupBy("b", "b2").agg(count(lit(1)).as("cp"))
          .crossJoin(broadcast(nDf))
          .filter(col("cp") * 200L >= col("n"))
        pairs
          .join(broadcast(
            single.withColumnRenamed("b", "bb").withColumnRenamed("cb", "ca")),
            col("b") === col("bb"))
          .join(broadcast(single.withColumnRenamed("b", "bb2")),
            col("b2") === col("bb2"))
          .select(
            col("b").as("brand_a"), col("b2").as("brand_b"),
            col("cp").as("pair_orders"),
            (col("cp").cast("double") / col("ca").cast("double"))
              .as("confidence"),
            ((col("cp") * col("n")).cast("double") /
              (col("ca") * col("cb")).cast("double")).as("lift"))
          .orderBy(desc("lift"), col("brand_a"), col("brand_b"))
          .limit(20)
      },
      Some("""WITH ob AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT COUNT(DISTINCT ok) AS n FROM ob),
        |single AS (SELECT b, COUNT(*) AS cb FROM ob GROUP BY 1),
        |pairs AS (
        |  SELECT x.b, y.b AS b2, COUNT(*) AS cp
        |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
        |  GROUP BY 1, 2 HAVING COUNT(*) * 200 >= (SELECT n FROM n))
        |SELECT p.b AS brand_a, p.b2 AS brand_b,
        |  CAST(cp AS BIGINT) AS pair_orders,
        |  CAST(cp AS DOUBLE) / CAST(sa.cb AS DOUBLE) AS confidence,
        |  CAST(cp * (SELECT n FROM n) AS DOUBLE)
        |    / CAST(sa.cb * sb.cb AS DOUBLE) AS lift
        |FROM pairs p
        |JOIN single sa ON p.b = sa.b
        |JOIN single sb ON p.b2 = sb.b
        |ORDER BY lift DESC, brand_a, brand_b LIMIT 20""".stripMargin)),

    Q("d58_sorted_neighborhood",
      "Sorted-neighborhood dedup blocking (Hernandez & Stolfo " +
        "merge/purge): sort docs by a normalized text prefix inside " +
        "4-char prefix blocks, compare each doc to its next 2 " +
        "neighbors, emit token-Jaccard >= 0.4 candidate pairs. The " +
        "complement to LSH blocking (d07): O(n * w) comparisons, no " +
        "signature computation. SCALE: the sort is per-block " +
        "(prefix-partitioned shuffle), window width is constant; " +
        "cross-block near-misses are the documented trade-off (run " +
        "multiple passes with rotated keys to recover them).",
      (s, dir) => {
        val toks = filter(
          array_distinct(split(lower(col("text")), "[^a-z0-9]+")),
          x => x =!= lit(""))
        val d = t(s, dir, "documents")
          .select(
            col("doc_id"),
            lower(col("text")).as("nk"),
            toks.as("tk"))
          // punctuation-only docs tokenize to [] and would make the
          // Jaccard 0/0 (NaN vs NULL across engines) — drop them here
          // and in the oracle identically.
          .filter(size(col("tk")) > 0)
          .withColumn("blk", substring(col("nk"), 1, 4))
        val w = Window.partitionBy("blk").orderBy("nk", "doc_id")
        // ONE window pass producing a neighbors array, then a single
        // explode — a two-branch union would re-run the scan + sort
        // per depth (no exchange reuse across differently-projected
        // branches).
        d.withColumn("nbs", array(
            struct(lead("doc_id", 1).over(w).as("id"),
              lead("tk", 1).over(w).as("tk")),
            struct(lead("doc_id", 2).over(w).as("id"),
              lead("tk", 2).over(w).as("tk"))))
          .select(col("doc_id").as("a"), col("tk"),
            explode(col("nbs")).as("nb"))
          .filter(col("nb.id").isNotNull)
          .select(col("a"), col("nb.id").as("b"),
            (size(array_intersect(col("tk"), col("nb.tk"))).cast("double") /
              size(array_union(col("tk"), col("nb.tk"))).cast("double"))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.4)
          .orderBy("a", "b")
      },
      Some("""WITH d AS (
        |  SELECT doc_id, lower(text) AS nk,
        |    list_distinct(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '')) AS tk,
        |    substr(lower(text), 1, 4) AS blk
        |  FROM documents
        |  WHERE len(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '')) > 0),
        |p AS (
        |  SELECT doc_id, tk,
        |    lead(doc_id, 1) OVER w AS nid1, lead(tk, 1) OVER w AS ntk1,
        |    lead(doc_id, 2) OVER w AS nid2, lead(tk, 2) OVER w AS ntk2
        |  FROM d WINDOW w AS (PARTITION BY blk ORDER BY nk, doc_id)),
        |pairs AS (
        |  SELECT doc_id AS a, nid1 AS b,
        |    CAST(len(list_intersect(tk, ntk1)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(tk, ntk1))) AS DOUBLE)
        |      AS jaccard
        |  FROM p WHERE nid1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, nid2,
        |    CAST(len(list_intersect(tk, ntk2)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(tk, ntk2))) AS DOUBLE)
        |  FROM p WHERE nid2 IS NOT NULL)
        |SELECT a, b, jaccard FROM pairs
        |WHERE jaccard >= 0.4 ORDER BY a, b""".stripMargin)),

    Q("q81_scd2_intervals",
      "SCD-Type-2 interval build: collapse consecutive same-type runs " +
        "(the q79 islands) to validity intervals [valid_from, " +
        "valid_to) where valid_to = next run's start (NULL while " +
        "current) — the standard warehouse dimension-history " +
        "construction. SCALE: all three windows and the run " +
        "aggregation share the user_id exchange; interval stitching " +
        "is lead() within the user partition, no self-join.",
      (s, dir) => {
        val w1 = Window.partitionBy("user_id").orderBy("tus", "event_id")
        val w2 = Window.partitionBy("user_id", "event_type")
          .orderBy("tus", "event_id")
        val runs = eline(s, dir)
          .withColumn("grp",
            row_number().over(w1) - row_number().over(w2))
          .groupBy("user_id", "event_type", "grp")
          .agg(min("tus").as("valid_from"))
        val w3 = Window.partitionBy("user_id")
          .orderBy("valid_from", "event_type")
        runs
          .withColumn("valid_to", lead("valid_from", 1).over(w3))
          .filter(col("user_id") < 10)
          .select("user_id", "event_type", "valid_from", "valid_to")
          .orderBy("user_id", "valid_from")
      },
      Some("""WITH o AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus
        |  FROM events),
        |g AS (
        |  SELECT user_id, event_type, tus,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY tus, event_id)
        |    - row_number() OVER (PARTITION BY user_id, event_type
        |                         ORDER BY tus, event_id) AS grp
        |  FROM o),
        |runs AS (
        |  SELECT user_id, event_type, grp, MIN(tus) AS valid_from
        |  FROM g GROUP BY 1, 2, 3)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id
        |                         ORDER BY valid_from, event_type)
        |    AS valid_to
        |FROM runs WHERE user_id < 10
        |ORDER BY user_id, valid_from""".stripMargin)),

    Q("q82_resample_gapfill",
      "Time-series resample + gap fill: per-user daily activity on a " +
        "DENSE day grid from the user's own [first, last] day " +
        "(sequence + explode, zero-filled left join), folded to " +
        "per-user coverage stats. SCALE: the grid generates inside " +
        "each user row (span/day elements, no cross join against a " +
        "calendar table); the join is user+day keyed and the grid " +
        "side is generated co-partitioned.",
      (s, dir) => {
        val e = events(s, dir)
          .select(col("user_id"),
            datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
              .cast("long").as("di"))
        val daily = e.groupBy("user_id", "di").agg(count(lit(1)).as("n"))
        val grid = e.groupBy("user_id")
          .agg(min("di").as("lo"), max("di").as("hi"))
          .select(col("user_id"),
            explode(sequence(col("lo"), col("hi"))).as("di"))
        grid.join(daily, Seq("user_id", "di"), "left")
          .withColumn("cnt", coalesce(col("n"), lit(0L)))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_days"),
            sum(when(col("cnt") === 0L, 1L).otherwise(0L)).as("n_zero_days"),
            max("cnt").as("max_daily"))
          .filter(col("user_id") < 25)
          .orderBy("user_id")
      },
      Some("""WITH e AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di
        |  FROM events),
        |daily AS (
        |  SELECT user_id, di, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(MIN(di), MAX(di))) AS di
        |  FROM e GROUP BY user_id)
        |SELECT g.user_id,
        |  COUNT(*) AS n_days,
        |  CAST(SUM(CASE WHEN d.n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero_days,
        |  CAST(MAX(COALESCE(d.n, 0)) AS BIGINT) AS max_daily
        |FROM grid g LEFT JOIN daily d USING (user_id, di)
        |WHERE g.user_id < 25
        |GROUP BY g.user_id ORDER BY g.user_id""".stripMargin)),

    Q("d59_zscore_outliers",
      "Per-language length outliers at |z| > 2 decided ENTIRELY in " +
        "integer arithmetic: (n*x - S)^2 > 4*(n*SS - S^2) is the exact " +
        "z^2 > 4 test from BIGINT count/sum/sum-of-squares — no " +
        "floating-point mean or stddev, so the verdict is bit-free " +
        "cross-engine (the q52 exactness discipline applied to " +
        "outlier detection). SCALE: one per-language aggregate " +
        "broadcast back over the scan; the decision is a codegen'd " +
        "projection, shuffle-free.",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val stats = d.groupBy("lang").agg(
          count(lit(1)).as("n"),
          sum("n_chars").as("s"),
          sum(col("n_chars") * col("n_chars")).as("ss"))
        d.join(broadcast(stats), "lang")
          .filter({
            val dev = col("n") * col("n_chars") - col("s")
            dev * dev > lit(4L) * (col("n") * col("ss") - col("s") * col("s"))
          })
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id")
      },
      Some("""WITH stats AS (
        |  SELECT lang, COUNT(*) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS s,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars
        |FROM documents d JOIN stats USING (lang)
        |WHERE (n * n_chars - s) * (n * n_chars - s)
        |      > 4 * (n * ss - s * s)
        |ORDER BY doc_id""".stripMargin)),

    Q("d60_markov_transitions",
      "First-order Markov transition matrix over per-user event " +
        "sequences: bigram counts via lead() in the user partition, " +
        "row-normalized to transition probabilities (single division " +
        "of exact BIGINTs). SCALE: ONE user-key exchange for the " +
        "bigram window; the matrix is (types x types)-bounded however " +
        "long the log, so the row-total window runs over that tiny " +
        "aggregate — a second aggregation + join-back would re-execute " +
        "the whole bigram subtree (the d44 defect class).",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
        eline(s, dir)
          .withColumn("nxt", lead("event_type", 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy(col("event_type").as("prev_type"),
            col("nxt").as("next_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("tn", sum("n").over(Window.partitionBy("prev_type")))
          .select(col("prev_type"), col("next_type"), col("n"),
            (col("n").cast("double") / col("tn").cast("double")).as("p"))
          .orderBy("prev_type", "next_type")
      },
      Some("""WITH o AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus
        |  FROM events),
        |bi AS (
        |  SELECT event_type AS prev_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY tus, event_id) AS next_type
        |  FROM o),
        |c AS (
        |  SELECT prev_type, next_type, COUNT(*) AS n
        |  FROM bi WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  CAST(n AS DOUBLE)
        |    / CAST(CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
        |           AS DOUBLE) AS p
        |FROM c
        |ORDER BY prev_type, next_type""".stripMargin)),

    Q("q83_chi_square_cells",
      "Chi-square independence test over the priority x status " +
        "contingency table, emitted PER CELL (observed, expected, " +
        "contribution) — every value is exact-count window math plus " +
        "single IEEE operations in identical op order, so cells are " +
        "bit-identical cross-engine; a cross-cell total would be an " +
        "order-dependent double sum, which is why the oracle contract " +
        "is per-cell (sum the column client-side for the statistic, " +
        "df = (R-1)(C-1)). SCALE: cells are (priorities x statuses)-" +
        "bounded, so the three window sums run over a tiny aggregate " +
        "however large the fact table; the only real work is the " +
        "map-side-partial count.",
      (s, dir) => {
        val cells = t(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("pri"),
            col("o_orderstatus").as("st"))
          .agg(count(lit(1)).as("o"))
        val wr = Window.partitionBy("pri")
        val wc = Window.partitionBy("st")
        val wn = Window.partitionBy()
        val d = (c: org.apache.spark.sql.Column) => c.cast("double")
        cells
          .withColumn("r", sum("o").over(wr))
          .withColumn("c", sum("o").over(wc))
          .withColumn("n", sum("o").over(wn))
          .select(
            col("pri"), col("st"), col("o"),
            ((d(col("r")) * d(col("c"))) / d(col("n"))).as("e"),
            {
              val num = d(col("o")) * d(col("n")) - d(col("r")) * d(col("c"))
              ((num * num) / (d(col("n")) * d(col("r")) * d(col("c"))))
                .as("contrib")
            })
          .orderBy("pri", "st")
      },
      Some("""WITH cells AS (
        |  SELECT o_orderpriority AS pri, o_orderstatus AS st,
        |    COUNT(*) AS o
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT pri, st, o,
        |    CAST(SUM(o) OVER (PARTITION BY pri) AS BIGINT) AS r,
        |    CAST(SUM(o) OVER (PARTITION BY st) AS BIGINT) AS c,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM cells)
        |SELECT pri, st, o,
        |  (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) / CAST(n AS DOUBLE) AS e,
        |  ((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
        |      - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
        |   * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
        |      - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
        |  / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
        |    AS contrib
        |FROM m ORDER BY pri, st""".stripMargin)),

    Q("q84_time_to_convert",
      "Time-to-event quantiles: per signup-week cohort, the p50/p90 " +
        "microsecond delay from a user's first signup to their first " +
        "subsequent purchase — quantiles by the q26 rank-selection " +
        "discipline (value at ceil(p*n) in a tie-broken order), no " +
        "interpolation formula to diverge cross-engine. SCALE: the " +
        "conversion table is one row per converted user; its cohort-" +
        "partitioned window is post-aggregation work.",
      (s, dir) => {
        val e = eline(s, dir)
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("tus").as("t0"))
        val conv = e.filter(col("event_type") === "purchase")
          .join(s1, "user_id")
          .filter(col("tus") > col("t0"))
          .groupBy("user_id").agg(
            min(col("tus") - col("t0")).as("dt"),
            min(col("t0")).as("t0"))
          .withColumn("cw",
            to_date(date_trunc("week", timestamp_micros(col("t0")))))
        val w = Window.partitionBy("cw").orderBy("dt", "user_id")
        conv
          .select(col("cw"), col("dt"), col("user_id"),
            row_number().over(w).as("rn"),
            count(lit(1)).over(Window.partitionBy("cw")).as("n"))
          .groupBy("cw")
          .agg(
            max("n").cast("long").as("n_conv"),
            max(when(col("rn") === ceil(col("n") * 0.5), col("dt")))
              .as("p50_us"),
            max(when(col("rn") === ceil(col("n") * 0.9), col("dt")))
              .as("p90_us"))
          .orderBy("cw")
      },
      Some("""WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |s1 AS (
        |  SELECT user_id, MIN(tus) AS t0 FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |conv AS (
        |  SELECT e.user_id, MIN(tus - t0) AS dt, MIN(t0) AS t0
        |  FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'purchase' AND tus > t0
        |  GROUP BY 1),
        |r AS (
        |  SELECT CAST(date_trunc('week', make_timestamp(t0)) AS DATE)
        |           AS cw, dt, user_id
        |  FROM conv),
        |rk AS (
        |  SELECT cw, dt,
        |    row_number() OVER (PARTITION BY cw ORDER BY dt, user_id)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY cw) AS n
        |  FROM r)
        |SELECT cw,
        |  CAST(MAX(n) AS BIGINT) AS n_conv,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN dt END)
        |    AS p50_us,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN dt END)
        |    AS p90_us
        |FROM rk GROUP BY cw ORDER BY cw""".stripMargin)),

    Q("d61_prefix_filter_join",
      "Prefix-filtered set-similarity self-join (the SSJoin primitive, " +
        "Chaudhuri et al. ICDE'06, + the PPJoin positional and PPJoin+ " +
        "suffix filters, Xiao et al. WWW'08) at Jaccard >= 0.9: tokens " +
        "hashed to 64 bits and globally ordered rarest-first; " +
        "candidates must share a token in their " +
        "(sz - ceil(t*sz) + 1)-prefix AND pass the length and " +
        "positional bounds; at verify the suffix partition bound " +
        "(O(2^d log) probes over the presorted arrays) prunes before " +
        "the exact overlap merge, and arrays ship once per side, " +
        "never once per prefix row (operators/SSJoin.scala). The third blocking family next " +
        "to LSH (d07) and sorted neighborhood (d58). Correctness " +
        "slice doc_id < 100 (the d52 discipline); the ORACLE is the " +
        "brute-force all-shared-token join, so any unsound pruning " +
        "would hash-mismatch.",
      (s, dir) => graft.operators.SSJoin.join(
          t(s, dir, "documents").filter(col("doc_id") < 100),
          "doc_id", "text", t = 0.9)
        .orderBy("a", "b"),
      Some(ssjoinBruteOracle(" WHERE doc_id < 100"))),

    Q("d143_ssjoin_clique",
      "d61's SSJoin in a pruning-ACTIVE regime (VERDICT r16 #6): the " +
        "FULL documents table at t=0.9 is clique-heavy — template-" +
        "derived docs share large token sets, so the prefix join " +
        "emits ~3.7x the true pair count and the PPJoin+ suffix " +
        "bound prunes ~2/3 of the positional survivors before the " +
        "exact merge (measured: 33,694 positional candidates -> " +
        "11,300 suffix survivors over 9,020 true pairs at sf0.01; " +
        "d61's doc_id<100 slice exercises the bound but barely " +
        "prunes). The ORACLE is the same brute-force all-shared-" +
        "token join, so pruning a qualifying pair would hash-" +
        "mismatch; PlanShapeSpec asserts the suffix stage prunes > 0 " +
        "candidates on this exact fixture.",
      (s, dir) => graft.operators.SSJoin.join(
          t(s, dir, "documents"), "doc_id", "text", t = 0.9)
        .orderBy("a", "b"),
      Some(ssjoinBruteOracle(""))))
}
