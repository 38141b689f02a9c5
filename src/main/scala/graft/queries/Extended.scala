package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType, DecimalType}

import graft.operators.{AsOf, Compact}
import Tables.{events, t}

/** Remaining SURVEY §2.2 categories: map functions, user-defined function
  * surface, range (theta) join, as-of join, approximate distinct. */
object Extended {

  private val D2 = DecimalType(18, 2)
  private def dec2(c: Column) = c.cast(D2)

  // q54's distinct (flag, partkey) pairs, localCheckpoint'ed once per
  // (session, dir) and reused across Verify sweeps + bench iterations —
  // same memo discipline as LlmOps.ccMemo (get + putIfAbsent; a racing
  // first caller recomputes harmlessly). Without this, every q54
  // invocation leaked a fresh checkpointed copy for the session's life.
  private val pairsMemo =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String),
      org.apache.spark.sql.DataFrame]()
  private def distinctFlagPartPairs(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val key = (s, dir)
    // registry-tracked (VERDICT r17 #7): Bench retires these blocks
    // after q54's samples; a release clears the entry so a later
    // caller rebuilds (the documented cold-sample shape). The
    // registry's global build lock also supersedes the putIfAbsent
    // race story — a loser is never built.
    Option(pairsMemo.get(key)).getOrElse {
      MemoRegistry.tracked("q54_pairs", s) {
        Option(pairsMemo.get(key)).getOrElse {
          val pairs = t(s, dir, "lineitem")
            .select("l_returnflag", "l_partkey").distinct()
            .localCheckpoint()
          pairsMemo.put(key, pairs)
          pairs
        }
      }(() => { pairsMemo.remove(key); () })
    }
  }

  val all: Seq[Q] = Seq(

    Q("q21_map_fns",
      "JSON → MapType column; map_keys / element_at feeding exact aggregates.",
      (s, dir) => events(s, dir)
        .select(
          col("event_type"),
          from_json(col("props"), MapType(StringType, LongType)).as("m"))
        .select(
          col("event_type"),
          element_at(col("m"), "k").as("kv"),
          size(map_keys(col("m"))).cast("long").as("nk"))
        .groupBy("event_type")
        .agg(
          sum("kv").cast("long").as("sum_k"),
          max("nk").cast("long").as("max_keys"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(MAX(len(json_keys(props))) AS BIGINT) AS max_keys,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("q22_udf_slugify",
      "Scala UDF surface (registered + applied); regex semantics portable.",
      (s, dir) => {
        val slug = udf((x: String) =>
          if (x == null) null else x.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
        t(s, dir, "part")
          .filter(col("p_partkey") <= 50)
          .select(col("p_partkey"), slug(col("p_name")).as("slug"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g') AS slug
        |FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""".stripMargin)),

    Q("q23_range_join",
      "Range (theta) join against literal buckets — broadcast nested loop.",
      (s, dir) => {
        import s.implicits._
        val buckets = Seq((1, 10, "s01_10"), (11, 20, "s11_20"), (21, 30, "s21_30"),
          (31, 40, "s31_40"), (41, 50, "s41_50"))
          .toDF("lo", "hi", "bucket")
        t(s, dir, "part")
          .join(broadcast(buckets), col("p_size").between(col("lo"), col("hi")))
          .groupBy("bucket")
          .agg(
            count(lit(1)).as("n_parts"),
            sum(col("p_retailprice").cast(D2)).cast("double").as("total_price"))
          .orderBy("bucket")
      },
      Some("""SELECT bucket, COUNT(*) AS n_parts,
        | CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM part JOIN (VALUES (1, 10, 's01_10'), (11, 20, 's11_20'), (21, 30, 's21_30'),
        |                (31, 40, 's31_40'), (41, 50, 's41_50')) AS b(lo, hi, bucket)
        |  ON p_size BETWEEN lo AND hi
        |GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("q24_asof_join",
      "As-of join (custom operator: union + window, one shuffle, no " +
        "blow-up): latest order at-or-before each event per user.",
      (s, dir) => AsOf.join(
          events(s, dir).filter(col("event_id") < 1000)
            .select("event_id", "user_id", "ts"),
          t(s, dir, "orders"),
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightVal = "o_orderkey")
        .select("event_id", "user_id", "asof_o_orderkey")
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id,
        | (SELECT max(o.o_orderkey) FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |     AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
        |                          WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)
        | ) AS asof_o_orderkey
        |FROM events e WHERE event_id < 1000 ORDER BY event_id""".stripMargin)),

    Q("q25_approx_distinct",
      "HLL approximate distinct checked AGAINST the exact count: the " +
        "sketch estimate itself is engine-specific (un-oracle-able), but " +
        "its error bound is not — the oracled columns are the exact count " +
        "and the assertion that the in-engine HLL (rsd 0.01) landed " +
        "within 5% of it. HLL is deterministic for fixed data, so the " +
        "boolean is stable across runs.",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct("l_partkey", 0.01).as("approx"),
          countDistinct("l_partkey").as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx") - col("exact_parts")).cast("double") /
            col("exact_parts") < 0.05).as("approx_within_5pct"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        | CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | true AS approx_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q27_zorder_cluster",
      "Z-order (Morton) clustering key over (l_partkey, l_suppkey): " +
        "equal-width integer buckets bit-interleaved; per-cell stats show " +
        "multi-column locality. Write path: Compact.parquetZOrder.",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        // Stats pass: 4 longs to the driver (z-ordering always needs one).
        val r = li.agg(
          min("l_partkey"), max("l_partkey"),
          min("l_suppkey"), max("l_suppkey")).head()
        val z = Compact.zValue(Seq(
          Compact.uniformBucket(col("l_partkey"),
            lit(r.getLong(0)), lit(r.getLong(1)), 16),
          Compact.uniformBucket(col("l_suppkey"),
            lit(r.getLong(2)), lit(r.getLong(3)), 16)), 4)
        li.select(col("l_partkey"), z)
          .groupBy("z")
          .agg(
            count(lit(1)).as("n"),
            min("l_partkey").as("min_pk"),
            max("l_partkey").as("max_pk"))
          .orderBy("z")
      },
      Some("""WITH mm AS (
        | SELECT min(l_partkey) AS pkmin, max(l_partkey) AS pkmax,
        |        min(l_suppkey) AS skmin, max(l_suppkey) AS skmax
        | FROM lineitem),
        |b AS (
        | SELECT l_partkey,
        |  (l_partkey - pkmin) // ((pkmax - pkmin) // 16 + 1) AS bp,
        |  (l_suppkey - skmin) // ((skmax - skmin) // 16 + 1) AS bs
        | FROM lineitem, mm)
        |SELECT
        |  (((bp >> 0) & 1) << 1) | (((bp >> 1) & 1) << 3)
        |  | (((bp >> 2) & 1) << 5) | (((bp >> 3) & 1) << 7)
        |  | (((bs >> 0) & 1) << 0) | (((bs >> 1) & 1) << 2)
        |  | (((bs >> 2) & 1) << 4) | (((bs >> 3) & 1) << 6) AS z,
        | COUNT(*) AS n,
        | CAST(MIN(l_partkey) AS BIGINT) AS min_pk,
        | CAST(MAX(l_partkey) AS BIGINT) AS max_pk
        |FROM b GROUP BY z ORDER BY z""".stripMargin)),

    Q("q38_file_pruning",
      "File-skipping proof for the z-order layout: model each output " +
        "file as a contiguous z-range (exactly what Compact.parquetZOrder's " +
        "repartitionByRange(z) produces — 64 files = z >> 2 cells) vs a " +
        "linear l_partkey-range layout with the same file count, compute " +
        "each file's (min,max) column stats — the numbers parquet footers " +
        "store — and count the files a 2-D box predicate must scan. " +
        "Z-order prunes on BOTH columns; the linear sort only on its own. " +
        "rows_matched is layout-invariant (sanity anchor). One scan and " +
        "one O(files) aggregation per layout; the stats pass ships 4 longs " +
        "to the driver.",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val r = li.agg(
          min("l_partkey"), max("l_partkey"),
          min("l_suppkey"), max("l_suppkey")).head()
        val (pkmin, pkmax) = (r.getLong(0), r.getLong(1))
        val (skmin, skmax) = (r.getLong(2), r.getLong(3))
        // Query box: the middle eighth of each key range (driver-side
        // exact integer arithmetic, replicated verbatim in the oracle).
        val plo = pkmin + (pkmax - pkmin) * 7 / 16
        val phi = pkmin + (pkmax - pkmin) * 9 / 16
        val slo = skmin + (skmax - skmin) * 7 / 16
        val shi = skmin + (skmax - skmin) * 9 / 16
        val hit = col("pk").between(plo, phi) && col("sk").between(slo, shi)
        val overlap = col("minpk") <= phi && col("maxpk") >= plo &&
          col("minsk") <= shi && col("maxsk") >= slo
        val zFile = shiftright(Compact.zValue(Seq(
          Compact.uniformBucket(col("l_partkey"), lit(pkmin), lit(pkmax), 16),
          Compact.uniformBucket(col("l_suppkey"), lit(skmin), lit(skmax), 16)),
          4), 2)
        val linFile =
          Compact.uniformBucket(col("l_partkey"), lit(pkmin), lit(pkmax), 64)
        // Both layouts in ONE scan: grouping sets ((fz),(fl)) expand each
        // row into its two per-layout file assignments — at 100 TB this
        // halves the I/O vs aggregating each layout from its own scan.
        li.select(zFile.as("fz"), linFile.as("fl"),
            col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
          .groupingSets(Seq(Seq(col("fz")), Seq(col("fl"))),
            col("fz"), col("fl"))
          .agg(count(lit(1)).as("n"),
            min("pk").as("minpk"), max("pk").as("maxpk"),
            min("sk").as("minsk"), max("sk").as("maxsk"),
            sum(when(hit, 1L).otherwise(0L)).as("hits"),
            // grouping() marks which column was grouped OUT of this set:
            // the (fz) set has grouping(fl)=1 → it is the z-order layout.
            when(grouping(col("fl")) === 1, "zorder")
              .otherwise("linear_pk").as("layout"))
          .groupBy("layout")
          .agg(
            count(lit(1)).cast("long").as("files_total"),
            sum(when(overlap, 1L).otherwise(0L)).cast("long")
              .as("files_scanned"),
            sum(when(overlap, col("n")).otherwise(0L)).cast("long")
              .as("rows_scanned"),
            sum("hits").cast("long").as("rows_matched"))
          .orderBy("layout")
      },
      Some("""WITH mm AS (
        | SELECT min(l_partkey) AS pkmin, max(l_partkey) AS pkmax,
        |        min(l_suppkey) AS skmin, max(l_suppkey) AS skmax
        | FROM lineitem),
        |box AS (
        | SELECT pkmin + (pkmax - pkmin) * 7 // 16 AS plo,
        |        pkmin + (pkmax - pkmin) * 9 // 16 AS phi,
        |        skmin + (skmax - skmin) * 7 // 16 AS slo,
        |        skmin + (skmax - skmin) * 9 // 16 AS shi
        | FROM mm),
        |b AS (
        | SELECT l_partkey AS pk, l_suppkey AS sk,
        |  (l_partkey - pkmin) // ((pkmax - pkmin) // 16 + 1) AS bp,
        |  (l_suppkey - skmin) // ((skmax - skmin) // 16 + 1) AS bs,
        |  (l_partkey - pkmin) // ((pkmax - pkmin) // 64 + 1) AS fl
        | FROM lineitem, mm),
        |files AS (
        | SELECT 'zorder' AS layout,
        |  ((((bp >> 0) & 1) << 1) | (((bp >> 1) & 1) << 3)
        |   | (((bp >> 2) & 1) << 5) | (((bp >> 3) & 1) << 7)
        |   | (((bs >> 0) & 1) << 0) | (((bs >> 1) & 1) << 2)
        |   | (((bs >> 2) & 1) << 4) | (((bs >> 3) & 1) << 6)) >> 2 AS f,
        |  pk, sk FROM b
        | UNION ALL
        | SELECT 'linear_pk', fl, pk, sk FROM b),
        |per AS (
        | SELECT layout, f, COUNT(*) AS n,
        |  MIN(pk) AS minpk, MAX(pk) AS maxpk,
        |  MIN(sk) AS minsk, MAX(sk) AS maxsk,
        |  SUM(CASE WHEN pk BETWEEN plo AND phi AND sk BETWEEN slo AND shi
        |      THEN 1 ELSE 0 END) AS hits
        | FROM files, box GROUP BY layout, f)
        |SELECT layout,
        | CAST(COUNT(*) AS BIGINT) AS files_total,
        | CAST(SUM(CASE WHEN minpk <= phi AND maxpk >= plo
        |   AND minsk <= shi AND maxsk >= slo THEN 1 ELSE 0 END) AS BIGINT)
        |   AS files_scanned,
        | CAST(SUM(CASE WHEN minpk <= phi AND maxpk >= plo
        |   AND minsk <= shi AND maxsk >= slo THEN n ELSE 0 END) AS BIGINT)
        |   AS rows_scanned,
        | CAST(SUM(hits) AS BIGINT) AS rows_matched
        |FROM per, box GROUP BY layout ORDER BY layout""".stripMargin)),

    Q("q51_listagg",
      "SQL:2023 ordered string aggregation (LISTAGG ... WITHIN GROUP), " +
        "new in Spark 4.0 — the deterministic ORDER BY inside the " +
        "aggregate is what makes the result oracle-able at all (an " +
        "unordered collect would be partition-order noise).",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("q51_nation")
        t(s, dir, "region").createOrReplaceTempView("q51_region")
        s.sql("""
          SELECT r_name,
                 LISTAGG(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
                 CAST(COUNT(*) AS BIGINT) AS n_nations
          FROM q51_region JOIN q51_nation ON n_regionkey = r_regionkey
          GROUP BY r_name ORDER BY r_name""")
      },
      Some("""SELECT r_name,
        | string_agg(n_name, ',' ORDER BY n_name) AS nations,
        | COUNT(*) AS n_nations
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    Q("q52_regression_aggs",
      "Linear-regression aggregates: the oracled values are slope / " +
        "intercept / r2 derived from EXACT decimal moment sums (count, " +
        "Σx, Σy, Σxy, Σx², Σy² — associative, partial+final, the way a " +
        "100 TB regression should be computed) cast to double at the " +
        "end; the engine's streaming regr_slope/regr_intercept/regr_r2 " +
        "are gated against them within 1e-6 relative. Decimal→double " +
        "casts are correctly rounded in both engines, and the final " +
        "double expressions are written in identical op order, so the " +
        "derived values match bit-exactly.",
      (s, dir) => {
        val x = dec2(col("l_quantity"))
        val y = dec2(col("l_extendedprice"))
        val g = t(s, dir, "lineitem")
          .select(col("l_returnflag"), x.as("x"), y.as("y"),
            col("l_quantity").as("xd"), col("l_extendedprice").as("yd"))
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(col("x")).cast("double").as("sx"),
            sum(col("y")).cast("double").as("sy"),
            sum(col("x") * col("y")).cast("double").as("sxy"),
            sum(col("x") * col("x")).cast("double").as("sxx"),
            sum(col("y") * col("y")).cast("double").as("syy"),
            regr_slope(col("yd"), col("xd")).as("b_slope"),
            regr_intercept(col("yd"), col("xd")).as("b_icept"),
            regr_r2(col("yd"), col("xd")).as("b_r2"))
        val nD = col("n").cast("double")
        val cxy = nD * col("sxy") - col("sx") * col("sy")
        val cxx = nD * col("sxx") - col("sx") * col("sx")
        val cyy = nD * col("syy") - col("sy") * col("sy")
        val slope = cxy / cxx
        val icept = (col("sy") - (cxy / cxx) * col("sx")) / nD
        val r2 = (cxy * cxy) / (cxx * cyy)
        def near(b: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
          abs(b - e) <= greatest(lit(1e-6), abs(e) * 1e-6)
        g.select(col("l_returnflag"), col("n"),
            slope.as("slope"), icept.as("intercept"), r2.as("r2"),
            near(col("b_slope"), slope).as("slope_ok"),
            near(col("b_icept"), icept).as("intercept_ok"),
            near(col("b_r2"), r2).as("r2_ok"))
          .orderBy("l_returnflag")
      },
      Some("""WITH a AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS x,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        |  FROM lineitem),
        |g AS (
        |  SELECT rf, COUNT(*) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*y) AS DOUBLE) AS sxy, CAST(SUM(x*x) AS DOUBLE) AS sxx,
        |    CAST(SUM(y*y) AS DOUBLE) AS syy
        |  FROM a GROUP BY rf),
        |e AS (
        |  SELECT rf, n, sx, sy,
        |    CAST(n AS DOUBLE)*sxy - sx*sy AS cxy,
        |    CAST(n AS DOUBLE)*sxx - sx*sx AS cxx,
        |    CAST(n AS DOUBLE)*syy - sy*sy AS cyy
        |  FROM g)
        |SELECT rf AS l_returnflag, n,
        |  cxy/cxx AS slope,
        |  (sy - (cxy/cxx)*sx)/CAST(n AS DOUBLE) AS intercept,
        |  (cxy*cxy)/(cxx*cyy) AS r2,
        |  true AS slope_ok, true AS intercept_ok, true AS r2_ok
        |FROM e ORDER BY l_returnflag""".stripMargin)),

    Q("q53_ignore_nulls_window",
      "IGNORE NULLS window navigation (LAG + running LAST_VALUE): " +
        "carry-forward of the last finished-order price per customer — " +
        "the canonical gauge-fill/last-observation pattern. DuckDB 1.0 " +
        "has no IGNORE NULLS syntax, so the oracle emulates it exactly " +
        "with a running non-null COUNT joined back to the row_number-" +
        "indexed non-null sequence.",
      (s, dir) => {
        t(s, dir, "orders").filter(col("o_custkey") <= 100)
          .createOrReplaceTempView("q53_orders")
        s.sql("""
          WITH t0 AS (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS fp
            FROM q53_orders)
          SELECT o_custkey, o_orderkey,
            LAG(fp) IGNORE NULLS OVER
              (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              AS prev_f_price,
            LAST_VALUE(fp) IGNORE NULLS OVER
              (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS fill_f_price
          FROM t0 ORDER BY o_custkey, o_orderkey""")
      },
      Some("""WITH t0 AS (
        |  SELECT o_custkey AS k, o_orderkey AS o, o_orderdate AS d,
        |         CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS fp
        |  FROM orders WHERE o_custkey <= 100),
        |nn AS (
        |  SELECT k, fp, ROW_NUMBER() OVER (PARTITION BY k ORDER BY d, o) AS j
        |  FROM t0 WHERE fp IS NOT NULL),
        |b AS (
        |  SELECT k, o, fp,
        |    COUNT(fp) OVER (PARTITION BY k ORDER BY d, o
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS jprev,
        |    COUNT(fp) OVER (PARTITION BY k ORDER BY d, o) AS jcur
        |  FROM t0)
        |SELECT b.k AS o_custkey, b.o AS o_orderkey,
        |  p.fp AS prev_f_price, c.fp AS fill_f_price
        |FROM b
        |LEFT JOIN nn p ON p.k = b.k AND p.j = b.jprev
        |LEFT JOIN nn c ON c.k = b.k AND c.j = b.jcur
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q54_hll_sketch_union",
      "Mergeable HLL sketches (Apache DataSketches, Spark 3.5+): one " +
        "sketch per group, then hll_union_agg combines the per-group " +
        "sketches into a global estimate WITHOUT rescanning rows — the " +
        "100 TB pattern (sketch per partition/day once, union forever). " +
        "Sketch insertion is register-max, order-independent, so the " +
        "estimate is deterministic; the oracled columns are the exact " +
        "distinct counts plus the within-5%-of-exact assertions " +
        "(lgK=12 → rsd ≈ 1.6%).",
      (s, dir) => {
        // HLL insertion is idempotent, so sketches built from the
        // DISTINCT (flag, partkey) pairs are identical to sketches over
        // the raw rows — ONE lineitem scan and one pair-shuffle feed
        // both the per-group and the global arm (vs a second full scan
        // + a second two-phase distinct expansion).
        val pairs = distinctFlagPartPairs(s, dir)
        val per = pairs
          .groupBy("l_returnflag")
          .agg(
            hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"),
            count(lit(1)).as("exact_parts"))
        val perRow = per.select(
          col("l_returnflag"), col("exact_parts"),
          (abs(hll_sketch_estimate(col("sk")) - col("exact_parts"))
            .cast("double") / col("exact_parts") < 0.05).as("hll_within_5pct"))
        val globalExact = pairs
          .agg(countDistinct("l_partkey").as("exact_parts"))
        val unionRow = per.agg(
            hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
          .crossJoin(globalExact)
          .select(lit("ALL").as("l_returnflag"), col("exact_parts"),
            (abs(col("est") - col("exact_parts")).cast("double") /
              col("exact_parts") < 0.05).as("hll_within_5pct"))
        perRow.unionByName(unionRow).orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        | CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | true AS hll_within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT 'ALL', CAST(COUNT(DISTINCT l_partkey) AS BIGINT), true
        |FROM lineitem
        |ORDER BY l_returnflag""".stripMargin)),

    Q("q55_width_bucket_histogram",
      "Equi-width histogram via width_bucket over a power-of-two range " +
        "([0, 2^20), 32 buckets of 32768): every FP step (divide by a " +
        "power of two, floor) is exact, so the manual FLOOR in the " +
        "oracle reproduces the engine's bucket function bit-for-bit — " +
        "the one-scan, one-aggregation histogram a 100 TB profiler runs.",
      (s, dir) => t(s, dir, "orders")
        .select(
          width_bucket(col("o_totalprice"), lit(0d), lit(1048576d), lit(32L))
            .as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("bucket"),
      Some("""SELECT CAST(FLOOR(o_totalprice / 32768.0) AS BIGINT) + 1 AS bucket,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    Q("q56_bitwise_aggs",
      "Bitwise aggregate family (BIT_AND / BIT_OR / BIT_XOR over int64) " +
        "plus scalar shifts/masks — pure integer lattice ops, " +
        "associative+commutative, so partial+final aggregation and " +
        "cross-engine exactness are both free. The permission-mask / " +
        "feature-flag rollup shape.",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderpriority"),
          col("o_orderkey"),
          expr("shiftleft(1L, cast(o_orderkey % 16 as int))").as("flag"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          bit_and(col("o_orderkey")).as("key_and"),
          bit_or(col("o_orderkey")).as("key_or"),
          bit_xor(col("o_orderkey")).as("key_xor"),
          bit_or(col("flag")).as("flags_seen"),
          bit_count(bit_or(col("flag"))).cast("long").as("n_distinct_flags"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
        | CAST(BIT_AND(o_orderkey) AS BIGINT) AS key_and,
        | CAST(BIT_OR(o_orderkey) AS BIGINT) AS key_or,
        | CAST(BIT_XOR(o_orderkey) AS BIGINT) AS key_xor,
        | CAST(BIT_OR(1::BIGINT << CAST(o_orderkey % 16 AS INT)) AS BIGINT)
        |   AS flags_seen,
        | CAST(bit_count(BIT_OR(1::BIGINT << CAST(o_orderkey % 16 AS INT)))
        |   AS BIGINT) AS n_distinct_flags
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("q57_date_fns",
      "Calendar function battery — epoch-day arithmetic, month index, " +
        "quarter, ISO week, day-of-week (Spark is 1=Sunday, DuckDB " +
        "0=Sunday: aligned by +1), month-end (last_day) and clamped " +
        "add_months (Jan 31 + 1 month = Feb 28 in both engines).",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("d"))
        .select(
          col("o_orderkey"),
          col("d"),
          datediff(col("d"), lit("1970-01-01").cast("date")).cast("long")
            .as("epoch_day"),
          ((year(col("d")) - 1970) * 12 + month(col("d")) - 1).cast("long")
            .as("month_index"),
          quarter(col("d")).cast("long").as("qtr"),
          weekofyear(col("d")).cast("long").as("iso_week"),
          dayofweek(col("d")).cast("long").as("dow"),
          last_day(col("d")).as("month_end"),
          add_months(col("d"), 3).as("plus3m"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        | date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |   AS epoch_day,
        | (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
        |   AS month_index,
        | quarter(o_orderdate) AS qtr,
        | weekofyear(o_orderdate) AS iso_week,
        | dayofweek(o_orderdate) + 1 AS dow,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin)),

    Q("q58_null_semantics",
      "Three-valued-logic battery: COUNT(*) vs COUNT(col), SUM over an " +
        "all-NULL slice (NULL, not 0), COALESCE/NULLIF, and null-safe " +
        "equality (Spark <=> ≡ DuckDB IS NOT DISTINCT FROM) — the " +
        "semantics corner every engine port gets wrong first.",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderpriority"),
          when(col("o_orderkey") % 3 =!= 0, col("o_totalprice")).as("x"),
          when(col("o_orderkey") % 5 =!= 0, col("o_totalprice")).as("y"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("x")).as("n_x"),
          sum(when(col("x").isNull, dec2(col("y")))).cast("double")
            .as("sum_y_where_x_null"),
          sum(when(lit(false), dec2(col("y")))).cast("double")
            .as("sum_empty_slice"),
          sum(when(col("x") <=> col("y"), 1L).otherwise(0L))
            .as("n_nullsafe_eq"),
          sum(dec2(coalesce(col("x"), lit(0)))).cast("double")
            .as("sum_x_coalesced"),
          count(nullif(col("o_orderpriority"), lit("1-URGENT")))
            .as("n_not_urgent"))
        .orderBy("o_orderpriority"),
      Some("""WITH t0 AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN o_orderkey % 3 <> 0 THEN o_totalprice END AS x,
        |    CASE WHEN o_orderkey % 5 <> 0 THEN o_totalprice END AS y
        |  FROM orders)
        |SELECT o_orderpriority,
        | COUNT(*) AS n_rows,
        | COUNT(x) AS n_x,
        | CAST(SUM(CASE WHEN x IS NULL THEN CAST(y AS DECIMAL(18,2)) END)
        |   AS DOUBLE) AS sum_y_where_x_null,
        | CAST(SUM(CASE WHEN false THEN CAST(y AS DECIMAL(18,2)) END)
        |   AS DOUBLE) AS sum_empty_slice,
        | CAST(SUM(CASE WHEN x IS NOT DISTINCT FROM y THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_nullsafe_eq,
        | CAST(SUM(COALESCE(CAST(x AS DECIMAL(18,2)), 0)) AS DOUBLE)
        |   AS sum_x_coalesced,
        | COUNT(NULLIF(o_orderpriority, '1-URGENT')) AS n_not_urgent
        |FROM t0 GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("q59_execute_immediate",
      "SQL scripting surface (Spark 4.0): session VARIABLE declared, SET, " +
        "then EXECUTE IMMEDIATE with a ? parameter marker bound USING the " +
        "variable — parameterized dynamic SQL without string splicing " +
        "(the injection-safe template path a metadata-driven 100 TB " +
        "pipeline uses for per-tenant predicates).",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("q59_orders")
        s.sql("DECLARE OR REPLACE VARIABLE q59_cut DOUBLE DEFAULT 0.0")
        s.sql("SET VAR q59_cut = 100000.0")
        s.sql("""EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  COUNT(*) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS sum_price
           FROM q59_orders WHERE o_totalprice > ?
           GROUP BY o_orderpriority ORDER BY o_orderpriority'
          USING q59_cut""")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_totalprice > 100000.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("q60_collation",
      "Collation-aware grouping (Spark 4.0 COLLATE): a deliberately " +
        "case-mangled name column grouped under UTF8_LCASE folds the " +
        "case variants together; the emitted key is normalized via " +
        "lower(min(raw)) because WHICH variant represents a collated " +
        "group is engine-internal. Oracle groups by lower() — the " +
        "pre-collation workaround the feature replaces.",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("q60_nation")
        s.sql("""
          WITH v AS (
            SELECT CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
                        ELSE lower(n_name) END AS name_var,
                   n_regionkey
            FROM q60_nation)
          SELECT lower(min(name_var)) AS name_ci,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT name_var) AS BIGINT) AS n_variants,
                 CAST(MAX(n_regionkey) AS BIGINT) AS regionkey
          FROM v
          GROUP BY name_var COLLATE UTF8_LCASE
          ORDER BY name_ci""")
      },
      Some("""WITH v AS (
        |  SELECT CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
        |              ELSE lower(n_name) END AS name_var,
        |         n_regionkey
        |  FROM nation)
        |SELECT lower(min(name_var)) AS name_ci,
        | COUNT(*) AS n,
        | CAST(COUNT(DISTINCT name_var) AS BIGINT) AS n_variants,
        | CAST(MAX(n_regionkey) AS BIGINT) AS regionkey
        |FROM v GROUP BY lower(name_var) ORDER BY name_ci""".stripMargin)),

    Q("q61_map_hofs",
      "Map higher-order functions — transform_values, map_filter, " +
        "map_zip_with over the props map, folded to exact aggregates " +
        "(map COLUMNS never reach the output: map iteration order is " +
        "engine noise, their aggregated values are not).",
      (s, dir) => {
        val m = from_json(col("props"), MapType(StringType, LongType)).as("m")
        events(s, dir)
          .select(col("event_type"), m)
          .select(
            col("event_type"),
            element_at(transform_values(col("m"), (_, v) => v * 2), "k")
              .as("k2"),
            element_at(
              map_zip_with(col("m"),
                transform_values(col("m"), (_, v) => v * 2),
                (_, a, b) => a + b), "k").as("k3"),
            size(map_filter(col("m"), (_, v) => v % 2 === 0)).cast("long")
              .as("n_even_entries"))
          .groupBy("event_type")
          .agg(
            sum("k2").cast("long").as("sum_k2"),
            sum("k3").cast("long").as("sum_k3"),
            sum("n_even_entries").as("n_even"),
            count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""WITH t0 AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
        |  FROM events)
        |SELECT event_type,
        | CAST(SUM(kv * 2) AS BIGINT) AS sum_k2,
        | CAST(SUM(kv * 3) AS BIGINT) AS sum_k3,
        | CAST(SUM(CASE WHEN kv % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
        | COUNT(*) AS n
        |FROM t0 GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("q62_identifier_clause",
      "Dynamic identifier binding (Spark 4 IDENTIFIER(...)): the table " +
        "name arrives in a session variable and binds as an IDENTIFIER, " +
        "not by splicing strings into SQL — with q59's parameter " +
        "markers, the complete injection-safe dynamic-SQL surface of a " +
        "metadata-driven pipeline.",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("q62_customer")
        s.sql("DECLARE OR REPLACE VARIABLE q62_tbl STRING DEFAULT ''")
        s.sql("SET VAR q62_tbl = 'q62_customer'")
        s.sql("""
          SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_bal
          FROM IDENTIFIER(q62_tbl)
          GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("q64_xml_fns",
      "Native XML functions (Spark 4): per-record XML payloads (the " +
        "enterprise-feed shape NiFi pipelines carry next to JSON) parsed " +
        "with from_xml against a declared schema — attribute (_id) and " +
        "element extraction, nullable missing elements — plus xpath_long " +
        "on the raw string; aggregated per event_type. The oracle " +
        "re-derives the same fields with regexp_extract, proving the " +
        "XML parse itself, not just the aggregation.",
      (s, dir) => {
        val xml = concat(
          lit("<rec id=\""), col("event_id"), lit("\"><u>"),
          col("user_id"), lit("</u>"),
          when(col("value") >= 50, concat(lit("<hi>"),
            round(col("value") * 100).cast("long"), lit("</hi>")))
            .otherwise(lit("")),
          lit("<t>"), col("event_type"), lit("</t></rec>"))
        val parsed = events(s, dir)
          .select(col("event_type"), xml.as("x"))
          .select(col("event_type"), col("x"),
            from_xml(col("x"), lit("STRUCT<_id: BIGINT, u: BIGINT, " +
              "hi: BIGINT, t: STRING>")).as("r"))
        parsed.select(col("event_type"),
            col("r._id").as("rid"), col("r.u").as("u"),
            col("r.hi").as("hi"),
            expr("xpath_long(x, 'sum(/rec/u)')").as("xp_u"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("rid")).cast("long").as("sum_id"),
            sum(col("u")).cast("long").as("sum_u"),
            sum(col("xp_u")).cast("long").as("sum_xpath_u"),
            count(col("hi")).as("n_hi"),
            sum(col("hi")).cast("long").as("sum_hi_cents"))
          .orderBy("event_type")
      },
      Some("""WITH x AS (
        |  SELECT event_type,
        |    '<rec id="' || event_id || '"><u>' || user_id || '</u>' ||
        |    CASE WHEN value >= 50
        |         THEN '<hi>' || CAST(round(value * 100) AS BIGINT) || '</hi>'
        |         ELSE '' END ||
        |    '<t>' || event_type || '</t></rec>' AS doc
        |  FROM events),
        |p AS (
        |  SELECT event_type,
        |    CAST(regexp_extract(doc, 'id="(\d+)"', 1) AS BIGINT) AS rid,
        |    CAST(regexp_extract(doc, '<u>(\d+)</u>', 1) AS BIGINT) AS u,
        |    CAST(NULLIF(regexp_extract(doc, '<hi>(\d+)</hi>', 1), '')
        |      AS BIGINT) AS hi
        |  FROM x)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(rid) AS BIGINT) AS sum_id,
        |  CAST(SUM(u) AS BIGINT) AS sum_u,
        |  CAST(SUM(u) AS BIGINT) AS sum_xpath_u,
        |  CAST(COUNT(hi) AS BIGINT) AS n_hi,
        |  CAST(SUM(hi) AS BIGINT) AS sum_hi_cents
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("q65_ansi_intervals",
      "ANSI interval TYPES (year-month + day-time), not just date_add " +
        "sugar: o_orderdate shifted by a constructed YEAR TO MONTH " +
        "interval (make_ym_interval, +1y2m — month-end clamping " +
        "semantics agree across engines) and a DAY TO SECOND interval " +
        "(make_dt_interval, +45d) over the timestamp form; per-priority " +
        "aggregates of the shifted dates and the VARYING day spans the " +
        "month shift produces (month lengths differ — datediff over the " +
        "ym shift is a real per-row signal, not a constant).",
      (s, dir) => {
        val d = col("o_orderdate").cast("date")
        val md = d + make_ym_interval(lit(1), lit(2))
        val dd = (col("o_orderdate") + make_dt_interval(
          lit(45), lit(0), lit(0), lit(0))).cast("date")
        t(s, dir, "orders")
          .select(col("o_orderpriority"), d.as("d"), md.as("md"), dd.as("dd"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            // ISO strings, not DATE: the comparator sees identical
            // dtypes on both engines (DATE arrives as object vs
            // datetime64 otherwise)
            date_format(min(col("md")), "yyyy-MM-dd").as("min_shifted"),
            date_format(max(col("md")), "yyyy-MM-dd").as("max_shifted"),
            sum(datediff(col("md"), col("d"))).cast("long").as("sum_ym_days"),
            sum(dayofyear(col("dd"))).cast("long").as("sum_dt_doy"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH o AS (
        |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
        |    CAST(o_orderdate AS DATE) + INTERVAL '1 year 2 months' AS md,
        |    CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS dd
        |  FROM orders)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  strftime(MIN(md), '%Y-%m-%d') AS min_shifted,
        |  strftime(MAX(md), '%Y-%m-%d') AS max_shifted,
        |  CAST(SUM(date_diff('day', d, md)) AS BIGINT) AS sum_ym_days,
        |  CAST(SUM(dayofyear(dd)) AS BIGINT) AS sum_dt_doy
        |FROM o GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("q66_csv_fns",
      "In-row CSV parsing (from_csv) — completes the embedded-record " +
        "parse trio next to from_json (q14/p-ops) and from_xml (q64): " +
        "per-record CSV payloads with a quoted field containing the " +
        "delimiter, parsed against a declared schema; a malformed row " +
        "(too few columns) yields NULLs in PERMISSIVE mode and is " +
        "counted on the invalid side — the same valid/invalid routing " +
        "contract as the reference's JSON validation (op #3), applied " +
        "to a second wire format.",
      (s, dir) => {
        val csvLine = when(col("event_id") % 97 === 0,
          concat(lit("\""), col("event_type"), lit("\"")))
          .otherwise(concat(
            lit("\""), col("event_type"), lit(",x\","),
            col("user_id"), lit(","),
            round(col("value") * 100).cast("long")))
        events(s, dir)
          .select(col("event_type"), csvLine.as("line"))
          .select(col("event_type"),
            from_csv(col("line"),
              org.apache.spark.sql.types.StructType.fromDDL(
                "tag STRING, uid BIGINT, cents BIGINT"),
              Map.empty[String, String]).as("r"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(col("r.uid")).as("n_parsed"),
            sum(when(col("r.uid").isNull, 1L).otherwise(0L))
              .cast("long").as("n_invalid"),
            sum(col("r.cents")).cast("long").as("sum_cents"),
            max(col("r.tag")).as("max_tag"))
          .orderBy("event_type")
      },
      Some("""WITH x AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 97 = 0 THEN NULL ELSE user_id END AS uid,
        |    CASE WHEN event_id % 97 = 0 THEN NULL
        |         ELSE CAST(round(value * 100) AS BIGINT) END AS cents,
        |    CASE WHEN event_id % 97 = 0 THEN NULL
        |         ELSE event_type || ',x' END AS tag
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(COUNT(uid) AS BIGINT) AS n_parsed,
        |  CAST(COUNT(*) - COUNT(uid) AS BIGINT) AS n_invalid,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |  MAX(tag) AS max_tag
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("q67_bloom_semi_join",
      "Bloom-filter join pruning built from codegen'd primitives — the " +
        "runtime-filter pattern for a fact⋈dim join where the dim " +
        "predicate is selective: the dim side folds its keys into a " +
        "2^16-bit Bloom filter (k=3 xxhash64 probes, bit array = ~1024 " +
        "bit_or-aggregated words — a TINY table, broadcast, never " +
        "collected), the fact side keeps only rows whose 3 bits are all " +
        "set, and the surviving candidates flow into the EXACT join " +
        "that dedups false positives. At 100 TB this is the shuffle-" +
        "avoidance play: the bloom prefilter drops most fact rows " +
        "BEFORE the join exchange. Two require-gates prove (1) the " +
        "filter actually pruned and (2) zero false negatives — the " +
        "final answer is exact, which is what the oracle checks.",
      (s, dir) => {
        val B = graft.operators.Bloom
        val dim = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#23").select("p_partkey")
        val words = B.build(dim, "p_partkey")
        val li = t(s, dir, "lineitem")
          .select("l_partkey", "l_extendedprice", "l_discount", "l_returnflag")
        val cand = B.probe(li, "l_partkey", words)
        val joined = cand
          .join(broadcast(dim), col("l_partkey") === col("p_partkey"))
        val nFact = li.count()
        val nCand = cand.count()
        val nTrue = li.join(broadcast(dim),
          col("l_partkey") === col("p_partkey")).count()
        val nAfter = joined.count()
        require(nCand < nFact,
          s"q67: bloom did not prune ($nCand candidates of $nFact rows)")
        require(nAfter == nTrue,
          s"q67: bloom dropped true matches ($nAfter != $nTrue)")
        joined.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("l_extendedprice")) *
              (dec2(lit(1)) - dec2(col("l_discount"))))
              .cast("double").as("revenue"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q68_cms_freq_bound",
      "Count-min sketch frequency estimation gated against its error " +
        "contract (q25's discipline for a SECOND sketch family): ONE " +
        "count_min_sketch aggregate (eps 0.1%, confidence 99%, fixed " +
        "seed — deterministic for fixed data) over all of lineitem; the " +
        "serialized sketch (a few KB — aggregate state, not row data) " +
        "is opened on the driver and probed for 5 supplier keys. CMS " +
        "guarantees est ≥ exact and, w.h.p., est ≤ exact + eps·N — " +
        "both booleans are computed IN the result against the exact " +
        "per-key counts, which is what the oracle replays. The sketch " +
        "answers point frequency queries in O(1) from one streaming " +
        "pass — the 100 TB use is heavy-hitter screening (d33's " +
        "Misra-Gries sibling) without a per-key shuffle.",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val eps = 0.001
        val row = li.agg(
          expr("count_min_sketch(l_suppkey, 0.001d, 0.99d, 42)").as("cms"),
          count(lit(1)).as("n")).head()
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
        val slack = math.ceil(eps * row.getLong(1)).toLong
        val keys = (1L to 5L).toSeq
        val est = typedLit(
          keys.map(k => k -> cms.estimateCount(java.lang.Long.valueOf(k))).toMap)
        li.filter(col("l_suppkey").isin(keys: _*))
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("exact_n"))
          .select(col("l_suppkey"), col("exact_n"),
            (element_at(est, col("l_suppkey")) >= col("exact_n")).as("cms_overcounts"),
            (element_at(est, col("l_suppkey")) <= col("exact_n") + lit(slack))
              .as("cms_within_bound"))
          .orderBy("l_suppkey")
      },
      Some("""SELECT l_suppkey, COUNT(*) AS exact_n,
        | true AS cms_overcounts, true AS cms_within_bound
        |FROM lineitem WHERE l_suppkey BETWEEN 1 AND 5
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    Q("q69_pipe_syntax",
      "SQL pipe syntax (Spark 4 |> operators — the linear query form " +
        "the 2024 'Pipe Syntax in SQL' paper argues for): FROM |> WHERE " +
        "|> EXTEND |> AGGREGATE..GROUP BY |> ORDER BY, with the house " +
        "exact-decimal revenue arithmetic inside EXTEND. Same plan as " +
        "the nested-SQL equivalent (pipe operators are pure parser " +
        "sugar over the single logical plan) — the oracle is that " +
        "equivalent in ANSI form.",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("q69_li")
        s.sql(
          "FROM q69_li\n" +
            "|> WHERE l_quantity >= 30\n" +
            "|> EXTEND CAST(l_extendedprice AS DECIMAL(18,2)) * " +
            "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev\n" +
            "|> AGGREGATE COUNT(*) AS n, CAST(SUM(rev) AS DOUBLE) AS revenue " +
            "GROUP BY l_returnflag\n" +
            "|> ORDER BY l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem WHERE l_quantity >= 30
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q70_sql_udf",
      "SQL-defined function (Spark 4 CREATE FUNCTION ... RETURN — the " +
        "declarative UDF surface next to q22's Scala UDF): the margin " +
        "arithmetic lives in a named catalog function whose body is " +
        "pure SQL, so it inlines into codegen instead of crossing a " +
        "JVM closure boundary — at 100 TB the difference between a " +
        "library of reusable business logic and a serialization tax. " +
        "Composed with two more Spark-4 SQL conveniences the oracle " +
        "replays literally: a LATERAL column alias (avg_rev reuses " +
        "the revenue alias in the same SELECT) and GROUP BY ALL " +
        "(grouping keys inferred from the non-aggregate output).",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("q70_li")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION q70_margin(
            p DOUBLE, d DOUBLE) RETURNS DECIMAL(38,4)
          RETURN CAST(p AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(d AS DECIMAL(18,2)))""")
        s.sql("""
          SELECT l_returnflag, revenue, n,
                 revenue / n AS avg_rev,
                 avg_rev * 2 AS twice_avg
          FROM (
            SELECT l_returnflag,
                   CAST(SUM(q70_margin(l_extendedprice, l_discount))
                     AS DOUBLE) AS revenue,
                   COUNT(*) AS n
            FROM q70_li
            WHERE l_quantity >= 25
            GROUP BY ALL)
          ORDER BY l_returnflag""")
      },
      Some("""WITH g AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS n
        |  FROM lineitem WHERE l_quantity >= 25
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, revenue, n,
        | revenue / n AS avg_rev,
        | (revenue / n) * 2 AS twice_avg
        |FROM g ORDER BY l_returnflag""".stripMargin)),

    Q("q71_script_transform",
      "Hive-style script transform (SELECT TRANSFORM ... USING) — rows " +
        "piped through an EXTERNAL PROCESS per partition (here 'cat', " +
        "the identity filter available in any container) in no-serde " +
        "tab-delimited mode, read back as strings, re-typed, and " +
        "aggregated. This is the legacy streaming-UDF escape hatch a " +
        "migration from Hadoop/Hive pipelines needs; the typed " +
        "roundtrip is lossless (Spark's double→string rendering is " +
        "shortest-roundtrip), so the oracle aggregates the original " +
        "table directly.",
      (s, dir) => {
        t(s, dir, "lineitem").filter(col("l_orderkey") < 1000)
          .createOrReplaceTempView("q71_li")
        s.sql("""
          WITH piped AS (
            SELECT TRANSFORM(l_orderkey, l_returnflag, l_quantity)
                   USING 'cat' AS (ok STRING, rf STRING, qt STRING)
            FROM q71_li)
          SELECT rf AS l_returnflag, COUNT(*) AS n,
                 CAST(SUM(CAST(qt AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 CAST(MIN(CAST(ok AS BIGINT)) AS BIGINT) AS min_ok
          FROM piped GROUP BY rf ORDER BY rf""")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(MIN(l_orderkey) AS BIGINT) AS min_ok
        |FROM lineitem WHERE l_orderkey < 1000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q72_try_arithmetic",
      "Error-safe arithmetic under ANSI mode (Spark 4 defaults ANSI " +
        "ON, where overflow/div-zero/bad-cast THROW): the try_* " +
        "family returns NULL instead, per cell, without disabling " +
        "ANSI for the rest of the query — try_divide hits zero only " +
        "where l_quantity=17, try_add/try_multiply overflow BIGINT " +
        "exactly where the key crosses the 2^63 boundary, try_cast " +
        "rejects non-numeric strings. The oracle reproduces every " +
        "NULL boundary arithmetically (DuckDB HUGEINT computes the " +
        "overflow condition exactly). Aggregates are order-free " +
        "(COUNT/MIN/MAX), so doubles stay engine-portable.",
      (s, dir) => {
        t(s, dir, "lineitem").filter(col("l_orderkey") < 5000)
          .createOrReplaceTempView("q72_li")
        s.sql("""
          WITH t AS (
            SELECT l_returnflag,
              try_divide(l_extendedprice, l_quantity - 17.0) AS td,
              try_add(9223372036854775800L, l_orderkey) AS ta,
              try_multiply(l_orderkey, 4611686018427387904L) AS tm,
              try_cast(concat('x', l_orderkey) AS BIGINT) AS bad,
              try_cast(CAST(l_orderkey AS STRING) AS BIGINT) AS good
            FROM q72_li)
          SELECT l_returnflag, COUNT(*) AS n,
                 CAST(COUNT(*) - COUNT(td) AS BIGINT) AS n_div_zero,
                 CAST(COUNT(ta) AS BIGINT) AS n_add_ok,
                 CAST(COUNT(tm) AS BIGINT) AS n_mul_ok,
                 CAST(COUNT(bad) AS BIGINT) AS n_bad_cast,
                 CAST(MAX(good) AS BIGINT) AS max_good,
                 round(MIN(td), 6) AS min_td
          FROM t GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some("""WITH t AS (
        |  SELECT l_returnflag,
        |    CASE WHEN l_quantity = 17.0 THEN NULL
        |         ELSE l_extendedprice / (l_quantity - 17.0) END AS td,
        |    CASE WHEN CAST(9223372036854775800 AS HUGEINT) + l_orderkey
        |              > 9223372036854775807 THEN NULL
        |         ELSE l_orderkey END AS ta,
        |    CASE WHEN CAST(l_orderkey AS HUGEINT) * 4611686018427387904
        |              > 9223372036854775807 THEN NULL
        |         ELSE l_orderkey END AS tm,
        |    l_orderkey AS good
        |  FROM lineitem WHERE l_orderkey < 5000)
        |SELECT l_returnflag, COUNT(*) AS n,
        | CAST(COUNT(*) - COUNT(td) AS BIGINT) AS n_div_zero,
        | CAST(COUNT(ta) AS BIGINT) AS n_add_ok,
        | CAST(COUNT(tm) AS BIGINT) AS n_mul_ok,
        | CAST(0 AS BIGINT) AS n_bad_cast,
        | CAST(MAX(good) AS BIGINT) AS max_good,
        | round(MIN(td), 6) AS min_td
        |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q73_pagination",
      "Pagination two ways, proven equivalent: page 3 (rows 21-30 of " +
        "the (o_totalprice DESC, o_orderkey) total order) via " +
        "OFFSET/LIMIT — O(offset) work, fine for UIs — and via KEYSET " +
        "continuation (WHERE past-the-boundary on the sort key, the " +
        "O(page) pattern that survives deep pagination at 100 TB " +
        "because the predicate pushes into the scan). The boundary " +
        "row stays IN the plan (broadcast 1-row frame + explicit " +
        "tuple-comparison filter); the keyset_match column proves " +
        "both methods return identical rows — which is what the " +
        "oracle's OFFSET page asserts.",
      (s, dir) => {
        val ord = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
        def sorted(df: org.apache.spark.sql.DataFrame) =
          df.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        val offsetPage = sorted(ord).offset(20).limit(10)
        val boundary = sorted(ord).offset(19).limit(1)
          .select(col("o_totalprice").as("bp"), col("o_orderkey").as("bk"))
        val keysetPage = sorted(
          ord.crossJoin(broadcast(boundary))
            .filter(col("o_totalprice") < col("bp") ||
              (col("o_totalprice") === col("bp") &&
                col("o_orderkey") > col("bk")))
            .select("o_orderkey", "o_totalprice"))
          .limit(10)
        offsetPage.join(
            keysetPage.select(col("o_orderkey").as("kk")),
            col("o_orderkey") === col("kk"), "left")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("kk").isNotNull.as("keyset_match"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      },
      Some("""SELECT o_orderkey, o_totalprice, true AS keyset_match
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin)),

    Q("q74_generators",
      "The remaining Generator (UDTF-shaped) builtins in one battery " +
        "— stack (columns→rows reshaping), inline (array-of-struct " +
        "flattening), and posexplode_OUTER (empty arrays keep their " +
        "parent row as a NULL child — the outer-join semantics of " +
        "generation): each arm reshapes the same slice and folds to " +
        "exact per-tag aggregates. Generators run inside " +
        "whole-stage codegen as Generate nodes — row multiplication " +
        "without a shuffle; the oracle re-derives each arm " +
        "arithmetically.",
      (s, dir) => {
        t(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
          .createOrReplaceTempView("q74_li")
        s.sql("""
          WITH st AS (
            SELECT stack(2, 'qty', l_quantity, 'ext', l_extendedprice)
                   AS (tag, val)
            FROM q74_li),
          px AS (
            SELECT CAST(p.pos AS STRING) AS tag, p.col AS val
            FROM q74_li
            LATERAL VIEW OUTER posexplode(
              CASE WHEN l_orderkey % 7 = 0 THEN array()
                   ELSE array(l_quantity, l_quantity * 2) END) p AS pos, col),
          inl AS (
            SELECT i.tag, i.val FROM q74_li
            LATERAL VIEW inline(array(
              named_struct('tag', 'lo', 'val', l_discount),
              named_struct('tag', 'hi', 'val', l_discount * 2))) i)
          SELECT gen, coalesce(tag, 'null') AS tag, COUNT(*) AS n,
                 CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
          FROM (
            SELECT 'stack' AS gen, tag, val FROM st
            UNION ALL SELECT 'posexplode', tag, val FROM px
            UNION ALL SELECT 'inline', tag, val FROM inl)
          GROUP BY gen, tag ORDER BY gen, tag""")
      },
      Some("""WITH src AS (SELECT * FROM lineitem WHERE l_orderkey < 2000),
        |u AS (
        |  SELECT 'stack' AS gen, 'qty' AS tag, l_quantity AS val FROM src
        |  UNION ALL SELECT 'stack', 'ext', l_extendedprice FROM src
        |  UNION ALL SELECT 'posexplode', '0', l_quantity FROM src
        |    WHERE l_orderkey % 7 <> 0
        |  UNION ALL SELECT 'posexplode', '1', l_quantity * 2 FROM src
        |    WHERE l_orderkey % 7 <> 0
        |  UNION ALL SELECT 'posexplode', 'null', NULL FROM src
        |    WHERE l_orderkey % 7 = 0
        |  UNION ALL SELECT 'inline', 'lo', l_discount FROM src
        |  UNION ALL SELECT 'inline', 'hi', l_discount * 2 FROM src)
        |SELECT gen, tag, COUNT(*) AS n,
        | CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM u GROUP BY gen, tag ORDER BY gen, tag""".stripMargin)),

    Q("q85_observe_metrics",
      "In-job observability via Dataset.observe + Observation (the " +
        "Spark 3.3+ metrics API): data-quality counters — row count, " +
        "exact quantity total, discount-outlier count, null-shipdate " +
        "count — ride the SAME job as the real work instead of a " +
        "second audit scan (d32 is the two-pass audit; this is the " +
        "zero-extra-pass production variant: at 100 TB a second scan " +
        "of the fact table to count nulls costs as much as the " +
        "pipeline itself). The observed frame is materialized once, " +
        "the Observation handle yields the metrics the executors " +
        "accumulated during that one pass, and the metrics themselves " +
        "are the query result the oracle re-derives in SQL.",
      (s, dir) => {
        import s.implicits._
        val obs = new org.apache.spark.sql.Observation(
          s"q85_${java.util.UUID.randomUUID()}")
        val observed = t(s, dir, "lineitem").observe(obs,
          count(lit(1)).as("n_rows"),
          sum(dec2(col("l_quantity"))).as("sum_qty"),
          count(when(col("l_discount") > 0.05, 1)).as("n_high_discount"),
          count(when(col("l_shipdate").isNull, 1)).as("n_null_shipdate"))
        // ONE materializing pass — the metrics accumulate on its tasks
        observed.write.format("noop").mode("overwrite").save()
        val m = obs.get
        Seq((
          m("n_rows").asInstanceOf[Long],
          m("sum_qty").asInstanceOf[java.math.BigDecimal].doubleValue(),
          m("n_high_discount").asInstanceOf[Long],
          m("n_null_shipdate").asInstanceOf[Long]))
          .toDF("n_rows", "sum_qty", "n_high_discount", "n_null_shipdate")
      },
      Some("""SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_high_discount,
        |  COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END) AS n_null_shipdate
        |FROM lineitem""".stripMargin)),

    Q("q86_sql_sugar",
      "Spark-4 SQL ergonomics in one query: LATERAL COLUMN ALIAS " +
        "(rev defined in the SELECT list and referenced by margin on " +
        "the same level — no subquery nesting), GROUP BY ALL (group " +
        "by every non-aggregate select item), and ORDER BY ALL. Pure " +
        "parser/analyzer sugar — the plan is identical to the " +
        "spelled-out form, which is the DuckDB oracle (DuckDB " +
        "supports all three, so the oracle uses the SAME sugar: two " +
        "engines must desugar identically).",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("q86_li")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (CAST(1 AS DECIMAL(18,2)) -
               CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev,
            round(rev / COUNT(*), 6) AS rev_per_item
          FROM q86_li
          WHERE l_quantity >= 20
          GROUP BY ALL
          ORDER BY ALL""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) -
        |     CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev,
        |  round(rev / COUNT(*), 6) AS rev_per_item
        |FROM lineitem
        |WHERE l_quantity >= 20
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin)),

    Q("q87_unpivot",
      "UNPIVOT / melt — the wide-to-long reshape (Dataset.unpivot, " +
        "the inverse of q29's pivot): per-nation aggregates of three " +
        "measures unpivoted to (nation, measure, value) rows. All " +
        "measures cast to DOUBLE via DECIMAL so the long format is " +
        "type-uniform and engine-exact; the oracle uses DuckDB's " +
        "standard-SQL UNPIVOT clause — the two engines' reshapes must " +
        "agree row-for-row.",
      (s, dir) => {
        val a = t(s, dir, "customer").groupBy("c_nationkey").agg(
          count(lit(1)).cast("double").as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("sum_bal"),
          min(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("min_bal"))
        a.unpivot(Array(col("c_nationkey")),
            Array(col("n_cust"), col("sum_bal"), col("min_bal")),
            "measure", "value")
          .orderBy("c_nationkey", "measure")
      },
      Some("""WITH a AS (SELECT c_nationkey,
        |  CAST(COUNT(*) AS DOUBLE) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_bal,
        |  CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS min_bal
        |  FROM customer GROUP BY 1)
        |SELECT c_nationkey, measure, value
        |FROM a UNPIVOT (value FOR measure IN (n_cust, sum_bal, min_bal))
        |ORDER BY c_nationkey, measure""".stripMargin)),

    Q("q88_binned_range_join",
      "BINNED point-in-interval range join (RangeJoin.pointInInterval " +
        "— the public binned-range-join shape, hand-expressed because " +
        "vanilla Spark plans a bare BETWEEN join as a broadcast " +
        "nested loop over every (point, interval) pair): shipments " +
        "counted into each sampled order's 30-day window with NO key " +
        "equality — points bin by floor(day/31), intervals replicate " +
        "to the ≤ 2 bins they touch, the equi-join runs per bin and " +
        "the exact BETWEEN re-verifies (lossless by construction, " +
        "spec-proved vs the theta join). The oracle is the bare " +
        "theta join — the binning must be invisible in results.",
      (s, dir) => {
        val epoch = to_date(lit("1970-01-01"))
        val pts = t(s, dir, "lineitem").select(
          datediff(to_date(col("l_shipdate")), epoch)
            .cast("long").as("sd"))
        val iv = t(s, dir, "orders")
          .filter(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey"),
            datediff(to_date(col("o_orderdate")), epoch)
              .cast("long").as("lo"))
          .withColumn("hi", col("lo") + 30)
        graft.operators.RangeJoin
          .pointInInterval(pts, "sd", iv, "lo", "hi", width = 31)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).cast("long").as("n_ship"))
          .orderBy("o_orderkey")
      },
      Some("""WITH iv AS (SELECT o_orderkey,
        |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS lo
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |p AS (SELECT CAST(l_shipdate AS DATE) - DATE '1970-01-01'
        |        AS sd
        |      FROM lineitem)
        |SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_ship
        |FROM iv JOIN p ON p.sd BETWEEN iv.lo AND iv.lo + 30
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    Q("q89_exact_percentiles",
      "EXACT per-group percentiles (p25/median/p90) via Spark's " +
        "sort-based `percentile` — the exact complement to the q26 " +
        "rank-selection and approx_percentile paths: both engines " +
        "use the classic (n−1)·p linear interpolation on the sorted " +
        "group, so the values hash-match bit-for-bit at 6 decimals " +
        "(probed before gating). Exact percentiles buffer the group — " +
        "fine for bounded group counts like this 3-flag split; an " +
        "unbounded-cardinality profile belongs on the approx/sketch " +
        "path (q25's discipline).",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag").agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"),
          count(lit(1)).cast("long").as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    Q("q90_tpch_q5_local_supplier",
      "TPC-H Q5 faithful — the 6-table CYCLIC join graph (customer ⋈ " +
        "orders ⋈ lineitem ⋈ supplier with the local-supplier " +
        "condition c_nationkey = s_nationkey closing the cycle, " +
        "⋈ nation ⋈ region): the classic join-ordering stress. " +
        "Declarative with broadcast hints on the dim chain " +
        "(supplier/nation/region — at TPC-H proportions supplier is " +
        "1% of customers, a legitimate broadcast at any SF); the " +
        "date filter pushes to the orders scan, the region filter " +
        "prunes nation before the fact side is touched. Revenue is " +
        "the exact DECIMAL Σ price·(1−discount), cast once.",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >=
              lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <
                lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region"))
            .filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(dec2(col("l_extendedprice")) *
            (lit(1).cast(D2) - dec2(col("l_discount"))))
          .cast("double"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
      Some("""SELECT n_name,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) -
        |     CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
        |    AS revenue
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |    AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin))
  )
}
