package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables.{events, t}

/** Declared relational query surface (SURVEY.md §2.2 / M3): one green
  * query per category, each with a DuckDB oracle.
  *
  * Scale notes (the 100 TB contract, local[32] is only the test rig):
  * dimension joins (`part`, `nation`, `region`) are explicit
  * `broadcast()`; fact-fact joins shuffle on their keys and rely on AQE;
  * every aggregate is partial+final (plain `groupBy.agg`); filters and
  * projections sit directly on the parquet scan so Catalyst pushes them
  * down. Global-window queries (q20) note their single-partition caveat.
  */
object Relational {

  private val D2 = DecimalType(18, 2)
  private def dec2(c: org.apache.spark.sql.Column) = c.cast(D2)

  val all: Seq[Q] = Seq(

    Q("q01_pricing_summary",
      "TPC-H Q1-style scan + filter + hash aggregate (partial+final).",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (dec2(lit(1)) - dec2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q02_brand_revenue",
      "Fact-to-dim join: part scales with SF, so join strategy is left to " +
        "the size threshold + AQE (broadcast at test scale, SMJ at 100 TB) — " +
        "a hard broadcast() hint here would OOM at scale.",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          sum(dec2(col("l_extendedprice")) * (dec2(lit(1)) - dec2(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    Q("q03_region_order_stats",
      "3-way join chain: shuffle join on the fact side, broadcast dims.",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
        .orderBy("r_name"),
      Some("""SELECT r_name, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    Q("q04_segment_big_spenders",
      "Left-semi join (EXISTS): customers with at least one 300k+ order.",
      (s, dir) => t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("q05_inactive_customers",
      "Left-anti join (NOT EXISTS): customers with no orders at all.",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_inactive")),
      Some("""SELECT COUNT(*) AS n_inactive FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin)),

    Q("q06_top_order_per_cust",
      "Window ranking: row_number over (partition by customer), deterministic tie-break.",
      (s, dir) => t(s, dir, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
        .limit(200),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey LIMIT 200""".stripMargin)),

    Q("q07_order_gaps",
      "Window lag + date arithmetic, folded to one exact-integer row.",
      (s, dir) => t(s, dir, "orders")
        .withColumn("prev", lag("o_orderdate", 1).over(
          Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")))
        .filter(col("prev").isNotNull)
        .select(datediff(col("o_orderdate"), col("prev")).cast("long").as("gap"))
        .agg(
          sum("gap").cast("long").as("total_gap_days"),
          count(lit(1)).as("n_gaps")),
      Some("""SELECT CAST(SUM(gap) AS BIGINT) AS total_gap_days, COUNT(*) AS n_gaps
        |FROM (SELECT date_diff('day',
        |        lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |        o_orderdate) AS gap
        |      FROM orders)
        |WHERE gap IS NOT NULL""".stripMargin)),

    Q("q08_topk_orders",
      "Global top-k: Spark plans TakeOrderedAndProject (no full sort at scale).",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    Q("q09_nation_setops",
      "Set operations: INTERSECT and EXCEPT over nation keys, tagged and unioned.",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").cast("long").as("k")).distinct()
        val p = t(s, dir, "supplier").select(col("s_nationkey").cast("long").as("k")).distinct()
        c.intersect(p).withColumn("op", lit("both"))
          .unionByName(c.except(p).withColumn("op", lit("cust_only")))
          .select("op", "k")
          .orderBy("op", "k")
      },
      Some("""SELECT 'both' AS op, k FROM (
        |  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS k FROM customer
        |  INTERSECT SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier)
        |UNION ALL
        |SELECT 'cust_only' AS op, k FROM (
        |  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS k FROM customer
        |  EXCEPT SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier)
        |ORDER BY op, k""".stripMargin)),

    Q("q10_string_fns",
      "Scalar string battery: case, length, substring, concat, regex, split, pad.",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_partkey") <= 100)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 8).as("prefix"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          lpad(col("p_brand"), 12, "_").as("padded"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS uname,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | substr(p_name, 1, 8) AS prefix,
        | concat_ws('-', p_brand, p_type) AS brand_type,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
        | string_split(p_name, ' ')[1] AS first_word,
        | lpad(p_brand, 12, '_') AS padded
        |FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""".stripMargin)),

    Q("q11_monthly_orders",
      "Date/time battery: year/month grouping, min/max dates.",
      (s, dir) => t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total_price"),
          min(col("o_orderdate")).cast("date").as("first_day"),
          max(col("o_orderdate")).cast("date").as("last_day"))
        .orderBy("y", "m"),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        | CAST(month(o_orderdate) AS BIGINT) AS m,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        | CAST(MIN(o_orderdate) AS DATE) AS first_day,
        | CAST(MAX(o_orderdate) AS DATE) AS last_day
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin)),

    Q("q12_math_fns",
      "Scalar math battery over a keyed slice (IEEE-deterministic ops only).",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 60)
        .select(
          col("l_orderkey"),
          col("l_linenumber").cast("long").as("line_no"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"),
          ceil(col("l_extendedprice")).cast("long").as("ceil_price"),
          floor(col("l_discount") * 100).cast("long").as("disc_pct"),
          (col("l_orderkey") % 7).as("mod7"),
          abs(col("l_quantity") - 25.0).as("absdev"))
        .orderBy("l_orderkey", "line_no"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        | round(sqrt(l_quantity), 6) AS sqrt_qty,
        | l_quantity * l_quantity AS qty_sq,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        | CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
        | l_orderkey % 7 AS mod7,
        | abs(l_quantity - 25.0) AS absdev
        |FROM lineitem WHERE l_orderkey <= 60 ORDER BY l_orderkey, line_no""".stripMargin)),

    Q("q13_doc_array_fns",
      "Array battery over tokenized documents: size/distinct/contains/sort/intersect.",
      (s, dir) => {
        val toks = split(col("text"), " ")
        t(s, dir, "documents").select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_unique"),
          array_contains(toks, "spark").as("has_spark"),
          element_at(array_sort(toks), 1).as("first_token"),
          size(array_intersect(toks, array(lit("spark"), lit("data"), lit("query"))))
            .cast("long").as("n_kw"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
        | list_contains(string_split(text, ' '), 'spark') AS has_spark,
        | list_sort(string_split(text, ' '))[1] AS first_token,
        | CAST(len(list_intersect(string_split(text, ' '), ['spark','data','query'])) AS BIGINT) AS n_kw
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q14_json_group",
      "JSON scalar extraction feeding an exact aggregate — via VARIANT " +
        "(try_parse_json + try_variant_get): the string parses ONCE into " +
        "the binary variant encoding and the path lookup is a cheap " +
        "binary probe, ~40% faster than get_json_object's per-call " +
        "JsonPath evaluation and the right shape for repeated extraction " +
        "at 100 TB. Invalid JSON rows yield NULL (skipped by SUM), same " +
        "as get_json_object.",
      (s, dir) => events(s, dir)
        .groupBy("event_type")
        .agg(
          sum(try_variant_get(try_parse_json(col("props")), "$.k", "long"))
            .cast("long").as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("q15_rollup_pricing",
      "ROLLUP grouping sets with NULL subtotal rows.",
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    Q("q16_distinct_parts",
      "Distinct aggregation (expand + two-phase) per group.",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        | COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q17_loyal_customers",
      "Aggregate + HAVING re-aggregated to one exact row.",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 15)
        .agg(
          count(lit(1)).as("n_loyal"),
          max("cnt").cast("long").as("max_orders"),
          sum("cnt").cast("long").as("their_orders")),
      Some("""SELECT COUNT(*) AS n_loyal, CAST(MAX(cnt) AS BIGINT) AS max_orders,
        | CAST(SUM(cnt) AS BIGINT) AS their_orders
        |FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders
        |      GROUP BY o_custkey HAVING COUNT(*) >= 15)""".stripMargin)),

    Q("q18_cube_events",
      "CUBE over event type × month with exact decimal totals.",
      (s, dir) => events(s, dir)
        .cube(col("event_type"), month(col("ts")).cast("long").as("m"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("total_value"))
        .orderBy(col("event_type").asc_nulls_first, col("m").asc_nulls_first),
      Some("""SELECT event_type, CAST(month(ts) AS BIGINT) AS m, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY CUBE(event_type, month(ts))
        |ORDER BY event_type NULLS FIRST, m NULLS FIRST""".stripMargin)),

    Q("q19_moving_sum",
      "Window frame (ROWS BETWEEN 2 PRECEDING): exact decimal moving sum.",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
              .rowsBetween(-2, 0))
            .cast("double").as("moving_sum"))
        .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
        |FROM orders WHERE o_custkey < 50 ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q31_range_frame",
      "RANGE window frame (vs q19's ROWS): per customer, orders placed " +
        "in the 30 days strictly before each order — a value-based frame " +
        "over an integer day ordinal, identical semantics both engines.",
      (s, dir) => {
        val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
        t(s, dir, "orders")
          .filter(col("o_custkey") < 50)
          .select(
            col("o_custkey"), col("o_orderkey"),
            count(lit(1)).over(
              Window.partitionBy("o_custkey").orderBy(day)
                .rangeBetween(-30, -1)).as("prior_30d_orders"),
            sum(dec2(col("o_totalprice"))).over(
              Window.partitionBy("o_custkey").orderBy(day)
                .rangeBetween(-30, -1))
              .cast("double").as("prior_30d_spend"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        | COUNT(*) OVER w AS prior_30d_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS prior_30d_spend
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
        |  RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q32_full_outer",
      "FULL OUTER join with null-side handling: per-customer order " +
        "counts joined back to the customer dim — customers with no " +
        "orders surface with n_orders = 0 via coalesce.",
      (s, dir) => {
        val perCust = t(s, dir, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
        t(s, dir, "customer")
          .join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            coalesce(col("n_ord"), lit(0L)).as("n_orders"),
            col("c_mktsegment").isNull.cast("boolean").as("unknown_customer"))
          .orderBy("custkey")
      },
      Some("""SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        | COALESCE(n_ord, 0) AS n_orders,
        | c_mktsegment IS NULL AS unknown_customer
        |FROM customer
        |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_ord
        |                 FROM orders GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin)),

    Q("q33_exists_subquery",
      "Correlated EXISTS / NOT EXISTS through the SQL surface — " +
        "Catalyst decorrelates both into semi/anti joins (no per-row " +
        "subquery execution).",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("q33_customer")
        t(s, dir, "orders").createOrReplaceTempView("q33_orders")
        s.sql("""SELECT c_mktsegment,
            COUNT(*) AS n_customers,
            CAST(SUM(CASE WHEN EXISTS (
              SELECT 1 FROM q33_orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
              THEN 1 ELSE 0 END) AS BIGINT) AS n_big_spenders,
            CAST(SUM(CASE WHEN NOT EXISTS (
              SELECT 1 FROM q33_orders o WHERE o.o_custkey = c.c_custkey)
              THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive
          FROM q33_customer c
          GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment,
        | COUNT(*) AS n_customers,
        | CAST(SUM(CASE WHEN EXISTS (
        |   SELECT 1 FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_big_spenders,
        | CAST(SUM(CASE WHEN NOT EXISTS (
        |   SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive
        |FROM customer c
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("q20_price_quartiles",
      "Exact ntile quartiles via graft.operators.RankOps.globalNtile — " +
        "two-phase range-rank (range repartition + local rank + broadcast " +
        "offsets), NOT Spark's single-partition global window; scales to " +
        "any row count.",
      (s, dir) => graft.operators.RankOps.globalNtile(
          t(s, dir, "orders").select("o_totalprice", "o_orderkey"),
          Seq(col("o_totalprice"), col("o_orderkey")), 4, "bucket")
        .select(col("bucket"), col("o_totalprice"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .orderBy("bucket"),
      Some("""SELECT bucket, COUNT(*) AS n, MIN(o_totalprice) AS min_price,
        | MAX(o_totalprice) AS max_price
        |FROM (SELECT ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket,
        |             o_totalprice FROM orders)
        |GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("q26_percentiles",
      "Discrete rank-based percentiles per group (value at ceil(p*n) in a " +
        "fully tie-broken order) — exact data values, bit-identical across " +
        "engines; interpolated percentile formulas differ in FP shape.",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        t(s, dir, "orders")
          .select(
            col("o_orderpriority"), col("o_totalprice"),
            row_number().over(w).as("rn"),
            count(lit(1)).over(Window.partitionBy("o_orderpriority")).as("n"))
          .groupBy("o_orderpriority")
          .agg(
            max(when(col("rn") === ceil(col("n") * 0.5), col("o_totalprice")))
              .as("p50"),
            max(when(col("rn") === ceil(col("n") * 0.9), col("o_totalprice")))
              .as("p90"),
            max("n").cast("long").as("n"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
        | MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN o_totalprice END) AS p50,
        | MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN o_totalprice END) AS p90,
        | CAST(MAX(n) AS BIGINT) AS n
        |FROM (SELECT o_orderpriority, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |        COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |      FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("w01_daily_events",
      "Tumbling event-time window (batch form of the streaming window op).",
      (s, dir) => events(s, dir)
        .groupBy(window(col("ts"), "1 day"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("total_value"))
        .select(
          col("window.start").cast("date").as("day"),
          col("n"), col("total_value"))
        .orderBy("day"),
      Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin)),

    Q("q28_grouping_sets",
      "Explicit GROUPING SETS (the general form rollup/cube specialize): " +
        "(status, priority) + (status) + grand total in one aggregation " +
        "pass (Spark expands then hash-aggregates — no re-scan per set).",
      (s, dir) => t(s, dir, "orders")
        .groupingSets(
          Seq(
            Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")),
            Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority"),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        | COALESCE(o_orderpriority, 'ALL') AS priority,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY status, priority""".stripMargin)),

    Q("q29_pivot",
      "PIVOT: event counts per user segment × event type, one wide row " +
        "per nation — pivot is an Expand+aggregate in Spark (single " +
        "pass); the oracle spells it as portable CASE aggregation.",
      (s, dir) => events(s, dir)
        .join(t(s, dir, "customer"), col("user_id") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .pivot("event_type", Seq("click", "purchase", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("n_name"),
          col("click").as("n_click"),
          col("purchase").as("n_purchase"),
          col("error").as("n_error"))
        .orderBy("n_name"),
      Some("""SELECT n_name,
        | COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
        | COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        | COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    Q("q30_udtf_lateral",
      "Custom Generator (UDTF) through the SQL surface: LATERAL VIEW " +
        "explode_shingles (codegen'd, registered via GraftExtensions) — " +
        "repeated-shingle frequencies over a doc slice.",
      (s, dir) => {
        graft.GraftExtensions.install(s)
        t(s, dir, "documents").filter(col("doc_id") < 20)
          .createOrReplaceTempView("q30_docs")
        s.sql("""SELECT shingle, COUNT(*) AS n
          FROM q30_docs LATERAL VIEW explode_shingles(text, 3) sh AS shingle
          GROUP BY shingle HAVING COUNT(*) >= 2
          ORDER BY shingle""")
      },
      Some("""SELECT sh AS shingle, COUNT(*) AS n
        |FROM (SELECT unnest(list_transform(
        |        generate_series(1, len(string_split(text, ' ')) - 2),
        |        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS sh
        |      FROM documents WHERE doc_id < 20)
        |GROUP BY sh HAVING COUNT(*) >= 2 ORDER BY shingle""".stripMargin)),

    Q("q34_setops_all",
      "Multiset set ops (INTERSECT ALL / EXCEPT ALL) — the bag-semantics " +
        "variants q09's set-semantics pass skips. Spark plans both as a " +
        "single aggregate+generate per op (count min / count difference " +
        "with replicate_rows), not a join per duplicate.",
      (s, dir) => {
        val a = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        val b = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
        a.intersectAll(b).withColumn("op", lit("intersect_all"))
          .union(a.exceptAll(b).withColumn("op", lit("except_all")))
          .groupBy("op", "nk")
          .agg(count(lit(1)).as("n"))
          .orderBy("op", "nk")
      },
      Some("""WITH a AS (SELECT c_nationkey AS nk FROM customer),
        |     b AS (SELECT s_nationkey AS nk FROM supplier),
        |     ia AS (SELECT nk FROM a INTERSECT ALL SELECT nk FROM b),
        |     ea AS (SELECT nk FROM a EXCEPT ALL SELECT nk FROM b)
        |SELECT op, nk, n FROM (
        |  SELECT 'intersect_all' AS op, nk, COUNT(*) AS n FROM ia GROUP BY nk
        |  UNION ALL
        |  SELECT 'except_all' AS op, nk, COUNT(*) AS n FROM ea GROUP BY nk)
        |ORDER BY op, nk""".stripMargin)),

    Q("q35_scalar_in_subquery",
      "Scalar + IN + NOT IN subqueries through the SQL surface: the " +
        "scalar aggregate becomes a broadcast one-row join; IN/NOT IN " +
        "decorrelate to semi/anti joins (NOT IN with the null-safe " +
        "anti-join Catalyst plans for three-valued logic).",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("q35_orders")
        t(s, dir, "customer").createOrReplaceTempView("q35_customer")
        t(s, dir, "nation").createOrReplaceTempView("q35_nation")
        t(s, dir, "supplier").createOrReplaceTempView("q35_supplier")
        // The scalar threshold is SUM(DECIMAL)/COUNT — NOT AVG: Spark's
        // AVG(DECIMAL) is exact decimal while DuckDB's is an FP-summed
        // DOUBLE, and an unrounded cross-engine threshold could flip
        // rows at the boundary. Decimal sum → double → divide is
        // bit-identical in both engines.
        s.sql("""SELECT c_mktsegment, COUNT(*) AS n_orders,
            CAST(SUM(CASE WHEN o_totalprice >
              (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) FROM q35_orders)
              THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg,
            CAST(SUM(CASE WHEN c_nationkey IN
              (SELECT s_nationkey FROM q35_supplier) THEN 1 ELSE 0 END) AS BIGINT)
              AS n_supplied_nation,
            CAST(SUM(CASE WHEN c_nationkey NOT IN
              (SELECT n_nationkey FROM q35_nation WHERE n_name LIKE 'A%')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_not_a_nation
          FROM q35_orders JOIN q35_customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
        | CAST(SUM(CASE WHEN o_totalprice >
        |   (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*) FROM orders)
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg,
        | CAST(SUM(CASE WHEN c_nationkey IN
        |   (SELECT s_nationkey FROM supplier) THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_supplied_nation,
        | CAST(SUM(CASE WHEN c_nationkey NOT IN
        |   (SELECT n_nationkey FROM nation WHERE n_name LIKE 'A%')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_not_a_nation
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("q36_bucketed_join",
      "Bucketed co-located join: both sides written bucketBy(8, key) + " +
        "sortBy into the session catalog, then joined — Spark plans a " +
        "sort-merge join with ZERO shuffle exchanges (bucket-local " +
        "sorts; BucketingSpec asserts the Exchange-free plan). The " +
        "storage-layout answer to repeated fact-fact joins at 100 TB: " +
        "pay the shuffle once at write time, never per query. Result " +
        "must equal the plain-join oracle.",
      (s, dir) => {
        // A previous SESSION's warehouse directory outlives the
        // in-memory catalog, and saveAsTable refuses to claim a stale
        // location — drop the catalog entry AND the leftover directory.
        Warehouse.reset(s, "q36_orders_b")
        Warehouse.reset(s, "q36_customer_b")
        t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable("q36_orders_b")
        t(s, dir, "customer")
          .select("c_custkey", "c_mktsegment")
          .write.mode("overwrite")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable("q36_customer_b")
        s.table("q36_orders_b")
          .join(s.table("q36_customer_b"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_orders"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("q37_format_roundtrip",
      "Source/sink format breadth: the same projection written to CSV " +
        "(header, explicit read schema — no sampling inference) and ORC, " +
        "read back and joined — every value must survive both roundtrips " +
        "exactly (Java double toString/parse is lossless, ORC is binary), " +
        "proven against an oracle over the ORIGINAL parquet.",
      (s, dir) => {
        // FIXED temp location, overwritten per run: the lambda returns a
        // lazy frame, so a per-run random dir could never be deleted
        // safely before execution — a stable path bounds the leak to one
        // copy instead of one per Verify sweep.
        val tmp = new java.io.File(
          System.getProperty("java.io.tmpdir"), "graft-q37").getPath
        val proj = t(s, dir, "part")
          .select("p_partkey", "p_name", "p_retailprice", "p_size")
        proj.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
        proj.write.mode("overwrite").orc(s"$tmp/orc")
        val csv = s.read
          .schema("p_partkey LONG, p_name STRING, p_retailprice DOUBLE, p_size INT")
          .option("header", "true").csv(s"$tmp/csv")
        val orc = s.read.orc(s"$tmp/orc")
        csv.select("p_partkey", "p_name", "p_retailprice")
          .join(orc.select(col("p_partkey").as("k2"), col("p_size")),
            col("p_partkey") === col("k2"))
          .groupBy(col("p_size").cast("long").as("p_size"))
          .agg(
            count(lit(1)).as("n"),
            sum(dec2(col("p_retailprice"))).cast("double").as("sum_price"),
            max(length(col("p_name"))).cast("long").as("max_name_len"))
          .orderBy("p_size")
      },
      Some("""SELECT CAST(p_size AS BIGINT) AS p_size, COUNT(*) AS n,
        | CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | CAST(MAX(len(p_name)) AS BIGINT) AS max_name_len
        |FROM part GROUP BY p_size ORDER BY p_size""".stripMargin)),

    Q("q39_stats_moments",
      "Statistical aggregates (corr, sample stddev) made engine-portable " +
        "by computing them FROM EXACT DECIMAL MOMENT SUMS (n, Σx, Σy, " +
        "Σx², Σy², Σxy — order-free, both engines bit-identical) cast to " +
        "double only at the final formula, q25-style: Spark's built-in " +
        "single-pass corr/stddev_samp are asserted within 1e-6 of the " +
        "exact values. One aggregation pass computes all six moments AND " +
        "both built-ins.",
      (s, dir) => {
        val q = dec2(col("l_quantity"))
        val p = dec2(col("l_extendedprice"))
        def d(n: String) = col(n).cast("double")
        val nd = d("n_rows")
        val corrE = (nd * d("_sqp") - d("_sq") * d("_sp")) /
          (sqrt(nd * d("_sqq") - d("_sq") * d("_sq")) *
            sqrt(nd * d("_spp") - d("_sp") * d("_sp")))
        val stdE = sqrt((nd * d("_spp") - d("_sp") * d("_sp")) /
          (nd * (nd - lit(1.0))))
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(q).as("_sq"), sum(p).as("_sp"),
            sum(q * q).as("_sqq"), sum(p * p).as("_spp"),
            sum(q * p).as("_sqp"),
            corr(col("l_quantity"), col("l_extendedprice")).as("_bcorr"),
            stddev_samp(col("l_extendedprice")).as("_bstd"))
          .select(col("l_returnflag"), col("n_rows"),
            corrE.as("corr_qty_price"), stdE.as("stddev_price"),
            (abs(col("_bcorr") - corrE) < 1e-6).as("corr_builtin_ok"),
            (abs(col("_bstd") - stdE) / stdE < 1e-6).as("stddev_builtin_ok"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (
        | SELECT l_returnflag, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |       * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |       * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n_rows,
        | (n_rows*sqp - sq*sp)
        |   / (sqrt(n_rows*sqq - sq*sq) * sqrt(n_rows*spp - sp*sp))
        |   AS corr_qty_price,
        | sqrt((n_rows*spp - sp*sp) / (n_rows*(n_rows - 1.0)))
        |   AS stddev_price,
        | true AS corr_builtin_ok,
        | true AS stddev_builtin_ok
        |FROM m ORDER BY l_returnflag""".stripMargin)),

    Q("q40_merge_upsert",
      "MERGE INTO semantics without a table format — the CDC upsert " +
        "shape: target (customer) FULL OUTER JOIN source (per-customer " +
        "order totals + synthetic new keys), three-branch action " +
        "classification (update / insert / keep) and merged balance in " +
        "one projection. On a real lakehouse sink the same plan feeds a " +
        "partition-overwrite write; the join shuffles on the key both " +
        "sides — broadcast if the changeset is small. Exact decimal " +
        "balances; per-action counts and totals.",
      (s, dir) => {
        // Changeset restricted to 2/3 of keys so all three MERGE
        // branches are live (every customer has orders in this data —
        // an unfiltered source would leave 'keep' unexercised).
        val g = t(s, dir, "orders")
          .filter(col("o_custkey") % 3 =!= 1)
          .groupBy("o_custkey")
          .agg(sum(dec2(col("o_totalprice"))).as("delta"))
        val src = g.select(col("o_custkey").as("k"), col("delta"))
          .union(g.filter(col("o_custkey") < 50)
            .select((col("o_custkey") + 10000000L).as("k"), col("delta")))
        val bal = dec2(col("c_acctbal"))
        t(s, dir, "customer")
          .join(src, col("c_custkey") === col("k"), "full_outer")
          .select(
            when(col("c_custkey").isNotNull && col("k").isNotNull, "update")
              .when(col("c_custkey").isNull, "insert")
              .otherwise("keep").as("action"),
            when(col("k").isNull, bal)
              .when(col("c_custkey").isNull, col("delta"))
              .otherwise(bal + col("delta")).as("bal"))
          .groupBy("action")
          .agg(count(lit(1)).as("n"),
            sum(col("bal")).cast("double").as("total_bal"))
          .orderBy("action")
      },
      Some("""WITH g AS (
        | SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS delta
        | FROM orders WHERE o_custkey % 3 <> 1 GROUP BY o_custkey),
        |s AS (
        | SELECT o_custkey AS k, delta FROM g
        | UNION ALL
        | SELECT o_custkey + 10000000, delta FROM g WHERE o_custkey < 50),
        |m AS (
        | SELECT
        |  CASE WHEN c.c_custkey IS NOT NULL AND s.k IS NOT NULL THEN 'update'
        |       WHEN c.c_custkey IS NULL THEN 'insert'
        |       ELSE 'keep' END AS action,
        |  CASE WHEN s.k IS NULL THEN CAST(c.c_acctbal AS DECIMAL(18,2))
        |       WHEN c.c_custkey IS NULL THEN s.delta
        |       ELSE CAST(c.c_acctbal AS DECIMAL(18,2)) + s.delta END AS bal
        | FROM customer c FULL JOIN s ON c.c_custkey = s.k)
        |SELECT action, COUNT(*) AS n, CAST(SUM(bal) AS DOUBLE) AS total_bal
        |FROM m GROUP BY action ORDER BY action""".stripMargin)),

    Q("q41_recursive_cte",
      "WITH RECURSIVE through Spark's native UnionLoop (4.x): walk each " +
        "customer's order chain in o_orderdate order accumulating an " +
        "exact-decimal running spend; emit the chain tail (depth + total). " +
        "Each iteration is one join of the frontier (one row per customer) " +
        "against the rank-indexed orders — the loop does O(max-chain) " +
        "bounded joins, not one join per row; the frontier never exceeds " +
        "|customers|. Recursion depth = max orders per customer (~25 at " +
        "sf0.01), far under the configured limit.",
      (s, dir) => {
        // Raise the recursion limit only for this query's execution and
        // restore the previous session value (no cross-query conf leak);
        // localCheckpoint forces the loop to run while the limit is up.
        val limitKey = "spark.sql.cteRecursionLevelLimit"
        val prevLimit = s.conf.getOption(limitKey)
        s.conf.set(limitKey, "500")
        try {
          t(s, dir, "orders").filter(col("o_custkey") <= 300)
            .createOrReplaceTempView("q41_orders")
          s.sql("""
          WITH RECURSIVE ranked AS (
            SELECT o_custkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rk
            FROM q41_orders
          ),
          chain (o_custkey, rk, cum) AS (
            SELECT o_custkey, rk, CAST(o_totalprice AS DECIMAL(28,2))
            FROM ranked WHERE rk = 1
            UNION ALL
            SELECT r.o_custkey, r.rk,
                   CAST(c.cum + CAST(r.o_totalprice AS DECIMAL(28,2))
                        AS DECIMAL(28,2))
            FROM chain c JOIN ranked r
              ON r.o_custkey = c.o_custkey AND r.rk = c.rk + 1
          )
          SELECT o_custkey, CAST(MAX(rk) AS BIGINT) AS chain_len,
                 CAST(MAX_BY(cum, rk) AS DOUBLE) AS total_spend
          FROM chain GROUP BY o_custkey ORDER BY o_custkey""").localCheckpoint()
        } finally prevLimit match {
          case Some(v) => s.conf.set(limitKey, v)
          case None    => s.conf.unset(limitKey)
        }
      },
      Some("""WITH RECURSIVE ranked AS (
        |  SELECT o_custkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rk
        |  FROM orders WHERE o_custkey <= 300
        |),
        |chain (o_custkey, rk, cum) AS (
        |  SELECT o_custkey, rk, CAST(o_totalprice AS DECIMAL(28,2))
        |  FROM ranked WHERE rk = 1
        |  UNION ALL
        |  SELECT r.o_custkey, r.rk,
        |         CAST(c.cum + CAST(r.o_totalprice AS DECIMAL(28,2))
        |              AS DECIMAL(28,2))
        |  FROM chain c JOIN ranked r
        |    ON r.o_custkey = c.o_custkey AND r.rk = c.rk + 1
        |)
        |SELECT o_custkey, CAST(MAX(rk) AS BIGINT) AS chain_len,
        |       CAST(MAX_BY(cum, rk) AS DOUBLE) AS total_spend
        |FROM chain GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    Q("q42_unpivot",
      "Wide→long UNPIVOT (melt): per-returnflag exact-decimal aggregates " +
        "unpivoted into (flag, metric, value) rows via Dataset.unpivot — " +
        "planned as a single Expand over the aggregated (tiny) frame, " +
        "never touching the fact table again. Oracle is the portable " +
        "UNION ALL spelling of the same melt.",
      (s, dir) => {
        val wide = t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
            count(lit(1)).cast("double").as("n_items"))
        wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("n_items")),
          "metric", "value")
          .orderBy("l_returnflag", "metric")
      },
      Some("""WITH w AS (
        | SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(COUNT(*) AS DOUBLE) AS n_items
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price', sum_price FROM w
        |  UNION ALL
        |  SELECT l_returnflag, 'n_items', n_items FROM w)
        |ORDER BY l_returnflag, metric""".stripMargin)),

    Q("q43_lateral_topn",
      "LATERAL correlated subquery with ORDER BY + LIMIT: per-nation " +
        "top-2 customers by balance. Spark decorrelates the lateral into " +
        "a ranked window join (one shuffle on the correlation key) — not " +
        "a per-outer-row re-execution.",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("q43_nation")
        t(s, dir, "customer").createOrReplaceTempView("q43_customer")
        s.sql("""
          SELECT n.n_name, c.c_custkey,
                 CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
          FROM q43_nation n,
          LATERAL (SELECT c_custkey, c_acctbal FROM q43_customer
                   WHERE c_nationkey = n.n_nationkey
                   ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
          ORDER BY n.n_name, bal DESC, c.c_custkey""")
      },
      Some("""SELECT n.n_name, c.c_custkey,
        | CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n.n_name, bal DESC, c.c_custkey""".stripMargin)),

    Q("q44_agg_filter",
      "FILTER-clause aggregates: unconditional, conditionally-filtered, " +
        "and filtered-DISTINCT aggregates over different predicates, all " +
        "in ONE scan + one aggregation pass (each FILTER compiles to a " +
        "conditional partial-agg update — never a scan per predicate; " +
        "the DISTINCT column adds the standard two-phase expand).",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("q44_orders")
        s.sql("""
          SELECT o_orderpriority,
                 COUNT(*) AS n,
                 COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
                 CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS sum_f,
                 COUNT(DISTINCT o_custkey)
                   FILTER (WHERE o_totalprice > 200000) AS n_cust_big
          FROM q44_orders
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority,
        | COUNT(*) AS n,
        | COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        | CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS sum_f,
        | COUNT(DISTINCT o_custkey)
        |   FILTER (WHERE o_totalprice > 200000) AS n_cust_big
        |FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("q45_window_breadth",
      "Remaining analytic window functions — dense_rank, percent_rank, " +
        "cume_dist, first_value, nth_value — all over ONE fully " +
        "tie-broken window spec, so the plan is a single hash-partition " +
        "exchange + one sort per partition feeding every function. The " +
        "rank ratios are exact-integer divisions, identical on any " +
        "engine.",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders").filter(col("o_custkey") < 100)
          .select(
            col("o_orderpriority"), col("o_orderkey"),
            dense_rank().over(w).cast("long").as("dr"),
            round(percent_rank().over(w), 9).as("pr"),
            round(cume_dist().over(w), 9).as("cd"),
            first(col("o_orderkey")).over(w).as("top_key"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey,
        | CAST(dense_rank() OVER w AS BIGINT) AS dr,
        | round(percent_rank() OVER w, 9) AS pr,
        | round(cume_dist() OVER w, 9) AS cd,
        | first_value(o_orderkey) OVER w AS top_key,
        | nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    Q("q46_approx_percentile_bound",
      "Mergeable-sketch quantiles with a verified contract (q25's trick " +
        "for percentile_approx): per group, the in-engine KLL-style " +
        "sketch's median must land within the documented rank error " +
        "(n/accuracy, +1 for ties). The oracled columns are the EXACT " +
        "discrete median and the bound assertion — the sketch value " +
        "itself is engine-specific, its error contract is not. At 100 TB " +
        "this sketch (partial-mergeable, O(accuracy) state) replaces " +
        "q26's full per-group sort.",
      (s, dir) => {
        val od = t(s, dir, "orders")
        val ap = od.groupBy("o_orderstatus")
          .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
            .as("apx"))
        val w = Window.partitionBy("o_orderstatus")
          .orderBy("o_totalprice", "o_orderkey")
        val exact = od
          .select(col("o_orderstatus"), col("o_totalprice"),
            row_number().over(w).as("rn"),
            count(lit(1)).over(Window.partitionBy("o_orderstatus")).as("n"))
          .groupBy("o_orderstatus")
          .agg(
            max(when(col("rn") === ceil(col("n") * 0.5), col("o_totalprice")))
              .as("exact_p50"),
            max("n").cast("long").as("n"))
        // Tie-aware rank interval: the sketch contract bounds SOME rank
        // of the returned element, so with k-way ties at the sketch
        // value the element's rank RANGE [count(<)+1, count(<=)] must
        // intersect the allowed band — a single count(<=) rank would
        // spuriously fail the gate on tied data.
        val rk = od.join(broadcast(ap), "o_orderstatus")
          .groupBy("o_orderstatus")
          .agg(
            sum(when(col("o_totalprice") < col("apx"), 1L).otherwise(0L))
              .as("rank_lo"),
            sum(when(col("o_totalprice") <= col("apx"), 1L).otherwise(0L))
              .as("rank_hi"))
        exact.join(rk, "o_orderstatus")
          .select(col("o_orderstatus"), col("n"), col("exact_p50"),
            (col("rank_lo") + 1.0 <= col("n") * 0.5 + col("n") / 1000.0 &&
              col("rank_hi") >= col("n") * 0.5 - col("n") / 1000.0)
              .as("within_bound"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, CAST(MAX(n) AS BIGINT) AS n,
        | MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN o_totalprice END)
        |   AS exact_p50,
        | true AS within_bound
        |FROM (SELECT o_orderstatus, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderstatus
        |                           ORDER BY o_totalprice, o_orderkey) AS rn,
        |        COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        |      FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    Q("q47_merge_schema",
      "Parquet schema evolution on read: two file generations with " +
        "different columns (v1: partkey+name, v2: partkey+retailprice — " +
        "the add-a-column rollout) unioned by mergeSchema=true into the " +
        "superset schema, absent columns NULL. The footer-merge cost is " +
        "why it's off by default at 100 TB — production pins the merged " +
        "schema explicitly; per-generation counts prove the NULL-fill " +
        "semantics either way.",
      (s, dir) => {
        // Per-run temp dir, removed after the (eager) localCheckpoint
        // materializes the one-row result — no leak, no cross-run
        // interference on a shared fixed path.
        val tmp = java.nio.file.Files.createTempDirectory("graft-q47").toString
        val p = t(s, dir, "part")
        p.filter(col("p_partkey") % 2 === 0)
          .select("p_partkey", "p_name")
          .write.mode("overwrite").parquet(s"$tmp/gen=1")
        p.filter(col("p_partkey") % 2 === 1)
          .select("p_partkey", "p_retailprice")
          .write.mode("overwrite").parquet(s"$tmp/gen=2")
        val res = s.read.option("mergeSchema", "true")
          .parquet(s"$tmp/gen=1", s"$tmp/gen=2")
          .agg(
            count(lit(1)).as("n"),
            count(col("p_name")).as("n_with_name"),
            count(col("p_retailprice")).as("n_with_price"),
            sum(dec2(col("p_retailprice"))).cast("double").as("sum_price"))
          .localCheckpoint()
        Rm.rf(tmp)
        res
      },
      Some("""SELECT COUNT(*) AS n,
        | COUNT(*) FILTER (WHERE p_partkey % 2 = 0) AS n_with_name,
        | COUNT(*) FILTER (WHERE p_partkey % 2 = 1) AS n_with_price,
        | CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)))
        |   FILTER (WHERE p_partkey % 2 = 1) AS DOUBLE) AS sum_price
        |FROM part""".stripMargin)),

    Q("q48_partitioned_pruning",
      "Hive-style partitioned parquet layout (write partitionBy, read " +
        "with a partition predicate): the filter prunes DIRECTORIES at " +
        "planning time (plan shows PartitionFilters, zero data files of " +
        "other event types opened) — the coarse-grained complement to " +
        "q38's in-file stats skipping, and the layout that makes " +
        "dt/source retention DROPs possible at 100 TB. Pruning evidence " +
        "comes from the PHYSICAL PLAN (the scan's PartitionFilters must " +
        "carry the literal predicate) — any row-level check such as " +
        "distinct event_type would be 1 by the filter alone, plan or no " +
        "plan.",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-q48").toString
        events(s, dir)
          .select("event_id", "event_type", "value")
          .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
        val agg = s.read.parquet(tmp)
          .filter(col("event_type") === "purchase")
          .agg(
            count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("sum_value"))
        val planned = raw"PartitionFilters: \[[^\]]*=\s*purchase"
          .r.findFirstIn(agg.queryExecution.executedPlan.toString).isDefined
        val res = agg
          .select(col("n"),
            lit(if (planned) 1L else 0L).as("pruning_planned"),
            col("sum_value"))
          .localCheckpoint()
        Rm.rf(tmp)
        res
      },
      Some("""SELECT COUNT(*) AS n,
        | CAST(1 AS BIGINT) AS pruning_planned,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type = 'purchase'""".stripMargin)),

    Q("q49_compaction",
      "Small-file compaction (graft.operators.Compact.parquet) — the " +
        "lakehouse maintenance op that keeps scan task counts sane: the " +
        "input is deliberately fragmented into 64 tiny files, then " +
        "rewritten targeting bytes/4 per file -> exactly 4 output files " +
        "(planPartitions = ceil(in/target)), with row count and an " +
        "exact-decimal value sum proving nothing was lost or doubled. " +
        "At 100 TB the same call sizes files to 128 MB and runs per " +
        "partition directory.",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-q49").toString
        try {
          events(s, dir).select("event_id", "event_type", "value")
            .repartition(64)
            .write.mode("overwrite").parquet(s"$tmp/frag")
          val before = s.read.parquet(s"$tmp/frag")
            .select(input_file_name()).distinct().count()
          val bytes = graft.operators.Compact.sizeOf(s, s"$tmp/frag")
          val (_, nOut) = graft.operators.Compact.parquet(
            s, s"$tmp/frag", s"$tmp/out",
            targetBytes = math.max(1L, (bytes + 3) / 4))
          val compacted = s.read.parquet(s"$tmp/out")
          val after = compacted.select(input_file_name()).distinct().count()
          // The oracle pins 64 -> 4 files; fail HERE with a readable message
          // (not a downstream hash mismatch) if data volume or write sizing
          // ever drifts from that assumption.
          require(before == 64L,
            s"q49 expects 64 fragment files (one per non-empty repartition " +
              s"slice), got $before — events row count or file sizing changed")
          require(nOut == 4 && after == 4L,
            s"q49 expects 4 compacted files (planned=$nOut, written=$after) " +
              "— Compact.parquet sizing or partition emptiness changed")
          compacted
            .agg(count(lit(1)).as("n_rows"),
              sum(dec2(col("value"))).cast("double").as("sum_value"))
            .select(lit(before).as("n_files_before"),
              lit(after).as("n_files_after"),
              lit(nOut.toLong).as("n_files_planned"),
              col("n_rows"), col("sum_value"))
            .localCheckpoint()
        } finally Rm.rf(tmp)
      },
      Some("""SELECT CAST(64 AS BIGINT) AS n_files_before,
        | CAST(4 AS BIGINT) AS n_files_after,
        | CAST(4 AS BIGINT) AS n_files_planned,
        | COUNT(*) AS n_rows,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events""".stripMargin)),

    Q("q50_dynamic_partition_pruning",
      "DYNAMIC partition pruning: the partition predicate is not a " +
        "literal (q48) but comes from a filtered dimension at RUNTIME — " +
        "Catalyst plans a dynamicpruning subquery on the fact scan's " +
        "PartitionFilters, so only the dimension-selected directories " +
        "are read. At 100 TB this is the date-dim x fact pattern: the " +
        "dim filter prunes years of partitions without a literal in the " +
        "query text.",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-q50").toString
        events(s, dir)
          .select("event_id", "event_type", "value")
          .write.mode("overwrite").partitionBy("event_type").parquet(s"$tmp/fact")
        import s.implicits._
        // The dim must be a SCANNED relation with a comparison filter:
        // a pre-filtered LocalRelation constant-folds the Filter away and
        // a bare-boolean predicate fails isLikelySelective — either way
        // the PartitionPruning rule declines and the scan degrades to
        // static isnotnull-only PartitionFilters (verified both ways).
        Seq(("purchase", "keep"), ("click", "drop"), ("view", "drop"))
          .toDF("et", "grp").write.mode("overwrite").parquet(s"$tmp/dim")
        val dim = s.read.parquet(s"$tmp/dim")
        val agg = s.read.parquet(s"$tmp/fact")
          .join(dim.filter(col("grp") === "keep"), col("event_type") === col("et"))
          .agg(
            count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("sum_value"))
        // Same plan-not-rows evidence rule as q48: the fact scan's
        // PartitionFilters must carry the runtime dynamicpruning subquery.
        val planned = agg.queryExecution.executedPlan.toString
          .toLowerCase(java.util.Locale.ROOT).contains("dynamicpruning")
        val res = agg
          .select(col("n"),
            lit(if (planned) 1L else 0L).as("dpp_planned"),
            col("sum_value"))
          .localCheckpoint()
        Rm.rf(tmp)
        res
      },
      Some("""SELECT COUNT(*) AS n,
        | CAST(1 AS BIGINT) AS dpp_planned,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type = 'purchase'""".stripMargin)),

    Q("q63_cbo_stats_join",
      "CATALOG-STATISTICS-driven join planning (the CBO evidence q48/" +
        "q50's runtime pruning doesn't cover): orders/customer live as " +
        "Hive TEXTFILE tables in the derby metastore (HiveMode — " +
        "textfile so no parquet-relation conversion substitutes file-" +
        "size estimates), AQE off. Before ANALYZE the stats-less " +
        "dimension sizes at spark.sql.defaultSizeInBytes (Long.MaxValue) " +
        "and the join plans as SortMergeJoin; after ANALYZE TABLE ... " +
        "COMPUTE STATISTICS (+ FOR COLUMNS on the join key) the catalog " +
        "totalSize drives a BroadcastHashJoin — both plan shapes gated " +
        "by requires, emitted as evidence columns. At 100 TB this is " +
        "why nightly ANALYZE matters: without stats the planner must " +
        "assume every table is unbroadcastable.",
      (s, dir) => {
        val hs = graft.catalog.HiveMode.session(s)
        val fact = "graft_q63_orders"
        val dim = "graft_q63_customer"
        val tmp = java.nio.file.Files.createTempDirectory("graft-q63").toString
        // EXTERNAL tables over files written OUTSIDE Hive: a CTAS would
        // auto-gather totalSize into the table properties and the
        // "before" side would never be stats-less. DECIMAL(18,2) before
        // the text roundtrip: decimal -> string -> decimal is lossless,
        // so the textfile tables reproduce the parquet sums exactly.
        t(hs, dir, "customer")
          .select(concat_ws("\u0001", col("c_custkey"), col("c_mktsegment"))
            .as("value"))
          .write.mode("overwrite").text(s"$tmp/cust")
        t(hs, dir, "orders")
          .select(concat_ws("\u0001", col("o_orderkey"), col("o_custkey"),
            dec2(col("o_totalprice"))).as("value"))
          .write.mode("overwrite").text(s"$tmp/ord")
        hs.sql(s"DROP TABLE IF EXISTS $dim")
        hs.sql(s"DROP TABLE IF EXISTS $fact")
        hs.sql(s"CREATE EXTERNAL TABLE $dim (c_custkey BIGINT, " +
          s"c_mktsegment STRING) STORED AS TEXTFILE LOCATION '$tmp/cust'")
        hs.sql(s"CREATE EXTERNAL TABLE $fact (o_orderkey BIGINT, " +
          s"o_custkey BIGINT, o_totalprice DECIMAL(18,2)) " +
          s"STORED AS TEXTFILE LOCATION '$tmp/ord'")
        val prevAqe = hs.conf.get("spark.sql.adaptive.enabled")
        try {
          hs.conf.set("spark.sql.adaptive.enabled", "false")
          def joined = hs.table(fact)
            .join(hs.table(dim), col("o_custkey") === col("c_custkey"))
            .filter(col("c_mktsegment") === "BUILDING")
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice")).cast("double").as("sum_price"))
          val smjBefore = joined.queryExecution.executedPlan.toString
            .contains("SortMergeJoin")
          hs.sql(s"ANALYZE TABLE $dim COMPUTE STATISTICS")
          hs.sql(s"ANALYZE TABLE $dim COMPUTE STATISTICS " +
            "FOR COLUMNS c_custkey, c_mktsegment")
          val bhjAfter = joined.queryExecution.executedPlan.toString
            .contains("BroadcastHashJoin")
          require(smjBefore,
            "q63: expected SortMergeJoin before ANALYZE (stats-less Hive " +
              "table should size at defaultSizeInBytes)")
          require(bhjAfter,
            "q63: expected catalog-stats-driven BroadcastHashJoin after " +
              "ANALYZE")
          joined.select(col("n"),
              lit(if (smjBefore) 1L else 0L).as("smj_before_stats"),
              lit(if (bhjAfter) 1L else 0L).as("bhj_after_stats"),
              col("sum_price"))
            .localCheckpoint()
        } finally {
          hs.conf.set("spark.sql.adaptive.enabled", prevAqe)
          hs.sql(s"DROP TABLE IF EXISTS $dim")
          hs.sql(s"DROP TABLE IF EXISTS $fact")
          Rm.rf(tmp)
        }
      },
      Some("""SELECT COUNT(*) AS n,
        | CAST(1 AS BIGINT) AS smj_before_stats,
        | CAST(1 AS BIGINT) AS bhj_after_stats,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin))
  )
}
