package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

/** Co-located joins via bucketed tables: writing both join sides
  * bucketed+sorted by the key lets Spark plan a sort-merge join with NO
  * shuffle exchange — the 100 TB answer to repeated fact-fact joins on
  * the same key (SURVEY.md §2.2 joins row; brief: "bucketing for
  * co-located joins").
  */
class BucketingSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark

  it("joins bucketed tables without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val orders = (1L to 100L).map(k => (k, s"o$k")).toDF("okey", "oval")
    val lines = (1L to 300L).map(i => (i % 100 + 1, s"l$i")).toDF("lkey", "lval")

    orders.write.mode("overwrite")
      .bucketBy(4, "okey").sortBy("okey").saveAsTable("b_orders")
    lines.write.mode("overwrite")
      .bucketBy(4, "lkey").sortBy("lkey").saveAsTable("b_lineitem")

    // Force the sort-merge path (tiny test tables would broadcast).
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("okey") === col("lkey"))
      assert(joined.count() == 300)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle, but plan has an Exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  it("snapshot diff over bucketed snapshots runs without a shuffle exchange") {
    // d129's at-rest claim, proven: two corpus snapshots written
    // bucketed+sorted by the key let the FULL OUTER diff plan as a
    // zero-Exchange sort-merge join — nightly 100 TB reconciliation
    // never reshuffles either snapshot.
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_snap_a")
    spark.sql("DROP TABLE IF EXISTS b_snap_b")
    val a = (1L to 90L).map(k => (k, s"t$k")).toDF("doc_id", "text")
    val b = (11L to 100L)
      .map(k => (k, if (k % 5 == 0) s"t$k rev2" else s"t$k"))
      .toDF("doc_id", "text")
    a.write.mode("overwrite")
      .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("b_snap_a")
    b.write.mode("overwrite")
      .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("b_snap_b")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sa = spark.table("b_snap_a").as("a")
      val sb = spark.table("b_snap_b").as("b")
      val diff = sa.join(sb, col("a.doc_id") === col("b.doc_id"),
          "full_outer")
        .select(
          when(col("a.doc_id").isNull, "added")
            .when(col("b.doc_id").isNull, "removed")
            .when(col("a.text") =!= col("b.text"), "changed")
            .otherwise("unchanged").as("cls"))
      val got = diff.groupBy("cls").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("added" -> 10L, "removed" -> 10L,
        "changed" -> 16L, "unchanged" -> 64L))
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed diff should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS b_snap_a")
      spark.sql("DROP TABLE IF EXISTS b_snap_b")
    }
  }

  it("salted aggregation matches the plain aggregation exactly") {
    import spark.implicits._
    // Skewed data: key "hot" dominates.
    val df = ((1 to 500).map(_ => "hot") ++ Seq("a", "a", "b")).toDF("k")
    val salted = Skew.saltedCount(df, col("k"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == Map("hot" -> 500L, "a" -> 2L, "b" -> 1L))
  }
}
