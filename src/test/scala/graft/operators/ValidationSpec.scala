package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class ValidationSpec extends AnyFunSuite {
  import spark.implicits._

  private val checks = Seq(
    RowCheck("v_pos", col("v") <= 0),
    RowCheck("name_not_null", col("name").isNull))
  private val uniq = Some(("pk_unique", Seq("k1", "k2")))

  private def fixture = Seq(
    (1L, 1, 5L, "a"),
    (1L, 2, -3L, "b"),        // v_pos violation
    (2L, 1, 0L, null),        // v_pos + name_not_null violations
    (2L, 1, 7L, "c"))         // pk duplicate of the row above
    .toDF("k1", "k2", "v", "name")

  test("report: one row per check, exact counts, pass verdicts") {
    val got = Validation.report(fixture, checks, uniq)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("name_not_null", 4L, 1L, false),
      ("pk_unique", 4L, 1L, false),
      ("v_pos", 4L, 2L, false)))
  }

  test("report: a clean frame passes every check") {
    val clean = Seq((1L, 1, 5L, "a"), (1L, 2, 3L, "b"))
      .toDF("k1", "k2", "v", "name")
    val got = Validation.report(clean, checks, uniq).collect()
    assert(got.forall(_.getAs[Boolean]("pass")))
    assert(got.forall(_.getAs[Long]("n_violations") == 0L))
  }

  test("counts is ONE scan: single aggregate, no repeated FileScan") {
    // The whole suite must cost one pass — the executed plan carries
    // exactly one scan of the input even with 3 checks + uniqueness.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-valspec").toString
    try {
      fixture.write.mode("overwrite").parquet(s"$tmp/t")
      val df = spark.read.parquet(s"$tmp/t")
      val plan = Validation.counts(df, checks, uniq)
        .queryExecution.executedPlan.toString
      assert(plan.split("Scan parquet").length - 1 == 1, plan)
    } finally graft.queries.Rm.rf(tmp)
  }

  test("foldCounts: additive across range-disjoint splits + exactly-once replay") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-valfold").toString
    try {
      val whole = Validation.counts(fixture, checks, uniq)
        .orderBy("check_name").collect().toSeq
      // Split on k1 — range-disjoint, so pk_unique stays additive.
      val b0 = Validation.counts(
        fixture.filter(col("k1") === 1L), checks, uniq)
      val b1 = Validation.counts(
        fixture.filter(col("k1") === 2L), checks, uniq)
      Validation.foldCounts(b0, tmp, Some("b0"))
      Validation.foldCounts(b1, tmp, Some("b1"))
      // Replay of an already-committed batch must be a no-op.
      Validation.foldCounts(b1, tmp, Some("b1"))
      val folded = Validation.readCounts(spark, tmp)
        .orderBy("check_name").collect().toSeq
      assert(folded == whole)
    } finally graft.queries.Rm.rf(tmp)
  }

  test("foldCounts: a crashed partial write (stale store_new) is invisible") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-valcrash").toString
    try {
      val b0 = Validation.counts(
        fixture.filter(col("k1") === 1L), checks, uniq)
      Validation.foldCounts(b0, tmp, Some("b0"))
      // Simulate a crash mid-fold: a partial store_new with garbage
      // and NO marker was left behind; the rename never happened.
      val staleDir = new java.io.File(s"$tmp/store_new")
      staleDir.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$tmp/store_new/garbage.txt"), "x")
      val b1 = Validation.counts(
        fixture.filter(col("k1") === 2L), checks, uniq)
      Validation.foldCounts(b1, tmp, Some("b1"))
      val whole = Validation.counts(fixture, checks, uniq)
        .orderBy("check_name").collect().toSeq
      val folded = Validation.readCounts(spark, tmp)
        .orderBy("check_name").collect().toSeq
      assert(folded == whole)
    } finally graft.queries.Rm.rf(tmp)
  }

  test("foldCounts: an overlapping key range fails LOUDLY; disjoint " +
      "ranges fold and the witness rows stay out of the report") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-valrange").toString
    try {
      val b0 = Validation.counts(
        fixture.filter(col("k1") === 1L), checks, uniq)
      val b1 = Validation.counts(
        fixture.filter(col("k1") === 2L), checks, uniq)
      Validation.foldCounts(b0, tmp, Some("b0"), Some((1L, 1L)))
      // Overlap (touching bound counts): range-disjoint ingest
      // violated -> the fold must refuse, not double-count.
      val e = intercept[IllegalArgumentException] {
        Validation.foldCounts(b1, tmp, Some("b1"), Some((1L, 2L)))
      }
      assert(e.getMessage.contains("range-disjoint ingest violated"))
      // Replay of the refused tag with a CORRECT range commits fine.
      Validation.foldCounts(b1, tmp, Some("b1"), Some((2L, 2L)))
      val whole = Validation.counts(fixture, checks, uniq)
        .orderBy("check_name").collect().toSeq
      val folded = Validation.readCounts(spark, tmp)
        .orderBy("check_name").collect().toSeq
      assert(folded == whole) // no _range: rows leak into the report
      // keyRange without a tag is a caller bug, refused up front
      intercept[IllegalArgumentException] {
        Validation.foldCounts(b0, tmp, None, Some((5L, 6L)))
      }
    } finally graft.queries.Rm.rf(tmp)
  }

  test("foldCounts: the rename-out→rename-in crash window self-heals " +
      "instead of silently resetting the store") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-valheal").toString
    try {
      val b0 = Validation.counts(
        fixture.filter(col("k1") === 1L), checks, uniq)
      val b1 = Validation.counts(
        fixture.filter(col("k1") === 2L), checks, uniq)
      Validation.foldCounts(b0, tmp, Some("b0"))
      // simulate the crash BETWEEN the two renames of a b1 fold: the
      // live store is gone, a fully-staged store_new (marker inside)
      // remains — here staged = the b0 store itself, the state a
      // crash right after rename-out of a replayed b0 would leave
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/store"),
        new org.apache.hadoop.fs.Path(s"$tmp/store_new")))
      // the next fold heals first, so it merges against b0's counts
      // rather than an empty base
      Validation.foldCounts(b1, tmp, Some("b1"))
      val whole = Validation.counts(fixture, checks, uniq)
        .orderBy("check_name").collect().toSeq
      val folded = Validation.readCounts(spark, tmp)
        .orderBy("check_name").collect().toSeq
      assert(folded == whole)
    } finally graft.queries.Rm.rf(tmp)
  }

  test("check names are validated") {
    intercept[IllegalArgumentException] {
      Validation.counts(fixture, Seq(RowCheck("bad name", lit(true))))
    }
    intercept[IllegalArgumentException] {
      Validation.counts(fixture,
        Seq(RowCheck("dup", lit(true)), RowCheck("dup", lit(false))))
    }
  }
}
