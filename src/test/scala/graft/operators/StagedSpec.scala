package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** The shared staged-rename commit protocol (graft.operators.Staged)
  * — the state machine every persisted store now rides (Packing
  * carry, StatsStore, Validation counts, Retrieval term dictionary,
  * and the w41/w42/w44 inline foreachBatch stores). Each test
  * manufactures one crash state on disk and asserts the protocol's
  * recovery, including the two gaps ADVICE r13 named (the untagged
  * fold's heal — _SUCCESS plus the retired tombstone is the witness —
  * and the partial-staged dir that must NOT be promoted) and the one
  * ADVICE r14 named: a lazily-bootstrapped store's crash AFTER the
  * staged write but BEFORE commit leaves _SUCCESS with no marker and
  * no tombstone, and promoting it would double-count the replay. */
class StagedSpec extends AnyFunSuite {
  import spark.implicits._

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  private def writeLive(dir: String, v: Long): Unit =
    Seq(v).toDF("v").write.mode("overwrite").parquet(s"$dir/store")
  private def readLive(dir: String): Long =
    spark.read.parquet(s"$dir/store").head().getLong(0)

  test("commit: marker + data land in ONE rename; isApplied flips") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-staged").toString
    try {
      writeLive(tmp, 1L)
      assert(!Staged.isApplied(spark, tmp, "b7"))
      Seq(2L).toDF("v").write.mode("overwrite")
        .parquet(Staged.staging(tmp))
      Staged.commit(spark, tmp, Some("b7"))
      assert(Staged.isApplied(spark, tmp, "b7"))
      assert(readLive(tmp) == 2L)
      // the retired snapshot is the pre-commit store
      assert(spark.read.parquet(s"$tmp/store_retired")
        .head().getLong(0) == 1L)
    } finally graft.queries.Rm.rf(tmp)
  }

  test("heal: crash between the two renames is completed (marker witness)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-staged").toString
    try {
      writeLive(tmp, 1L)
      Seq(2L).toDF("v").write.mode("overwrite")
        .parquet(Staged.staging(tmp))
      val fs = fsOf(tmp)
      fs.create(p(s"${Staged.staging(tmp)}/_applied_b1"), true).close()
      // crash simulation: rename-out done, rename-in never ran
      require(fs.rename(p(s"$tmp/store"), p(s"$tmp/store_retired")))
      Staged.heal(spark, tmp)
      assert(readLive(tmp) == 2L)
      assert(Staged.isApplied(spark, tmp, "b1"))
    } finally graft.queries.Rm.rf(tmp)
  }

  test("heal: UNTAGGED fold's crash window promotes on _SUCCESS (ADVICE r13)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-staged").toString
    try {
      writeLive(tmp, 1L)
      // an untagged fold writes no _applied_* marker — the staged
      // dir's only completeness witness is parquet's _SUCCESS file
      Seq(2L).toDF("v").write.mode("overwrite")
        .parquet(Staged.staging(tmp))
      val fs = fsOf(tmp)
      assert(fs.exists(p(s"${Staged.staging(tmp)}/_SUCCESS")))
      require(fs.rename(p(s"$tmp/store"), p(s"$tmp/store_retired")))
      Staged.heal(spark, tmp)
      assert(readLive(tmp) == 2L)
    } finally graft.queries.Rm.rf(tmp)
  }

  test("heal: a PARTIAL staged dir (no witness) is never promoted") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-staged").toString
    try {
      // no live store, a torn staged dir: neither marker nor _SUCCESS
      val staged = new java.io.File(Staged.staging(tmp))
      staged.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"${Staged.staging(tmp)}/part-0.parquet"),
        "torn")
      Staged.heal(spark, tmp)
      assert(!fsOf(tmp).exists(p(s"$tmp/store")),
        "heal promoted a staged dir with no completeness witness")
    } finally graft.queries.Rm.rf(tmp)
  }

  test("heal: bootstrap crash BEFORE commit (_SUCCESS, no marker, no" +
      " retired dir) is NOT promoted (ADVICE r14)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-staged").toString
    try {
      // Lazy-bootstrap store: no live dir ever existed. The fold wrote
      // its first staged result (parquet stamps _SUCCESS) and crashed
      // before Staged.commit ran — no _applied_* marker, no
      // store_retired tombstone. Promoting would let the replayed
      // batch re-merge on top of its own output (double-count).
      Seq(7L).toDF("v").write.mode("overwrite")
        .parquet(Staged.staging(tmp))
      val fs = fsOf(tmp)
      assert(fs.exists(p(s"${Staged.staging(tmp)}/_SUCCESS")))
      Staged.heal(spark, tmp)
      assert(!fs.exists(p(s"$tmp/store")),
        "heal promoted a pre-commit bootstrap staged dir")
      // the replayed fold overwrites the orphan and commits cleanly
      Seq(7L).toDF("v").write.mode("overwrite")
        .parquet(Staged.staging(tmp))
      Staged.commit(spark, tmp, Some("b1"))
      assert(readLive(tmp) == 7L)
      assert(Staged.isApplied(spark, tmp, "b1"))
    } finally graft.queries.Rm.rf(tmp)
  }

  test("bootstrap fold replay: staged-write crash does not double-count") {
    // End-to-end version of the ADVICE r14 scenario against the fold
    // shape the inline stores run: batch 1 bootstraps, crashes after
    // the staged write (before commit); the replay must produce the
    // sum once, not twice.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-staged").toString
    try {
      def fold(batchId: Long, add: Long,
               crashBeforeCommit: Boolean = false): Unit = {
        Staged.heal(spark, tmp)
        if (!Staged.isApplied(spark, tmp, s"b$batchId")) {
          val fs = fsOf(tmp)
          val base =
            if (fs.exists(p(s"$tmp/store"))) readLive(tmp) else 0L
          Seq(base + add).toDF("v").write.mode("overwrite")
            .parquet(Staged.staging(tmp))
          if (!crashBeforeCommit)
            Staged.commit(spark, tmp, Some(s"b$batchId"))
          // crashBeforeCommit: _SUCCESS is on disk, nothing else ran
        }
      }
      fold(1, 10, crashBeforeCommit = true)
      assert(!fsOf(tmp).exists(p(s"$tmp/store")), "crash state intact")
      fold(1, 10)             // stream replays the uncommitted batch
      assert(readLive(tmp) == 10L, "bootstrap replay double-counted")
      fold(2, 5)
      assert(readLive(tmp) == 15L)
    } finally graft.queries.Rm.rf(tmp)
  }

  test("inline foreachBatch store path: crash window + replay recovers" +
      " (the w41/w42/w44 shape)") {
    // The exact fold the inline stores run: heal → isApplied gate →
    // merge live+batch into staging → commit. Batch 2's commit is
    // interrupted between the renames; the re-run must first heal,
    // then skip (marker present), leaving the sum correct and no
    // double-count.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-staged").toString
    try {
      def fold(batchId: Long, add: Long,
               crashBeforeRenameIn: Boolean = false): Unit = {
        Staged.heal(spark, tmp)
        if (!Staged.isApplied(spark, tmp, s"b$batchId")) {
          val merged = readLive(tmp) + add
          Seq(merged).toDF("v").write.mode("overwrite")
            .parquet(Staged.staging(tmp))
          if (crashBeforeRenameIn) {
            val fs = fsOf(tmp)
            fs.create(p(s"${Staged.staging(tmp)}/_applied_b$batchId"),
              true).close()
            fs.delete(p(s"$tmp/store_retired"), true)
            require(fs.rename(p(s"$tmp/store"),
              p(s"$tmp/store_retired")))
            // crash: rename-in never happens
          } else Staged.commit(spark, tmp, Some(s"b$batchId"))
        }
      }
      writeLive(tmp, 0L)
      fold(1, 10)
      fold(2, 5, crashBeforeRenameIn = true)
      assert(!fsOf(tmp).exists(p(s"$tmp/store")), "crash state intact")
      fold(2, 5)              // stream replays the uncommitted batch
      assert(readLive(tmp) == 15L)
      fold(2, 5)              // a second replay is a no-op
      assert(readLive(tmp) == 15L)
      fold(3, 100)
      assert(readLive(tmp) == 115L)
    } finally graft.queries.Rm.rf(tmp)
  }
}
