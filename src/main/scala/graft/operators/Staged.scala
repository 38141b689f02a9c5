package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** THE staged-rename commit protocol for persisted parquet stores —
  * one implementation of the discipline the streaming folds rely on
  * (Packing carry, StatsStore, Validation counts, and the w41/w42/w44
  * inline `foreachBatch` stores), extracted after six hand-rolled
  * copies drifted: three gained the crash-window self-heal in round
  * 13, three did not (VERDICT r13 #2).
  *
  * Protocol (caller's view, per batch):
  * {{{
  *   Staged.heal(spark, dir)                  // fix a prior crash
  *   if (!Staged.isApplied(spark, dir, tag)) {
  *     ...read live store at s"$dir/store"...
  *     ...write merged result to Staged.staging(dir)...
  *     Staged.commit(spark, dir, Some(tag))   // atomic swap
  *   }
  * }}}
  *
  * Commit order: the `_applied_<tag>` marker is created INSIDE the
  * fully-written staging dir, THEN the live dir renames out to
  * `<live>_retired`, THEN the staging dir renames in. One rename
  * commits data and marker atomically; a replayed batch either finds
  * its marker in the live store (skip) or re-merges from the old
  * store (correct — the merge never happened). Structured Streaming
  * replays at most the last uncommitted batch, so retaining only the
  * latest tag suffices.
  *
  * Crash-window self-heal: a crash BETWEEN the two renames leaves no
  * live dir but a fully-staged one. [[heal]] completes the rename-in
  * when the staging dir carries an `_applied_*` marker, OR when it
  * carries a parquet `_SUCCESS` commit file AND the `<live>_retired`
  * tombstone exists. The tombstone requirement matters (ADVICE r14):
  * `_SUCCESS` is written by Spark's committer the moment the staged
  * WRITE completes — strictly before [[commit]] runs — so on a
  * lazily-bootstrapped store (no live dir yet) a crash after the
  * staged write but before commit leaves a `_SUCCESS`-bearing staged
  * dir whose batch was never marked applied. Promoting it would make
  * the replay re-merge the same batch on top of the promoted data
  * (silent double-count for tag-only folds). The tombstone is proof
  * rename-out ran, i.e. the crash was between the two renames and the
  * staged dir is the committed result; bootstrap commits (which never
  * rename out) recover via the marker witness alone, since commit
  * stamps the marker before rename-in. A staging dir with NO
  * promotable witness is left in place: either the live dir still
  * exists (mid-write crash; the caller's `overwrite` replaces it) or
  * the store never bootstrapped (the caller re-runs the fold from
  * scratch — the un-promoted partial is overwritten, nothing is
  * double-counted).
  */
object Staged {

  /** Sub-dir names derived from the live name (default "store"):
    * staging `<live>_new`, tombstone `<live>_retired`. */
  def staging(dir: String, live: String = "store"): String =
    s"$dir/${live}_new"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hasCommitWitness(fs: FileSystem, staged: Path,
                               retired: Path): Boolean =
    Option(fs.globStatus(new Path(staged, "_applied_*")))
      .exists(_.nonEmpty) ||
      (fs.exists(new Path(staged, "_SUCCESS")) && fs.exists(retired))

  /** Complete a crash-interrupted swap: no live dir + a fully-staged
    * one (marker inside, or `_SUCCESS` inside plus the retired
    * tombstone) → rename it in. Idempotent; call on every entry
    * before reading the live store. */
  def heal(spark: SparkSession, dir: String,
           live: String = "store"): Unit = {
    val fs = fsOf(spark, dir)
    val liveP = new Path(s"$dir/$live")
    val stagedP = new Path(staging(dir, live))
    val retiredP = new Path(s"$dir/${live}_retired")
    if (!fs.exists(liveP) && fs.exists(stagedP) &&
        hasCommitWitness(fs, stagedP, retiredP)) {
      require(fs.rename(stagedP, liveP),
        s"Staged.heal($dir/$live): self-heal rename-in failed")
    }
  }

  /** True iff `tag`'s batch already committed into the live store —
    * the exactly-once replay check. */
  def isApplied(spark: SparkSession, dir: String, tag: String,
                live: String = "store"): Boolean =
    fsOf(spark, dir).exists(new Path(s"$dir/$live/_applied_$tag"))

  /** Atomically swap the fully-written staging dir in as the live
    * store, stamping `tag`'s marker first (inside the staging dir,
    * so marker and data commit in the same rename). */
  def commit(spark: SparkSession, dir: String, tag: Option[String],
             live: String = "store"): Unit = {
    val fs = fsOf(spark, dir)
    val liveP = new Path(s"$dir/$live")
    val stagedP = new Path(staging(dir, live))
    val retiredP = new Path(s"$dir/${live}_retired")
    tag.foreach(t =>
      fs.create(new Path(stagedP, s"_applied_$t"), true).close())
    // First commit of a store that bootstraps lazily (Validation's
    // fold) has no live dir yet — nothing to retire.
    if (fs.exists(liveP)) {
      fs.delete(retiredP, true)
      require(fs.rename(liveP, retiredP),
        s"Staged.commit($dir/$live): rename-out of the live store failed")
    }
    require(fs.rename(stagedP, liveP),
      s"Staged.commit($dir/$live): rename-in of the staged store failed")
  }
}
