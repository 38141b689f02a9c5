package graft.queries

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

/** The r18 infrastructure gate (VERDICT r18 #6): MemoRegistry is the
  * evict-on-retire layer every catalog memo builds through, so its
  * ownership arithmetic is load-bearing for Bench's storage budget —
  * a wrong release truncates a localCheckpointed memo's lineage and
  * every later consumer throws. These specs pin (a) the basic
  * track→release→rebuild cycle, (b) lock reentrancy for a tracked
  * build nested inside a tracked build, and (c) the r18 review fix:
  * releasing an OUTER tag whose delta is a superset of an inner
  * memo's ids must not unpersist the inner memo's blocks. */
class MemoRegistrySpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  describe("MemoRegistry.tracked / release") {

    it("captures the build's pinned blocks, frees exactly them on " +
       "release, runs the site eviction, and reports the tag retired") {
      val before = persistedIds
      var evictions = 0
      val df = MemoRegistry.tracked("spec-basic", spark) {
        spark.range(1000).toDF("x").localCheckpoint()
      }(() => evictions += 1)
      val mine = persistedIds -- before
      assert(mine.nonEmpty, "localCheckpoint must pin blocks")
      assert(MemoRegistry.registered.contains("spec-basic"))
      assert(mine.subsetOf(MemoRegistry.liveIds))
      assert(df.count() == 1000L)
      val (n, mb) = MemoRegistry.release("spec-basic")
      assert(evictions == 1, "the site's memo eviction must run")
      assert(n >= 1 && mb >= 0.0)
      assert((persistedIds & mine).isEmpty,
        "released blocks must leave the storage pool")
      assert(!MemoRegistry.registered.contains("spec-basic"))
      assert((MemoRegistry.liveIds & mine).isEmpty)
    }

    it("an unknown tag releases nothing and returns (0, 0)") {
      assert(MemoRegistry.release("spec-no-such-tag") == ((0, 0.0)))
    }

    it("a released tag's re-invocation rebuilds and re-registers " +
       "(the documented cold-sample shape)") {
      var builds = 0
      def build(): org.apache.spark.sql.DataFrame =
        MemoRegistry.tracked("spec-rebuild", spark) {
          builds += 1
          spark.range(100).toDF("x").localCheckpoint()
        }(() => ())
      assert(build().count() == 100L)
      MemoRegistry.release("spec-rebuild")
      val again = build()
      assert(builds == 2 && again.count() == 100L)
      assert(MemoRegistry.registered.contains("spec-rebuild"))
      MemoRegistry.release("spec-rebuild")
    }

    it("a tracked build nested inside a tracked build does not " +
       "deadlock (buildLock is reentrant), and releasing the OUTER " +
       "tag leaves the inner memo's blocks pinned and servable — " +
       "the outer delta is a superset of the inner's ids (r18)") {
      val before = persistedIds
      var innerIds = Set.empty[Int]
      val (innerDf, outerDf) = MemoRegistry.tracked("spec-outer", spark) {
        val pre = persistedIds
        val i = MemoRegistry.tracked("spec-inner", spark) {
          spark.range(500).toDF("i").localCheckpoint()
        }(() => ())
        innerIds = persistedIds -- pre
        val o = spark.range(700).toDF("o").localCheckpoint()
        (i, o)
      }(() => ())
      val outerDelta = persistedIds -- before
      assert(innerIds.nonEmpty && innerIds.subsetOf(outerDelta),
        "the outer tag's delta must capture the nested build's ids")
      MemoRegistry.release("spec-outer")
      assert(innerIds.subsetOf(persistedIds),
        "the inner memo's blocks must survive the outer release")
      assert((persistedIds & (outerDelta -- innerIds)).isEmpty,
        "the outer tag's OWN blocks must be freed")
      // the inner frame still serves: lineage was truncated by
      // localCheckpoint, so this count would throw on dropped blocks
      assert(innerDf.count() == 500L)
      MemoRegistry.release("spec-inner")
      assert((persistedIds & innerIds).isEmpty)
      assert(outerDf.schema.fieldNames.sameElements(Array("o")))
    }
  }
}
