package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

/** Bloom-filter join pruning (q67's backend): the no-false-negative
  * property that makes `probe ⋈ exact-join` exact, and the pruning
  * that makes it worthwhile.
  */
class BloomSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark

  it("never drops a true member and prunes most non-members") {
    import spark.implicits._
    val members = (0L until 200L).map(_ * 7L).toDF("k")
    val probeKeys = (0L until 5000L).toDF("k")
    val words = Bloom.build(members, "k")
    // m/64 = 1024 word rows max
    assert(words.count() <= 1024)
    val kept = Bloom.probe(probeKeys, "k", words).collect().map(_.getLong(0)).toSet
    val truth = members.collect().map(_.getLong(0)).toSet
    // No false negatives: every true member that appears among the
    // probes survives the filter.
    assert(truth.filter(_ < 5000L).subsetOf(kept))
    // Pruning: with 200 keys in 2^16 bits / 3 hashes, the false-
    // positive rate is well under 1%, so of ~4800 non-members only a
    // handful may survive.
    val falsePos = kept -- truth
    assert(falsePos.size < 48, s"${falsePos.size} false positives")
  }

  it("is exact after the confirming join") {
    import spark.implicits._
    val dim = Seq(3L, 10L, 77L).toDF("k")
    val fact = (0L until 100L).toDF("k")
    val words = Bloom.build(dim, "k")
    val exact = Bloom.probe(fact, "k", words)
      .join(broadcast(dim.withColumnRenamed("k", "dk")),
        col("k") === col("dk"))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(exact == Set(3L, 10L, 77L))
  }
}
