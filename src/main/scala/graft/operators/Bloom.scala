package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter from codegen'd primitives (q67's backend) —
  * the runtime-filter play for selective fact⋈dim joins: the dim side
  * folds its keys into a bit array held as a TINY `(word, bits)` table
  * (m/64 rows, bit_or-aggregated, broadcast — never collected to the
  * driver), and the probe side keeps only rows whose k bits are all
  * set. Bloom filters have no false negatives, so `probe ⋈ exact-join`
  * returns the exact join result while the prefilter drops most
  * non-matching rows BEFORE the join exchange — at 100 TB that is the
  * shuffle-avoidance lever (Spark's own runtime row-group filtering
  * plays the same trick inside the scan).
  *
  * Hashing is `xxhash64(key, seed_i) mod m` — engine-internal is fine
  * here because the filter is an optimization, not a result: the final
  * answer always comes from the exact join.
  */
object Bloom {

  /** xxhash64 is type-sensitive (LONG 5 and INT 5 hash differently), so
    * a filter built on one integral width and probed with another would
    * silently break the no-false-negative contract. Normalize every
    * integral key to BIGINT before hashing, identically on the build
    * and probe sides; non-integral keys (string, binary, …) hash as-is
    * and must carry the same type on both sides. */
  private def normKey(key: Column, df: DataFrame, keyCol: String): Column =
    df.schema(keyCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType |
           _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.LongType => key.cast("bigint")
      case _ => key
    }

  /** Bit positions for `key` under `k` seeded hash probes. */
  private def positions(key: Column, k: Int, m: Long): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(m)))

  /** Build the `(w, bits)` word table over the distinct keys of
    * `keys`'s column `keyCol` — `m/64` rows max, one aggregation. */
  def build(keys: DataFrame, keyCol: String, k: Int = 3,
            m: Long = 1L << 16): DataFrame =
    keys
      .select(explode(array(
        positions(normKey(col(keyCol), keys, keyCol), k, m): _*)).as("pos"))
      .withColumn("w", expr("pos DIV 64"))
      .groupBy("w")
      .agg(expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").as("bits"))

  /** Keep only probe rows whose `k` bits are all set in `words` —
    * `k` broadcast joins against the word table; rows hitting an
    * absent word (bits implicitly 0) drop via the inner join. The
    * result is a superset of true matches (no false negatives).
    * Internal columns are uniquely suffixed so caller columns named
    * `pos`/`w`/`bits` survive untouched. */
  def probe(df: DataFrame, keyCol: String, words: DataFrame, k: Int = 3,
            m: Long = 1L << 16): DataFrame = {
    val key = normKey(col(keyCol), df, keyCol)
    val wordsR = words.select(col("w").as("__bloom_w"),
      col("bits").as("__bloom_bits"))
    var cand = df
    for (i <- 0 until k) {
      cand = cand
        .withColumn("__bloom_pos", pmod(xxhash64(key, lit(i)), lit(m)))
        .withColumn("__bloom_w", expr("__bloom_pos DIV 64"))
        .join(broadcast(wordsR), Seq("__bloom_w"))
        .filter(expr(
          "(__bloom_bits & shiftleft(1L, CAST(__bloom_pos % 64 AS INT))) != 0"))
        .drop("__bloom_pos", "__bloom_w", "__bloom_bits")
    }
    cand
  }
}
