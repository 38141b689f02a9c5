package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: salted two-stage aggregation.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer. Salting splits each key into `salts` sub-keys for the first
  * (partial) aggregation, then merges the sub-aggregates in a second,
  * tiny aggregation — the hot key's work spreads over `salts` reducers
  * and only `salts` pre-aggregated rows hit the final one. Results are
  * exactly those of the unsalted aggregate for any commutative monoid
  * (sum/count/min/max). For skewed JOINs, Spark 4's AQE skew-join
  * handles it at runtime (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default); this helper covers the aggregation side.
  */
object Skew {

  /** One salted aggregate: `name` in the output, `partial` computed per
    * (key, salt) group, `merge` combining the partials per key. */
  final case class SaltedCol(name: String, partial: Column, merge: Column => Column)

  def saltedAgg(df: DataFrame, key: Column, aggs: Seq[SaltedCol],
                salts: Int = 16): DataFrame = {
    // Any spread works — the merge is exact — so use a cheap
    // deterministic row number rather than rand().
    val salted = df.withColumn(
      "_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val partials = aggs.map(a => a.partial.as("_p_" + a.name))
    val merges = aggs.map(a => a.merge(col("_p_" + a.name)).as(a.name))
    salted
      .groupBy(key.as("_k"), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("_k"))
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted exact count per key (the common hot-key case). */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    saltedAgg(df, key,
      Seq(SaltedCol("n", count(lit(1)), c => sum(c).cast("long"))), salts)

  /** Salted equi-join for a skewed FACT side: each fact row gets a
    * deterministic salt in [0, salts); the (smaller) right side is
    * replicated `salts` times so `(key, salt)` still matches every
    * fact row exactly once — a hot key's rows now land on `salts`
    * reducers instead of one. Result set is identical to the unsalted
    * join. Prefer AQE's runtime skew-join when it fires; this is the
    * explicit variant for when it can't (e.g. the skewed side feeds
    * from an exchange AQE won't split, or a deterministic plan is
    * required). Replication costs `salts ×` the right side — keep the
    * right side the small one.
    *
    * Only inner and left joins are supported: under right/full outer,
    * an unmatched replicated right row would be null-extended once PER
    * SALT (`salts` spurious rows), silently breaking the identity. */
  def saltedJoin(fact: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter")
        .contains(joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType' — " +
        "right/full outer would emit unmatched right rows once per salt")
    val saltedFact = fact.withColumn(
      "_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = right.withColumn(
      "_salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
