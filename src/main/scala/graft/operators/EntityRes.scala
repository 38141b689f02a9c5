package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record linkage (JASA 1969) — the probabilistic
  * entity-resolution scorer behind every dedup of dirty structured
  * records (user tables, author lists, product catalogs): candidate
  * pairs from BLOCKING, per-field agreement tests, and a match score
  * Σ ln(m/u) over agreements + Σ ln((1−m)/(1−u)) over disagreements,
  * where m = P(agree | match) and u = P(agree | non-match) are the
  * field's published error rates.
  *
  * Scale shape: the self-join keys on the blocking columns — the
  * quadratic pairing is confined to blocks (pick keys so blocks stay
  * bounded; a hot block is an AQE skew-join case), and comparison
  * fields ride the join so scoring is pure codegen'd expression work,
  * no second fetch. Blocking trades recall for tractability: a pair
  * split across blocks is never compared (run multiple passes with
  * different keys, or d58's sorted-neighborhood, to recover — the
  * classic multi-pass discipline).
  */
final case class FsField(
    name: String, agree: (Column, Column) => Column, m: Double, u: Double)

object EntityRes {

  /** Score all within-block pairs: returns
    * `(id_a, id_b, n_agree, score)` with `score` rounded to 6 (the
    * ln(m/u) weights are computed at runtime from double literals in
    * the same shape the SQL oracle uses — the rounding absorbs libm
    * ulps). `recs` must carry `idCol`, the `blockCols`, and every
    * field column. */
  def fsScorePairs(recs: DataFrame, idCol: String, blockCols: Seq[String],
                   fields: Seq[FsField]): DataFrame = {
    val cols = (idCol +: (blockCols ++ fields.map(_.name))).distinct
    def side(p: String) =
      recs.select(cols.map(c => col(c).as(s"$p$c")): _*)
    val joined = side("a_").join(side("b_"),
      blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
        .reduce(_ && _) && (col(s"a_$idCol") < col(s"b_$idCol")))
    val agrees = fields.map(f =>
      f.agree(col(s"a_${f.name}"), col(s"b_${f.name}")))
    val score = fields.zip(agrees).map { case (f, a) =>
      when(a, log(lit(f.m) / lit(f.u)))
        .otherwise(log(lit(1.0 - f.m) / lit(1.0 - f.u)))
    }.reduce(_ + _)
    joined.select(
      col(s"a_$idCol").as("id_a"),
      col(s"b_$idCol").as("id_b"),
      agrees.map(_.cast("int")).reduce(_ + _).cast("long").as("n_agree"),
      round(score, 6).as("score"))
  }
}
