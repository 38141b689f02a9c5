package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality audit (the Deequ-style constraint gate a
  * 100 TB ingest runs before publishing a partition): every check
  * compiles to aggregate expressions over ONE table scan — null counts
  * and predicate violations are conditional sums, uniqueness is the
  * standard two-phase distinct — and the result is one row of violation
  * counts (0 = constraint holds).
  */
object Quality {

  sealed trait Check {
    /** Result column name (one per check). */
    def name: String
    /** Violation-count aggregate. */
    def agg: Column
  }

  /** Violations = rows where the column is NULL. */
  final case class NotNull(c: String) extends Check {
    val name = s"notnull_$c"
    def agg: Column =
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long")
  }

  /** Violations = duplicate surplus among non-null values
    * (`count − countDistinct`; NULLs are [[NotNull]]'s job). */
  final case class Unique(c: String) extends Check {
    val name = s"unique_$c"
    def agg: Column = (count(col(c)) - countDistinct(col(c))).cast("long")
  }

  /** Violations = non-null values outside [lo, hi]. */
  final case class InRange(c: String, lo: Double, hi: Double) extends Check {
    val name = s"inrange_$c"
    def agg: Column =
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)).cast("long")
  }

  /** Violations = non-null values NOT matching `re` (unanchored find,
    * same semantics in Spark rlike and standard regexp_matches). */
  final case class Matches(c: String, re: String) extends Check {
    val name = s"matches_$c"
    def agg: Column =
      sum(when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L))
        .cast("long")
  }

  /** One row of per-check violation counts, ONE scan. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = checks.map(ch => ch.agg.as(ch.name))
    df.agg(aggs.head, aggs.tail: _*)
  }
}
